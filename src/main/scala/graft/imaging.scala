package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Image kernels (SURVEY.md §2.2 P5/P7): decode via JDK javax.imageio (no
  * native deps), 8×8-DCT perceptual hash (Zauner 2010), PSNR verification
  * (BASELINE.json:L15 "decoded-pixel allclose, PSNR>=40dB for lossy").
  *
  * These are the only pipeline kernels exposed as Scala UDFs: image decode
  * cannot be expressed in Catalyst, and they run ONLY on the small set of
  * surviving candidate pairs after signature scoring (J5 discipline —
  * pixels never ride a wide shuffle; SURVEY.md §7.5.1).
  */
object Imaging {

  ImageIO.setUseCache(false) // no temp-file cache inside executors

  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException("undecodable image payload")
    img
  }

  /** Decode to a row-major RGB int array (alpha dropped). */
  def decodeRgb(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val img = decode(bytes)
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < px.length) { px(i) = px(i) & 0xffffff; i += 1 }
    (px, w, h)
  }

  /** Luma (BT.601 integer approx) from packed RGB. */
  @inline private def luma(rgb: Int): Double = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    0.299 * r + 0.587 * g + 0.114 * b
  }

  /** Area-average resample of a luma plane to `side`×`side`. */
  private def resampleLuma(px: Array[Int], w: Int, h: Int, side: Int): Array[Double] = {
    val out = new Array[Double](side * side)
    var oy = 0
    while (oy < side) {
      val y0 = oy * h / side; val y1 = math.max(y0 + 1, (oy + 1) * h / side)
      var ox = 0
      while (ox < side) {
        val x0 = ox * w / side; val x1 = math.max(x0 + 1, (ox + 1) * w / side)
        var sum = 0.0; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += luma(px(y * w + x)); x += 1 }
          y += 1
        }
        out(oy * side + ox) = sum / ((y1 - y0) * (x1 - x0))
        ox += 1
      }
      oy += 1
    }
    out
  }

  private val DctSide = 32
  // precomputed DCT-II basis for the 8 low frequencies over 32 samples
  private val dctBasis: Array[Array[Double]] = Array.tabulate(8, DctSide) { (u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / (2.0 * DctSide))
  }

  /** 64-bit perceptual hash: 32×32 luma → 2-D DCT-II → 8×8 low-frequency
    * block → bit = coefficient > median (DC excluded from the median per
    * the classic pHash recipe, Zauner 2010 §3.3).
    */
  def phash(bytes: Array[Byte]): Long = {
    val (px, w, h) = decodeRgb(bytes)
    phashOfPixels(px, w, h)
  }

  def phashOfPixels(px: Array[Int], w: Int, h: Int): Long = {
    val g = resampleLuma(px, w, h, DctSide)
    // separable 2-D DCT: rows then cols, keeping only the 8 low freqs
    val rows = Array.ofDim[Double](DctSide, 8) // rows(y)(u)
    var y = 0
    while (y < DctSide) {
      var u = 0
      while (u < 8) {
        var acc = 0.0; var x = 0
        while (x < DctSide) { acc += g(y * DctSide + x) * dctBasis(u)(x); x += 1 }
        rows(y)(u) = acc
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0; var yy = 0
        while (yy < DctSide) { acc += rows(yy)(u) * dctBasis(v)(yy); yy += 1 }
        coef(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val ac = coef.drop(1).sorted
    val median = (ac(31) + ac(32)) / 2.0
    var bits = 0L; var i = 0
    while (i < 64) {
      if (coef(i) > median) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** PSNR between two encoded payloads, in dB over all RGB channels.
    * Returns [[PsnrExact]] (positive infinity stand-in) for identical
    * pixels, -1 for dimension mismatch / decode failure (never a dup).
    */
  val PsnrExact: Double = 99.0

  /** Per-THREAD decode LRU: in a dup-heavy corpus each image appears in
    * many verified pairs (cluster of size m → m-1..m² pairs), so decoding
    * per PAIR wastes ~2× to ~m× the work. Keyed by a 64-bit content hash;
    * pure memoization — results identical with or without the cache.
    *
    * Bounded by PIXEL BYTES, not entry count: with production-sized
    * images an entry-count bound multiplies by thread count into GBs per
    * executor (32 threads × 256 × 4 MB of 1-MP pixels ≈ 32 GB). Budget is
    * 16 MB of pixel ints per thread (≈ 512 MB worst case at local[32],
    * ~4 fixture images to thousands of thumbnails); eviction pops
    * access-order eldest entries until under budget.
    *
    * Thread-local on purpose: a shared `synchronizedMap` LRU serialized
    * every lookup (access-order `get` mutates under one lock) and made the
    * PSNR stage 4× SLOWER at local[32] than local[8] (measured). Executor
    * task threads are pooled, so each thread's cache lives across tasks;
    * duplicate decodes across threads are an accepted constant-factor
    * cost for lock-free scaling.
    */
  private val CacheBudgetBytes = 16L << 20
  private final class DecodeLru
      extends java.util.LinkedHashMap[Long, (Array[Int], Int, Int)](64, 0.75f, true) {
    var pixelBytes: Long = 0L
    def putBounded(k: Long, v: (Array[Int], Int, Int)): Unit = {
      pixelBytes += v._1.length.toLong * 4
      put(k, v)
      val it = entrySet().iterator()
      while (pixelBytes > CacheBudgetBytes && it.hasNext) {
        val e = it.next()
        if (e.getKey != k) { // never evict the entry just inserted
          pixelBytes -= e.getValue._1.length.toLong * 4
          it.remove()
        }
      }
    }
  }
  private val decodeCache = ThreadLocal.withInitial[DecodeLru](() => new DecodeLru)

  private def contentKey(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L ^ bytes.length.toLong
    var i = 0
    while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001b3L; i += 1 }
    Hashing.mix64(h)
  }

  def decodeRgbCached(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val cache = decodeCache.get()
    val k = contentKey(bytes)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val v = decodeRgb(bytes)
      cache.putBounded(k, v)
      v
    }
  }

  def psnr(aBytes: Array[Byte], bBytes: Array[Byte]): Double = {
    try {
      val (pa, wa, ha) = decodeRgbCached(aBytes)
      val (pb, wb, hb) = decodeRgbCached(bBytes)
      if (wa != wb || ha != hb) return -1.0
      var se = 0.0; var i = 0
      while (i < pa.length) {
        val x = pa(i); val y = pb(i)
        val dr = ((x >> 16) & 0xff) - ((y >> 16) & 0xff)
        val dg = ((x >> 8) & 0xff) - ((y >> 8) & 0xff)
        val db = (x & 0xff) - (y & 0xff)
        se += dr * dr + dg * dg + db * db
        i += 1
      }
      val mse = se / (pa.length * 3.0)
      if (mse == 0.0) PsnrExact
      else math.min(PsnrExact, 10.0 * math.log10(255.0 * 255.0 / mse))
    } catch { case _: Exception => -1.0 }
  }

  // ---- fixture-side encoders (deterministic, JDK-only) ----

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    // JPEG writer requires no alpha channel
    val rgb =
      if (img.getType == BufferedImage.TYPE_3BYTE_BGR) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_3BYTE_BGR)
        val gfx = c.createGraphics(); gfx.drawImage(img, 0, 0, null); gfx.dispose(); c
      }
    writer.write(null, new IIOImage(rgb, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }
}
