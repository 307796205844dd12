package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column operators (builder-prompt first-class ops): opaque
  * `binary` payload columns + typed metadata, with decode /
  * feature-extract / resize / frame-sample as row-local kernels.
  *
  * ALL kernels are REAL decoders, pure JVM (no native codec deps):
  * PNG/JPEG decode + resize + pHash (javax.imageio), multi-frame video
  * via animated GIF (ImageIO's multi-image reader — per-frame pHash
  * fingerprints), and audio via RIFF/WAVE PCM parsing + a classic
  * FFT → mel filterbank → DCT MFCC feature chain. Formats needing
  * licensed codecs (H.264, MP3) slot into the same kernel signatures.
  */
object Multimodal {

  /** decode → (width, height, ok) without materializing pixels twice. */
  val decodeMetaUdf = udf { (bytes: Array[Byte]) =>
    try {
      val (_, w, h) = Imaging.decodeRgb(bytes)
      (w, h, true)
    } catch { case _: Exception => (-1, -1, false) }
  }

  /** area-resample to side×side grayscale, returned as byte[] features. */
  val resizeGrayUdf = udf { (bytes: Array[Byte], side: Int) =>
    try {
      val (px, w, h) = Imaging.decodeRgb(bytes)
      val out = new Array[Byte](side * side)
      var oy = 0
      while (oy < side) {
        val y0 = oy * h / side; val y1 = math.max(y0 + 1, (oy + 1) * h / side)
        var ox = 0
        while (ox < side) {
          val x0 = ox * w / side; val x1 = math.max(x0 + 1, (ox + 1) * w / side)
          var sum = 0L; var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = px(y * w + x)
              sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              n += 1; x += 1
            }
            y += 1
          }
          out(oy * side + ox) = (sum / (3 * n)).toByte
          ox += 1
        }
        oy += 1
      }
      out
    } catch { case _: Exception => null }
  }

  /** perceptual-hash feature extraction (real, 8×8 DCT). */
  val phashUdf = udf { (bytes: Array[Byte]) =>
    try Imaging.phash(bytes)
    catch { case _: Exception => 0L }
  }

  // ---- video: REAL multi-frame decode (animated GIF via JDK ImageIO) ----

  /** Decode frames of an animated GIF payload, sampling every `everyNth`
    * frame up to `maxFrames`, and return (frame_idx, frame pHash). REAL
    * decode — ImageIO's GIF reader is JDK-builtin (the only multi-frame
    * container decodable without native codecs; an H.264/VP9 kernel slots
    * into the same signature). Frames are read as stored (no disposal
    * compositing — sufficient for frame fingerprints of full-frame
    * animations, which is what the fixture generator emits). Returns null
    * for undecodable payloads (decode_ok discipline, never throws).
    */
  def gifFrameHashes(bytes: Array[Byte], everyNth: Int, maxFrames: Int): Array[(Int, Long)] = {
    if (bytes == null) return null
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        var i = 0
        while (i < n && out.length < maxFrames) {
          val img = reader.read(i)
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var j = 0
          while (j < px.length) { px(j) = px(j) & 0xffffff; j += 1 }
          out += ((i, Imaging.phashOfPixels(px, w, h)))
          i += math.max(1, everyNth)
        }
        out.toArray
      } finally reader.dispose()
    } catch { case _: Exception => null }
    finally iis.close()
  }

  val sampleFramesUdf = udf(gifFrameHashes _)

  // ---- audio: REAL WAV (RIFF PCM) decode + spectral features ----

  /** Parse a RIFF/WAVE PCM payload → (mono samples in [-1,1], sample
    * rate). Supports PCM 8/16-bit, any channel count (channels averaged).
    * Returns null on malformed/compressed payloads.
    */
  def decodeWavPcm(bytes: Array[Byte]): (Array[Double], Int) = {
    if (bytes == null || bytes.length < 44) return null
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != 0x46464952 /* "RIFF" */ ||
      bb.getInt(8) != 0x45564157 /* "WAVE" */ ) return null
    var pos = 12
    var channels = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (pos >= 0 && pos + 8 <= bytes.length) {
      val id = bb.getInt(pos); val size = bb.getInt(pos + 4)
      // the chunk `size` field is attacker-controlled: negative values
      // would stall the scan loop (zero advance) or make `frames`
      // negative; oversized values overflow `pos` — both violate the
      // null-on-malformed contract, so reject/stop instead
      if (size < 0) return null
      if (id == 0x20746d66 /* "fmt " */ && pos + 24 <= bytes.length) {
        val audioFormat = bb.getShort(pos + 8)
        if (audioFormat != 1) return null // PCM only
        channels = bb.getShort(pos + 10)
        sampleRate = bb.getInt(pos + 12)
        bits = bb.getShort(pos + 22)
      } else if (id == 0x61746164 /* "data" */ ) {
        dataOff = pos + 8; dataLen = math.min(size, bytes.length - dataOff)
      }
      val next = pos.toLong + 8L + size.toLong + (size & 1) // word-aligned
      pos = if (next > bytes.length.toLong) -1 else next.toInt // truncated tail: stop
    }
    if (channels <= 0 || sampleRate <= 0 || dataOff < 0 ||
      (bits != 8 && bits != 16)) return null
    val bytesPerSample = bits / 8
    val frames = dataLen / (bytesPerSample * channels)
    val out = new Array[Double](frames)
    var f = 0
    while (f < frames) {
      var acc = 0.0
      var c = 0
      while (c < channels) {
        val off = dataOff + (f * channels + c) * bytesPerSample
        acc += (if (bits == 16) bb.getShort(off) / 32768.0
                else ((bytes(off) & 0xff) - 128) / 128.0)
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    (out, sampleRate)
  }

  /** Iterative radix-2 FFT (in-place, n must be a power of two). */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var i = 1; var j = 0
    while (i < n) { // bit-reversal permutation
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr0 = re(blk + k + len / 2); val vi0 = im(blk + k + len / 2)
          val vr = vr0 * cwr - vi0 * cwi
          val vi = vr0 * cwi + vi0 * cwr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr; im(blk + k + len / 2) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  private val FftSize = 512
  private val HopSize = 256
  private val NMelFilters = 26

  /** MFCC-style coefficients of a WAV payload: frame (512/256 Hamming) →
    * FFT power spectrum → 26 triangular mel filters → log energies →
    * DCT-II → first `nCoeffs` coefficients, averaged over frames. The
    * classic recipe (Davis & Mermelstein 1980); deterministic pure-JVM
    * implementation. Returns null for undecodable payloads.
    */
  def audioMfcc(bytes: Array[Byte], nCoeffs: Int): Array[Float] = {
    // decodeWavPcm validates structure, but this kernel runs on opaque
    // binary columns — any residual parse exception must become null, not
    // a failed Spark task (same discipline as gifFrameHashes)
    val dec = try decodeWavPcm(bytes) catch { case _: Exception => null }
    if (dec == null) return null
    val (samples, sr) = dec
    if (samples.length < FftSize) return null
    def mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    def invMel(m: Double) = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
    // mel filterbank center frequencies → FFT bin edges
    val melMax = mel(sr / 2.0)
    val binOf = Array.tabulate(NMelFilters + 2) { i =>
      val hz = invMel(melMax * i / (NMelFilters + 1.0))
      math.min(FftSize / 2, (hz * FftSize / sr).toInt)
    }
    val hamming = Array.tabulate(FftSize)(i =>
      0.54 - 0.46 * math.cos(2.0 * math.Pi * i / (FftSize - 1)))
    val acc = new Array[Double](nCoeffs)
    var nFrames = 0
    var start = 0
    while (start + FftSize <= samples.length) {
      val re = new Array[Double](FftSize)
      val im = new Array[Double](FftSize)
      var i = 0
      while (i < FftSize) { re(i) = samples(start + i) * hamming(i); i += 1 }
      fft(re, im)
      val power = Array.tabulate(FftSize / 2 + 1)(k => re(k) * re(k) + im(k) * im(k))
      val logE = Array.tabulate(NMelFilters) { m =>
        val (lo, mid, hi) = (binOf(m), binOf(m + 1), binOf(m + 2))
        var e = 0.0
        var k = lo
        while (k <= hi) {
          val wgt =
            if (k < mid && mid > lo) (k - lo).toDouble / (mid - lo)
            else if (k >= mid && hi > mid) (hi - k).toDouble / (hi - mid)
            else if (k == mid) 1.0 else 0.0
          e += wgt * power(k)
          k += 1
        }
        math.log(e + 1e-10)
      }
      var c = 0
      while (c < nCoeffs) { // DCT-II over the mel log-energies
        var s = 0.0
        var m = 0
        while (m < NMelFilters) {
          s += logE(m) * math.cos(math.Pi * c * (m + 0.5) / NMelFilters)
          m += 1
        }
        acc(c) += s
        c += 1
      }
      nFrames += 1
      start += HopSize
    }
    if (nFrames == 0) null
    else Array.tabulate(nCoeffs)(c => (acc(c) / nFrames).toFloat)
  }

  val audioFeaturesUdf = udf(audioMfcc _)

  /** Assemble a typed media-features frame from an ImageRow-shaped input:
    * decode metadata validation + resize features + phash, all row-local
    * (single projection; bytes read once per kernel, never shuffled).
    */
  def imageFeatures(corpus: DataFrame, side: Int = 16): DataFrame =
    corpus.select(
      col("image_id"),
      col("w"), col("h"), col("fmt"),
      decodeMetaUdf(col("bytes")).as("meta"),
      resizeGrayUdf(col("bytes"), lit(side)).as("gray"),
      phashUdf(col("bytes")).as("phash_computed"))
      .select(
        col("image_id"), col("w"), col("h"), col("fmt"),
        col("meta._1").as("dec_w"), col("meta._2").as("dec_h"),
        col("meta._3").as("decode_ok"),
        col("gray"), col("phash_computed"))
}
