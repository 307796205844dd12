package graft

import java.awt.image.BufferedImage
import java.util.SplittableRandom
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic corpus + labeled-pair fixtures (FIXTURES.md).
  *
  * The reference's own labeled dup/non-dup samples are unavailable (empty
  * reference mount — SURVEY.md §0), so labels are exact *by construction*:
  * the generator plants known duplicate-variant chains (power-law cluster
  * sizes for skew realism) and emits the transitive pair closure as
  * `pair_labels`. Seeded (`seed=42` default) and byte-stable.
  *
  * Spec construction is driver-side (cheap metadata); image rendering +
  * encoding runs distributed via `Dataset.map` so bench-scale corpora
  * (100k+ rows) parallelize across executors.
  */
object Fixtures {

  val Kinds = Vector("exact", "reencode", "noise", "retypo", "paraphrase", "span", "hamming")

  final case class Spec(
      image_id: String,
      cluster_id: String, // golden cluster (min image_id of planted group)
      kind: String, // "base" | variant kind | "decoy"
      baseSeed: Long, // drives base image + caption
      variantSeed: Long, // drives the mutation
      w: Int,
      h: Int,
      fmt: String, // "png" | "jpeg"
      quality: Float // jpeg quality (ignored for png)
  )

  private val vocab: Array[String] =
    ("sunset beach mountain forest river city street bridge tower harbor " +
      "market garden temple castle desert island valley meadow canyon cliff " +
      "lighthouse waterfall glacier volcano prairie lagoon orchard vineyard " +
      "red blue green golden silver bright dark misty frozen ancient quiet " +
      "busy narrow wide tall small giant hidden famous remote coastal rural " +
      "dog cat horse eagle whale fox bear deer owl heron salmon turtle " +
      "man woman child fisher farmer artist dancer runner rider sailor " +
      "walking running standing resting flying swimming climbing reading " +
      "painting fishing sailing riding jumping sleeping watching waiting " +
      "under over beside behind near across along within beyond during " +
      "morning evening winter summer spring autumn night noon dawn dusk " +
      "photo picture view scene shot closeup portrait landscape detail frame")
      .split("\\s+") ++ syntheticWords

  /** 12k deterministic random-letter words. The thematic base list alone
    * (~130 words) gives two *unrelated* captions a background char-5-gram
    * Jaccard high enough that LSH candidate volume grows ~quadratically
    * with corpus size (measured: 2× rows → 3.8× candidates) — an artifact
    * no open-vocabulary web caption corpus has. Words must be random over
    * the FULL letter alphabet: a syllable-compound vocab (20 syllables)
    * was tried first and still collided quadratically, because distinct
    * words share the syllables' 5-grams. Full-alphabet words make the
    * shingle space ~26^5, background similarity ≈ 0, and candidate volume
    * linear in corpus size (matching an open-vocab web corpus). A base-26
    * suffix of the index guarantees pairwise distinctness.
    */
  private def syntheticWords: Array[String] = Array.tabulate(12000) { i =>
    val rng = new SplittableRandom(0x5eedcafeL + i)
    val len = 4 + rng.nextInt(5)
    val sb = new StringBuilder
    var j = 0
    while (j < len) { sb.append(('a' + rng.nextInt(26)).toChar); j += 1 }
    var v = i
    sb.append(('a' + v % 26).toChar); v /= 26
    while (v > 0) { sb.append(('a' + v % 26).toChar); v /= 26 }
    sb.toString
  }

  private def word(rng: SplittableRandom): String = vocab(rng.nextInt(vocab.length))

  private[graft] def baseCaption(rng: SplittableRandom): String = {
    val n = 8 + rng.nextInt(13) // 8..20 words
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(word(rng))
      i += 1
    }
    sb.append(' ').append("no").append(rng.nextInt(10000)) // numeric token
    sb.toString
  }

  // ---- caption mutations ----

  private def typo(caption: String, rng: SplittableRandom): String = {
    val chars = caption.toCharArray
    val nTypos = 1 + rng.nextInt(2)
    var t = 0
    while (t < nTypos) {
      val i = 1 + rng.nextInt(math.max(1, chars.length - 2))
      if (chars(i) != ' ' && chars(i + 1) != ' ') {
        val tmp = chars(i); chars(i) = chars(i + 1); chars(i + 1) = tmp
      }
      t += 1
    }
    new String(chars)
  }

  private def paraphrase(caption: String, rng: SplittableRandom): String = {
    val toks = caption.split(' ')
    // 10–25% tokens replaced. Char-level k-gram Jaccard runs BELOW token
    // Jaccard (each swapped token kills ~k+len(tok) shingles), so this
    // lands the FIXTURES.md-specified J≈0.5–0.8 band; heavier rewrites of
    // short captions fell to J≈0.23, outside the fixture's own spec.
    val frac = 0.10 + 0.15 * rng.nextDouble()
    val n = math.max(1, (toks.length * frac).toInt)
    var i = 0
    while (i < n) {
      toks(rng.nextInt(toks.length)) = word(rng)
      i += 1
    }
    toks.mkString(" ")
  }

  /** Mostly-new caption embedding a ≥30-char contiguous span of the base
    * caption (exercises the suffix-array pass, SURVEY.md §2.7).
    */
  private def spanCaption(caption: String, rng: SplittableRandom): String = {
    val spanLen = math.min(caption.length, 30 + rng.nextInt(20))
    val start = rng.nextInt(math.max(1, caption.length - spanLen + 1))
    val span = caption.substring(start, start + spanLen)
    val pre = (0 until (3 + rng.nextInt(4))).map(_ => word(rng)).mkString(" ")
    val post = (0 until (3 + rng.nextInt(4))).map(_ => word(rng)).mkString(" ")
    s"$pre $span $post"
  }

  private def minorEdit(caption: String, rng: SplittableRandom): String =
    caption + " " + word(rng)

  /** Decoy caption: shares a few rare tokens with the target but is a
    * different sentence (must NOT end up a dup — negative label).
    */
  private def decoyCaption(target: String, rng: SplittableRandom): String = {
    val toks = target.split(' ')
    val keep = (0 until 3).map(_ => toks(rng.nextInt(toks.length)))
    val noise = (0 until (6 + rng.nextInt(8))).map(_ => word(rng))
    rng.nextLong() // advance
    (keep ++ noise).mkString(" ")
  }

  // ---- image rendering ----

  /** Muted-palette gradient + antialiased ovals. Style constraints (probed
    * empirically, see ImagingSpec): low chroma + soft edges keep the JDK
    * JPEG encoder (4:2:0 subsampling) above 45 dB PSNR at q≥0.85, while
    * the shapes give the 8×8 DCT enough structure for a stable pHash
    * (pure gradients flip 20+ phash bits under re-encode).
    */
  private[graft] def renderBase(seed: Long, w: Int, h: Int): BufferedImage = {
    val rng = new SplittableRandom(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val base = 60 + rng.nextInt(110)
    val amp = 36
    def muted(): Array[Int] =
      Array(base + rng.nextInt(amp), base + rng.nextInt(amp), base + rng.nextInt(amp))
    val c0 = muted(); val c1 = muted()
    val angle = rng.nextDouble() * math.Pi
    val (dx, dy) = (math.cos(angle), math.sin(angle))
    val span = math.abs(dx) * w + math.abs(dy) * h
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val t = math.max(0.0, math.min(1.0, (dx * x + dy * y) / span + 0.5))
        val r = (c0(0) + (c1(0) - c0(0)) * t).toInt
        val g = (c0(1) + (c1(1) - c0(1)) * t).toInt
        val b = (c0(2) + (c1(2) - c0(2)) * t).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val gfx = img.createGraphics()
    gfx.setRenderingHint(java.awt.RenderingHints.KEY_ANTIALIASING,
      java.awt.RenderingHints.VALUE_ANTIALIAS_ON)
    var i = 0
    while (i < 4) { // soft shapes for DCT structure
      val c = muted()
      gfx.setColor(new java.awt.Color(c(0), c(1), c(2)))
      val rw = w / 5 + rng.nextInt(w / 3); val rh = h / 5 + rng.nextInt(h / 3)
      gfx.fillOval(rng.nextInt(math.max(1, w - rw)), rng.nextInt(math.max(1, h - rh)), rw, rh)
      i += 1
    }
    gfx.dispose()
    img
  }

  /** ±1 per-channel noise on every pixel → PSNR ≈ 50 dB standalone, so the
    * stacked budget (noise + JPEG re-encode of BOTH endpoints at q≥0.92)
    * still clears the 40 dB verification bar with ~2 dB margin.
    */
  private def addNoise(img: BufferedImage, seed: Long): BufferedImage = {
    val rng = new SplittableRandom(seed)
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        def clamp(v: Int) = math.max(0, math.min(255, v))
        val r = clamp(((p >> 16) & 0xff) + rng.nextInt(3) - 1)
        val g = clamp(((p >> 8) & 0xff) + rng.nextInt(3) - 1)
        val b = clamp((p & 0xff) + rng.nextInt(3) - 1)
        out.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Tiny localized patch — near-identical pixels, phash within a few
    * bits. Perturbs a 2×2 block by ±24/channel relative to the ORIGINAL
    * pixels (an absolute random color would cost ~8 dB PSNR on a 32×32
    * image and fail verification).
    */
  private def patch(img: BufferedImage, seed: Long): BufferedImage = {
    val rng = new SplittableRandom(seed)
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_3BYTE_BGR)
    val gfx = out.createGraphics()
    gfx.drawImage(img, 0, 0, null)
    gfx.dispose()
    val px = rng.nextInt(math.max(1, img.getWidth - 2))
    val py = rng.nextInt(math.max(1, img.getHeight - 2))
    def clamp(v: Int) = math.max(0, math.min(255, v))
    var dy = 0
    while (dy < 2) {
      var dx = 0
      while (dx < 2) {
        val p = out.getRGB(px + dx, py + dy)
        val r = clamp(((p >> 16) & 0xff) + rng.nextInt(49) - 24)
        val g = clamp(((p >> 8) & 0xff) + rng.nextInt(49) - 24)
        val b = clamp((p & 0xff) + rng.nextInt(49) - 24)
        out.setRGB(px + dx, py + dy, (r << 16) | (g << 8) | b)
        dx += 1
      }
      dy += 1
    }
    out
  }

  def render(spec: Spec): ImageRow = {
    val base = renderBase(spec.baseSeed, spec.w, spec.h)
    val img = spec.kind match {
      case "noise" | "span" => addNoise(base, spec.variantSeed)
      case "hamming" => patch(base, spec.variantSeed)
      case "decoy" => renderBase(spec.variantSeed, spec.w, spec.h) // unrelated image
      case _ => base // exact / reencode / retypo / paraphrase / base share pixels
    }
    val bytes =
      if (spec.fmt == "png") Imaging.encodePng(img)
      else Imaging.encodeJpeg(img, spec.quality)
    val capRng = new SplittableRandom(spec.baseSeed ^ 0xcafef00dL)
    val baseCap = baseCaption(capRng)
    val vRng = new SplittableRandom(spec.variantSeed ^ 0xabad1deaL)
    val caption = spec.kind match {
      case "base" | "exact" | "reencode" | "noise" => baseCap
      case "retypo" => typo(baseCap, vRng)
      case "paraphrase" => paraphrase(baseCap, vRng)
      case "span" => spanCaption(baseCap, vRng)
      case "hamming" => minorEdit(baseCap, vRng)
      case "decoy" => decoyCaption(baseCap, vRng)
      case other => throw new IllegalArgumentException(other)
    }
    val ph = Imaging.phash(bytes)
    ImageRow(spec.image_id, bytes, spec.w, spec.h, spec.fmt, caption, ph)
  }

  /** Build specs + exact labels. `nClusters` planted groups; sizes drawn
    * power-law (α≈0.7, capped) so hot LSH buckets exist at every scale
    * (salting realism, SURVEY.md §7.5.6); ~5% decoy negatives.
    */
  def plan(nClusters: Int, seed: Long = 42L, maxClusterSize: Int = 48)
      : (Vector[Spec], Vector[PairLabel]) = {
    val rng = new SplittableRandom(seed)
    val specs = Vector.newBuilder[Spec]
    val labels = Vector.newBuilder[PairLabel]
    var nextId = 0
    def newId(): String = { val id = f"img$nextId%08d"; nextId += 1; id }

    var c = 0
    while (c < nClusters) {
      val baseSeed = rng.nextLong()
      val u = rng.nextDouble()
      val size = math.min(maxClusterSize, math.max(1, math.pow(u, -0.7).toInt))
      val w = 32 + rng.nextInt(4) * 16 // 32..80
      val h = 32 + rng.nextInt(4) * 16
      val fmtBase = if (rng.nextBoolean()) "png" else "jpeg"
      val ids = new Array[String](size)
      val baseId = newId()
      ids(0) = baseId
      specs += Spec(baseId, baseId, "base", baseSeed, rng.nextLong(), w, h, fmtBase,
        0.92f + rng.nextInt(4) * 0.01f)
      var v = 1
      while (v < size) {
        val kind = Kinds(rng.nextInt(Kinds.length))
        val id = newId()
        ids(v) = id
        val fmt = kind match {
          case "exact" => fmtBase
          case "reencode" | "paraphrase" => "jpeg"
          case _ => if (rng.nextBoolean()) "png" else "jpeg"
        }
        specs += Spec(id, baseId, kind, baseSeed, rng.nextLong(), w, h, fmt,
          0.92f + rng.nextInt(4) * 0.01f)
        labels += PairLabel(baseId, id, label = true, kind)
        v += 1
      }
      // transitive closure among variants (evaluated via shared cluster_id)
      var i = 1
      while (i < size) {
        var j = i + 1
        while (j < size) {
          labels += PairLabel(ids(i), ids(j), label = true, "transitive")
          j += 1
        }
        i += 1
      }
      // ~5% decoys, pointed at this cluster
      if (rng.nextDouble() < 0.3) {
        val id = newId()
        specs += Spec(id, id, "decoy", baseSeed, rng.nextLong(), w, h, "png", 0.92f)
        labels += PairLabel(baseId, id, label = false, "decoy")
      }
      c += 1
    }
    (specs.result(), labels.result())
  }

  def corpus(spark: SparkSession, nClusters: Int, seed: Long = 42L): Dataset[ImageRow] = {
    import spark.implicits._
    val (specs, _) = plan(nClusters, seed)
    spark.createDataset(specs).repartition(spark.sparkContext.defaultParallelism)
      .map(render)
  }

  def pairLabels(spark: SparkSession, nClusters: Int, seed: Long = 42L): Dataset[PairLabel] = {
    import spark.implicits._
    val (_, labels) = plan(nClusters, seed)
    spark.createDataset(labels.map(l =>
      if (l.a <= l.b) l else l.copy(a = l.b, b = l.a)))
  }

  /** Golden expected clusters: every member maps to min image_id of its
    * planted group; decoys/singletons map to themselves.
    */
  def goldenClusters(spark: SparkSession, nClusters: Int, seed: Long = 42L): Dataset[ClusterRow] = {
    import spark.implicits._
    val (specs, _) = plan(nClusters, seed)
    spark.createDataset(specs.map(s => ClusterRow(s.image_id, s.cluster_id)))
  }

  // ---- media fixtures (REAL containers: animated GIF video, PCM WAV) ----

  /** Deterministic animated GIF: `nFrames` frames of the seeded gradient
    * renderer (each frame a fresh seed → distinct per-frame pHashes).
    * JDK ImageIO writes GIF sequences natively.
    */
  def renderGif(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var i = 0
    while (i < nFrames) {
      val img = renderBase(seed ^ (i.toLong * 0x9e3779b97f4a7c15L), w, h)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
      i += 1
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  /** Deterministic PCM-16 mono WAV: a mix of 2–3 seeded sine tones.
    * Hand-built RIFF container (44-byte canonical header + data chunk).
    */
  def renderWav(seed: Long, sampleRate: Int = 8000, seconds: Double = 0.5): Array[Byte] = {
    val rng = new SplittableRandom(seed)
    val nTones = 2 + rng.nextInt(2)
    val tones = Array.fill(nTones)(200.0 + rng.nextInt(1800))
    val n = (sampleRate * seconds).toInt
    val data = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      var s = 0.0
      var t = 0
      while (t < nTones) { s += math.sin(2.0 * math.Pi * tones(t) * i / sampleRate); t += 1 }
      bb.putShort(i * 2, (s / nTones * 20000).toShort)
      i += 1
    }
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putInt(0x46464952) // "RIFF"
    out.putInt(36 + data.length)
    out.putInt(0x45564157) // "WAVE"
    out.putInt(0x20746d66) // "fmt "
    out.putInt(16)
    out.putShort(1) // PCM
    out.putShort(1) // mono
    out.putInt(sampleRate)
    out.putInt(sampleRate * 2) // byte rate
    out.putShort(2) // block align
    out.putShort(16) // bits
    out.putInt(0x61746164) // "data"
    out.putInt(data.length)
    out.put(data)
    out.array()
  }

  final case class VideoRow(video_id: String, bytes: Array[Byte], fmt: String, n_frames: Int)
  final case class AudioRow(audio_id: String, bytes: Array[Byte], fmt: String, sample_rate: Int)

  /** Seeded corpus of real animated GIFs (3–8 frames each). */
  def videoCorpus(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[VideoRow] = {
    import spark.implicits._
    val rng = new SplittableRandom(seed)
    val specs = Vector.tabulate(n) { i =>
      (f"vid$i%05d", rng.nextLong(), 3 + rng.nextInt(6))
    }
    spark.createDataset(specs).map { case (id, s, frames) =>
      VideoRow(id, renderGif(s, 32, 32, frames), "gif", frames)
    }
  }

  /** Seeded corpus of real PCM WAV clips. */
  def audioCorpus(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[AudioRow] = {
    import spark.implicits._
    val rng = new SplittableRandom(seed)
    val specs = Vector.tabulate(n)(i => (f"aud$i%05d", rng.nextLong()))
    spark.createDataset(specs).map { case (id, s) =>
      AudioRow(id, renderWav(s), "wav", 8000)
    }
  }
}
