package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column operators (builder-prompt first-class ops): opaque
  * `binary` payload columns + typed metadata, with decode /
  * feature-extract / resize / frame-sample as row-local kernels.
  *
  * PNG/JPEG decode and resize are REAL (JDK javax.imageio — no native
  * deps). Video frame-sampling and audio feature extraction are STUBS
  * (deterministic fakes clearly marked below — no codec libraries exist
  * in this container); their Spark-side plumbing (schema, batch shape,
  * null discipline) is real and tested, so swapping in a codec-backed
  * kernel is a one-function change.
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

  /** STUB — video frame sampling. No video codec ships in this container,
    * so the "decoder" is a deterministic fake: frame i of a payload is
    * hash(payload, i). The operator's real part — per-row explosion into
    * (frame_idx, frame_feature) with bounded fan-out — is exactly what a
    * codec-backed version produces.
    */
  val sampleFramesUdf = udf { (bytes: Array[Byte], everyNth: Int, maxFrames: Int) =>
    if (bytes == null) Array.empty[(Int, Long)]
    else {
      val pseudoFrameCount = math.min(1 + bytes.length / 1024, 300)
      (0 until pseudoFrameCount by math.max(1, everyNth))
        .take(maxFrames)
        .map { i =>
          var h = 0xcbf29ce484222325L ^ i.toLong
          var j = 0
          val step = math.max(1, bytes.length / 64)
          while (j < bytes.length) { h = (h ^ bytes(j)) * 0x100000001b3L; j += step }
          (i, Hashing.mix64(h))
        }
        .toArray
    }
  }

  /** STUB — audio MFCC-ish feature vector: deterministic fake (seeded by
    * payload hash); real plumbing: fixed-width float vector per row.
    */
  val audioFeaturesUdf = udf { (bytes: Array[Byte], nCoeffs: Int) =>
    if (bytes == null) null
    else {
      var h = 0xcbf29ce484222325L
      var j = 0
      val step = math.max(1, bytes.length / 256)
      while (j < bytes.length) { h = (h ^ bytes(j)) * 0x100000001b3L; j += step }
      Array.tabulate(nCoeffs)(i =>
        (Hashing.mix64(h ^ i.toLong) % 10000L).toFloat / 10000f)
    }
  }

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
