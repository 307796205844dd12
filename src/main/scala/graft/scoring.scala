package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stages 4–5: signature-space scoring and pixel verification
  * (SURVEY.md §3.1). Replaces the reference's XGBoost feature scorer with
  * the spec's deterministic rule (BASELINE.json:L6): Jaccard-from-signature
  * + SimHash Hamming + span length, then PSNR pixel verification.
  */
object Scoring {

  /** Attach both endpoints' signatures and compute signature-space scores.
    * `jaccard_sig` = fraction of equal MinHash lanes (unbiased Jaccard
    * estimator, Broder 1997) via `zip_with`+`aggregate` HOFs — codegen'd,
    * no UDF. `hamming` = popcount of SimHash XOR (built-in `bit_count`).
    *
    * Join discipline: signatures are (id, 128×i32, i64) ≈ 530 B/row —
    * these shuffle; pixel payloads do NOT (they join later, J5).
    */
  def score(
      pairs: DataFrame,
      sigs: DataFrame,
      cfg: DedupConfig,
      sigRows: Long = -1L): DataFrame = {
    // Join-strategy choice: candidate volume is O(100×) the signature
    // count, so shuffling the pair side twice through sort-merge joins is
    // the bottleneck. When the signature table fits an executor
    // (id+128×i32+i64 ≈ 560 B/row → ~4M rows ≈ 2 GB), broadcast it and
    // scoring becomes map-side — no pair shuffle at all. Beyond that,
    // SHUFFLE_HASH beats SMJ (no sort of the huge pair side).
    val small = sigRows >= 0 && sigRows <= cfg.broadcastSigRows
    def side(s: DataFrame) = if (small) broadcast(s) else s.hint("SHUFFLE_HASH")
    val sa = side(sigs.select(
      col("id").as("a"), col("minhash").as("mh_a"), col("simhash").as("sh_a")))
    val sb = side(sigs.select(
      col("id").as("b"), col("minhash").as("mh_b"), col("simhash").as("sh_b")))
    val withSpan =
      if (pairs.columns.contains("span_len")) pairs
      else pairs.withColumn("span_len", lit(0))
    withSpan
      .join(sa, "a")
      .join(sb, "b")
      .withColumn(
        "jaccard_sig",
        aggregate(
          zip_with(col("mh_a"), col("mh_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0),
          (acc, x) => acc + x
        ).cast("double") / cfg.numPerms)
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .select("a", "b", "src", "span_len", "jaccard_sig", "hamming")
  }

  /** Keep rule: any retrieval criterion passing keeps the pair for pixel
    * verification. Then W1: top-k surviving candidates per left endpoint
    * (bounds the expensive PSNR stage exactly like the reference's Solr
    * `rows=N` bounded its scorer).
    */
  /** Keep-rule filter + per-criterion top-k. The cap ranks WITHIN each
    * keep criterion (signature Jaccard / SimHash Hamming / span length)
    * and unions the three winners: a single Jaccard-ordered cap
    * systematically evicted exactly the pairs the other two tiers
    * exist to catch (a span-caught caption rewrite has near-zero
    * signature Jaccard BY CONSTRUCTION, so on a candidate-rich image it
    * always ranked below the Jaccard pairs and died before pixel
    * verification). Bound: ≤ 3·topKPerImage pairs per image.
    */
  def filterAndTopK(scored: DataFrame, cfg: DedupConfig): DataFrame = {
    def topKBy(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
      val w = Window.partitionBy(col("a")).orderBy(key.desc, col("b"))
      df.withColumn("rk", row_number().over(w))
        .where(col("rk") <= cfg.topKPerImage)
        .drop("rk")
    }
    val byJac = topKBy(scored.where(col("jaccard_sig") >= cfg.minJaccardSig),
      col("jaccard_sig"))
    val bySim = topKBy(scored.where(col("hamming") <= cfg.simhashMaxHamming),
      lit(64) - col("hamming"))
    val bySpan = topKBy(scored.where(col("span_len") >= cfg.saMinSpan),
      col("span_len"))
    byJac.unionByName(bySim).unionByName(bySpan).dropDuplicates("a", "b")
  }

  private val psnrUdf = udf { (a: Array[Byte], b: Array[Byte]) => Imaging.psnr(a, b) }

  /** Stage 5 (J5 + P7): re-join the two payloads and verify pixels.
    * Projection discipline: only (image_id, bytes, fmt, caption) of the
    * corpus is read here, and only rows that appear in surviving pairs
    * cross the wire (the join keys prune). `is_dup` per
    * BASELINE.json:L15: decoded-pixel allclose — exact for lossless,
    * PSNR ≥ 40 dB for lossy.
    *
    * Join discipline — the inverse of [[score]]'s, because here the BYTES
    * side must not be the build side: when the survivor count is known
    * and bounded (≤ broadcastSigRows; pair rows are ~10× narrower than
    * signature rows), the PAIR side is PINNED as the broadcast side —
    * payload bytes are filtered map-side at the probe, never ride the
    * broadcast, and the pin holds even when the pair side reports no
    * size statistics (a localCheckpointed stream micro-batch; the same
    * stats gap that flipped the estimate-gate joins to sort-merge). AQE
    * finishes the second join on runtime sizes; the byte volume it can
    * sort or shuffle there is bounded by the regime's survivor bound. A
    * semi-prune of the payload sides before the joins was measured 3×
    * SLOWER here (its dedup shuffles + broadcast builds serialize ahead
    * of the scan, and the broadcast inner probe already filters bytes
    * map-side), and hinting the second join SHUFFLE_HASH was 2.7× slower
    * (the hash map builds from byte rows; the sort it avoids is bounded).
    * Beyond the bound, SHUFFLE_HASH everywhere, built from the pair /
    * single-payload side: unbounded byte relations are never sorted,
    * bytes ride one exchange each — or none when the corpus commit is
    * id-bucketed (TableIO.commitBucketed pre-partitions the scan on the
    * join key).
    */
  def verify(
      survivors: DataFrame,
      corpus: DataFrame,
      cfg: DedupConfig,
      repairs: Option[DataFrame] = None,
      survivorRows: Long = -1L): DataFrame = {
    val pairsSmall = survivorRows >= 0 && survivorRows <= cfg.broadcastSigRows
    // survivors carry i64 ids; the payload join translates them back to
    // public image_ids (the payload side derives the same repaired id, so
    // no extra mapping table is needed).
    val payload = IdHash.withId(corpus, "image_id", "id", repairs)
      .select(col("id"), col("image_id"), col("bytes"), col("fmt"), col("caption"))
    val pa = payload.select(
      col("id").as("a"), col("image_id").as("a_img"), col("bytes").as("bytes_a"),
      col("fmt").as("fmt_a"), col("caption").as("cap_a"))
    val pb = payload.select(
      col("id").as("b"), col("image_id").as("b_img"), col("bytes").as("bytes_b"),
      col("fmt").as("fmt_b"), col("caption").as("cap_b"))
    val pairs0 =
      if (pairsSmall) broadcast(survivors)
      else survivors.hint("SHUFFLE_HASH")
    pairs0
      .join(pa, "a")
      .join(if (pairsSmall) pb else pb.hint("SHUFFLE_HASH"), "b")
      .withColumn(
        "psnr",
        // byte-equal short-circuit for ANY format: identical bytes decode
        // to identical pixels, so the pair is an exact dup without decoding
        // either side. Byte-identical JPEGs are the most common exact-dup
        // case in a crawl — the earlier png-only guard decoded those twice
        // for nothing.
        when(col("bytes_a") === col("bytes_b"), lit(Imaging.PsnrExact))
          .otherwise(psnrUdf(col("bytes_a"), col("bytes_b"))))
      .withColumn("caption_eq", col("cap_a") === col("cap_b"))
      // default: pixel-only (the engine's documented reading of the L15
      // invariant — SURVEY.md §1.2); requireCaptionEq: the invariant's
      // letter, pixels AND caption equality (model.scala rationale)
      .withColumn("is_dup",
        if (cfg.requireCaptionEq)
          col("psnr") >= cfg.psnrThresholdDb && col("caption_eq")
        else col("psnr") >= cfg.psnrThresholdDb)
      .select(col("a_img").as("a"), col("b_img").as("b"), col("src"),
        col("span_len"), col("jaccard_sig"), col("hamming"), col("psnr"),
        col("caption_eq"), col("is_dup"))
  }
}
