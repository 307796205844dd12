package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 0–1: normalize captions and compute per-image signatures
  * (SURVEY.md §3.1 stages 0–1). Entirely row-local — a single
  * whole-stage-codegen'd projection, no shuffle: built-in normalization
  * columns feeding the three native graft expressions
  * (shingles → minhash; tokens+phash → simhash).
  *
  * The `bytes` column is dropped here: pixels never ride the signature
  * path (SURVEY.md §4.2.5); they are re-joined only for surviving
  * candidates in Scoring.verify.
  */
object Signatures {

  def signatures(corpus: DataFrame, cfg: DedupConfig): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus
      .withColumn("norm", Text.normalizeCol(col("caption")))
      .select(
        col("image_id"),
        // 64-bit internal id: every candidate/scoring shuffle moves i64
        // keys instead of string ids (2–3× narrower rows, radix-sortable
        // join keys). Collision probability at 10^12 rows is ~2.7e-8 per
        // pair (birthday over 2^64) and is asserted against in
        // Pipeline.runStaged before use.
        xxhash64(col("image_id")).as("id"),
        col("norm"),
        GraftFunctions
          .minhashCol(
            GraftFunctions.shinglesCol(col("norm"), cfg.shingleK), cfg.numPerms)
          .as("minhash"),
        GraftFunctions.simhashCol(col("norm"), col("phash")).as("simhash"))
  }
}
