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

  def signatures(
      corpus: DataFrame,
      cfg: DedupConfig,
      repairs: Option[DataFrame] = None): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    // 64-bit internal id: every candidate/scoring shuffle moves i64 keys
    // instead of string ids (2–3× narrower rows, radix-sortable join
    // keys). Expected colliding pairs ≈ n²/2^65 — certain at the 10¹²
    // target — so the id is derived through IdHash.withId, whose repair
    // table (built in Pipeline.runStaged) re-salts the colliding
    // minority; with no collisions (every sandbox corpus) this is a
    // plain xxhash64 projection.
    IdHash.withId(corpus, "image_id", "id", repairs)
      .withColumn("norm", Text.normalizeCol(col("caption")))
      .select(
        col("image_id"),
        col("id"),
        col("norm"),
        // cfg.useOphSignatures swaps the per-lane MinHash for the
        // densified OPH sketch — same width and banding, one hash per
        // shingle instead of numPerms (the 10¹²-row CPU lever); both are
        // single codegen projections. See the flag's comment in
        // model.scala for the regime caveat: OPH concentrates like
        // MinHash only when shingle sets are a few times larger than the
        // bin count, which captions are NOT — hence default off.
        (if (cfg.useOphSignatures)
          GraftFunctions.ophMinhashCol(
            GraftFunctions.shinglesCol(col("norm"), cfg.shingleK), cfg.numPerms)
        else
          GraftFunctions.minhashCol(
            GraftFunctions.shinglesCol(col("norm"), cfg.shingleK), cfg.numPerms))
          .as("minhash"),
        GraftFunctions.simhashCol(col("norm"), col("phash")).as("simhash"))
  }
}
