package graft.streaming

import graft.{DedupConfig, Lsh, Signatures}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.9 ST1–ST4). The reference
  * is batch-only; this is the incremental-ingest path for a continuously
  * growing corpus: stateless stages are the SAME column functions as
  * batch (one code path), stateful pieces use watermarked built-ins.
  *
  * New-pair generation against the full historical index is not
  * streaming-shaped (it needs the committed LSH band table), so it runs
  * as a micro-batch join inside `foreachBatch` against the last committed
  * snapshot — see [[incrementalCandidates]].
  */
object Streaming {

  /** ST1 — incremental signatures: identical transform chain as batch
    * (Signatures.signatures is a pure projection, so it is
    * streaming-safe with zero changes).
    */
  def signatureStream(corpusStream: DataFrame, cfg: DedupConfig): DataFrame =
    Signatures.signatures(corpusStream, cfg)

  /** ST2 — windowed ingest metrics with watermark discipline: rows/sec
    * per tumbling window, late rows beyond the watermark dropped.
    */
  def windowedIngestMetrics(
      events: DataFrame,
      tsCol: String,
      windowLen: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("window.start").as("window_start"), col("n_rows"))

  /** ST2b — sliding + session windows (breadth). */
  def slidingCounts(events: DataFrame, tsCol: String): DataFrame =
    events
      .withWatermark(tsCol, "10 minutes")
      .groupBy(window(col(tsCol), "10 minutes", "1 minute"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("window.start").as("window_start"), col("n_rows"))

  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String): DataFrame =
    events
      .withWatermark(tsCol, "10 minutes")
      .groupBy(session_window(col(tsCol), "5 minutes"), col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("session_window.start").as("session_start"), col(keyCol), col("n_rows"))

  /** ST3 — stateful stream dedup: drop image_ids already seen within the
    * watermark horizon (exact-duplicate suppression at ingest).
    */
  def dedupStream(corpusStream: DataFrame, tsCol: String, watermark: String = "10 minutes"): DataFrame =
    corpusStream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("image_id")

  /** ST4 — micro-batch incremental candidate generation (foreachBatch
    * body): band the new rows and equi-join against the committed
    * historical band snapshot. Returns (new_id, historical_id) candidate
    * pairs; downstream scoring/verify reuses the batch operators
    * unchanged.
    */
  def incrementalCandidates(
      newSignatures: DataFrame,
      committedBands: DataFrame,
      cfg: DedupConfig): DataFrame = {
    val newBands = Lsh.bands(newSignatures, cfg)
    newBands.as("n")
      .join(committedBands.as("h"), Seq("band", "band_hash"))
      .where(col("n.id") =!= col("h.id"))
      .select(col("n.id").as("a"), col("h.id").as("b"))
      .dropDuplicates("a", "b")
  }
}
