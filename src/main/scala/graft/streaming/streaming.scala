package graft.streaming

import graft.{DedupConfig, Lsh, Signatures}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-content-key dedup state for [[Streaming.assignCanonicalStream]]:
  * the first-seen (canonical) image_id and the max event time observed
  * (drives the event-time eviction timeout).
  */
final case class CanonicalState(canonicalId: String, maxTsMs: Long)

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

  /** ST5 — CUSTOM-STATE streaming dedup (`flatMapGroupsWithState`):
    * group arrivals by an exact content key (md5 of caption|phash — a
    * 128-bit digest, matching the batch twin q_dedup_exact; a 64-bit
    * grouping key would silently merge unrelated images on a hash
    * collision, the exact failure mode the batch IdHash REPAIR exists to
    * prevent, and state keys never ride a width-critical shuffle so the
    * narrower key bought nothing), keep the first-seen image_id per key
    * as the canonical, and emit an
    * ASSIGNMENT row `(image_id, canonical_id, is_dup)` for every arrival
    * — the streaming twin of the batch exact-dedup operator
    * (q_dedup_exact), where ST3's `dropDuplicatesWithinWatermark` merely
    * drops. Downstream sinks get full lineage: which incoming row
    * collapsed onto which canonical.
    *
    * State discipline at scale: one O(1) `CanonicalState` per DISTINCT
    * active content key, evicted by event-time timeout `horizonMs` after
    * the key's newest arrival passes the watermark — state size is
    * bounded by keys-within-horizon, not stream length. Within a
    * micro-batch the canonical choice is made deterministic by sorting
    * the (bounded: one content key's arrivals in one batch) group on
    * (ts, image_id).
    */
  def assignCanonicalStream(
      corpusStream: DataFrame, // needs (image_id, caption, phash, <tsCol>)
      tsCol: String,
      watermark: String = "10 minutes",
      horizonMs: Long = 10L * 60 * 1000): DataFrame = {
    val sess = corpusStream.sparkSession
    import sess.implicits._
    corpusStream
      .withWatermark(tsCol, watermark)
      .select(col("image_id"), col(tsCol),
        // phash is numeric (no '|'), so the trailing separator splits
        // unambiguously — the digest input is injective in (caption, phash)
        md5(concat_ws("|", col("caption"), col("phash")).cast("binary")).as("ckey"))
      .as[(String, java.sql.Timestamp, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[CanonicalState, (String, String, Boolean)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state: GroupState[CanonicalState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._1))
            val canonical = state.getOption.map(_.canonicalId)
              .getOrElse(sorted.head._1)
            val maxTs = math.max(
              state.getOption.map(_.maxTsMs).getOrElse(Long.MinValue),
              sorted.map(_._2.getTime).max)
            state.update(CanonicalState(canonical, maxTs))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            sorted.iterator.map(r => (r._1, canonical, r._1 != canonical))
          }
      }
      .toDF("image_id", "canonical_id", "is_dup")
  }

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
