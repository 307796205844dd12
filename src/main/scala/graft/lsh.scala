package graft

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Candidate generation (SURVEY.md §2.3 J1–J3, §2.5 W2).
  *
  * Replaces the reference's external Solr top-k retrieval with in-plan LSH:
  * MinHash band hashing (Leskovec/Rajaraman/Ullman MMDS ch.3) and a
  * SimHash multi-block Hamming prefilter (Manku et al., WWW 2007 style
  * block-permutation pigeonhole).
  *
  * Skew design (BASELINE.json:L6 "salted repartitioning on band-hash
  * keys"): duplicate-heavy corpora put thousands of images in one LSH
  * bucket. Pair emission is bucket-local (`groupBy` + explode of in-bucket
  * combinations — J2 form, ONE shuffle) and the bucket cap is enforced
  * inside the aggregation itself by a bounded min-set aggregate
  * ([[graft.functions.BoundedMinIds]]): map-side partial aggregation
  * reduces a hot key to ≤cap values per map task BEFORE the shuffle — the
  * same effect salted repartitioning buys (no task sees an unbounded
  * bucket), with strictly less data movement (salting needs a second
  * exchange to merge shards; partial aggregation is Spark's built-in
  * equivalent of that shard phase). Worst-case pair fan-out is cap²/2 per
  * bucket. Dropped overflow is counted, not silent (W2).
  */
object Lsh {

  /** Stage 2: explode each signature into b (band, band_hash) rows.
    * band_hash = xxhash64(band, minhash[band*r .. band*r+r)). Pure
    * built-ins — whole-stage codegen, no shuffle.
    */
  def bands(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val bandHashes = transform(
      sequence(lit(0), lit(cfg.bands - 1)),
      i => xxhash64(i, slice(col("minhash"), i * lit(cfg.rowsPerBand) + lit(1), lit(cfg.rowsPerBand))))
    sigs
      .select(col("id"), posexplode(bandHashes))
      .toDF("id", "band", "band_hash")
  }

  /** Bounded bucket cap: ONE hash aggregation keeping the `cap` smallest
    * ids per bucket via [[graft.functions.BoundedMinIds]] (O(cap) state,
    * partial/map-side combine — see its scaladoc for the skew argument).
    * Replaces a two-phase salted window cap that cost three exchanges and
    * two full sorts of the band table. Deterministic: smallest `cap` ids,
    * independent of input partitioning. Output: (keys…, ids, n_seen).
    */
  private def cappedBuckets(df: DataFrame, keys: Seq[String], cfg: DedupConfig): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.GraftAggregates.boundedMinIds(cfg.bucketCap)(col("id")).as("b"))
      .select((keys.map(col) :+ col("b.ids").as("ids") :+ col("b.n_seen").as("n_seen")): _*)

  /** In-bucket pair expansion (J2): sorted distinct ids → canonical (a<b)
    * combinations, written with nested `transform`+`flatten` HOFs so the
    * expansion stays inside whole-stage codegen (no UDF encoder
    * round-trip on the highest-volume path in the engine). Bucket size is
    * already ≤cap, so fan-out per bucket is ≤cap²/2.
    *
    * `census`: an [[Observation]] attached to the bucket relation —
    * overflow (n_seen > cap, i.e. a recall-affecting drop) is aggregated
    * as the plan executes, with NO extra job, and surfaced by the caller
    * after its first action (W2: logged drop counts on EVERY path, not
    * just checkpointed runs).
    */
  private[graft] def emitPairs(
      df: DataFrame,
      keys: Seq[String],
      src: String,
      cfg: DedupConfig,
      dedup: Boolean,
      census: Option[Observation]): DataFrame = {
    val buckets0 = cappedBuckets(df, keys, cfg)
    val buckets = census.fold(buckets0)(o => buckets0.observe(o,
      sum(when(col("n_seen") > cfg.bucketCap, 1L).otherwise(0L)).as("overflow_buckets"),
      sum(when(col("n_seen") > cfg.bucketCap, col("n_seen") - cfg.bucketCap)
        .otherwise(0L)).as("dropped_ids"),
      max(col("n_seen")).as("max_bucket"),
      count(lit(1)).as("n_buckets")))
    val pairs = buckets
      .where(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b"))
    // The standalone operators return distinct pairs; the pipeline passes
    // dedup=false because its union-side groupBy(a,b) dedupes anyway —
    // a per-source dropDuplicates there would just add an exchange and a
    // second aggregation pass over the highest-volume relation. `src` is
    // attached AFTER the distinct: a dropDuplicates carrying the string
    // gives First(src) a var-length aggregation buffer, which forces
    // SortAggregate (two sorts of the pair relation) instead of a pure
    // HashAggregate on two i64 keys.
    (if (dedup) pairs.dropDuplicates("a", "b") else pairs)
      .withColumn("src", lit(src))
  }

  /** Stage 3a: LSH band-bucket candidate pairs. */
  def lshCandidates(
      bandsDf: DataFrame,
      cfg: DedupConfig,
      dedup: Boolean = true,
      census: Option[Observation] = None): DataFrame =
    emitPairs(bandsDf, Seq("band", "band_hash"), "lsh", cfg, dedup, census)

  /** Stage 3c — CROSS-corpus LSH candidates (T49): A×B record linkage,
    * "which items of a new batch near-dup something in the committed
    * corpus" — the batch complement of the streaming exact tier's
    * committed-index probe, at MinHash granularity instead of byte
    * identity. Both sides' band buckets are capped independently inside
    * their own single hash aggregation (W2 — a boilerplate band key is
    * hot on BOTH sides of a crawl linkage; map-side partial aggregation
    * collapses it to ≤cap ids per side before either shuffle), then
    * co-occupied buckets meet in ONE equi-join of two already-collapsed
    * bucket tables — one row per (band, band_hash) per side, never a
    * row-level band join — and the ≤cap² a×b cross pairs explode inside
    * whole-stage codegen. Pairs are oriented (a ∈ A, b ∈ B), NOT
    * canonicalized by id order: the sides are distinct relations, and
    * the caller's ids may interleave arbitrarily.
    *
    * The census counts overflow only on CO-OCCUPIED buckets — an
    * over-cap bucket with no counterpart on the other side can drop no
    * cross pair, so it is not a recall event for this operator.
    */
  def crossCandidates(
      bandsA: DataFrame,
      bandsB: DataFrame,
      cfg: DedupConfig,
      census: Option[Observation] = None): DataFrame = {
    val keys = Seq("band", "band_hash")
    val ba = cappedBuckets(bandsA, keys, cfg)
      .select(col("band"), col("band_hash"),
        col("ids").as("ids_a"), col("n_seen").as("n_a"))
    val bb = cappedBuckets(bandsB, keys, cfg)
      .select(col("band"), col("band_hash"),
        col("ids").as("ids_b"), col("n_seen").as("n_b"))
    val joined0 = ba.join(bb, keys)
    val joined = census.fold(joined0)(o => joined0.observe(o,
      sum(when(col("n_a") > cfg.bucketCap, col("n_a") - cfg.bucketCap)
          .otherwise(0L) +
        when(col("n_b") > cfg.bucketCap, col("n_b") - cfg.bucketCap)
          .otherwise(0L)).as("dropped_ids"),
      max(greatest(col("n_a"), col("n_b"))).as("max_bucket"),
      count(lit(1)).as("n_buckets")))
    joined
      .select(explode(flatten(transform(col("ids_a"), x =>
        transform(col("ids_b"), y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b"))
      .dropDuplicates("a", "b")
  }

  /** Stage 3b: SimHash Hamming-≤h prefilter via block pigeonhole: split the
    * 64-bit signature into q blocks; if hamming(x,y) ≤ h then x and y agree
    * on SOME (q-h)-subset of blocks, so equi-joining on every C(q,h)
    * subset key finds all such pairs. Exact Hamming is re-checked in
    * scoring (P6).
    */
  def simhashCandidates(
      sigs: DataFrame,
      cfg: DedupConfig,
      dedup: Boolean = true,
      census: Option[Observation] = None): DataFrame =
    emitPairs(simhashKeys(sigs, cfg), Seq("cid", "key"), "simhash", cfg, dedup, census)

  /** The SimHash pigeonhole prefilter keys: (id, cid, key) rows, one per
    * C(q, q−h) block subset. Exposed so the streaming path can equi-join
    * a micro-batch's keys against the committed historical key table —
    * the same retrieval rule as the batch self-join.
    */
  def simhashKeys(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val q = cfg.simhashBlocks
    val keep = q - cfg.simhashMaxHamming
    val bounds = (0 to q).map(i => i * 64 / q)
    def block(i: Int) = {
      val lo = bounds(i); val hi = bounds(i + 1)
      val width = hi - lo
      val mask = if (width == 64) -1L else (1L << width) - 1L
      shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit(mask))
    }
    val combos = (0 until q).combinations(keep).toSeq.zipWithIndex
    val keyCols = combos.map { case (idxs, cid) =>
      xxhash64((lit(cid) +: idxs.map(block)): _*)
    }
    sigs
      .select(col("id"), posexplode(array(keyCols: _*)))
      .toDF("id", "cid", "key")
  }

  /** Skew census (A3): bucket-size distribution + overflow count for the
    * metrics table — how many buckets exceeded the cap (their tail pairs
    * were dropped; recall impact bounded by fixture tests).
    */
  def bucketStats(bandsDf: DataFrame, cfg: DedupConfig): DataFrame = {
    bandsDf
      .groupBy("band", "band_hash")
      .count()
      .agg(
        count(lit(1)).as("n_buckets"),
        max(col("count")).as("max_bucket"),
        expr("approx_percentile(count, 0.99)").as("p99_bucket"),
        sum(when(col("count") > cfg.bucketCap, 1).otherwise(0)).as("overflow_buckets"))
  }
}
