package graft

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (builder-prompt first-class op).
  *
  * Baseline: brute-force cosine top-k (broadcast query side; see
  * SparkEntry.q_cosine_topk). Scale path: random-hyperplane LSH
  * (Charikar 2002) — bucket vectors by the sign pattern of `nPlanes`
  * pseudo-random hyperplanes (hash-derived, nothing stored), then search
  * only within buckets. At 10^9+ vectors the bucket join replaces the
  * O(n²) cross join; multi-probe (flip one bit) recovers recall lost at
  * bucket borders.
  */
/** Lifetime registry for the ANN family's codebook broadcasts (IVF
  * centroids, PQ sub-quantizer codebooks, SemDedup cells — up to ~67 MB
  * EACH at the 2¹⁶-cell ceiling). A broadcast must outlive every
  * unexecuted plan that references it, so `ivfTopK`-style builders can't
  * destroy their own: they register here instead, and the CALLER releases
  * after materializing the returned plans. Verify and Bench release
  * between queries, so a session running the whole scoreboard holds at
  * most one query's codebooks live — the round-3 ADVICE leak (repeated
  * ANN calls accumulating broadcast blocks until plan GC) is closed by
  * construction for every driver-visible path, and long-lived library
  * callers get the same one-call contract.
  */
object AnnBroadcasts {
  // WeakReferences (round-4 ADVICE): a strong registry would pin every
  // codebook for the session lifetime in library callers that never call
  // release() (TextDedupJob → SemDedup.prune, direct ivfTopK/pq users).
  // The broadcast stays strongly reachable through any still-unexecuted
  // plan that references it; once the caller drops the plan, the weak ref
  // clears and Spark's ContextCleaner reclaims the blocks as before —
  // release() is an eager fast path for drivers (Verify/Bench) that know
  // their plans are materialized, not a mandatory contract.
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[
    java.lang.ref.WeakReference[org.apache.spark.broadcast.Broadcast[_]]]()

  private[graft] def track[T](
      b: org.apache.spark.broadcast.Broadcast[T]): org.apache.spark.broadcast.Broadcast[T] = {
    // purge cleared nodes first: library callers that never release()
    // would otherwise grow the queue by one dead node per call forever
    val it = live.iterator()
    while (it.hasNext) if (it.next().get == null) it.remove()
    live.add(new java.lang.ref.WeakReference[org.apache.spark.broadcast.Broadcast[_]](b))
    b
  }

  /** Number of registered, not-yet-released codebook broadcasts still
    * strongly reachable elsewhere (cleared weak refs don't count).
    */
  def liveCount: Int = {
    val it = live.iterator()
    var n = 0
    while (it.hasNext) if (it.next().get != null) n += 1
    n
  }

  /** Destroy every still-reachable codebook broadcast registered since
    * the last release (already-GC'd ones were or will be reclaimed by
    * ContextCleaner). Call ONLY after materializing (collect/write/count)
    * the plans built since then — a destroyed broadcast fails any
    * still-unexecuted plan that references it. Returns the number
    * destroyed.
    */
  def release(): Int = {
    var n = 0
    var ref = live.poll()
    while (ref != null) {
      val b = ref.get
      if (b != null) {
        // blocking=false: removal proceeds asynchronously; the driver
        // doesn't stall between queries
        b.destroy()
        n += 1
      }
      ref = live.poll()
    }
    n
  }
}

object Ann {

  /** Hyperplane component (p, i) ∈ {-1, +1}, derived from a hash — no
    * materialized plane matrix, deterministic across executors.
    */
  @inline private def planeSign(p: Int, i: Int, seed: Long): Double =
    if ((Hashing.mix64(seed ^ (p.toLong << 32) ^ i.toLong) & 1L) == 0L) 1.0 else -1.0

  def bucketOf(vec: Seq[Float], nPlanes: Int, seed: Long): Int = {
    var bits = 0
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) { dot += planeSign(p, i, seed) * vec(i); i += 1 }
      if (dot >= 0) bits |= (1 << p)
      p += 1
    }
    bits
  }

  /** Buckets for a vector with 1-bit multi-probe: its own bucket plus all
    * nPlanes single-bit flips (recall backstop at hyperplane borders).
    */
  def probeBuckets(vec: Seq[Float], nPlanes: Int, seed: Long): Array[Int] = {
    val b = bucketOf(vec, nPlanes, seed)
    val out = new Array[Int](nPlanes + 1)
    out(0) = b
    var p = 0
    while (p < nPlanes) { out(p + 1) = b ^ (1 << p); p += 1 }
    out
  }

  private def bucketUdf(nPlanes: Int, seed: Long) =
    udf((v: Seq[Float]) => bucketOf(v, nPlanes, seed))
  private def probeUdf(nPlanes: Int, seed: Long) =
    udf((v: Seq[Float]) => probeBuckets(v, nPlanes, seed))

  /** Dot product of two double-array columns via zip_with/aggregate HOFs
    * (no UDF on the O(candidates) hot path).
    */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /** Float-cast dot product — THE dot-product FP sequence every cosine
    * in the engine shares with its DuckDB `list_dot_product` oracle
    * twins (cast each element to double, multiply, left-fold sum).
    * Oracle parity depends on there being exactly one definition.
    */
  def dotCastCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity of two float-array columns via zip_with/aggregate
    * HOFs (codegen'd — no UDF on the O(candidates) hot path).
    */
  def cosineCol(a: Column, b: Column): Column =
    dotCastCol(a, b) / (sqrt(dotCastCol(a, a)) * sqrt(dotCastCol(b, b)))

  /** L2 norm of a float-array column (as double). */
  def normCol(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Unit-normalized copy of `v` given its precomputed norm column.
    * Candidate scoring then needs ONE dot product per pair instead of
    * three (dot + both self-dots): at 10⁹ vectors × nProbe candidates
    * the norm work moves from O(candidates·dim) to O(corpus·dim).
    */
  def unitCol(v: Column, norm: Column): Column =
    transform(v, x => x.cast("double") / norm)

  /** Plane count scaled to corpus size: 2^planes buckets sized toward
    * `targetBucket` vectors each (planes = ⌈log2(n / targetBucket)⌉,
    * clamped to [8, 24]). A FIXED plane count is a scale bug: 12 planes =
    * 4096 buckets forever, so at 10^9 vectors every bucket holds ~250k
    * vectors and the bucket equi-join re-explodes quadratically. At
    * n = 10^9 this derives 24 planes (~16M buckets, ~60 vectors each).
    */
  def derivePlanes(n: Long, targetBucket: Int = 64): Int = {
    val needed = math.ceil(math.log(math.max(1L, n / targetBucket).toDouble) /
      math.log(2.0)).toInt
    math.max(8, math.min(24, needed))
  }

  /** LSH-bucketed ANN: top-k neighbors per query vector, searching only
    * shared (multi-probed) buckets. `queries` and `corpus` both carry
    * (id, vec). One equi-join on bucket id replaces the cross join.
    *
    * `nPlanes = 0` (default) derives the plane count from `corpus.count()`
    * (one cheap count job). Hot buckets — duplicate/near-constant
    * embeddings all land on one sign pattern — are capped at `bucketCap`
    * corpus vectors (deterministic: smallest ids win, via WindowGroupLimit
    * so only the top-cap rows per bucket are buffered), and the drop count
    * is surfaced through `census` (never silent; same W2 discipline as the
    * LSH text path).
    *
    * `corpus` is scanned more than once (count when nPlanes=0, the bucket
    * keys projection, the vectors projection) — same contract as
    * [[Ivf.ivfTopK]]: a NON-DETERMINISTIC upstream frame (sample/limit
    * without persist) can desync bucket assignment from vectors, so
    * callers with such a plan must persist it first; for a parquet-backed
    * table the extra scans are pruned columnar reads.
    */
  def annTopK(
      corpus: DataFrame, // (id: long, vec: array<float>)
      queries: DataFrame, // (qid: long, qvec: array<float>)
      k: Int,
      nPlanes: Int = 0,
      seed: Long = 42L,
      bucketCap: Int = 4096,
      census: Option[Observation] = None,
      probeAll: Boolean = false,
      corpusCount: Long = -1L): DataFrame = {
    // corpusCount: callers invoking annTopK AND ivfTopK on one corpus can
    // pass the count once instead of paying a count job per call
    val planes =
      if (nPlanes > 0) nPlanes
      else derivePlanes(if (corpusCount >= 0) corpusCount else corpus.count())
    val keys = corpus.select(
      bucketUdf(planes, seed)(col("vec")).as("gkey"), col("id"))
    val vecs = corpus.select(
      col("id"), unitCol(col("vec"), normCol(col("vec"))).as("vecn"))
    val cb = capKeyed(keys, vecs, bucketCap, census, "max_bucket")
    // normalize BEFORE the explode so the norm is computed once per query,
    // not once per probed bucket
    val probes =
      if (probeAll) {
        // EXHAUSTIVE-PROBE mode: every query probes all 2^planes buckets.
        // Each corpus id lives in exactly one bucket, so with bucketCap >
        // corpus size this scans every (query, corpus) pair exactly once —
        // PROVABLY the brute-force top-k under the same (round(cos,4)
        // desc, id) ranking, which makes the whole distributed machinery
        // (bucket assignment, bounded cap aggregate, id re-join, probe
        // explode, scoring, ranking) value-checkable against an
        // independent exact oracle (q_ann_lsh_exhaustive). Only sane with
        // small plane counts — the probe fan-out is 2^planes per query.
        require(planes <= 12, s"probeAll with $planes planes would fan out ${1 << planes}×")
        typedLit((0 until (1 << planes)).toArray)
      } else probeUdf(planes, seed)(col("qvec"))
    val qb = queries
      .withColumn("qvecn", unitCol(col("qvec"), normCol(col("qvec"))))
      .withColumn("gkey", explode(probes))
      .drop("qvec")
    bucketSearch(cb, qb, k)
  }

  /** Cap each key group to its `cap` smallest corpus ids, then re-attach
    * the unit vectors with an id equi-join.
    *
    * The cap runs as ONE hash aggregation with O(cap) per-key state
    * ([[graft.functions.BoundedMinIds]] — map-side partial combine, no
    * sort, the same W2 skew discipline as the LSH text path), replacing
    * the earlier window `row_number` formulation: that one needed a full
    * per-bucket sort whenever a `census` Observation was attached,
    * because the CollectMetrics node between the rank filter and the
    * Window defeated Spark's InferWindowGroupLimit rule — precisely in
    * the hot-bucket case the cap exists for. Here the census reads
    * `n_seen` off the aggregated one-row-per-bucket relation, so drop
    * accounting is free and plan-shape-neutral.
    *
    * `keys` (gkey, id) and `vecs` (id, vecn) are taken as separate
    * projections so the bucket-assignment UDF runs once per row (only
    * `keys` flows into the aggregate) and the vectors never ride the
    * bucket shuffle — they move once, through the id join.
    */
  private[graft] def capKeyed(
      keys: DataFrame, // (gkey: int, id: long)
      vecs: DataFrame, // (id: long, vecn: array<double>)
      cap: Int,
      census: Option[Observation],
      maxMetric: String): DataFrame = {
    val agg = keys.groupBy("gkey").agg(
      graft.functions.GraftAggregates.boundedMinIds(cap)(col("id")).as("kept"))
    val observed = census.fold(agg)(o => agg.observe(o,
      sum(col("kept.n_seen") - size(col("kept.ids"))).as("dropped_vectors"),
      max(col("kept.n_seen")).as(maxMetric),
      sum(col("kept.n_seen")).as("n_vectors")))
    observed
      .select(col("gkey"), explode(col("kept.ids")).as("id"))
      .join(vecs, "id")
  }

  /** Shared candidate search: bucket equi-join → cosine → per-query
    * top-k. A corpus id lives in exactly ONE bucket/cell and a query's
    * probe list is distinct, so the join emits each (qid, id) pair at
    * most once — no dedup exchange. The rank filter sits directly above
    * the window, so InferWindowGroupLimit prunes to top-k per query
    * before the full sort.
    */
  private[graft] def bucketSearch(
      cb: DataFrame, // (gkey, id, vecn)
      qb: DataFrame, // (gkey, qid, qvecn)
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    qb.join(cb, "gkey")
      .where(col("qid") =!= col("id"))
      .withColumn("cos", round(dotCol(col("qvecn"), col("vecn")), 4))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }
}
