package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Suffix-array substring pass (SURVEY.md §2.7 X1): find caption pairs
  * sharing an exact common substring of length ≥ `saMinSpan`
  * (BASELINE.json:L6 "suffix-array substring pass for exact near-dup
  * caption spans").
  *
  * Two levels, both distributed-friendly:
  *
  *  1. ROUTING — robust winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
  *     per caption, hash all k-grams and keep the minimum hash of every
  *     window of w = L-k+1 consecutive k-grams. Guarantee: two strings
  *     sharing a substring of length ≥ L share at least one selected
  *     fingerprint, independent of alignment. Fingerprints are exploded
  *     and equi-grouped — the same shuffle shape as LSH bands, so the
  *     salted cap applies.
  *  2. KERNEL — per fingerprint group (≤cap docs), a generalized suffix
  *     array (prefix-doubling, O(n log² n)) + Kasai LCP over the
  *     sentinel-joined concatenation; maximal runs of adjacent suffixes
  *     with LCP ≥ L spanning ≥2 docs emit canonical pairs with the run's
  *     min-LCP as `span_len`. Runs inside `flatMapGroups` on a typed
  *     `KeyValueGroupedDataset` — the one imperative kernel in the engine
  *     (allowed: Dataset API, no RDD).
  */
object SuffixPass {

  // ---- winnowing ----

  /** Shared winnowing selection rule over a caller-supplied per-gram
    * hash (Schleimer et al. 2003) — [[winnowFingerprints]] plugs the
    * xxhash-style window hash, [[TextOps.winnowPoly]] the SQL-twin
    * polynomial hash; ONE selection-rule implementation, so the two
    * can never silently diverge. The guard covers BOTH bounds: a
    * string shorter than the GRAM length would otherwise allocate a
    * negative-length hash array (reachable when a caller passes
    * k > minSpan).
    */
  private[graft] def winnowKernel(s: String, k: Int, minSpan: Int,
      gramHash: (String, Int, Int) => Long): Array[Long] = {
    if (s == null || s.length < math.max(minSpan, k)) return Array.emptyLongArray
    val n = s.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = gramHash(s, i, k); i += 1 }
    val w = math.max(1, minSpan - k + 1)
    if (n <= w) return Array(hs.min)
    val set = new java.util.TreeSet[java.lang.Long]()
    // simple O(n·w) min-of-window (captions are short; fine)
    var start = 0
    while (start + w <= n) {
      var m = hs(start); var j = start + 1
      while (j < start + w) { if (hs(j) < m) m = hs(j); j += 1 }
      set.add(m)
      start += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var j2 = 0
    while (it.hasNext) { out(j2) = it.next(); j2 += 1 }
    out
  }

  def winnowFingerprints(s: String, k: Int, minSpan: Int): Array[Long] =
    winnowKernel(s, k, minSpan, Hashing.hashWindow)

  // ---- generalized suffix array kernel ----

  /** Suffix array by prefix doubling (Manber–Myers 1990, O(n log² n)).
    *
    * Each round packs (rank(i), rank(i+k), i) into one long — 21|21|21
    * bits at positions 42|21|0, 63 bits total so the SIGN BIT is never
    * touched (an earlier 21|21|22 layout put rank's top bit at bit 63:
    * any rank ≥ 2^20 went negative and `Arrays.sort` silently corrupted
    * the order). Valid for n < 2^21: rank ≤ n-1 and r2 = rank+1 ≤ n both
    * fit 21 bits, as does i. Sorting a primitive `long[]` with
    * `Arrays.sort`: a boxed-`Integer[]`/comparator formulation measured
    * several times slower and, worse, was the dominant allocator in the
    * engine (cache/GC pressure was the top cause of poor thread-scaling
    * in the span stage).
    */
  private[graft] def suffixArray(s: Array[Int]): Array[Int] = {
    val n = s.length
    require(n < (1 << 21), s"suffix group of $n exceeds packed-sort bound")
    // strict (1<<21)-1 bound: the first doubling round packs r2 = code+1,
    // so a code of exactly 2^21-1 would overflow the 21-bit middle field
    // into the rank field (silent order corruption, the bug class this
    // layout exists to prevent)
    require(s.forall(c => c >= 0 && c < (1 << 21) - 1),
      "char codes must fit the 21-bit r2 = code+1 field")
    val sa = new Array[Int](n)
    if (n <= 1) return sa // initial "ranks" are raw char codes; loop never runs
    var rank = s.clone()
    var tmp = new Array[Int](n)
    val packed = new Array[Long](n)
    var kk = 1
    var done = false
    while (kk < n && !done) {
      var i = 0
      while (i < n) {
        val r2 = if (i + kk < n) rank(i + kk) + 1 else 0 // 0 = "past end", sorts first
        packed(i) = (rank(i).toLong << 42) | (r2.toLong << 21) | i.toLong
        i += 1
      }
      java.util.Arrays.sort(packed)
      var r = 0
      tmp((packed(0) & 0x1fffff).toInt) = 0
      i = 1
      while (i < n) {
        // same (rank, rank2) key iff the top 42 bits match
        if ((packed(i) >>> 21) != (packed(i - 1) >>> 21)) r += 1
        tmp((packed(i) & 0x1fffff).toInt) = r
        i += 1
      }
      val sw = rank; rank = tmp; tmp = sw
      done = r == n - 1 // all ranks distinct — sorted
      kk = kk << 1
    }
    var i = 0
    while (i < n) { sa(rank(i)) = i; i += 1 }
    if (!done && n > 1) {
      // ranks never became fully distinct without a final round only when
      // n == 1; with distinct sentinels every group terminates above.
      // Defensive: rebuild from last packed order.
      var j = 0
      while (j < n) { sa(j) = (packed(j) & 0x1fffff).toInt; j += 1 }
    }
    sa
  }

  /** Kasai et al. 2001 LCP array: lcp(i) = LCP(sa(i-1), sa(i)). */
  private[graft] def lcpArray(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** Pairs of docs in `docs` sharing an exact substring ≥ minSpan.
    * Returns canonical (a, b, span_len) with max observed span per pair.
    */
  private[graft] def spanPairs(docs: Seq[(Long, String)], minSpan: Int): Iterator[(Long, Long, Int)] = {
    if (docs.size < 2) return Iterator.empty
    // sentinel-joined int text: chars as positive ints, unique negative
    // sentinels between docs (kept distinct so no cross-doc false LCP)
    val totalLen = docs.map(_._2.length).sum + docs.size
    val text = new Array[Int](totalLen)
    val docOf = new Array[Int](totalLen)
    var pos = 0
    var d = 0
    docs.foreach { case (_, t) =>
      var i = 0
      while (i < t.length) {
        text(pos) = t.charAt(i).toInt + docs.size + 1
        docOf(pos) = d
        pos += 1; i += 1
      }
      text(pos) = d + 1 // unique sentinel per doc, < any char code
      docOf(pos) = d
      pos += 1
      d += 1
    }
    val sa = suffixArray(text)
    val lcp = lcpArray(text, sa)
    val best = scala.collection.mutable.HashMap.empty[(Long, Long), Int]
    // scan maximal runs with lcp >= minSpan; all suffixes in a run share a
    // prefix of length >= the run's min LCP, so every cross-doc pair in the
    // run shares a span of at least that length. Reducing to distinct docs
    // per run keeps this linear in run length + quadratic only in #docs
    // (<= bucket cap), not in suffix positions.
    var i = 1
    while (i < text.length) {
      if (lcp(i) >= minSpan) {
        var runEnd = i
        var runMin = lcp(i)
        val runDocs = scala.collection.mutable.LinkedHashSet(docOf(sa(i - 1)), docOf(sa(i)))
        while (runEnd + 1 < text.length && lcp(runEnd + 1) >= minSpan) {
          runEnd += 1
          runMin = math.min(runMin, lcp(runEnd))
          runDocs += docOf(sa(runEnd))
        }
        val ds = runDocs.toArray
        var x = 0
        while (x < ds.length) {
          var y = x + 1
          while (y < ds.length) {
            val (ia, ib) = (docs(ds(x))._1, docs(ds(y))._1)
            val key = if (ia < ib) (ia, ib) else (ib, ia)
            if (runMin > best.getOrElse(key, 0)) best(key) = runMin
            y += 1
          }
          x += 1
        }
        i = runEnd + 1
      }
      i += 1
    }
    best.iterator.map { case ((a, b), l) => (a, b, l) }
  }

  // ---- kernel-size control ----

  /** Per-chunk char budget (counting each doc as len+1 for its sentinel):
    * a PAIR of chunks unions to ≤ 2·budget = 2,088,960 < 2^21 chars, so
    * [[suffixArray]]'s packed-sort bound is unreachable from any query
    * path — a hot fingerprint bucket of long documents degrades into
    * chunked kernel calls, never an exception.
    */
  private[graft] val KernelChunkChars: Int = (1 << 20) - 4096

  /** Max doc length admitted to the span path. The winnow-fingerprint
    * explode necessarily replicates the doc payload once per fingerprint
    * (~2·len/w fingerprints), so wire volume grows as O(len²/w): at 16 KB
    * that is a bounded ~31 MB per doc; at 1 MB it would be ~120 GB per
    * doc — a single long document OOMs the exchange regardless of any
    * kernel-side cap (measured: a 1.1M-char doc killed the explode stage
    * before the kernel ever ran). Docs longer than this are excluded
    * BEFORE the explode and counted via the doc census (never silent) —
    * the span operator's scale envelope is caption-class text
    * (BASELINE.json:L6 "exact near-dup caption spans"; 16 KB ≈ 50× the
    * longest realistic caption). Long-document near-dup routing belongs
    * to the MinHash/LSH path, whose shingle-SET routing is O(len) not
    * O(len²/w).
    */
  private[graft] val SpanDocChars: Int = 16384

  /** [[spanPairs]] with deterministic group splitting (W2 "never silent,
    * never fatal", applied to BYTES): buckets whose total payload exceeds
    * the kernel's packed-sort bound are split — in ascending-id order, the
    * order [[graft.functions.BoundedMinRows]] already emits — into chunks
    * of ≤ `chunkChars`, and the SA+LCP kernel runs on every chunk and
    * every chunk-PAIR union. Any two surviving docs still share some
    * kernel call, so NO pair is lost to the split (cost: each doc is
    * scanned once per chunk, O(c²) kernel calls for c chunks — paid only
    * by the rare over-budget bucket, which the census flags).
    *
    * A byte-budget EVICTION inside the bounded aggregate was considered
    * and rejected: evict-largest-id-while-over-budget keeps an
    * order-DEPENDENT subset (which ids survive depends on merge order of
    * partial states), making output non-deterministic under shuffle —
    * the bug class this engine pins oracles against. Splitting keeps the
    * aggregate's keep-smallest-ids semantics exact.
    *
    * Docs longer than a whole chunk are excluded here (they cannot pair
    * within the bound) and counted upstream in the census — the only
    * recall-affecting drop, logged, never silent.
    */
  private[graft] def spanPairsChunked(
      docs: Seq[(Long, String)],
      minSpan: Int,
      chunkChars: Int = KernelChunkChars): Iterator[(Long, Long, Int)] = {
    var total = 0L
    docs.foreach(d => total += d._2.length + 1)
    if (total <= chunkChars) return spanPairs(docs, minSpan) // common case: one kernel call
    val kept = docs.filter(_._2.length + 1 <= chunkChars)
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String)]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var curLen = 0L
    kept.foreach { d =>
      val l = d._2.length + 1
      if (curLen + l > chunkChars && cur.nonEmpty) {
        chunks += cur.toVector; cur = scala.collection.mutable.ArrayBuffer.empty; curLen = 0L
      }
      cur += d; curLen += l
    }
    if (cur.nonEmpty) chunks += cur.toVector
    val best = scala.collection.mutable.HashMap.empty[(Long, Long), Int]
    var i = 0
    while (i < chunks.length) {
      var j = i
      while (j < chunks.length) {
        val group = if (i == j) chunks(i) else chunks(i) ++ chunks(j)
        spanPairs(group, minSpan).foreach { case (a, b, l) =>
          val key = (a, b)
          if (l > best.getOrElse(key, 0)) best(key) = l
        }
        j += 1
      }
      i += 1
    }
    best.iterator.map { case ((a, b), l) => (a, b, l) }
  }

  // ---- distributed assembly ----

  private val kernelUdf = udf { (ids: Seq[Long], norms: Seq[String], minSpan: Int) =>
    spanPairsChunked(ids.zip(norms), minSpan).toSeq
  }

  /** Winnow-fingerprint routing keys (id, fp) under the same doc-length
    * envelope as [[spanCandidates]] — exposed so the streaming path can
    * equi-join a micro-batch's fingerprints against the committed
    * historical fingerprint table.
    */
  def fingerprintsOf(normed: DataFrame, cfg: DedupConfig): DataFrame =
    spanFps(normed, cfg).select(col("id"), col("fp"))

  /** (id, norm) → (id, norm, fp) winnow-fingerprint rows, the shared
    * base of [[fingerprintsOf]] (key-table shape) and
    * [[spanCandidatesFromFps]] (bucket-kernel shape) — the stream
    * derives this ONCE per batch and feeds both, instead of running the
    * winnowing expression (the span path's corpus-wide row-local cost)
    * twice over every caption.
    */
  def spanFps(normed: DataFrame, cfg: DedupConfig): DataFrame = {
    graft.functions.GraftFunctions.register(normed.sparkSession)
    normed
      .where(length(col("norm")).between(cfg.saMinSpan, SpanDocChars))
      .select(col("id"), col("norm"),
        explode(graft.functions.GraftFunctions
          .winnowCol(col("norm"), cfg.saGramK, cfg.saMinSpan)).as("fp"))
  }

  /** Exact longest-common-substring length of ONE candidate pair (the
    * two-doc SA+LCP kernel) — used by the streaming cross-batch span path
    * where each (new, historical) pair is checked individually. Unlike
    * the bucket kernel's run-min estimate, this is the exact pair span.
    */
  val pairSpanUdf = udf { (a: String, b: String, minSpan: Int) =>
    spanPairsChunked(Seq((0L, a), (1L, b)), minSpan)
      .map(_._3).maxOption.getOrElse(0)
  }

  /** (id, norm) → candidate pairs (a, b, src="span", span_len).
    *
    * ONE exchange: fingerprint buckets are capped and assembled in a
    * single hash aggregation with bounded per-key state
    * ([[graft.functions.BoundedMinRows]] — map-side combine, ≤cap (id,
    * caption) rows per key per map task), and the SA+LCP kernel runs as a
    * scalar UDF over the aggregated bucket. Replaces a two-phase salted
    * window cap + `groupByKey` (three exchanges of the exploded
    * fingerprint relation).
    *
    * The fingerprint projection is the corpus-wide row-local stage of the
    * span path, so it runs as a native [[graft.functions.WinnowExpr]]
    * (whole-stage codegen, no encoder round-trip) — the kernel UDF by
    * contrast only sees ≤cap-row aggregated buckets.
    */
  def spanCandidates(
      normed: DataFrame,
      cfg: DedupConfig,
      census: Option[org.apache.spark.sql.Observation] = None,
      docCensus: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    graft.functions.GraftFunctions.register(normed.sparkSession)
    val eligible = normed.where(length(col("norm")) >= cfg.saMinSpan)
    // W2 applied to doc LENGTH: docs beyond the span path's O(len²/w)
    // payload-amplification envelope (see SpanDocChars) are excluded
    // before the explode, with the drop counted — logged, never silent,
    // never fatal
    val measured = docCensus.fold(eligible)(o => eligible.observe(o,
      sum(when(length(col("norm")) > SpanDocChars, 1L).otherwise(0L))
        .as("oversized_docs"),
      max(length(col("norm"))).cast("long").as("max_doc_chars")))
    val fps = measured
      .where(length(col("norm")) <= SpanDocChars)
      .select(
        col("id"),
        col("norm"),
        explode(graft.functions.GraftFunctions
          .winnowCol(col("norm"), cfg.saGramK, cfg.saMinSpan)).as("fp"))
    spanCandidatesFromFps(fps, cfg, census)
  }

  /** Bucket-cap + kernel stage over a PRECOMPUTED (id, norm, fp)
    * relation ([[spanFps]]) — the stream path's entry, so winnowing runs
    * once per batch instead of once per consumer.
    */
  def spanCandidatesFromFps(
      fps: DataFrame,
      cfg: DedupConfig,
      census: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val buckets0 = fps
      .groupBy(col("fp"))
      .agg(graft.functions.GraftAggregates
        .boundedMinRows(cfg.bucketCap)(col("id"), col("norm")).as("bucket"))
    // W2: a capped fingerprint bucket is a recall-affecting drop — same
    // census contract as the LSH/SimHash paths (Lsh.emitPairs), read off
    // the aggregate's n_seen with no extra job
    val buckets = census.fold(buckets0)(o => buckets0.observe(o,
      sum(when(col("bucket.n_seen") > cfg.bucketCap, 1L).otherwise(0L))
        .as("overflow_buckets"),
      sum(when(col("bucket.n_seen") > cfg.bucketCap,
        col("bucket.n_seen") - cfg.bucketCap).otherwise(0L)).as("dropped_ids"),
      max(col("bucket.n_seen")).as("max_bucket"),
      count(lit(1)).as("n_buckets")))
    buckets
      .where(col("bucket.size") > 1)
      .select(explode(
        kernelUdf(col("bucket.ids"), col("bucket.payloads"), lit(cfg.saMinSpan))).as("p"))
      .select(col("p._1").as("a"), col("p._2").as("b"), col("p._3").as("span_len"))
      .groupBy("a", "b")
      .agg(max("span_len").as("span_len"))
      .withColumn("src", lit("span"))
  }
}
