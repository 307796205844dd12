package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou, Douze & Schmid, "Product quantization
  * for nearest neighbor search", TPAMI 2011) — the MEMORY-scale path of
  * the similarity-search family, complementing [[Ann]] (LSH buckets) and
  * [[Ivf]] (centroid cells), which both prune the SEARCH but still store
  * full float vectors. At 10⁹ × dim-1536 float32 the vector column alone
  * is ~6 TB; PQ codes at m=8..64 bytes/vector are 100–400× narrower, which
  * is what lets the index side of the search join fit executor memory and
  * keeps its shuffle (when one is ever needed) byte-light.
  *
  * Structure (asymmetric distance computation, ADC — §IV.A of the paper):
  *   1. TRAIN m independent sub-quantizers: the (unit-normalized) vector
  *      is split into m contiguous subspaces of dim/m; each gets a kCent-
  *      centroid EUCLIDEAN k-means codebook ([[lloydEuclidean]] — plain
  *      means, NOT the spherical variant in [[Ivf.lloyd]]: subvectors are
  *      not unit vectors, renormalizing their means would bias the
  *      reconstruction). Training is driver-side on the same bounded,
  *      deterministic sample as IVF ([[Ivf.sampleVectors]]).
  *   2. ENCODE the corpus: vector → m small ints (nearest sub-centroid per
  *      subspace) — a map-side codegen'd projection, no shuffle; the float
  *      vector is DROPPED from the index relation.
  *   3. SEARCH asymmetrically: the query stays un-quantized. Per query,
  *      ONE lookup table of m·kCent sub-dot-products is precomputed
  *      (O(kCent·dim) — independent of corpus size); each candidate's
  *      score is then m table lookups + adds instead of a dim-length dot:
  *      score(q, v) = Σ_s lut[s·kCent + code_s(v)] ≈ q · v̂. The LUT sum
  *      runs as a native zip_with/aggregate HOF over the code array —
  *      whole-stage-codegen, no per-candidate UDF.
  *
  * Exactness escape hatch (how the distributed machinery gets a DuckDB
  * oracle, same pattern as q_ann_ivf_exhaustive): with kCent ≥ corpus
  * size and the training sample = the whole corpus, every distinct
  * subvector is its own centroid, reconstruction is exact, and ADC top-k
  * PROVABLY equals brute-force cosine top-k under (round(cos,4) desc, id)
  * — q_ann_pq_exact value-checks training, encoding, LUT build and the
  * HOF scoring end-to-end against the brute-force oracle. The compressed
  * regime (kCent ≪ n) is approximate by nature; its planted-twin recall
  * is pinned in PqSpec and surfaced in q_ann_recall.
  */
object Pq {

  /** m sub-codebooks over subspaces of `subDim`; `centroids(s)(c)` is the
    * c-th centroid of subspace s. One instance is broadcast and shared by
    * the encode and LUT closures (same lifetime contract as the IVF
    * codebook — see [[Ivf.ivfTopK]]'s scaladoc).
    */
  final case class PqCodebook(
      m: Int, subDim: Int, kCent: Int,
      centroids: Array[Array[Array[Double]]]) extends Serializable {

    private def nearestSub(v: Array[Double], off: Int, cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        val cc = cs(c); var d = 0.0; var i = 0
        while (i < subDim) {
          val t = v(off + i) - cc(i); d += t * t; i += 1
        }
        // strict < : first of equals wins — deterministic under padded
        // duplicate centroids (dead cells), same rule as Ivf.nearest
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    /** Code of a unit-normalized vector: m nearest-sub-centroid indices. */
    def encode(v: Array[Double]): Array[Int] = {
      val out = new Array[Int](m)
      var s = 0
      while (s < m) { out(s) = nearestSub(v, s * subDim, centroids(s)); s += 1 }
      out
    }

    /** ADC lookup table for one unit-normalized query: flat m·kCent array,
      * lut(s·kCent + c) = ⟨q_sub_s, centroid_s_c⟩. Built once per query —
      * O(kCent·dim) regardless of corpus size.
      */
    def lut(q: Array[Double]): Array[Double] = {
      val out = new Array[Double](m * kCent)
      var s = 0
      while (s < m) {
        val off = s * subDim; val cs = centroids(s)
        var c = 0
        while (c < kCent) {
          val cc = cs(c); var d = 0.0; var i = 0
          while (i < subDim) { d += q(off + i) * cc(i); i += 1 }
          out(s * kCent + c) = d
          c += 1
        }
        s += 1
      }
      out
    }
  }

  /** Lloyd iterations of EUCLIDEAN k-means (assignment by squared L2,
    * update = arithmetic mean). Same determinism discipline as
    * [[Ivf.lloyd]]: the O(n·k·subDim) assignment pass is parallel (each
    * element independent), the accumulation pass is sequential in sample
    * order so centroid sums add in a fixed order — bit-identical codebooks
    * regardless of thread scheduling. Init = first k sample vectors
    * (callers pass a hash-shuffled sample); fewer samples than k pads by
    * repetition (dead cells under first-of-equals, never a crash); empty
    * cells keep their previous centroid.
    */
  private[graft] def lloydEuclidean(
      sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means needs at least one sample vector")
    val dim = sample(0).length
    var centroids =
      if (sample.length >= k) sample.take(k).map(_.clone())
      else Array.tabulate(k)(i => sample(i % sample.length).clone())
    val assign = new Array[Int](sample.length)
    var it = 0
    while (it < iters) {
      val cs = centroids
      java.util.stream.IntStream.range(0, sample.length).parallel().forEach { j =>
        val v = sample(j)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cs.length) {
          val cc = cs(c); var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - cc(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(j) = best
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var j = 0
      while (j < sample.length) {
        val v = sample(j); val s = sums(assign(j))
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(assign(j)) += 1
        j += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0L) centroids(c)
        else {
          val s = sums(c); val inv = 1.0 / counts(c)
          Array.tabulate(dim)(i => s(i) * inv)
        }
      }
      it += 1
    }
    centroids
  }

  /** Train m sub-quantizers on a normalized sample. Subspaces train
    * independently — parallel over s (each depends only on its own slice
    * of the deterministic sample, so the result is thread-schedule-
    * invariant, same argument as [[Ivf.trainTwoLevel]]'s branch loop).
    */
  def train(sample: Array[Array[Double]], m: Int, kCent: Int, iters: Int): PqCodebook = {
    require(sample.nonEmpty, "PQ training needs at least one sample vector")
    val dim = sample(0).length
    require(m > 0 && dim % m == 0,
      s"PQ subspace count m=$m must divide the embedding dim $dim")
    val subDim = dim / m
    val books = new Array[Array[Array[Double]]](m)
    java.util.stream.IntStream.range(0, m).parallel().forEach { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      books(s) = lloydEuclidean(sub, kCent, iters)
    }
    PqCodebook(m, subDim, kCent, books)
  }

  /** PQ-ADC ANN: top-k cosine neighbors per query, scored against the
    * m-byte-code compressed corpus. Output: (qid, id, cos, rk) — `cos` is
    * the ADC approximation of the cosine (exact when kCent ≥ corpus, see
    * object scaladoc). The QUERY side broadcasts (queries are the small
    * side by regime); the corpus is scanned once for encoding and never
    * shuffled — scoring + per-query top-k run map-side under one window
    * whose rank filter InferWindowGroupLimit prunes to k before any sort.
    *
    * Same multi-scan contract as [[Ivf.ivfTopK]]: `corpus` is read for the
    * training sample and the encode pass — non-deterministic upstream
    * frames must be persisted by the caller.
    */
  def adcTopK(
      corpus: DataFrame, // (id: long, vec: array<float>)
      queries: DataFrame, // (qid: long, qvec: array<float>)
      k: Int,
      m: Int = 8,
      kCent: Int = 256,
      iters: Int = 8,
      seed: Long = 42L,
      sampleN: Int = 0,
      sampleBytes: Long = Ivf.DefaultSampleBytes): DataFrame = {
    val n = if (sampleN > 0) sampleN
    else math.min(262144, math.max(32768, 32 * kCent))
    val sample = Ivf.sampleVectors(corpus, n, seed, sampleBytes)
    val cb = train(sample, m, kCent, iters)
    val bc = AnnBroadcasts.track(corpus.sparkSession.sparkContext.broadcast(cb))
    val codeU = udf((v: Seq[Float]) =>
      bc.value.encode(Ivf.normalize(v.map(_.toDouble).toArray)))
    val lutU = udf((v: Seq[Float]) =>
      bc.value.lut(Ivf.normalize(v.map(_.toDouble).toArray)))
    val codes = corpus.select(col("id"), codeU(col("vec")).as("code"))
    val qs = queries.select(col("qid"), lutU(col("qvec")).as("lut"))
    rankAdc(codes.crossJoin(broadcast(qs)), kCent, k)
  }

  /** ADC score + per-query top-k over rows carrying (qid, id, code, lut).
    * The score is a native zip_with/aggregate HOF — m one-based
    * element_at lookups into the query's LUT, summed in subspace order
    * (the left-fold every cosine oracle twin in the engine shares).
    */
  private[graft] def rankAdc(joined: DataFrame, kCent: Int, k: Int): DataFrame = {
    val score = aggregate(
      zip_with(col("code"), sequence(lit(0), size(col("code")) - 1),
        (c, i) => element_at(col("lut"), (i * kCent + c + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    joined
      .where(col("qid") =!= col("id"))
      .withColumn("cos", round(score, 4))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** IVF+PQ (the FAISS IndexIVFPQ shape, no-residual variant): the [[Ivf]]
    * coarse quantizer prunes WHICH candidates each query scores (nProbe
    * cells instead of the whole corpus) while PQ codes compress WHAT is
    * stored and scored — at 10⁹ vectors the index relation is (cell, id,
    * m bytes) instead of (cell, id, dim·4 bytes), so the per-cell
    * candidate lists that ride the probe join are 100–400× narrower.
    *
    * Codes quantize the vectors themselves, not cell residuals: residual
    * coding (the paper's IVFADC) needs a fresh LUT per (query, probed
    * cell) — nProbe× the LUT flops and a LUT keyed into the join — for a
    * reconstruction-error win that shrinks as nList grows; the
    * no-residual form keeps ONE LUT per query and the same provable-
    * exactness escape hatch as [[adcTopK]] (nProbe = nCells AND kCent ≥
    * corpus ⇒ exact brute-force top-k, oracled by q_ann_ivfpq_exact).
    *
    * Hot cells are capped (bounded-state aggregate, censused drops) by the
    * same [[Ann.capKeyed]] machinery as IVF-Flat — the cap join carries
    * codes, not vectors.
    */
  def ivfAdcTopK(
      corpus: DataFrame, // (id: long, vec: array<float>)
      queries: DataFrame, // (qid: long, qvec: array<float>)
      k: Int,
      nList: Int = 0,
      nProbe: Int = 4,
      m: Int = 8,
      kCent: Int = 256,
      iters: Int = 8,
      seed: Long = 42L,
      cellCap: Int = 65536,
      census: Option[org.apache.spark.sql.Observation] = None,
      sampleN: Int = 0,
      twoLevelFrom: Int = 4096,
      sampleBytes: Long = Ivf.DefaultSampleBytes,
      corpusCount: Long = -1L): DataFrame = {
    val lists =
      if (nList > 0) nList
      else Ivf.deriveNList(if (corpusCount >= 0) corpusCount else corpus.count())
    val n = if (sampleN > 0) sampleN
    else math.max(Ivf.autoSampleN(lists), math.min(262144, 32 * kCent))
    val sample = Ivf.sampleVectors(corpus, n, seed, sampleBytes)
    val coarse: Ivf.Codebook =
      if (lists <= twoLevelFrom) Ivf.FlatCodebook(Ivf.lloyd(sample, lists, iters))
      else Ivf.trainTwoLevel(sample, lists, iters)
    val pq = train(sample, m, kCent, iters)
    val bcC = AnnBroadcasts.track(corpus.sparkSession.sparkContext.broadcast(coarse))
    val bcP = AnnBroadcasts.track(corpus.sparkSession.sparkContext.broadcast(pq))
    val cellU = udf((v: Seq[Float]) =>
      bcC.value.cellOf(Ivf.normalize(v.map(_.toDouble).toArray)))
    val probeU = udf((v: Seq[Float]) =>
      bcC.value.probeCells(Ivf.normalize(v.map(_.toDouble).toArray), nProbe))
    val codeU = udf((v: Seq[Float]) =>
      bcP.value.encode(Ivf.normalize(v.map(_.toDouble).toArray)))
    val lutU = udf((v: Seq[Float]) =>
      bcP.value.lut(Ivf.normalize(v.map(_.toDouble).toArray)))

    val keys = corpus.select(cellU(col("vec")).as("gkey"), col("id"))
    val codes = corpus.select(col("id"), codeU(col("vec")).as("code"))
    // capKeyed joins the kept ids back to their payload — codes here,
    // where IVF-Flat carries unit vectors; the bounded-cap + census
    // semantics are identical
    val cells = Ann.capKeyed(keys, codes, cellCap, census, "max_cell")
    val qb = queries
      .withColumn("lut", lutU(col("qvec")))
      .withColumn("gkey", explode(probeU(col("qvec"))))
      .drop("qvec")
    // a corpus id lives in exactly one cell and probe lists are distinct,
    // so the equi-join emits each (qid, id) at most once — no dedup
    rankAdc(qb.join(cells, "gkey"), kCent, k)
  }
}
