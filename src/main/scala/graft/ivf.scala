package graft

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate-nearest-neighbor search — the
  * centroid-partitioned scale path for similarity search, complementing
  * the random-hyperplane LSH in [[Ann]] (builder-prompt: "an IVF or
  * LSH-bucketed variant as the scale path").
  *
  * Structure (FAISS-style IVF-Flat, spherical k-means coarse quantizer):
  *   1. TRAIN a small codebook of `nList` unit-norm centroids on a
  *      bounded, deterministic sample of the corpus. Training cost is
  *      O(sampleN · nList · dim · iters) on the driver and INDEPENDENT of
  *      corpus size — sampling the training set is the standard IVF
  *      recipe, not a shortcut; the collected sample is ≤ `sampleN` rows
  *      by construction, so this is not a driver-side data collect.
  *   2. ASSIGN every corpus vector to its nearest centroid (max cosine) —
  *      a map-side pass with the codebook broadcast in the UDF closure
  *      (nList·dim floats ≈ a few MB at production sizes); no shuffle.
  *   3. SEARCH: each query probes its `nProbe` nearest cells, and one
  *      equi-join on cell id replaces the O(n²) cross join. Scored with
  *      the codegen'd [[Ann.cosineCol]]; exact cosine inside the probed
  *      cells (IVF-Flat, no product quantization — vectors are small
  *      relative to the images they describe).
  *
  * Scale accounting at 10⁹ vectors: `deriveNList` clamps at 2¹⁶ cells of
  * ~15k vectors each; nProbe=4 means each query scores ~61k candidates —
  * linear fan-out, no quadratic blow-up. Hot cells (duplicate embeddings
  * collapsing onto one centroid) are capped at `cellCap` with the drop
  * count surfaced via `census` — the same never-silent-drop discipline as
  * the LSH bucket cap (W2).
  */
object Ivf {

  /** Cell count n/`targetCell` (cells of ~targetCell vectors each),
    * clamped to [16, 65536]. A fixed nList is the same scale bug as a
    * fixed LSH plane count: cell population grows linearly with corpus
    * size and the per-cell scan re-explodes.
    */
  def deriveNList(n: Long, targetCell: Int = 1024): Int = {
    val needed = math.ceil(math.max(1.0, n.toDouble / targetCell)).toLong
    math.max(16, math.min(65536, needed)).toInt
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val inv = if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }

  @inline private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Nearest-centroid index by cosine (centroids unit-norm ⇒ max dot);
    * ties break to the lower cell index for determinism.
    */
  @inline private def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
    while (c < cs.length) {
      val d = dot(v, cs(c))
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** Top-`nProbe` cell indices by descending dot (partial selection). */
  private def nearestK(v: Array[Double], cs: Array[Array[Double]], k: Int): Array[Int] = {
    val ds = Array.tabulate(cs.length)(c => (dot(v, cs(c)), c))
    ds.sortBy { case (d, c) => (-d, c) }.take(math.min(k, cs.length)).map(_._2)
  }

  /** Spherical k-means codebook on a deterministic hash-ordered sample.
    * Init = first `nList` sample vectors in hashed-id order (a seeded
    * shuffle, so initial centroids are spread across the corpus, not
    * clustered by ingestion order). Lloyd iterations keep an empty cell's
    * previous centroid. Fully deterministic for (corpus, nList, seed).
    */
  def trainCentroids(
      corpus: DataFrame, // (id: long, vec: array<float>)
      nList: Int,
      iters: Int = 8,
      seed: Long = 42L,
      sampleN: Int = 32768): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .select(col("id"), col("vec"))
      .orderBy(xxhash64(col("id"), lit(seed)))
      .limit(sampleN)
      .select(col("vec"))
      .collect()
      .map(r => normalize(r.getSeq[Float](0).map(_.toDouble).toArray))
      .filter(_.exists(_ != 0.0))
    require(sample.length >= nList,
      s"IVF training needs ≥ nList=$nList non-zero sample vectors, got ${sample.length}")
    var centroids = sample.take(nList).map(_.clone())
    val dim = centroids(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nList)(new Array[Double](dim))
      val counts = new Array[Long](nList)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        val s = sums(c); var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(c) += 1
      }
      centroids = Array.tabulate(nList) { c =>
        if (counts(c) == 0L) centroids(c) else normalize(sums(c))
      }
      it += 1
    }
    centroids
  }

  /** IVF-Flat ANN: top-k cosine neighbors per query, searching only the
    * query's `nProbe` nearest cells. `nList = 0` derives the cell count
    * from `corpus.count()`. Output: (qid, id, cos, rk).
    */
  def ivfTopK(
      corpus: DataFrame, // (id: long, vec: array<float>)
      queries: DataFrame, // (qid: long, qvec: array<float>)
      k: Int,
      nList: Int = 0,
      nProbe: Int = 4,
      iters: Int = 8,
      seed: Long = 42L,
      cellCap: Int = 65536,
      census: Option[Observation] = None): DataFrame = {
    val lists = if (nList > 0) nList else deriveNList(corpus.count())
    val centroids = trainCentroids(corpus, lists, iters, seed)
    val cellU = udf((v: Seq[Float]) =>
      nearest(normalize(v.map(_.toDouble).toArray), centroids))
    val probeU = udf((v: Seq[Float]) =>
      nearestK(normalize(v.map(_.toDouble).toArray), centroids, nProbe))

    val cw = Window.partitionBy(col("cell")).orderBy(col("id"))
    val withRk = corpus
      .withColumn("cell", cellU(col("vec")))
      .withColumn("vecn", Ann.unitCol(col("vec"), Ann.normCol(col("vec"))))
      .drop("vec")
      .withColumn("crk", row_number().over(cw))
    val observed = census.fold(withRk)(o => withRk.observe(o,
      sum(when(col("crk") > cellCap, 1L).otherwise(0L)).as("dropped_vectors"),
      max(col("crk")).as("max_cell"),
      count(lit(1)).as("n_vectors")))
    val cells = observed.where(col("crk") <= cellCap).drop("crk")

    // normalize BEFORE the explode: one norm per query, not per probed cell
    val qb = queries
      .withColumn("qvecn", Ann.unitCol(col("qvec"), Ann.normCol(col("qvec"))))
      .withColumn("cell", explode(probeU(col("qvec"))))
      .drop("qvec")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    qb.join(cells, "cell")
      .where(col("qid") =!= col("id"))
      .withColumn("cos", round(Ann.dotCol(col("qvecn"), col("vecn")), 4))
      .dropDuplicates("qid", "id")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }
}
