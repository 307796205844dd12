package graft

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Cosine similarity of two float-array columns via zip_with/aggregate
    * HOFs (codegen'd — no UDF on the O(candidates) hot path).
    */
  def cosineCol(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** LSH-bucketed ANN: top-k neighbors per query vector, searching only
    * shared (multi-probed) buckets. `queries` and `corpus` both carry
    * (id, vec). One equi-join on bucket id replaces the cross join.
    */
  def annTopK(
      corpus: DataFrame, // (id: long, vec: array<float>)
      queries: DataFrame, // (qid: long, qvec: array<float>)
      k: Int,
      nPlanes: Int = 12,
      seed: Long = 42L): DataFrame = {
    val cb = corpus.withColumn("bucket", bucketUdf(nPlanes, seed)(col("vec")))
    val qb = queries.withColumn("bucket",
      explode(probeUdf(nPlanes, seed)(col("qvec"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    qb.join(cb, "bucket")
      .where(col("qid") =!= col("id"))
      .withColumn("cos", round(cosineCol(col("qvec"), col("vec")), 4))
      .dropDuplicates("qid", "id")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }
}
