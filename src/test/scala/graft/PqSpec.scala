package graft

import org.apache.spark.sql.functions._

/** Product-quantization ANN: sub-quantizer training, the exactness escape
  * hatch (kCent >= corpus => ADC == brute force), compressed-regime
  * planted-twin recall, determinism, and the IVF+PQ composition.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def randDf(n: Int, dim: Int, seed: Long) = {
    val rng = new java.util.SplittableRandom(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextDouble().toFloat - 0.5f))
    }.toDF("id", "vec")
  }

  test("pq: m must divide the embedding dim") {
    val rng = new java.util.SplittableRandom(1)
    val sample = Array.fill(8)(Array.fill(10)(rng.nextDouble() - 0.5))
    intercept[IllegalArgumentException](Pq.train(sample, m = 3, kCent = 4, iters = 2))
  }

  test("pq: training is deterministic and codes are in range") {
    val rng = new java.util.SplittableRandom(7)
    val sample = Array.fill(300)(Ivf.normalize(Array.fill(16)(rng.nextDouble() - 0.5)))
    val cb1 = Pq.train(sample, m = 4, kCent = 16, iters = 4)
    val cb2 = Pq.train(sample, m = 4, kCent = 16, iters = 4)
    assert(cb1.m == 4 && cb1.subDim == 4 && cb1.kCent == 16)
    (0 until 4).foreach { s =>
      assert(cb1.centroids(s).zip(cb2.centroids(s)).forall {
        case (a, b) => a.sameElements(b)
      })
    }
    sample.take(50).foreach { v =>
      val code = cb1.encode(v)
      assert(code.length == 4 && code.forall(c => c >= 0 && c < 16))
    }
  }

  test("pq: LUT scoring equals explicit reconstruction dot product") {
    val rng = new java.util.SplittableRandom(11)
    val sample = Array.fill(200)(Ivf.normalize(Array.fill(12)(rng.nextDouble() - 0.5)))
    val cb = Pq.train(sample, m = 3, kCent = 8, iters = 4)
    val q = Ivf.normalize(Array.fill(12)(rng.nextDouble() - 0.5))
    val lut = cb.lut(q)
    sample.take(30).foreach { v =>
      val code = cb.encode(v)
      val viaLut = code.zipWithIndex.map { case (c, s) => lut(s * cb.kCent + c) }.sum
      // explicit: dot(q, concatenated reconstructed subvectors)
      val recon = code.zipWithIndex.flatMap { case (c, s) => cb.centroids(s)(c) }
      val direct = q.zip(recon).map { case (a, b) => a * b }.sum
      assert(math.abs(viaLut - direct) < 1e-9)
    }
  }

  test("pq: exact configuration (kCent = n) equals brute-force top-k") {
    val n = 120
    val all = randDf(n, dim = 16, seed = 3L)
    val q = all.where(col("id") < 8).select(col("id").as("qid"), col("vec").as("qvec"))
    val pq = Pq.adcTopK(all, q, k = 5, m = 4, kCent = n, iters = 2, sampleN = n)
      .orderBy("qid", "rk").collect()
    // brute force with the same ranking rule (round(cos,4) desc, id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    val brute = all.crossJoin(broadcast(q))
      .where(col("qid") =!= col("id"))
      .withColumn("cos", round(Ann.cosineCol(col("qvec"), col("vec")), 4))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
      .orderBy("qid", "rk").collect()
    assert(pq.sameElements(brute))
  }

  test("pq: ivf+pq exact configuration (nProbe = nList, kCent = n) equals brute force") {
    val n = 120
    val all = randDf(n, dim = 16, seed = 5L)
    val q = all.where(col("id") < 8).select(col("id").as("qid"), col("vec").as("qvec"))
    val got = Pq.ivfAdcTopK(all, q, k = 5, nList = 8, nProbe = 8,
      m = 4, kCent = n, iters = 2, sampleN = n).orderBy("qid", "rk").collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    val brute = all.crossJoin(broadcast(q))
      .where(col("qid") =!= col("id"))
      .withColumn("cos", round(Ann.cosineCol(col("qvec"), col("vec")), 4))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
      .orderBy("qid", "rk").collect()
    assert(got.sameElements(brute))
  }

  /** Planted-twin recall in the COMPRESSED regime (same protocol as the
    * LSH/IVF ANN tests): the twin's ADC score dominates the random
    * background because its code reconstructs near the query while
    * background vectors reconstruct near-orthogonal to it.
    */
  private def twinRecall(n: Int, kCent: Int): Double = {
    val rng = new java.util.SplittableRandom(9)
    val base = (0 until n).map { i =>
      (i.toLong * 2, Array.fill(16)(rng.nextDouble().toFloat - 0.5f))
    }
    val twins = base.map { case (id, v) => (id + 1, v.map(x => x + 0.001f)) }
    val all = (base ++ twins).toDF("id", "vec")
    val queries = base.toDF("qid", "qvec")
    val top1 = Pq.adcTopK(all, queries, k = 1, m = 4, kCent = kCent)
      .select("qid", "id").as[(Long, Long)].collect().toMap
    base.count { case (id, _) => top1.get(id).contains(id + 1) }.toDouble / n
  }

  test("pq: compressed-regime recall on planted twins (two corpus sizes)") {
    // a twin and its base quantize to the SAME code except on sub-centroid
    // borders, so the twin shares the query's own reconstruction — the
    // highest possible ADC score; border losses bound recall below 1.0
    assert(twinRecall(40, kCent = 32) >= 0.9)
    assert(twinRecall(400, kCent = 64) >= 0.9)
  }

  test("pq: adc and ivf+pq results are deterministic across runs") {
    val all = randDf(300, dim = 8, seed = 13L)
    val q = all.limit(5).select(col("id").as("qid"), col("vec").as("qvec"))
    val a1 = Pq.adcTopK(all, q, k = 3, m = 2, kCent = 16).orderBy("qid", "rk").collect()
    val a2 = Pq.adcTopK(all, q, k = 3, m = 2, kCent = 16).orderBy("qid", "rk").collect()
    assert(a1.sameElements(a2))
    val b1 = Pq.ivfAdcTopK(all, q, k = 3, nList = 8, nProbe = 2,
      m = 2, kCent = 16).orderBy("qid", "rk").collect()
    val b2 = Pq.ivfAdcTopK(all, q, k = 3, nList = 8, nProbe = 2,
      m = 2, kCent = 16).orderBy("qid", "rk").collect()
    assert(b1.sameElements(b2))
  }

  test("pq: ivf+pq hot-cell cap drops are observable, never silent") {
    val all = (0 until 50).map(i => (i.toLong, Array.fill(8)(1.0f))).toDF("id", "vec")
    val q = Seq((999L, Array.fill(8)(1.0f))).toDF("qid", "qvec")
    val obs = new org.apache.spark.sql.Observation()
    val got = Pq.ivfAdcTopK(all, q, k = 5, nList = 4, nProbe = 4, m = 2,
      kCent = 4, cellCap = 20, census = Some(obs)).count()
    assert(got == 5)
    val m = obs.get
    assert(m("dropped_vectors").asInstanceOf[Number].longValue == 30L)
    assert(m("max_cell").asInstanceOf[Number].longValue == 50L)
  }
}
