package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** SemDeDup semantic dedup: exact config vs brute force, the clustered
  * regime's no-false-prune subset property, planted-twin recall,
  * determinism under repartitioning, and the cell-cap census.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic corpus with REAL near-dup structure: `nBase` random
    * vectors, every third one gets a slightly-perturbed twin (cos ≈ 1).
    * Random 12-dim vectors also produce incidental mid-cosine pairs, so
    * the exact/clustered comparison exercises non-planted pairs too.
    */
  private def corpus(nBase: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rng = new java.util.SplittableRandom(seed)
    val base = (0 until nBase).map { i =>
      (i.toLong * 2, Array.fill(12)(rng.nextDouble().toFloat - 0.5f))
    }
    val twins = base.collect {
      case (id, v) if id % 6 == 0 => (id + 1, v.map(x => x + 0.0005f))
    }
    base ++ twins
  }

  /** Scala brute-force reference of the prune rule: i pruned iff some
    * j < i has round(cos, 4) >= tau; dup_of = min such j.
    */
  private def bruteForce(
      rows: Seq[(Long, Array[Float])], tau: Double): Map[Long, Option[Long]] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.map { case (i, vi) =>
      val dupOf = rows.iterator
        .filter { case (j, vj) => j < i && cos(vi, vj) >= tau }
        .map(_._1).minOption
      i -> dupOf
    }.toMap
  }

  private def runPrune(
      rows: Seq[(Long, Array[Float])], tau: Double, nList: Int,
      cellCap: Int = 65536,
      census: Option[Observation] = None): Map[Long, Option[Long]] = {
    SemDedup.prune(rows.toDF("id", "vec"), tau = tau, nList = nList,
        cellCap = cellCap, census = census)
      .select("id", "dup_of").as[(Long, Option[Long])].collect().toMap
  }

  test("semdedup: exact configuration (nList=1) matches brute force") {
    val rows = corpus(60, seed = 11)
    val got = runPrune(rows, tau = 0.6, nList = 1)
    val want = bruteForce(rows, tau = 0.6)
    assert(got == want)
  }

  test("semdedup: clustered prune is a no-false-prune subset of exact") {
    val rows = corpus(120, seed = 13)
    val exact = bruteForce(rows, tau = 0.6)
    val clustered = runPrune(rows, tau = 0.6, nList = 6)
    // every clustered verdict is justified: a pruned row must be pruned
    // under the exact rule too (clusters can only HIDE pairs), and its
    // dup_of must be a true >= tau neighbor (>= the exact min)
    clustered.foreach { case (i, dupOf) =>
      dupOf.foreach { j =>
        assert(exact(i).isDefined, s"row $i pruned by clustering but not exact")
        assert(j >= exact(i).get && j < i)
      }
    }
    val exactPruned = exact.count(_._2.isDefined)
    val clusteredPruned = clustered.count(_._2.isDefined)
    assert(clusteredPruned <= exactPruned)
  }

  test("semdedup: planted near-identical twins are always caught (recall 1.0)") {
    val rows = corpus(150, seed = 17)
    val clustered = runPrune(rows, tau = 0.95, nList = 8)
    // a twin (odd id) has cos ≈ 1 to its base; k-means must put both in
    // one Voronoi cell (they are the same point up to 5e-4/component)
    val twinIds = rows.map(_._1).filter(id => id % 2 == 1)
    assert(twinIds.nonEmpty)
    twinIds.foreach { id =>
      assert(clustered(id).contains(id - 1),
        s"twin $id not pruned to its base ${id - 1}: ${clustered(id)}")
    }
  }

  test("semdedup: probeAll multi-cell configuration is provably exact") {
    // the q_semantic_dedup_allprobe twin's property: j-side replicated
    // into every cell ⇒ the clustered path equals brute force exactly,
    // while the i-side still routes through the trained assignment
    val rows = corpus(90, seed = 31)
    val got = SemDedup.prune(rows.toDF("id", "vec"), tau = 0.6, nList = 5,
        cellCap = 1 << 20, probeAll = true)
      .select("id", "dup_of").as[(Long, Option[Long])].collect().toMap
    assert(got == bruteForce(rows, tau = 0.6))
  }

  test("semdedup: verdict is deterministic under repartitioning") {
    val rows = corpus(90, seed = 23)
    val df = rows.toDF("id", "vec")
    def run(parts: Int): Map[Long, (Option[Long], Int)] =
      SemDedup.prune(df.repartition(parts), tau = 0.6, nList = 4)
        .select("id", "dup_of", "keep")
        .as[(Long, Option[Long], Int)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(run(3) == run(17))
  }

  test("semdedup: hot-cell cap drops are censused, never silent or fatal") {
    val rows = corpus(80, seed = 29)
    val obs = Observation("semdedup_census")
    val got = runPrune(rows, tau = 0.6, nList = 2, cellCap = 8,
      census = Some(obs))
    assert(got.size == rows.size) // every input row still gets a verdict
    val m = obs.get
    assert(m("dropped_vectors").asInstanceOf[Long] > 0L)
    assert(m("n_vectors").asInstanceOf[Long] == rows.size.toLong)
    // capped-out rows are conservatively KEPT (a miss, never a false prune)
    val exact = bruteForce(rows, tau = 0.6)
    got.foreach { case (i, dupOf) =>
      dupOf.foreach(_ => assert(exact(i).isDefined))
    }
  }

  test("a zero-norm embedding never prunes anything (NaN guard)") {
    // cos(zero, x) = 0/0 = NaN, and Spark orders NaN above every double —
    // without the norm guard a low-id zero vector would semantically
    // "duplicate" every higher-id cell-mate
    val rows = Seq(
      (0L, Seq(0.0f, 0.0f, 0.0f)), // failed-embedder output, lowest id
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.05f, 0.0f))) // near-dup of 1
    val df = rows.toDF("id", "vec")
    val out = SemDedup.prune(df, tau = 0.9, nList = 1)
      .where(col("keep") === 0)
      .select("id", "dup_of").as[(Long, Long)].collect().toSet
    assert(out == Set((3L, 1L)),
      s"only the genuine near-dup may be pruned, got $out")
  }
}
