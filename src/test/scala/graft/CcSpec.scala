package graft

import org.apache.spark.sql.functions._

class CcSpec extends SparkSpec {
  import spark.implicits._

  /** driver-side union-find oracle */
  private def unionFind(n: Int, edges: Seq[(Int, Int)]): Map[Int, Int] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to min rep
    (0 until n).map(i => i -> find(i)).toMap
  }

  private def check(n: Int, edges: Seq[(Int, Int)]): Unit = {
    def id(i: Int) = f"n$i%06d"
    val edgeDf = edges.map { case (a, b) => (id(a), id(b)) }.toDF("a", "b")
    val nodes = (0 until n).map(id).toDF("image_id")
    val got = ConnectedComponents
      .cluster(edgeDf, nodes)
      .as[(String, String)]
      .collect()
      .toMap
    val expected = unionFind(n, edges).map { case (k, v) => id(k) -> id(v) }
    assert(got == expected)
  }

  test("cc on random graphs equals union-find oracle") {
    val rng = new java.util.SplittableRandom(5)
    (0 until 3).foreach { _ =>
      val n = 200
      val edges = (0 until 150).map(_ => (rng.nextInt(n), rng.nextInt(n)))
      check(n, edges)
    }
  }

  test("cc on a path graph (worst case for star algorithms)") {
    val n = 2000
    check(n, (0 until n - 1).map(i => (i, i + 1)))
  }

  test("cc with no edges → all singletons") {
    check(50, Seq.empty)
  }

  test("cc on one big clique-ish star") {
    val n = 100
    check(n, (1 until n).map(i => (0, i)))
  }

  test("cc star rounds compile to constant-state hash aggregates (plan assert)") {
    // i64 ids — the production shape (Pipeline uses clusterHashed). The
    // min() aggregates must be HashAggregate: SortAggregate here means an
    // immutable aggregation buffer (e.g. string ids), i.e. two full sorts
    // of the edge relation per CC round at scale.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val plan = ConnectedComponents.planProbe(edges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      s"star round must not use object aggregation buffers:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"star round min() must hash-aggregate (immutable buffer type?):\n$plan")
    assert(!plan.contains("collect_set"), "unbounded collect_set in CC round")
    assert(plan.contains("HashAggregate"), "expected hash aggregation for min()")
  }

  test("clusterHashed equals string-id cluster() output (public min-id reps)") {
    val rng = new java.util.SplittableRandom(11)
    val n = 300
    def id(i: Int) = f"img$i%06d"
    val edges = (0 until 200).map(_ => (id(rng.nextInt(n)), id(rng.nextInt(n))))
    val edgeDf = edges.toDF("a", "b")
    val nodes = (0 until n).map(id).toDF("image_id")
    val viaHash = ConnectedComponents.clusterHashed(edgeDf, nodes)
      .as[(String, String)].collect().toMap
    val viaString = ConnectedComponents.cluster(edgeDf, nodes)
      .as[(String, String)].collect().toMap
    assert(viaHash == viaString)
  }

  test("cc hub stress: one node with 1e5 neighbors (bounded agg state)") {
    // a component minimum concentrates the whole component's edges on one
    // key mid-convergence; the join-based small-star must hold constant
    // state per key (the old collect_set formulation buffered all 1e5
    // neighbors in a single aggregation buffer)
    val n = 100001
    val hubEdges = (1 until n).map(i => (0, i))
    def id(i: Int) = f"n$i%06d"
    val edgeDf = hubEdges.map { case (a, b) => (id(a), id(b)) }.toDF("a", "b")
    val nodes = (0 until n).map(id).toDF("image_id")
    val got = ConnectedComponents.cluster(edgeDf, nodes)
    assert(got.select(countDistinct(col("cluster_id"))).as[Long].collect()(0) == 1L)
    assert(got.where(col("cluster_id") =!= id(0)).count() == 0L)
  }
}
