package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative DataFrame connected components (SURVEY.md §2.8 O5):
  * alternating large-star / small-star of Kiveris et al., "Connected
  * Components in MapReduce and Beyond" (SoCC 2014). Converges in
  * O(log² n) rounds (O(log n) in practice); each round is two
  * groupBy+join DataFrame passes. `localCheckpoint` every round truncates
  * the otherwise exponentially-growing Catalyst lineage — the classic
  * iterative-Spark requirement (SURVEY.md §4.2.3).
  *
  * Edge invariant maintained: edges always point "larger id → smaller id"
  * (parent pointers); fixpoint = every node points directly at its
  * component minimum.
  */
object ConnectedComponents {

  /** large-star: for each node u over its bidirectional neighborhood N(u),
    * connect every strictly-larger neighbor to m = min(N(u) ∪ {u}).
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
    nbrs
      .join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** small-star: orient edges large→small, then connect all smaller
    * neighbors (and u itself) to the minimum.
    *
    * Same join-back shape as [[largeStar]] — `groupBy(u).agg(min(v))` has
    * CONSTANT aggregation state per key, then the min is re-attached with
    * an equi-join. The earlier `collect_set` formulation materialized a
    * node's whole smaller-neighborhood in one aggregation buffer; degree
    * concentrates on component minima mid-convergence (star graphs), so at
    * scale one hot node held an O(component)-sized buffer on a single
    * executor. The join-based form shuffles the same rows but never holds
    * more than one value of state per key.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
    // every smaller neighbor v → m, plus u itself → m (m < u always since
    // m = min over strictly-smaller neighbors)
    oriented
      .join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** One large-star + small-star round, exposed for mechanical plan
    * verification (PlanDump + CcSpec assert it contains only
    * constant-state HashAggregates — no ObjectHashAggregate, no
    * collect_set buffers).
    */
  private[graft] def planProbe(edges: DataFrame): DataFrame =
    smallStar(largeStar(edges))

  /** Convergence probe: cheap order-independent signature of the edge set
    * (count + XOR of pair hashes) — one lightweight action per round
    * instead of an `except` anti-join. XOR aggregate is overflow-free
    * under ANSI mode (Spark 4 default).
    */
  private def signature(edges: DataFrame): (Long, Long) = {
    val r = edges
      .agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))"))
      .collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** CC over i64-hashed ids with public min-image_id representatives.
    *
    * The star rounds aggregate `min` over the node-id type, and `min` over
    * a STRING has an immutable aggregation buffer — Spark plans it as
    * SortAggregate, i.e. a full sort of the edge relation per aggregate,
    * twice per round, every round. Hashing the public ids to i64 first
    * keeps every per-round aggregate a codegen HashAggregate (mutable
    * buffer), and the one unavoidable string `min` — picking the stable
    * public representative (A5: cluster_id = min member image_id) — runs
    * ONCE over the n-row assignment, not O(rounds) times over the edges.
    *
    * i64 collision safety: ids come through [[IdHash.withId]] under the
    * pipeline's repair table, which made the id map globally injective
    * before any stage ran — a collision here would silently merge two
    * unrelated clusters, which is why CC shares the exact same repaired
    * derivation as signatures and verify.
    */
  def clusterHashed(
      dupEdges: DataFrame,
      corpus: DataFrame,
      maxIter: Int = 20,
      repairs: Option[DataFrame] = None): DataFrame = {
    // same repaired id function as the signature stage (IdHash): a hash
    // collision here would silently merge two unrelated clusters
    val edges = IdHash.withId(IdHash.withId(dupEdges, "a", "ha", repairs), "b", "hb", repairs)
      .select(col("ha").as("a"), col("hb").as("b"))
    val nodes = IdHash.withId(corpus, "image_id", "nid", repairs)
      .select(col("nid"), col("image_id"))
    val assign = cluster(edges, nodes.select(col("nid").as("image_id")), maxIter)
      .select(col("image_id").as("nid"), col("cluster_id").as("rep"))
      .join(nodes, "nid")
    val repPub = assign.groupBy("rep").agg(min(col("image_id")).as("cid"))
    assign.join(repPub, "rep")
      .select(col("image_id"), col("cid").as("cluster_id"))
  }

  /** Run to fixpoint; returns assignment (image_id → cluster_id=component
    * min). `nodes` supplies singletons (every corpus id appears in the
    * output — A5 stability rule: cluster_id = min member id). Generic over
    * the id type; pass NUMERIC ids (or use [[clusterHashed]]) so the
    * per-round min aggregates stay hash-based — see clusterHashed's
    * scaladoc.
    */
  def cluster(dupEdges: DataFrame, nodes: DataFrame, maxIter: Int = 20): DataFrame = {
    // lazy localCheckpoint: the convergence-signature action right after it
    // materializes the checkpoint AND the aggregate in ONE job per
    // iteration (eager checkpointing would cost a second pass).
    var edges = dupEdges
      .select(col("a").as("u"), col("b").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)
    var prev = signature(edges)
    var converged = prev._1 == 0L
    var it = 0
    while (!converged && it < maxIter) {
      edges = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val sig = signature(edges)
      converged = sig == prev
      prev = sig
      it += 1
    }
    // at fixpoint every u points at its component min; u may appear with
    // several parents mid-way — min() collapses defensively.
    val reps = edges.groupBy("u").agg(min(col("v")).as("cluster_id"))
      .select(col("u").as("image_id"), col("cluster_id"))
    nodes
      .select(col("image_id"))
      .join(reps, Seq("image_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("image_id")))
  }
}
