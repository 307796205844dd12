package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tiered dedup — the standard web-curation cascade (exact → near →
  * semantic) as one composed operator with per-doc tier provenance.
  *
  * The tier ORDER is the scale story (BASELINE.json north rule: tiered
  * dedup at 10¹²-row scale). Each tier sees only the previous tier's
  * survivors, so the cheap tier shrinks the corpus before the expensive
  * one runs:
  *
  *  - tier 1 "exact": md5 content groups, keeper = min doc_id. One hash
  *    aggregation keyed on the 128-bit digest (O(1) min-agg state per
  *    group, map-side combining) + one shuffled hash join back to tag
  *    rows. A web crawl is typically 30–50% byte-identical fetches, so
  *    this tier removes the bulk of the corpus for the price of one
  *    digest projection — no shingling, no signatures. 128-bit groups
  *    need no collision repair at 10¹² rows (birthday bound ≈ 1.5e-15;
  *    contrast idhash.scala, which repairs because 64-bit ids at 10¹²
  *    collide with probability ≈ 0.03).
  *  - tier 2 "near": caller-supplied pair generator over the survivors
  *    (pluggable so the bounded-slice oracle regime and the LSH scale
  *    regime share this cascade), then the engine's large/small-star
  *    connected components; keeper = cluster min, survivors = cluster
  *    representatives.
  *  - tier 3 "semantic": [[SemDedup.prune]] over the tier-2 survivors
  *    that have an embedding row; cos ≥ tauSem to a lower-id survivor
  *    prunes. Docs WITHOUT an embedding degrade to 'kept' (left join) —
  *    never silently vanish (TieredSpec pins this).
  *
  * Output: exactly one row per input doc — (doc_id, tier ∈ {exact, near,
  * semantic, kept}, dup_of = keeper id, null for kept). Disjointness and
  * completeness are structural (each tier emits only rows the next tier
  * never sees) and spec-pinned.
  */
object TieredDedup {

  /** Exact all-pairs 5-shingle Jaccard pairs at `tau` — the bounded-slice
    * regime (quadratic in co-shingled docs; SQL-oracle-able). The scale
    * regime for tier 2 is the LSH band/gate/verify path
    * (q_doc_near_dup_lsh), which emits the same pair set at its
    * threshold with P(miss) ≤ 2e-8 per true pair. Returns (a, b), a < b.
    */
  def exactPairsJaccard(docs: DataFrame, tau: Double): DataFrame =
    exactPairsScored(docs).where(col("j") >= tau).select(col("a"), col("b"))

  /** The scored form of [[exactPairsJaccard]]: every co-shingled pair
    * with its exact Jaccard, threshold NOT applied — so a consumer that
    * needs several τ settings (T43's churn audit compares two) pays the
    * quadratic shingle join ONCE and filters the scored table per
    * setting; the per-τ CC rounds that follow are cheap by comparison.
    * Callers fanning out over thresholds should localCheckpoint the
    * result (it is lazily recomputed per consumer otherwise).
    */
  def exactPairsScored(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
        i => col("text").substr(i, lit(5))))).as("shingle"))
    val na = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(na.select(col("doc_id").as("a"), col("n_sh").as("na")), "a")
      .join(na.select(col("doc_id").as("b"), col("n_sh").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("j"))
  }

  /** Cluster a pre-scored pair table ([[exactPairsScored]]) at `tau` —
    * the multi-threshold companion of [[exactClusters]]. */
  def exactClustersAt(docs: DataFrame, scoredPairs: DataFrame,
      tau: Double): DataFrame =
    clustersFrom(docs,
      scoredPairs.where(col("j") >= tau).select(col("a"), col("b")))

  /** [[exactPairsJaccard]] + connected components → (doc_id, cluster_id),
    * cluster_id = min doc_id of the component. Numeric ids straight
    * through: min over i64 keeps every CC-round aggregate hash-based
    * (min over STRING would plan SortAggregate and rank "10" < "9" —
    * see ConnectedComponents.clusterHashed scaladoc).
    */
  def exactClusters(docs: DataFrame, tau: Double): DataFrame =
    clustersFrom(docs, exactPairsJaccard(docs, tau))

  private def clustersFrom(docs: DataFrame, pairs: DataFrame): DataFrame =
    ConnectedComponents.cluster(pairs, docs.select(col("doc_id").as("image_id")))
      .select(col("image_id").as("doc_id"), col("cluster_id"))

  /** Tier 1 for the IMAGE pipeline (DedupConfig.exactTier): byte-identical
    * groups as (canon, dup, same_caption) PUBLIC-id edges. The
    * `same_caption` flag is the RECALL contract: the pipeline may drop a
    * dup member's signature row only when its caption equals the canon's
    * — then any candidate the member's caption would have retrieved is
    * retrieved by the canon's identical caption, and the pixel verify
    * sees identical bytes, so the emitted cluster set is provably
    * unchanged. A caption-REWRITTEN byte copy keeps its own signature
    * row (its caption may be the only retrieval path to a third near-dup
    * — dropping it would silently lose those pairs), and its exact edge
    * still merges it with the canon. PipelineSpec pins both directions.
    *
    * Plan shape: the digest is computed IN the scan projection — md5
    * over bytes is row-local codegen, so pixels never ride a shuffle:
    * only (i64 id, public id, 32-char digest, caption) rows leave the
    * scan, localCheckpointed ONCE because two consumers read them
    * (grouping + the member join; without it the corpus would be
    * scanned and digested twice — swap for a table checkpoint when the
    * narrow projection exceeds cluster storage). Canon = min of the
    * REPAIRED i64 id, a codegen HashAggregate with O(1) group state —
    * min over the public STRING id would silently plan SortAggregate
    * over the corpus-scale digest relation (strings have no mutable
    * agg buffer; the same trap ConnectedComponents.clusterHashed
    * documents), and the i64→public translation is one id-keyed join
    * against the canon rows already present in the member relation.
    * Suspect-gating the digest on cheap columns (phash, w, h, fmt) was
    * considered and rejected: bytes are already being read off parquet
    * either way, md5 is ~two orders cheaper than an image decode, and
    * the gating join would either broadcast an unbounded suspect set or
    * drag bytes through a shuffle to meet it.
    *
    * 128-bit digest ⇒ no collision repair needed at 10¹² rows (the same
    * birthday-bound argument as [[cascade]]'s text tier); the i64 id
    * reuses the pipeline's repair table, so colliding PUBLIC ids cannot
    * corrupt canon selection either.
    */
  def exactImageEdges(clean: DataFrame,
      repairs: Option[DataFrame] = None): DataFrame = {
    val ek = IdHash.withId(
      clean.select(col("image_id"), col("caption"), md5(col("bytes")).as("ek")),
      "image_id", "id", repairs)
      .localCheckpoint()
    val canon = ek.groupBy("ek").agg(min(col("id")).as("cid"))
    val members = ek.join(canon, "ek")
    val canonRows = members.where(col("id") === col("cid"))
      .select(col("cid"), col("image_id").as("canon_pub"),
        col("caption").as("canon_cap"))
    members.where(col("id") =!= col("cid"))
      .join(canonRows, "cid")
      .select(col("canon_pub").as("a"), col("image_id").as("b"),
        (col("caption") === col("canon_cap")).as("same_caption"))
  }

  /** The cascade. `docs` = (doc_id: long, text), `emb` = (id: long,
    * vec: array&lt;float&gt;), `nearPairs` maps tier-1 survivors
    * (doc_id, text) to undirected dup edges (a, b).
    *
    * `semNList` = 1 runs the semantic tier exact (SQL-oracle-able,
    * bounded-survivor regime); 0 derives k-means cells from the survivor
    * count (the 100 TB regime — pair work bounded to O(Σ|cell|²), see
    * SemDedup scaladoc for the no-false-prune subset property).
    */
  def cascade(
      docs: DataFrame,
      emb: DataFrame,
      nearPairs: DataFrame => DataFrame,
      tauSem: Double,
      semNList: Int = 1): DataFrame = {
    // tier 1: exact. md5 over the raw text bytes; keeper = group min.
    // t1 feeds TWO branches (dups out, survivors down-cascade) and the
    // survivor branch is consumed again by the pair generator and the CC
    // node list — without a checkpoint every branch re-runs the corpus
    // scan + digest aggregation + join. The lazy localCheckpoint bounds
    // that to once (same idiom as the nearDup signature reuse); the
    // 10¹²-row job uses the pipeline's TableIO stage commits instead,
    // which buy the same single-computation plus resumability.
    val tag1 = docs.withColumn("h", md5(col("text").cast("binary")))
    val canon = tag1.groupBy("h").agg(min("doc_id").as("canon"))
    val t1 = tag1.join(canon, "h").localCheckpoint(eager = false)
    val exactDups = t1.where(col("doc_id") =!= col("canon"))
      .select(col("doc_id"), lit("exact").as("tier"),
        col("canon").as("dup_of"))
    val surv1 = t1.where(col("doc_id") === col("canon"))
      .select(col("doc_id"), col("text"))

    // tier 2: near. CC over the caller's pair set; keeper = cluster min.
    // clu is narrow (two i64 cols) and consumed by both the dup branch
    // and the survivor branch — checkpoint instead of re-running the
    // final CC rep-join twice.
    val clu = clustersFrom(surv1, nearPairs(surv1)).localCheckpoint(eager = false)
    val nearDups = clu.where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit("near").as("tier"),
        col("cluster_id").as("dup_of"))
    val surv2 = clu.where(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"))

    // tier 3: semantic. Only survivors WITH an embedding enter the
    // prune; the left join degrades embedding-less docs to 'kept'.
    // Checkpointed because SemDedup.prune scans its input several times
    // (norm projection on both pair sides, the id/keep projection, plus
    // count/sample/keys in the clustered regime) — its own scaladoc
    // tells callers with an expensive upstream plan to persist, and
    // this emb ⋈ survivor join is exactly that.
    val e = emb.join(surv2, emb("id") === surv2("doc_id"))
      .select(emb("id"), emb("vec"))
      .localCheckpoint()
    val pr = SemDedup.prune(e, tau = tauSem, nList = semNList)
    val verdict = surv2.join(pr, surv2("doc_id") === pr("id"), "left")
      .select(surv2("doc_id"),
        when(col("keep") === 0, lit("semantic"))
          .otherwise(lit("kept")).as("tier"),
        when(col("keep") === 0, col("dup_of"))
          .cast("long").as("dup_of"))

    exactDups.unionByName(nearDups).unionByName(verdict)
  }
}
