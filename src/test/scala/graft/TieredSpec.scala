package graft

import org.apache.spark.sql.functions._

/** TieredDedup cascade: per-doc tier provenance on a planted corpus that
  * exercises every tier and both degrade paths, tier PRECEDENCE (a doc
  * removed by a cheap tier never reaches an expensive one, even when the
  * expensive tier would also have claimed it), structural completeness /
  * disjointness (exactly one verdict row per input doc), and determinism
  * under repartitioning.
  */
class TieredSpec extends SparkSpec {
  import spark.implicits._

  // Planted corpus. Texts 1/3 are 5-shingle near-dups (one trailing word
  // differs); 2 is byte-identical to 1; 7 byte-identical to 3; 4/5/6 are
  // unrelated texts. Every text is long enough that shingle sets of
  // unrelated docs share essentially nothing at tau = 0.4.
  private val tBase =
    "the quick brown fox jumps over the lazy dog near the river "
  private val docs: Seq[(Long, String)] = Seq(
    1L -> (tBase + "bank"),
    2L -> (tBase + "bank"), // exact dup of 1
    3L -> (tBase + "edge"), // near dup of 1
    4L -> "completely unrelated caption about mountain weather patterns",
    5L -> "another disjoint caption describing deep sea exploration gear",
    6L -> "a third standalone caption on desert botany and seed dormancy",
    7L -> (tBase + "edge")) // exact dup of 3 (whose keeper is itself near-dup'd)

  // Embeddings: 4 ≈ 1 (semantic dup), 6 orthogonal (kept), 3 ≈ 1 too —
  // but 3 is removed at tier 2, so its embedding must never matter
  // (precedence). 5 has NO embedding row (degrade-to-kept path).
  private val emb: Seq[(Long, Array[Float])] = Seq(
    1L -> Array(1f, 0f, 0f, 0f),
    2L -> Array(1f, 0f, 0f, 0f),
    3L -> Array(1f, 0f, 0f, 0f),
    4L -> Array(0.99f, 0.01f, 0f, 0f),
    6L -> Array(0f, 1f, 0f, 0f))

  private def run(shufflePartitions: Int = 8): Map[Long, (String, Option[Long])] = {
    val d = docs.toDF("doc_id", "text").repartition(shufflePartitions)
    val e = emb.toDF("id", "vec")
    TieredDedup.cascade(d, e,
        surv => TieredDedup.exactPairsJaccard(surv, tau = 0.4),
        tauSem = 0.9, semNList = 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
  }

  private lazy val verdict = run()

  test("completeness + disjointness: exactly one verdict row per input doc") {
    assert(verdict.keySet === docs.map(_._1).toSet)
    // Map construction would mask duplicate doc_ids — count rows too.
    val d = docs.toDF("doc_id", "text")
    val n = TieredDedup.cascade(d, emb.toDF("id", "vec"),
      surv => TieredDedup.exactPairsJaccard(surv, tau = 0.4),
      tauSem = 0.9, semNList = 1).count()
    assert(n === docs.size)
  }

  test("tier 1 exact: byte-identical text removed with group-min keeper") {
    assert(verdict(2L) === (("exact", Some(1L))))
    // 7's exact keeper is 3 — the group min — even though 3 itself is
    // then removed at tier 2. dup_of is the tier-local keeper, not the
    // transitive root (the cascade records provenance, not closure).
    assert(verdict(7L) === (("exact", Some(3L))))
  }

  test("tier 2 near: shingle-Jaccard dup clustered to the component min") {
    assert(verdict(3L) === (("near", Some(1L))))
  }

  test("tier 3 semantic: cosine dup of a lower-id survivor") {
    assert(verdict(4L) === (("semantic", Some(1L))))
  }

  test("precedence: a near-removed doc never reaches the semantic tier") {
    // 3's embedding is IDENTICAL to 1's (cos = 1 ≥ tauSem), so if tier 3
    // saw doc 3 it would tag it semantic; the cascade must tag it near.
    assert(verdict(3L)._1 === "near")
  }

  test("degrade paths: survivors stay kept — with or without an embedding") {
    assert(verdict(1L) === (("kept", None))) // has an embedding, no dup
    assert(verdict(6L) === (("kept", None))) // orthogonal embedding
    assert(verdict(5L) === (("kept", None))) // NO embedding row at all
  }

  test("deterministic under repartitioning") {
    assert(run(3) === verdict)
    assert(run(16) === verdict)
  }
}
