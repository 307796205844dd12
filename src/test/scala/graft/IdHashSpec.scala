package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Internal-id collision repair (IdHash): the 10¹² envelope where
  * xxhash64 collisions are certain. Forced here with a deliberately
  * narrow test hash (mod-N) — production code paths, toy hash width.
  */
class IdHashSpec extends SparkSpec {
  import spark.implicits._

  // 40 ids into 64 buckets: birthday guarantees first-round collisions,
  // but the space is wide enough for the salt loop to converge
  private val narrowBase: Column => Column = c => pmod(xxhash64(c), lit(64))
  private val narrowSalted: (Column, Column) => Column =
    (c, s) => pmod(xxhash64(c, s), lit(64))

  private def ids(n: Int) = (0 until n).map(i => f"img$i%04d").toDF("image_id")

  test("no repairs needed when the hash is injective (common case)") {
    assert(IdHash.buildRepairs(ids(500)).isEmpty)
  }

  test("narrow hash: repair converges to a globally injective id map") {
    val corpus = ids(40)
    val repairs = IdHash.buildRepairs(corpus, maxRounds = 16, narrowBase, narrowSalted)
    assert(repairs.nonEmpty, "40 ids in 64 buckets must collide at round 1")
    val assigned = IdHash.withId(corpus, "image_id", "id", repairs, narrowBase, narrowSalted)
    val n = assigned.select("id").distinct().count()
    assert(n == 40L, s"ids not injective after repair: $n distinct of 40")
  }

  test("duplicated image_ids fail fast with the real cause") {
    val corpus = ids(20).union(ids(3)) // img0000..0002 duplicated
    val e = intercept[IllegalArgumentException] {
      IdHash.buildRepairs(corpus) // full-width hash: only true dups collide
    }
    assert(e.getMessage.contains("duplicate image_ids"), e.getMessage)
    assert(e.getMessage.contains("img0000"), e.getMessage)
  }

  test("repair is deterministic across builds") {
    val corpus = ids(40)
    def build() = IdHash
      .buildRepairs(corpus, maxRounds = 16, narrowBase, narrowSalted).get
      .orderBy("image_id").as[(String, Long)].collect().toSeq
    assert(build() == build())
  }

  test("unrepaired ids hash identically with and without a repair table") {
    val corpus = ids(40)
    val repairs = IdHash.buildRepairs(corpus, maxRounds = 16, narrowBase, narrowSalted)
    val repairedIds = repairs.get.select("image_id").as[String].collect().toSet
    val withR = IdHash.withId(corpus, "image_id", "id", repairs, narrowBase, narrowSalted)
      .where(!col("image_id").isInCollection(repairedIds))
      .orderBy("image_id").as[(String, Long)].collect().toSeq
    val withoutR = IdHash.withId(corpus, "image_id", "id", None, narrowBase, narrowSalted)
      .where(!col("image_id").isInCollection(repairedIds))
      .orderBy("image_id").as[(String, Long)].collect().toSeq
    assert(withR == withoutR)
  }

  test("plan shape: no repairs ⇒ pure projection; repairs ⇒ one broadcast join") {
    val corpus = ids(100)
    val none = IdHash.withId(corpus, "image_id", "id", None)
      .queryExecution.executedPlan.toString
    assert(!none.contains("Join") && !none.contains("Exchange"),
      s"no-repair withId must fuse into the enclosing projection:\n$none")
    val repairs = Some(ids(2).withColumn("salt", lit(1L)))
    val some = IdHash.withId(corpus, "image_id", "id", repairs)
      .queryExecution.executedPlan.toString
    assert(some.contains("BroadcastHashJoin"), s"repair join must broadcast:\n$some")
    assert(!some.contains("ShuffleExchange") && !some.contains("SortMergeJoin"),
      s"repair path must not shuffle the corpus:\n$some")
  }

  test("stress: hundreds of colliders converge within the default round budget") {
    // 20k ids into 2^20 buckets ≈ 190 expected colliding pairs (birthday:
    // n²/2m) — the same ~percent-scale collision density the 10¹² target
    // produces against 2^64, ~400 repaired ids instead of 2. Default
    // maxRounds=8 must absorb it (expected ~3 rounds: each round
    // re-scatters only the shrinking collider set).
    val m = 1 << 20
    val base: Column => Column = c => pmod(xxhash64(c), lit(m))
    val salted: (Column, Column) => Column = (c, s) => pmod(xxhash64(c, s), lit(m))
    val corpus = ids(20000)
    val repairs = IdHash.buildRepairs(corpus, base = base, salted = salted)
    assert(repairs.nonEmpty, "expected ~190 colliding pairs at this density")
    val nRepaired = repairs.get.count()
    assert(nRepaired < 2000, s"repaired set should be a small minority: $nRepaired")
    val distinct = IdHash.withId(corpus, "image_id", "id", repairs, base, salted)
      .select("id").distinct().count()
    assert(distinct == 20000L, s"ids not injective after repair: $distinct")
  }

  test("incremental: new-batch collisions repaired against the committed space") {
    // committed corpus of 30 ids under the narrow hash (repaired to an
    // injective 30-id space), then a 10-id batch arrives: birthday at
    // 40/64 guarantees hits both within the batch and against history
    val hist = ids(30)
    val histRepairs = IdHash.buildRepairs(hist, maxRounds = 16, narrowBase, narrowSalted)
    val histIds = IdHash.withId(hist, "image_id", "id", histRepairs, narrowBase, narrowSalted)
      .select("id")
    val batch = (30 until 40).map(i => f"img$i%04d").toDF("image_id")
    val combined = IdHash.buildRepairsIncremental(
      batch, Some(histIds), histRepairs, maxRounds = 16, narrowBase, narrowSalted)
    // repairs only ever touch NEW rows: committed ids must not change
    val histSet = hist.as[String].collect().toSet
    val newlyRepaired = combined.toSeq.flatMap(_.as[(String, Long)].collect())
      .filterNot(r => histRepairs.toSeq.flatMap(_.as[(String, Long)].collect()).contains(r))
    assert(newlyRepaired.forall(r => !histSet.contains(r._1)),
      s"incremental repair salted a committed row: $newlyRepaired")
    // the combined map is injective over the accumulated corpus
    val all = hist.union(batch)
    val n = IdHash.withId(all, "image_id", "id", combined, narrowBase, narrowSalted)
      .select("id").distinct().count()
    assert(n == 40L, s"ids not injective after incremental repair: $n distinct of 40")
  }

  test("incremental: no collisions ⇒ committed repairs pass through unchanged") {
    val hist = ids(100)
    val histIds = IdHash.withId(hist, "image_id", "id", None).select("id")
    val batch = (100 until 120).map(i => f"img$i%04d").toDF("image_id")
    // full-width hash: nothing collides; no committed repairs → None
    assert(IdHash.buildRepairsIncremental(batch, Some(histIds), None).isEmpty)
    // committed repairs ride through untouched when the batch is clean
    val prior = Some(ids(2).withColumn("salt", lit(3L)))
    val out = IdHash.buildRepairsIncremental(batch, Some(histIds), prior)
    assert(out.get.orderBy("image_id").as[(String, Long)].collect().toSeq ==
      prior.get.orderBy("image_id").as[(String, Long)].collect().toSeq)
  }

  test("incremental == batch on the same accumulated corpus (injectivity)") {
    // the two paths may salt different victims of a colliding pair, but
    // both must yield an injective map over the same 40-id corpus
    val hist = ids(25)
    val batch = (25 until 40).map(i => f"img$i%04d").toDF("image_id")
    val all = hist.union(batch)
    val batchRepairs = IdHash.buildRepairs(all, maxRounds = 16, narrowBase, narrowSalted)
    val histRepairs = IdHash.buildRepairs(hist, maxRounds = 16, narrowBase, narrowSalted)
    val histIds = IdHash.withId(hist, "image_id", "id", histRepairs, narrowBase, narrowSalted)
      .select("id")
    val incRepairs = IdHash.buildRepairsIncremental(
      batch, Some(histIds), histRepairs, maxRounds = 16, narrowBase, narrowSalted)
    for ((label, r) <- Seq("batch" -> batchRepairs, "incremental" -> incRepairs)) {
      val n = IdHash.withId(all, "image_id", "id", r, narrowBase, narrowSalted)
        .select("id").distinct().count()
      assert(n == 40L, s"$label path not injective: $n distinct of 40")
    }
  }

  test("pipeline stages agree on repaired ids end-to-end") {
    // a REAL repair table flowing through signatures → verify → CC: fake
    // two colliding ids by building repairs under the narrow hash, then
    // check the pipeline's cluster output is unchanged vs the no-repair
    // run on the same corpus (ids are internal — the public result must
    // be identical)
    val corpus = Fixtures.corpus(spark, 15).toDF()
    val cfg = DedupConfig()
    // a synthetic repair table covering a few ids: every id-derivation
    // site must apply it consistently, and since ids are internal the
    // PUBLIC clustering must be identical with and without it
    val some = corpus.select(col("image_id")).orderBy("image_id").limit(3)
      .withColumn("salt", lit(7L))
    def runChain(repairs: Option[org.apache.spark.sql.DataFrame]) = {
      val sigs = Signatures.signatures(corpus, cfg, repairs)
      val cands = Lsh.lshCandidates(Lsh.bands(sigs, cfg), cfg)
      val scored = Scoring.filterAndTopK(Scoring.score(cands, sigs, cfg, sigs.count()), cfg)
      val verified = Scoring.verify(scored, corpus, cfg, repairs)
      ConnectedComponents.clusterHashed(
        verified.where(col("is_dup")).select(col("a"), col("b")),
        corpus.select(col("image_id")), repairs = repairs)
        .orderBy("image_id").as[(String, String)].collect().toSeq
    }
    assert(runChain(None) == runChain(Some(some)),
      "repaired internal ids changed the public clustering")
  }
}
