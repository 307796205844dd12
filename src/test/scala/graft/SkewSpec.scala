package graft

import org.apache.spark.sql.functions._

/** Skew handling evidence (SURVEY.md §4.2.1–2, M5): a duplicate-heavy
  * corpus drives hot LSH buckets; the salted two-phase cap must bound
  * task-local bucket materialization and pair fan-out without losing the
  * pairs that matter.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = DedupConfig()

  /** one pathological cluster: `n` rows with IDENTICAL captions — every
    * LSH band maps all of them into the same bucket.
    */
  private def hotCorpus(n: Int): org.apache.spark.sql.DataFrame = {
    (0 until n).map { i =>
      (f"hot$i%05d", f"identical caption for every single row here no42", 1000L + i)
    }.toDF("image_id", "caption", "phash")
  }

  test("bucket stats expose the hot bucket and count overflow") {
    val sigs = Signatures.signatures(hotCorpus(600), cfg)
    val stats = Lsh.bucketStats(Lsh.bands(sigs, cfg), cfg).collect()(0)
    assert(stats.getAs[Long]("max_bucket") == 600L)
    // all 42 band buckets hold 600 > cap → all overflow, and it is VISIBLE
    assert(stats.getAs[Long]("overflow_buckets") == cfg.bands.toLong)
  }

  test("pair fan-out is capped at cap^2/2 per bucket, not n^2") {
    val n = 600 // without caps: 600²/2 = 180k pairs per band
    val sigs = Signatures.signatures(hotCorpus(n), cfg)
    val pairs = Lsh.lshCandidates(Lsh.bands(sigs, cfg), cfg)
    val got = pairs.count()
    val capPairs = cfg.bucketCap.toLong * (cfg.bucketCap - 1) / 2
    assert(got <= capPairs, s"$got pairs exceeds the per-bucket cap bound $capPairs")
    assert(got == capPairs, s"identical captions → all bands keep the same capped id set")
  }

  test("bucket-cap overflow is observable on the uncheckpointed path (W2)") {
    // the census Observation aggregates drop counts as the candidate plan
    // executes — no extra job, and a recall-affecting cap is never silent
    val obs = new org.apache.spark.sql.Observation()
    val sigs = Signatures.signatures(hotCorpus(600), cfg)
    Lsh.lshCandidates(Lsh.bands(sigs, cfg), cfg, census = Some(obs)).count()
    val m = obs.get
    assert(m("overflow_buckets").asInstanceOf[Long] == cfg.bands.toLong)
    assert(m("max_bucket").asInstanceOf[Long] == 600L)
    assert(m("dropped_ids").asInstanceOf[Long] ==
      cfg.bands.toLong * (600 - cfg.bucketCap))
  }

  test("span-pass fingerprint-bucket overflow is observable (W2)") {
    // identical long captions → every doc emits the same winnow
    // fingerprints; with a tiny cap the bucket overflows and the census
    // must surface it (BoundedMinRows previously had no seen-counter, so
    // span-path drops were the one silent cap left in the engine)
    val small = cfg.copy(bucketCap = 8)
    val docs = (0 until 30).map { i =>
      (i.toLong, "an identical rather long caption shared by every row of this fixture")
    }.toDF("id", "norm")
    val obs = new org.apache.spark.sql.Observation()
    SuffixPass.spanCandidates(docs, small, census = Some(obs)).count()
    val m = obs.get
    assert(m("max_bucket").asInstanceOf[Long] == 30L)
    assert(m("overflow_buckets").asInstanceOf[Long] > 0L)
    val nFp = m("n_buckets").asInstanceOf[Long]
    assert(m("dropped_ids").asInstanceOf[Long] == nFp * (30 - 8))
  }

  test("salting is a pure repartition: capped set is deterministic") {
    val sigs = Signatures.signatures(hotCorpus(300), cfg)
    val p1 = Lsh.lshCandidates(Lsh.bands(sigs, cfg), cfg)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val p2 = Lsh.lshCandidates(Lsh.bands(sigs, cfg).repartition(7), cfg)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(p1 == p2, "input partitioning must not change the candidate set")
  }

  test("moderate clusters below the cap lose nothing") {
    // 20 clusters of 40 identical captions each, with DISJOINT per-cluster
    // vocabularies (no shared 5-grams across clusters) — under cap, all
    // within-cluster pairs kept and no cross-cluster pairs appear
    val rows = (0 until 20).flatMap { c =>
      // every character of cluster c's caption is its own letter, so no
      // 5-gram (even spanning token boundaries) is shared across clusters
      val ch = ('a' + c).toChar
      val caption = (0 until 8).map(w => s"$ch$ch$ch$ch${('a' + w).toChar}$ch").mkString(" ")
      (0 until 40).map(i => (f"c$c%02d-$i%03d", caption, c * 100L + i))
    }.toDF("image_id", "caption", "phash")
    val sigs = Signatures.signatures(rows, cfg)
    val pairs = Lsh.lshCandidates(Lsh.bands(sigs, cfg), cfg).count()
    assert(pairs == 20L * (40 * 39 / 2), s"got $pairs")
  }

  // ---- T49: cross-corpus candidates (A×B linkage) ----

  /** Two-sided corpus: ids encode the side (A = 100+, B = 200+). Captions
    * with the same cluster letter are identical across sides; each side
    * also carries a unique singleton.
    */
  private def twoSided(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    def cap(c: Char) = (0 until 8).map(w => s"$c$c$c$c${('a' + w).toChar}$c").mkString(" ")
    val a = Seq(
      ("a-0", cap('x'), 100L), ("a-1", cap('y'), 101L), ("a-2", cap('q'), 102L))
      .toDF("image_id", "caption", "phash")
    val b = Seq(
      ("b-0", cap('x'), 200L), ("b-1", cap('y'), 201L), ("b-2", cap('z'), 202L))
      .toDF("image_id", "caption", "phash")
    (a, b)
  }

  test("crossCandidates finds A×B matches, oriented (a in A, b in B), no within-side pairs") {
    val (a, b) = twoSided()
    val sa = Signatures.signatures(a, cfg).select(col("id"), col("minhash"))
    val sb = Signatures.signatures(b, cfg).select(col("id"), col("minhash"))
    val aIds = sa.select("id").as[Long].collect().toSet
    val bIds = sb.select("id").as[Long].collect().toSet
    val pairs = Lsh.crossCandidates(Lsh.bands(sa, cfg), Lsh.bands(sb, cfg), cfg)
      .as[(Long, Long)].collect().toSet
    // identical captions collide in every band: both planted cross pairs found
    assert(pairs.size == 2, s"got $pairs")
    pairs.foreach { case (x, y) =>
      assert(aIds.contains(x) && bIds.contains(y),
        s"pair ($x,$y) not oriented A->B")
    }
  }

  test("crossCandidates caps both sides and censuses overflow on co-occupied buckets") {
    val hotA = hotCorpus(300)
    val hotB = (0 until 300).map { i =>
      (f"bh$i%05d", f"identical caption for every single row here no42", 5000L + i)
    }.toDF("image_id", "caption", "phash")
    val sa = Signatures.signatures(hotA, cfg).select(col("id"), col("minhash"))
    val sb = Signatures.signatures(hotB, cfg).select(col("id"), col("minhash"))
    val obs = new org.apache.spark.sql.Observation()
    val got = Lsh.crossCandidates(Lsh.bands(sa, cfg), Lsh.bands(sb, cfg), cfg,
      census = Some(obs)).count()
    val capSq = cfg.bucketCap.toLong * cfg.bucketCap
    assert(got <= capSq, s"$got cross pairs exceeds the cap² bound $capSq")
    assert(got == capSq, "identical captions → every band keeps the same capped sets")
    val m = obs.get
    assert(m("dropped_ids").asInstanceOf[Long] > 0L, "overflow must be censused")
    assert(m("max_bucket").asInstanceOf[Long] == 300L)
  }

  test("crossCandidates is independent of input partitioning") {
    val (a, b) = twoSided()
    val sa = Signatures.signatures(a, cfg).select(col("id"), col("minhash"))
    val sb = Signatures.signatures(b, cfg).select(col("id"), col("minhash"))
    val p1 = Lsh.crossCandidates(Lsh.bands(sa, cfg), Lsh.bands(sb, cfg), cfg)
      .as[(Long, Long)].collect().toSet
    val p2 = Lsh.crossCandidates(Lsh.bands(sa.repartition(7), cfg),
        Lsh.bands(sb.repartition(3), cfg), cfg)
      .as[(Long, Long)].collect().toSet
    assert(p1 == p2)
  }
}
