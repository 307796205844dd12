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
}
