package graft

import org.apache.spark.sql.functions._

/** T29 PII redaction + T30 paragraph-level (token-window) exact dedup. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces every email, IPv4 and phone match") {
    val s = Seq(
      "mail a@b.co and c.d+x@e-f.org from 10.2.3.4 call +1-555-0042 end",
      "no pii here", "", "two ips 1.2.3.4 5.6.7.8").toDF("t")
    val out = s.select(
      Curation.redactPii(col("t")).as("r"),
      Curation.countMatches(col("t"), Curation.EmailPat).as("ne"),
      Curation.countMatches(col("t"), Curation.Ipv4Pat).as("ni"),
      Curation.countMatches(col("t"), Curation.PhonePat).as("np"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ("mail [EMAIL] and [EMAIL] from [IP] call [PHONE] end", 2L, 1L, 1L))
    assert(out(1) == ("no pii here", 0L, 0L, 0L))
    assert(out(2) == ("", 0L, 0L, 0L))
    assert(out(3) == ("two ips [IP] [IP]", 0L, 2L, 0L))
  }

  test("chunkDedup keeper rule: smallest (doc_id, pos) survives, including within-doc repeats") {
    // w=2 chunks: doc 1 = ["a b","c d","a b"]  (within-doc repeat at pos 2)
    //             doc 2 = ["c d","x y"]        (cross-doc repeat at pos 0)
    //             doc 3 = ["z w"]              (unique)
    val docs = Seq(
      (1L, "a b c d a b"), (2L, "c d x y"), (3L, "z w")).toDF("doc_id", "text")
    val out = Curation.chunkDedup(docs, w = 2).orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_dropped", "clean_len").as[(Long, Long, Long, Long)]
      .collect()
    // doc 1 keeps "a b"(0) and "c d"(1), drops the pos-2 "a b" repeat
    // doc 2 keeps "x y" only ("c d" lost to doc 1's earlier occurrence)
    // doc 3 keeps everything
    assert(out.toSeq == Seq((1L, 3L, 1L, 7L), (2L, 2L, 1L, 3L), (3L, 1L, 0L, 3L)))
  }

  test("chunkDedup clean text is rejoined in chunk order") {
    val docs = Seq((7L, "t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("t1 t2 t3 t4 t5".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val r = Curation.chunkDedup(docs, w = 2).select("clean_hash").as[String].head()
    assert(r == md5hex)
  }

  test("chunkDedup is input-order and partitioning independent") {
    val base = (0L until 200L).map(i => (i, s"w${i % 17} w${i % 5} w${i % 17} w${i % 3} pad$i"))
    val a = Curation.chunkDedup(base.toDF("doc_id", "text").repartition(7), w = 2)
    val b = Curation.chunkDedup(
      scala.util.Random.shuffle(base).toDF("doc_id", "text").repartition(3), w = 2)
    assert(a.orderBy("doc_id").collect().toSeq == b.orderBy("doc_id").collect().toSeq)
  }

  test("chunkDedup handles empty and whitespace-only text") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "only one")).toDF("doc_id", "text")
    val out = Curation.chunkDedup(docs, w = 8).orderBy("doc_id")
      .select("doc_id", "n_chunks").as[(Long, Long)].collect()
    // empty docs report zero chunks but STAY in the output — the one-row-
    // per-doc contract (input-vs-output accounting must be exact)
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 1L)))
  }

  test("lineDedup removes a >=minDf line from EVERY doc, keeps low-DF lines") {
    // CCNet rule: ubiquity, not precedence — the first doc loses the
    // boilerplate too (the distinction from chunkDedup's keep-first rule)
    val docs = (0L until 6L).map { i =>
      val shared = if (i < 2) Seq("common tail") else Seq.empty
      (i, Seq("cookie banner", s"unique body $i") ++ shared)
    }.toDF("doc_id", "lines")
    val got = Curation.lineDedup(docs, minDf = 5)
      .select("doc_id", "n_lines", "n_kept", "clean_len")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    got.foreach { case (id, nLines, nKept, cleanLen) =>
      assert(nLines == (if (id < 2) 3L else 2L))
      assert(nKept == nLines - 1, s"doc $id: banner (df=6) must drop")
      assert(cleanLen > 0) // unique body survives in every doc
    }
    // df=2 < minDf: "common tail" kept in both its docs
    val clean01 = Curation.lineDedup(docs, minDf = 5)
      .where(col("doc_id") < 2).select("n_kept").as[Long].collect()
    assert(clean01.forall(_ == 2L))
  }

  test("lineDedup is partition-independent and order-rebuilds survivors") {
    val docs = Seq(
      (1L, Seq("z last", "boiler", "a first")),
      (2L, Seq("boiler", "mid")),
      (3L, Seq("boiler")), (4L, Seq("boiler")), (5L, Seq("boiler")))
      .toDF("doc_id", "lines")
    def run(parts: Int) = Curation.lineDedup(docs.repartition(parts), minDf = 5)
      .select("doc_id", "n_kept", "clean_hash")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(run(2) == run(7))
    // doc 1 survivors rejoin in POSITION order (z before a), not sorted
    val h = run(2).head._3
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("z last | a first".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h == expected)
    // doc 3–5: all lines were boilerplate → empty survivor text, doc kept
    assert(run(2).count(_._2 == 0L) == 3)
  }

  test("ngramNovelty: first occurrence 1.0, verbatim copy 0.0, partial overlap in between") {
    val a = "the quick brown fox jumps over the lazy dog again and again tonight"
    val c = "completely different content describing distributed analytics engines"
    val docs = Seq(
      (10L, a),                                  // all grams first-seen here
      (20L, a),                                  // verbatim copy → nothing novel
      (30L, c),                                  // unrelated → all novel
      (40L, a + " with an extra novel tail of fresh text")) // shared prefix grams
      .toDF("doc_id", "text")
    val out = Curation.ngramNovelty(docs).orderBy("doc_id")
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(10L, 20L, 30L, 40L))
    assert(out(0)._4 == 1.0 && out(0)._2 == out(0)._3)
    assert(out(1)._4 == 0.0 && out(1)._3 == 0L)
    assert(out(2)._4 == 1.0)
    assert(out(3)._4 > 0.0 && out(3)._4 < 1.0, s"expected fractional, got ${out(3)._4}")
  }

  test("ngramNovelty excludes docs under k normalized chars and is partition-independent") {
    val base = (0L until 100L).map(i =>
      (i, if (i % 10 == 0) "tiny" else s"document number ${i % 7} carrying enough text to shingle properly"))
    val a = Curation.ngramNovelty(base.toDF("doc_id", "text").repartition(5))
    val b = Curation.ngramNovelty(
      scala.util.Random.shuffle(base).toDF("doc_id", "text").repartition(9))
    val as = a.orderBy("doc_id").collect().toSeq
    assert(as == b.orderBy("doc_id").collect().toSeq)
    // the 10 "tiny" docs are excluded entirely
    assert(as.size == 90 && !as.exists(_.getLong(0) % 10 == 0))
    // the 7 templates differ in ONE char, so they share most 24-grams:
    // each template's first occurrence (docs 1–7; doc 0 is "tiny") has
    // SOME novel grams around the differing char, every later repeat is
    // a verbatim copy and scores exactly 0.
    val firsts = Set(1L, 2L, 3L, 4L, 5L, 6L, 7L)
    as.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      if (firsts(r.getLong(0))) assert(nov > 0.0, s"doc ${r.getLong(0)}")
      else assert(nov == 0.0, s"doc ${r.getLong(0)} scored $nov")
    }
  }

  test("sourceBalance keeps exactly cap per source, best-quality first, doc_id tiebreak") {
    // src A: 4 docs, two with identical quality (tiebreak on doc_id);
    // src B: 2 docs (under cap — all kept)
    val docs = Seq(
      (1L, "aaaa bbbb", "A"),   // alpha 8/9 = 0.8889
      (2L, "aaaa 1234", "A"),   // alpha 4/9 = 0.4444
      (3L, "cccc dddd", "A"),   // alpha 0.8889 — ties doc 1, loses to it on id
      (4L, "12 34", "A"),       // alpha 0
      (10L, "xy zw", "B"), (11L, "11 22", "B"))
      .toDF("doc_id", "text", "source")
    val out = Curation.sourceBalance(docs, cap = 2).orderBy("source", "rk")
      .select("doc_id", "source", "rk").as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "A", 1L), (3L, "A", 2L), (10L, "B", 1L), (11L, "B", 2L)))
  }

  test("sourceBalance is partition- and input-order independent") {
    val base = (0L until 200L).map(i =>
      (i, s"document ${i % 13} with text payload ${"x" * (i % 7).toInt}", s"s${i % 5}"))
    val a = Curation.sourceBalance(
      base.toDF("doc_id", "text", "source").repartition(7))
    val b = Curation.sourceBalance(
      scala.util.Random.shuffle(base).toDF("doc_id", "text", "source").repartition(3))
    assert(a.orderBy("source", "rk").collect().toSeq ==
      b.orderBy("source", "rk").collect().toSeq)
    assert(a.groupBy("source").count().collect().forall(_.getLong(1) <= 10))
  }

  test("gopherFilter: each rule fires on its designed violation, clean doc passes") {
    // 3 stopwords + 30 distinct-ish 9-letter words: 33 tokens,
    // alpha 276/308 = 0.8961, stopword 3/33, mean tok len 8.36, max_tf 2
    val clean = (Seq("the", "a", "of") ++
      (1 to 30).map(i => "wordy" + ('a' to 'z')(i % 26) + "xyz")).mkString(" ")
    val docs = Seq(
      (1L, clean),
      (2L, "short doc"),                                        // n_tokens < 30
      (3L, (1 to 35).map(i => s"num${i}99999").mkString(" ")),  // alpha ~0.27
      (4L, ("spam " * 40).trim))                                // top-token 1.0
      .toDF("doc_id", "text")
    val out = Curation.gopherFilter(docs).orderBy("doc_id")
      .select("doc_id", "keep", "ok_tokens", "ok_alpha", "ok_repetition")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(out(0) == ((1L, true, true, true, true)))
    assert(!out(1)._3 && !out(1)._2)                   // doc 2: token rule fails
    assert(!out(2)._4 && !out(2)._2)                   // doc 3: alpha rule fails
    assert(!out(3)._5 && !out(3)._2)                   // doc 4: repetition rule fails
  }

  test("lmCrossEntropy matches the hand-computed add-one bigram LM") {
    // corpus: doc1 = "a b a b", doc2 = "a b", doc3 = "x" (1 token → excluded)
    // c1: a=3 b=3; V=2; c2: (a,b)=3 (b,a)=1
    // nll(a,b) = ln((3+2)/(3+1)) = ln 1.25; nll(b,a) = ln((3+2)/(1+1)) = ln 2.5
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = Curation.lmCrossEntropy(docs).orderBy("doc_id")
      .select("doc_id", "n_bigrams", "cross_entropy", "ppl")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    val ce1 = (2 * math.log(1.25) + math.log(2.5)) / 3
    assert(out(0)._2 == 3L)
    assert(out(0)._3 == BigDecimal(ce1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(0)._4 == BigDecimal(math.exp(ce1)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(1)._2 == 1L && out(1)._3 == 0.2231 && out(1)._4 == 1.25)
  }

  test("lmCrossEntropy ranks gibberish above natural repetition and is partition-independent") {
    // 60 docs from 3 repeated templates (low ppl) + 6 one-off token-salad
    // docs (every bigram unique → max smoothing penalty, high ppl)
    val common = (0L until 60L).map(i =>
      (i, s"the cat sat on the mat ${i % 3} and purred softly"))
    val rare = (100L until 106L).map(i =>
      (i, s"zq${i} vx${i * 7} kj${i * 13} wp${i * 31} bn${i * 57}"))
    val base = common ++ rare
    val a = Curation.lmCrossEntropy(base.toDF("doc_id", "text").repartition(7))
      .orderBy("doc_id").collect().toSeq
    val b = Curation.lmCrossEntropy(
      scala.util.Random.shuffle(base).toDF("doc_id", "text").repartition(3))
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "LM scores must not depend on partitioning or input order")
    val ppl = a.map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
    val maxCommon = common.map(c => ppl(c._1)).max
    val minRare = rare.map(c => ppl(c._1)).min
    assert(minRare > maxCommon,
      s"gibberish ppl $minRare should exceed template ppl $maxCommon")
  }

  test("imageMetaFilter: each gate fires on its designed violation, clean row passes") {
    val rows = Seq(
      // (id, w, h, n_bytes, caption)             violates
      ("ok", 640, 480, 640L * 480 * 3, "a clear photo of a dog"), // nothing
      ("small", 32, 100, 32L * 100 * 3, "a clear photo of a dog"), // ok_size
      ("sliver", 2000, 400, 2000L * 400 * 3, "a clear photo"), // ok_aspect
      ("trunc", 640, 480, 10L, "a clear photo of a dog"), // ok_bpp low
      ("bomb", 640, 480, 640L * 480 * 2000, "a clear photo"), // ok_bpp high
      ("nocap", 640, 480, 640L * 480 * 3, "hi y"), // ok_caption (4 chars, 2 toks)
      ("onetok", 640, 480, 640L * 480 * 3, "x" * 40) // ok_cap_toks
    ).toDF("image_id", "w", "h", "n_bytes", "caption")
    val out = Curation.imageMetaFilter(rows)
      .select("image_id", "ok_size", "ok_aspect", "ok_bpp", "ok_caption",
        "ok_cap_toks", "keep")
      .as[(String, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("ok") == ("ok", true, true, true, true, true, true))
    assert(out("small") == ("small", false, true, true, true, true, false))
    assert(out("sliver") == ("sliver", true, false, true, true, true, false))
    assert(out("trunc") == ("trunc", true, true, false, true, true, false))
    assert(out("bomb") == ("bomb", true, true, false, true, true, false))
    assert(out("nocap") == ("nocap", true, true, true, false, true, false))
    assert(out("onetok") == ("onetok", true, true, true, true, false, false))
  }

  test("imageMetaFilter: null metadata fails its gates instead of vanishing") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("image_id", StringType), StructField("w", IntegerType),
      StructField("h", IntegerType), StructField("n_bytes", LongType),
      StructField("caption", StringType)))
    val rows = spark.createDataFrame(java.util.Arrays.asList(
      Row("ok", 640, 480, 640L * 480 * 3, "a clear photo of a dog"),
      Row("nullcap", 640, 480, 640L * 480 * 3, null),
      Row("nullw", null, 480, 10L, "a clear photo of a dog")), schema)
    val out = Curation.imageMetaFilter(rows).cache()
    // keep is never NULL: kept + dropped must account for every row
    assert(out.filter(col("keep")).count() +
      out.filter(!col("keep")).count() == 3)
    val m = out.select("image_id", "ok_size", "ok_caption", "ok_cap_toks", "keep")
      .as[(String, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(m("ok") == ("ok", true, true, true, true))
    assert(m("nullcap") == ("nullcap", true, false, false, false))
    assert(m("nullw") == ("nullw", false, true, true, false))
    out.unpersist()
  }

  test("imageMetaFilter runs on the real fixture corpus (n_bytes = file size)") {
    // keep must equal the rule conjunction row-by-row, ok_size must be
    // exactly the 64-px side floor, and the gate must genuinely split
    // the corpus (base fixtures are 32–80 px; some variants upscale past
    // the floor, so both outcomes occur).
    val imgs = Fixtures.corpus(spark, 20).toDF()
      .withColumn("n_bytes", length(col("bytes")).cast("long"))
    val out = Curation.imageMetaFilter(imgs).cache()
    assert(out.filter(col("ok_size") =!=
      (least(col("w"), col("h")) >= 64)).count() == 0)
    assert(out.filter(col("keep") =!= (col("ok_size") && col("ok_aspect") &&
      col("ok_bpp") && col("ok_caption") && col("ok_cap_toks"))).count() == 0)
    assert(out.filter(col("keep")).count() > 0)
    assert(out.filter(!col("keep")).count() > 0)
    // real encoded bytes sit inside the plausibility band: bpp gate passes
    assert(out.filter(!col("ok_bpp")).count() == 0)
    out.unpersist()
  }

  test("clusterRepresentatives: keeper = (len desc, doc_id asc), one hash-agg") {
    val clusters = Seq((10L, 1L), (11L, 1L), (12L, 1L), (20L, 2L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq(
      (10L, "short"), (11L, "nine ch x"), (12L, "nine ch y"), (20L, "solo"))
      .toDF("doc_id", "text")
    val out = Curation.clusterRepresentatives(clusters, docs)
      .orderBy("cluster_id")
      .select("cluster_id", "rep_id", "rep_len", "n_members")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // cluster 1: docs 11 and 12 tie at len 9 -> lower id 11 wins
    assert(out == Seq((1L, 11L, 9L, 3L), (2L, 20L, 4L, 1L)))
    // scale shape: hash aggregation only — no window, and no silent
    // SortAggregate fallback (max over a struct buffer plans as one)
    val plan = Curation.clusterRepresentatives(clusters, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "keeper must be an aggregate, not a window")
    assert(!plan.contains("SortAggregate"),
      "keeper aggs must stay hash-based (primitive buffers only)")
  }

  test("clusterRepresentatives is partition- and input-order independent") {
    val n = 200
    val docs = Seq.tabulate(n)(i =>
      (i.toLong, "t" * (1 + (i * 31) % 97))).toDF("doc_id", "text")
    val clusters = Seq.tabulate(n)(i => (i.toLong, (i % 17).toLong))
      .toDF("doc_id", "cluster_id")
    val a = Curation.clusterRepresentatives(clusters, docs)
    val b = Curation.clusterRepresentatives(
      clusters.orderBy(col("doc_id").desc).repartition(13),
      docs.repartition(7))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("clusterSplit: cluster members share a split, so near-dups never straddle") {
    val clusters = Seq.tabulate(300)(i => (i.toLong, (i % 60).toLong))
      .toDF("doc_id", "cluster_id")
    val out = Curation.clusterSplit(clusters).cache()
    assert(out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") =!= 1).count() == 0)
    // 60 clusters is enough for all three splits to be populated
    assert(out.select("split").distinct().count() == 3)
    // bucket is the engine's mix64 of the cluster id (shared SQL twin)
    assert(out.filter(col("bucket") =!=
      pmod(graft.functions.GraftFunctions.mix64Col(col("cluster_id")),
        lit(10L))).count() == 0)
    // split is a pure function of cluster_id: re-running under different
    // partitioning moves nothing
    val again = Curation.clusterSplit(clusters.repartition(13))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("clusterChurn on planted assignments: moved/split/merged counted exactly") {
    // old: {1,2,3}=c1  {4,5}=c2  {6}=c6
    // new: {1,2}=c1    {3}=c3    {4,5,6}=c4
    // -> old c1 SPLIT across {c1,c3}; new c4 MERGED from {c2,c6};
    //    docs 3,4,5,6 changed label (min-id labels comparable by design)
    val oldC = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 6L))
      .toDF("doc_id", "cluster_id")
    val newC = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("doc_id", "cluster_id")
    val r = Curation.clusterChurn(oldC, newC)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((6L, 4L, 3L, 3L, 1L, 1L)))
    // identical assignments -> zero churn
    val z = Curation.clusterChurn(oldC, oldC)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(z == ((6L, 0L, 3L, 3L, 0L, 0L)))
  }

  test("hammingDecontaminate: exact radius semantics against a reference set") {
    val cfg = DedupConfig(simhashMaxHamming = 5)
    val corpus = Seq((1L, 0L), (2L, 31L), (3L, 63L), (4L, -1L),
      (5L, (1L << 40) | (1L << 20))).toDF("id", "simhash")
    val refs = Seq((100L, 0L), (101L, 3L)).toDF("id", "simhash")
    val out = Curation.hammingDecontaminate(corpus, refs, cfg)
      .select("id", "min_hamming", "n_refs", "contaminated")
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    // hand popcounts: 31^0=5 (the ≤h boundary), 31^3=28→3, 63^0=6 (out),
    // 63^3=60→4, r5 vs 0 → 2, r5 vs 3 → 4
    assert(out(1L) == ((0L, 2L, true)))
    assert(out(2L) == ((3L, 2L, true)))
    assert(out(3L) == ((4L, 1L, true)))
    assert(out(4L) == ((-1L, 0L, false)))
    assert(out(5L) == ((2L, 2L, true)))
  }

  test("hammingDecontaminate is partition- and input-order independent") {
    val cfg = DedupConfig(simhashMaxHamming = 3)
    val corpus = Seq.tabulate(400)(i =>
      (i.toLong, Hashing.mix64(i.toLong))).toDF("id", "simhash")
    val refs = Seq.tabulate(40)(i =>
      (1000L + i, Hashing.mix64(i.toLong * 10))).toDF("id", "simhash")
    val a = Curation.hammingDecontaminate(corpus, refs, cfg)
    val b = Curation.hammingDecontaminate(
      corpus.orderBy(col("id").desc).repartition(13), refs.repartition(3), cfg)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("canonicalizeUrl: every normalization rule, one messy URL each") {
    val cases = Seq(
      // case-folding of scheme + host, never of path or params
      "HTTPS://ExAmPlE.com/A/b?X=1" -> "https://example.com/A/b?X=1",
      "http://WWW.site.org/p" -> "http://site.org/p", // www strip
      "http://site.org:80/p" -> "http://site.org/p", // default port http
      "https://site.org:443/p" -> "https://site.org/p", // default port https
      "http://site.org:8080/p" -> "http://site.org:8080/p", // non-default kept
      "https://site.org:80/p" -> "https://site.org:80/p", // :80 NOT https default
      "http://site.org/p/" -> "http://site.org/p", // trailing slash
      "http://site.org/p#sec2" -> "http://site.org/p", // fragment
      "http://site.org/p?b=2&a=1" -> "http://site.org/p?a=1&b=2", // param sort
      "http://site.org/p?a=1&utm_source=x&utm_b=y" -> "http://site.org/p?a=1",
      "http://site.org/p?utm_only=1" -> "http://site.org/p", // all params dropped
      "http://site.org/" -> "http://site.org", // bare root
      "http://site.org" -> "http://site.org")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Curation.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (raw, want) =>
      assert(got(raw) === want, s"canonicalizeUrl($raw)")
    }
  }

  test("urlDedup: variants of one page group together, keeper = min id") {
    val rows = Seq(
      1L -> "HTTP://WWW.site.org:80/x/?b=2&a=1",
      2L -> "http://site.org/x?a=1&b=2&utm_c=z#f",
      3L -> "http://site.org/x?a=1&b=9", // differing param value: own group
      4L -> "https://site.org/x?a=1&b=2") // scheme differs: own group
    val got = Curation.urlDedup(rows.toDF("doc_id", "url"))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getInt(4))).toMap
    assert(got(1L) === ((1L, 0)))
    assert(got(2L) === ((1L, 1)))
    assert(got(3L) === ((3L, 0)))
    assert(got(4L) === ((4L, 0)))
  }

  private def extractOne(html: String,
      minWords: Int = 3, linkNum: Int = 1, linkDen: Int = 3): (Int, Int, String) = {
    val r = Seq(html).toDF("h")
      .select(Curation.extractHtmlText(col("h"), minWords, linkNum, linkDen).as("e"))
      .select(col("e.n_blocks"), col("e.n_kept"), col("e.text")).head()
    (r.getInt(0), r.getInt(1), r.getString(2))
  }

  test("extractHtmlText: each boilerplate rule fires on its designed block") {
    // content survives; nav fails link density; heading fails minWords;
    // script/style/comment content never reaches text
    val (nb, nk, text) = extractOne(
      "<html><head><style>body{x}</style><script>var i=1;</script></head>" +
        "<body><div><a href=\"/\">Home</a> <a href=\"/b\">Blog</a></div>" +
        "<h1>My Title</h1>" +
        "<p>the actual article body text <!-- tracker --> survives here</p>" +
        "<div>Share: <a href=\"/x\">X</a> <a href=\"/f\">FB</a> <a href=\"/i\">IG</a></div>" +
        "</body></html>")
    assert(nb == 5) // 4 closed blocks + the </body></html> tail
    assert(nk == 1)
    assert(text == "the actual article body text survives here")
  }

  test("extractHtmlText: link-density boundary is the exact integer rule") {
    // 1 link / 3 words: 1*3 <= 3*1 -> kept; 1 link / 2 words: dropped by
    // minWords=2? no - use minWords=1 so only density decides
    val keepEdge = extractOne("<p>alpha beta <a href=\"/x\">gamma</a></p>",
      minWords = 1)
    assert(keepEdge._2 == 1 && keepEdge._3 == "alpha beta gamma")
    val dropEdge = extractOne("<p>alpha <a href=\"/x\">gamma</a></p>",
      minWords = 1) // 1 link * 3 > 2 words * 1
    assert(dropEdge._2 == 0 && dropEdge._3 == "")
  }

  test("extractHtmlText: entities decode once, &amp; last (no re-decoding)") {
    val (_, _, text) = extractOne("<p>Q&amp;A: 5 &lt; 7 and &amp;lt; stays literal</p>")
    assert(text == "Q&A: 5 < 7 and &lt; stays literal")
  }

  test("extractHtmlText: multi-line script blocks and empty tails drop cleanly") {
    val (nb, nk, text) = extractOne(
      "<p>real words kept here</p><script>\nline1();\nline2();\n</script><div> </div>")
    assert(nk == 1 && text == "real words kept here")
    assert(nb == 3)
  }

  // ---- T48: linear-probe classifier gate over embeddings ----

  test("probeWeights: deterministic, exactly-representable, in [-1,1)") {
    val w = Curation.probeWeights(64, 9001L)
    assert(w.length == 65)
    assert(w.forall(x => x >= -1.0 && x < 1.0))
    // bit-for-bit recompute from the kernel definition
    (0 to 64).foreach { i =>
      val expect = (Hashing.mix64(9001L + i) >>> 32).toDouble / 2147483648.0 - 1.0
      assert(w(i) == expect)
      // k/2^31 - 1 is exact: scaling back must recover the integer
      assert(((w(i) + 1.0) * 2147483648.0).isWhole)
    }
    assert(w.toSeq != Curation.probeWeights(64, 9002L).toSeq)
  }

  test("linearProbe scores a hand-built head exactly; keep gates the ROUNDED logit") {
    // head: bias 0.5, w = (0.25, -0.5); v1 = (1, 2) -> logit 0.5+0.25-1.0 = -0.25
    //                                    v2 = (2, 0.5) -> 0.5+0.5-0.25 = 0.75
    //                                    v3 = (-2, 0)  -> 0.5-0.5     = 0.0  (boundary)
    val embs = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(2.0f, 0.5f)), (3L, Seq(-2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Curation.linearProbe(embs, Array(0.5, 0.25, -0.5), tau = 0.0)
      .orderBy("vec_id")
      .select("vec_id", "logit", "score", "keep")
      .as[(Long, Double, Double, Boolean)].collect().toSeq
    assert(out.map(_._2) == Seq(-0.25, 0.75, 0.0))
    assert(out.map(_._4) == Seq(false, true, true), "tau boundary row keeps")
    // sigmoid of the rounded logit, rounded
    def sig(z: Double) = math.rint(1.0 / (1.0 + math.exp(-z)) * 1e4) / 1e4
    assert(out.map(_._3) == Seq(sig(-0.25), sig(0.75), sig(0.0)))
  }

  test("linearProbe is a pure row-local projection: no exchange in the plan") {
    val embs = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val plan = Curation.linearProbe(embs, Curation.probeWeights(2, 7L), tau = 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("linearProbe: malformed embeddings are NOT kept and never vanish") {
    val embs = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(1.0f)), // wrong dimension
      (3L, null.asInstanceOf[Seq[Float]])
    ).toDF("vec_id", "embedding")
    val out = Curation.linearProbe(embs, Array(0.0, 1.0, 1.0), tau = 0.0)
    assert(out.count() == 3)
    val kept = out.where(col("keep")).count()
    val dropped = out.where(!col("keep")).count()
    assert(kept + dropped == 3, "kept + dropped must equal input")
    assert(out.where(col("vec_id") =!= 1L && col("keep")).count() == 0,
      "malformed rows must not be kept")
  }

  test("canonicalizeUrl: schemeless/non-authority inputs never merge") {
    val urls = Seq((1L, "example.com/x"), (2L, "mailto:a@b.com"),
      (3L, "tel:+15551234"), (4L, "http://example.com/x"))
      .toDF("doc_id", "url")
    val out = Curation.urlDedup(urls).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out.values.sum == 0,
      "no row may be marked a duplicate across unrelated non-URL inputs")
    val canon = Curation.urlDedup(urls).select("doc_id", "canon_url")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(canon(1L) == "example.com/x" && canon(2L) == "mailto:a@b.com")
  }

  test("canonicalizeUrl: a '?' inside the fragment is not a query") {
    val df = Seq((1L, "http://x.com/p#sec?a=1"), (2L, "http://x.com/p"))
      .toDF("doc_id", "url")
    val c = df.select(Curation.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(c(0) == c(1) && c(0) == "http://x.com/p",
      s"fragment must drop entirely: ${c.toSeq}")
  }

  test("chunkDedup and lineDedup keep one row per doc even for empty docs") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val cd = Curation.chunkDedup(docs, w = 2)
    assert(cd.count() == 3, "empty docs must not vanish")
    val empty = cd.where(col("doc_id") === 2L).head()
    assert(empty.getLong(1) == 0L && empty.getLong(2) == 0L) // n_chunks, n_dropped
    val ld = Curation.lineDedup(
      docs.withColumn("lines",
        filter(split(col("text"), " "), x => x =!= "")), minDf = 2)
    assert(ld.count() == 3)
    assert(ld.where(col("doc_id") === 2L).head().getLong(1) == 0L) // n_lines
  }

  test("extractHtmlText: uppercase markup is stripped and split like lowercase") {
    val html = lit("<HTML><BODY><SCRIPT>var x=1;</SCRIPT>" +
      "<P>real content words here for the block</P>" +
      "<DIV><A HREF=\"/a\">x</A> <A HREF=\"/b\">y</A></DIV></BODY></HTML>")
    val out = spark.range(1)
      .select(Curation.extractHtmlText(html).as("r"))
      .select(col("r.text"), col("r.n_kept")).head()
    assert(!out.getString(0).contains("var x=1"),
      "uppercase SCRIPT content must not leak into extracted text")
    assert(out.getString(0).contains("real content words"),
      "uppercase closing tags must still split and keep the content block")
  }

  test("gopherFilter mean_tok_len is whitespace-robust") {
    val docs = Seq((1L, "  hi   there  "), (2L, "hi there"))
      .toDF("doc_id", "text")
    val m = Curation.gopherFilter(docs)
      .select("doc_id", "mean_tok_len").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 3.5 && m(2L) == 3.5,
      s"irregular whitespace must not inflate token length: $m")
  }
}
