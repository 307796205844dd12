package graft

import org.apache.spark.sql.functions._

/** T52–T54: BM25 retrieval, Jaro-Winkler, record linkage.
  *
  * The Jaro-Winkler cases below were cross-checked against DuckDB's
  * native jaro_winkler_similarity / jaro_similarity (the oracle engine)
  * this session — including the probes that PIN the ambiguous corners of
  * the published definition: floor transposition division
  * ("abczzzz"/"bcazzzz" = 0.952381, not the 0.928571 a k/2.0 half-count
  * would give), the 0.7 boost threshold ("abcdxxxx"/"abcdyyyy" stays at
  * its jaro 2/3), and empty-vs-empty = 0.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, eps: Double = 1e-12): Boolean =
    math.abs(a - b) <= eps

  test("jaro: DuckDB-pinned cases") {
    assert(approx(StringSim.jaro("martha", "marhta"), 0.9444444444444445))
    assert(approx(StringSim.jaro("dixon", "dicksonx"), 0.7666666666666666))
    assert(approx(StringSim.jaro("dwayne", "duane"), 0.8222222222222223))
    assert(approx(StringSim.jaro("crate", "trace"), 0.7333333333333334))
    // floor transposition division (3 mismatch positions -> t = 1)
    assert(approx(StringSim.jaro("abczzzz", "bcazzzz"), 0.9523809523809524))
    // zero-width window: only diagonal matches
    assert(StringSim.jaro("ab", "ba") == 0.0)
    assert(approx(StringSim.jaro("aab", "aba"), 0.5555555555555555))
    assert(approx(StringSim.jaro("abcd", "bcda"), 0.8333333333333334))
    assert(StringSim.jaro("", "") == 0.0)
    assert(StringSim.jaro("", "abc") == 0.0)
    assert(StringSim.jaro("ab", "") == 0.0)
    assert(StringSim.jaro("x", "x") == 1.0)
    assert(StringSim.jaro("abc", "abc") == 1.0)
  }

  test("jaroWinkler: boost, cap, and threshold, DuckDB-pinned") {
    assert(approx(StringSim.jaroWinkler("martha", "marhta"), 0.9611111111111111))
    assert(approx(StringSim.jaroWinkler("dixon", "dicksonx"), 0.8133333333333332))
    assert(approx(StringSim.jaroWinkler("dwayne", "duane"), 0.8400000000000001))
    // jaro 2/3 <= 0.7: the 4-char common prefix must NOT boost
    assert(approx(StringSim.jaroWinkler("abcdxxxx", "abcdyyyy"), 0.6666666666666666))
    assert(approx(StringSim.jaroWinkler("jellyfish", "smellyfish"), 0.8962962962962964))
    assert(approx(StringSim.jaroWinkler("hello world", "hello wrold"), 0.9818181818181818))
    assert(StringSim.jaroWinkler("abc", "abc") == 1.0)
  }

  test("JaroWinklerExpr matches the kernel through codegen") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", ""))
      .toDF("a", "b")
      .select(graft.functions.GraftFunctions.jaroWinklerCol(col("a"), col("b")).as("jw"))
    val got = df.collect().map(_.getDouble(0))
    assert(approx(got(0), 0.9611111111111111))
    assert(approx(got(1), 0.8133333333333332))
    assert(got(2) == 0.0)
  }

  test("bm25TopK: hand-computed scores on a 4-doc corpus") {
    // corpus: dl = 3,3,2,2; query = doc 0's text, self excluded.
    val corpus = Seq(
      (0L, "red apple pie"),
      (1L, "red apple tart"),
      (2L, "green pear"),
      (3L, "apple pie")).toDF("doc_id", "text")
    val qs = corpus.where(col("doc_id") === 0)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val out = Retrieval.bm25TopK(qs, corpus, k = 3, maxDfFrac = 1.0)
      .orderBy("rk").collect()
    // N=4, sum_dl=10, avgdl=2.5. df: red 2, apple 3, pie 2.
    def idf(df: Int) = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def tfn(tf: Int, dl: Int) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl * 4L / 10.0)))
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    // doc 1 matches red+apple (dl 3), doc 3 apple+pie (dl 2), doc 2 none.
    val d1 = r4(idf(2) * tfn(1, 3) + idf(3) * tfn(1, 3))
    val d3 = r4(idf(3) * tfn(1, 2) + idf(2) * tfn(1, 2))
    assert(out.length == 2)
    val byDoc = out.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(approx(byDoc(1L), d1, 1e-9) && approx(byDoc(3L), d3, 1e-9))
    // rank follows the rounded score desc
    val ranked = out.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    assert(ranked == (if (d1 >= d3) Seq(1L, 3L) else Seq(3L, 1L)))
  }

  test("bm25TopK: stopword-fraction drop excludes ubiquitous terms") {
    val corpus = Seq(
      (0L, "the apple"), (1L, "the pear"), (2L, "the plum"),
      (3L, "the fig")).toDF("doc_id", "text")
    val qs = Seq((0L, "the apple")).toDF("qid", "qtext")
    // 'the' has df=4=N > 50%: with only 'apple' scoring, docs 1-3 never match
    val out = Retrieval.bm25TopK(qs, corpus, k = 10, maxDfFrac = 0.5)
    assert(out.count() == 0)
    // raising the fraction readmits 'the' and the other docs appear
    val all = Retrieval.bm25TopK(qs, corpus, k = 10, maxDfFrac = 1.0)
    assert(all.count() == 3)
  }

  test("bm25TopK: partition-count independence") {
    val corpus = (0L until 60L)
      .map(i => (i, s"tok${i % 7} tok${i % 11} tok${i % 13} filler$i"))
      .toDF("doc_id", "text")
    val qs = corpus.where(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val a = Retrieval.bm25TopK(qs, corpus, 5).orderBy("qid", "rk").collect().toSeq
    val b = Retrieval.bm25TopK(qs.repartition(7), corpus.repartition(5), 5)
      .orderBy("qid", "rk").collect().toSeq
    assert(a == b)
  }

  test("linkCandidates: near-identical doc matches, unrelated does not") {
    graft.functions.GraftFunctions.register(spark)
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (2L, "completely different subject matter entirely unrelated content here"),
      (3L, "quick brown foxes jump over lazy dogs by the river bank")
    ).toDF("doc_id", "text")
    val qs = corpus.where(col("doc_id") === 0)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val out = Retrieval.linkCandidates(qs, corpus, k = 5, maxDfFrac = 1.0)
      .collect().map(r => r.getLong(2) -> r.getBoolean(6)).toMap
    assert(out(1L), "one-token-off twin must match")
    assert(!out.getOrElse(2L, false), "unrelated doc must not match")
  }

  test("tfidfCosinePairs: hand-computed cosine; disjoint docs never pair") {
    val corpus = Seq(
      (0L, "apple pie"), (1L, "apple tart"), (2L, "plum jam")
    ).toDF("doc_id", "text")
    val out = Retrieval.tfidfCosinePairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // N=3; df: apple 2, pie/tart/plum/jam 1. All tf=1.
    val wApple = math.log(4.0 / 3) + 1
    val wRare = math.log(4.0 / 2) + 1
    val nrm = math.sqrt(wApple * wApple + wRare * wRare)
    val exp = math.rint(wApple * wApple / (nrm * nrm) * 1e4) / 1e4
    assert(out.keySet == Set((0L, 1L)), "only the apple pair shares a term")
    assert(math.abs(out((0L, 1L)) - exp) < 1e-9)
  }

  test("sortedNeighborhood: window pairs per block, none across blocks") {
    // two blocks by 4-char prefix; 'aaaa*' has 4 docs, 'bbbb*' has 2
    val corpus = Seq(
      (10L, "aaaa one"), (11L, "aaaa two"), (12L, "aaaa three"),
      (13L, "aaaa four"), (20L, "bbbb one"), (21L, "bbbb two")
    ).toDF("doc_id", "text")
    val out = Retrieval.sortedNeighborhood(corpus, w = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // block aaaa sort by 24-char key: "aaaa four"(13) < "aaaa one"(10)
    //   < "aaaa three"(12) < "aaaa two"(11); block bbbb: one(20) < two(21)
    val exp = Set(
      (13L, 10L, 1), (10L, 12L, 1), (12L, 11L, 1), // w=1 neighbors
      (13L, 12L, 2), (10L, 11L, 2), // w=2 neighbors
      (20L, 21L, 1)
    ).map { case (x, y, d) => (math.min(x, y), math.max(x, y), d) }
    assert(out == exp)
  }

  test("sortedNeighborhood: partition-count independence") {
    val corpus = (0L until 80L)
      .map(i => (i, s"pfx${i % 5} body token $i")).toDF("doc_id", "text")
    val a = Retrieval.sortedNeighborhood(corpus)
      .orderBy("a", "b", "dist").collect().toSeq
    val b = Retrieval.sortedNeighborhood(corpus.repartition(7))
      .orderBy("a", "b", "dist").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("fellegiSunter: weights, score, and three-region decision") {
    // fields: f1 (m=.9,u=.05): +4.1699/-3.2479; f2 (m=.85,u=.2):
    // +2.0875/-2.415 — both agree = 6.2574 (link at tau 3),
    // one each = 4.1699-2.415 = 1.7549 or -3.2479+2.0875 = -1.1604
    // (possible at tau -2), both disagree = -5.6629 (nonlink).
    assert(Retrieval.fsWeights(0.9, 0.05) == (4.1699, -3.2479))
    val pairs = Seq(
      (1L, true, true), (2L, true, false), (3L, false, true),
      (4L, false, false)).toDF("id", "x", "y")
    val out = Retrieval.fellegiSunter(pairs, Seq(
      Retrieval.FsField(col("x"), 0.9, 0.05, "a_x"),
      Retrieval.FsField(col("y"), 0.85, 0.2, "a_y")),
      tauLink = 3.0, tauNonlink = -2.0)
      .select("id", "fs_score", "decision").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(out(1L) == (6.2574, "link"))
    assert(out(2L) == (1.7549, "possible"))
    assert(out(3L) == (-1.1604, "possible"))
    assert(out(4L) == (-5.6629, "nonlink"))
  }

  test("soundexCol: canonical test vector") {
    val df = Seq("Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
      "Pfister", "Honeyman", "White", "Jackson", "", "123")
      .toDF("tok")
      .select(col("tok"), Retrieval.soundexCol(col("tok")).as("sdx"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("Robert") == "R163" && got("Rupert") == "R163")
    assert(got("Ashcraft") == "A261" && got("Ashcroft") == "A261")
    assert(got("Tymczak") == "T522")
    assert(got("Pfister") == "P236")
    assert(got("Honeyman") == "H555")
    assert(got("White") == "W300")
    assert(got("Jackson") == "J250")
    assert(got("") == "" && got("123") == "")
  }

  test("bm25TopK plan: no cartesian product; one-row stats broadcast only") {
    val corpus = Seq((0L, "a b"), (1L, "b c")).toDF("doc_id", "text")
    val qs = Seq((0L, "a b")).toDF("qid", "qtext")
    val plan = Retrieval.bm25TopK(qs, corpus, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
