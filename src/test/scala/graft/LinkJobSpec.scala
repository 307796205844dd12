package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** T54 as a runnable surface: LinkJob commits the match table through
  * TableIO with the linkage parameters hashed into the idempotence
  * guard.
  */
class LinkJobSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (2L, "completely different subject matter entirely unrelated content here"),
    (3L, "quick brown foxes jump over lazy dogs by the river bank"),
    (4L, "another entirely distinct body of text about nothing in common")
  ).toDF("doc_id", "text")

  test("self-linkage run commits matches and reports counts") {
    val out = Files.createTempDirectory("graft-link").toString
    val qs = corpus.select(col("doc_id").as("qid"), col("text").as("qtext"))
    val (cands, matched) = LinkJob.run(spark, qs, corpus, out, "t1",
      k = 5, tauJw = 0.8, tauJacc = 0.95, maxDfFrac = 1.0)
    assert(cands > 0 && matched > 0 && matched < cands)
    val committed = new ParquetTableIO(spark, out, "t1",
      LinkJob.configHash(5, 0.8, 0.95, 1.0) + "-" +
        LinkJob.inputFingerprint(qs, corpus)).load("matches").get
    val m = committed.where(col("qid") === 0L && col("matched"))
      .select("doc_id").as[Long].collect().toSet
    assert(m.contains(1L), "the one-token-off twin must be matched")
    assert(!m.contains(2L) && !m.contains(4L))
  }

  test("cross-corpus mode keeps coincidental qid == doc_id candidates") {
    graft.functions.GraftFunctions.register(spark)
    // offer id 1 coincides with catalog id 1, whose text is the offer's
    // near-twin — with self-exclusion on, its true match would vanish
    val offers = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("qid", "qtext")
    val catalog = corpus // catalog doc_id 1 is the near-twin of the text
    val withSelf = Retrieval.linkCandidates(offers, catalog, k = 5,
      maxDfFrac = 1.0, excludeSelf = false)
      .where(col("doc_id") === 1L).count()
    val without = Retrieval.linkCandidates(offers, catalog, k = 5,
      maxDfFrac = 1.0)
      .where(col("doc_id") === 1L).count()
    assert(withSelf == 1L, "cross-mode must keep the id-coincident match")
    assert(without == 0L, "self-mode must exclude it")
  }

  test("config-hash guard refuses a rerun with different thresholds") {
    val out = Files.createTempDirectory("graft-link").toString
    val qs = corpus.select(col("doc_id").as("qid"), col("text").as("qtext"))
    LinkJob.run(spark, qs, corpus, out, "t1", 5, 0.8, 0.95, 1.0)
    val e = intercept[Exception] {
      LinkJob.run(spark, qs, corpus, out, "t1", 5, 0.9, 0.95, 1.0)
    }
    assert(e.getMessage.toLowerCase.contains("config"),
      s"expected the idempotence guard, got: ${e.getMessage}")
  }

  test("input-fingerprint guard refuses a rerun with different inputs") {
    val out = Files.createTempDirectory("graft-link").toString
    val qs = corpus.select(col("doc_id").as("qid"), col("text").as("qtext"))
    LinkJob.run(spark, qs, corpus, out, "t1", 5, 0.8, 0.95, 1.0)
    // same rule parameters, one corpus row changed — must FAIL HARD at
    // the TableIO guard instead of silently serving the old matches
    val corpus2 = corpus.withColumn("text",
      when(col("doc_id") === 4L, lit("mutated row content")).otherwise(col("text")))
    val e = intercept[Exception] {
      LinkJob.run(spark, qs, corpus2, out, "t1", 5, 0.8, 0.95, 1.0)
    }
    assert(e.getMessage.toLowerCase.contains("config"),
      s"expected the idempotence guard, got: ${e.getMessage}")
  }

  test("identical rerun overwrites cleanly with identical content") {
    val out = Files.createTempDirectory("graft-link").toString
    val qs = corpus.select(col("doc_id").as("qid"), col("text").as("qtext"))
    val a = LinkJob.run(spark, qs, corpus, out, "t1", 5, 0.8, 0.95, 1.0)
    val b = LinkJob.run(spark, qs, corpus, out, "t1", 5, 0.8, 0.95, 1.0)
    assert(a == b)
  }
}
