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
    // empty docs produce zero chunks → no output row (no content to keep or drop)
    assert(out.toSeq == Seq((3L, 1L)))
  }
}
