package graft

import org.apache.spark.sql.functions.col
import java.nio.file.Files

/** T60 as a runnable surface: TokenizerJob commits the merges + vocab
  * tables through TableIO with the training parameters hashed into the
  * idempotence guard.
  */
class TokenizerJobSpec extends SparkSpec {
  import spark.implicits._

  test("train commits both artifacts; resume serves them without retraining") {
    val out = Files.createTempDirectory("graft-bpe").toString
    val docs = Seq("low low lower", "lowest of the low").toDF("text")
    val (nM, nV) = TokenizerJob.run(spark, docs, out, "t1", nMerges = 4)
    assert(nM == 4 && nV > 0)
    val io = new ParquetTableIO(spark, out, "t1", "bpe-k4-v1")
    val merges = io.load("merges").get
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2)))
    assert(merges.head == ("l", "o"), "corpus-dominant pair first")
    // resume: a limit(0) docs frame would train NOTHING if retraining
    // happened — the committed tables must be served as-is
    val (rM, rV) = TokenizerJob.run(spark, docs.limit(0), out, "t1", nMerges = 4)
    assert((rM, rV) == (nM, nV))
    // different k → different config hash → idempotence guard refuses
    val e = intercept[IllegalArgumentException] {
      TokenizerJob.run(spark, docs, out, "t1", nMerges = 8)
    }
    assert(e.getMessage.toLowerCase.contains("config"), e.getMessage)
    // vocab is the committed counterpart of Bpe.subwordVocab
    val vocab = io.load("vocab").get
      .orderBy(col("freq").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(vocab.map(_._2).sum > 0 && vocab.map(_._1).distinct.length == vocab.length)
  }
}
