package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit main for T60: train a BPE tokenizer on a documents
  * parquet `(doc_id: i64, text: string)` and commit the artifacts a
  * downstream tokenizer consumes — the ordered `merges` table and the
  * post-merge `vocab` table — atomically through [[ParquetTableIO]]
  * (manifest-swap commit, history, rollback), keyed by a hash of the
  * training parameters so a resume with different k refuses instead of
  * silently mixing runs.
  *
  * This is the job-surface complement to the oracled operators
  * (q_bpe_train / q_bpe_vocab): same `Bpe.train` / `Bpe.subwordVocab`
  * code path, plus the committed-table lifecycle every other graft CLI
  * gives its outputs. Scale shape is Bpe's: one corpus pass, then
  * vocab-bounded rounds (Bpe scaladoc; PLANS.md T60).
  */
object TokenizerJob {

  /** Train (or resume) and commit merges + vocab; returns their row
    * counts. Split from main for TokenizerJobSpec.
    */
  def run(spark: SparkSession, docs: org.apache.spark.sql.DataFrame,
          out: String, runId: String, nMerges: Int): (Long, Long) = {
    // config hash covers the training parameters that change the output
    val io = new ParquetTableIO(spark, out, runId, f"bpe-k$nMerges%d-v1")
    // resume: Bpe.train runs driver-looped jobs during CONSTRUCTION, so
    // check the committed tables before retraining rather than relying
    // on commit's lazy-arg skip; both artifacts come from ONE pass
    val (merges, vocab) = (io.load("merges"), io.load("vocab")) match {
      case (Some(m), Some(v)) => (m, v)
      case _ =>
        val (m, words) = Bpe.trainWithSegments(docs, nMerges)
        (io.commit("merges", m),
          io.commit("vocab", Bpe.vocabFromSegments(words)))
    }
    (merges.count(), vocab.count())
  }

  def main(args: Array[String]): Unit = {
    val (argMap, _) = DedupJob.parseArgs(args)
    val input = argMap.getOrElse("--input", sys.error("--input required"))
    val out = argMap.getOrElse("--out", sys.error("--out required"))
    val runId = argMap.getOrElse("--run-id", "bpe-" + System.currentTimeMillis())
    val nMerges = argMap.get("--merges").map(_.toInt).getOrElse(64)

    val builder = SparkSession.builder()
      .appName("graft-tokenizer")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.props.get("spark.master")
      .orElse(sys.env.get("SPARK_MASTER"))
      .map(builder.master)
      .getOrElse(builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(input).select(col("text"))
    val (nM, nV) = run(spark, docs, out, runId, nMerges)
    println(s"""{"merges":$nM,"vocab":$nV,"run_id":"$runId"}""")
    spark.stop()
  }
}
