package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit main for record linkage — the reference's actual CLI
  * shape (kkonevets/dedup is a match-offers-against-a-catalog script
  * pipeline: Solr top-N retrieval → pair features → score → match
  * table; SURVEY.md §3.0): here retrieve = [[Retrieval.bm25TopK]],
  * features = BM25 score + Jaro-Winkler + token-set Jaccard, decide =
  * the deterministic rule of [[Retrieval.linkCandidates]], and the
  * match table commits atomically through [[ParquetTableIO]] (manifest
  * swap, history, rollback, per-partition lineage metrics) under a
  * config hash of the linkage parameters, so re-runs are guarded the
  * same way DedupJob's are.
  *
  * ```
  * sbt "runMain graft.LinkJob --queries offers.parquet \
  *      --corpus catalog.parquet --out /tmp/link [--k 10] \
  *      [--tau-jw 0.8] [--tau-jacc 0.95] [--max-df-frac 0.5]"
  * ```
  * Both inputs are `(doc_id: i64, text: string)` parquet. Omitting
  * `--queries` links the corpus against itself (dedup-retrieval mode —
  * self pairs excluded inside bm25TopK). Emits the committed `matches`
  * table plus a one-line JSON summary.
  */
object LinkJob {

  /** Library body (the spec drives this directly): link, commit,
    * summarize. Returns (candidate rows, matched rows).
    */
  def run(
      spark: SparkSession,
      queries: DataFrame,
      corpus: DataFrame,
      out: String,
      runId: String,
      k: Int,
      tauJw: Double,
      tauJacc: Double,
      maxDfFrac: Double,
      excludeSelf: Boolean = true): (Long, Long) = {
    graft.functions.GraftFunctions.register(spark)
    val matches = Retrieval.linkCandidates(
      queries, corpus, k, tauJw, tauJacc, maxDfFrac, excludeSelf)
    // same prior-commits discipline as DedupJob, extended to the INPUTS:
    // the config hash folds in an order-independent content fingerprint
    // of both sides (row count + wrapped sum of xxhash64 over id+text),
    // so rerunning under the same --out with different --queries/--corpus
    // FAILS HARD at the TableIO guard instead of silently serving the
    // previously committed matches (a stderr warning was the only
    // safeguard before — easy to miss in spark-submit logs). Costs one
    // extra scan per input; the linkage itself scans them several times.
    val io = new ParquetTableIO(spark, out, runId,
      configHash(k, tauJw, tauJacc, maxDfFrac, excludeSelf) + "-" +
        inputFingerprint(queries, corpus))
    val committed = io.commit("matches", matches)
    val row = committed.agg(count(lit(1)).as("n"),
      count(when(col("matched"), 1)).as("m")).collect()(0)
    (row.getLong(0), row.getLong(1))
  }

  /** Idempotence-guard hash over every parameter that changes the
    * output (the DedupConfig.configHash discipline: a resumed/compared
    * run must never silently mix rule settings).
    */
  def configHash(k: Int, tauJw: Double, tauJacc: Double,
      maxDfFrac: Double, excludeSelf: Boolean = true): String = {
    val s = s"link|k=$k|jw=$tauJw|jacc=$tauJacc|df=$maxDfFrac|self=$excludeSelf"
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** Order-independent content fingerprint of the two linkage inputs:
    * per side, (row count, DECIMAL sum of xxhash64 over all columns —
    * decimal so the sum can't hit ANSI-mode long overflow). Deterministic
    * under repartitioning/input order; any changed, added, or dropped
    * row flips it (modulo the usual hash-sum caveats), which is all the
    * idempotence guard needs.
    */
  def inputFingerprint(queries: DataFrame, corpus: DataFrame): String = {
    def fp(df: DataFrame): String = {
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)).as("h"))
        .collect()(0)
      s"${r.getLong(0)}x${r.getDecimal(1).toBigInteger.toString(16)}"
    }
    fp(queries) + "-" + fp(corpus)
  }

  def main(args: Array[String]): Unit = {
    val (argMap, _) = DedupJob.parseArgs(args)
    val corpusPath = argMap.getOrElse("--corpus", sys.error("--corpus required"))
    val out = argMap.getOrElse("--out", sys.error("--out required"))
    val runId = argMap.getOrElse("--run-id", "link-" + System.currentTimeMillis())
    val k = argMap.get("--k").map(_.toInt).getOrElse(10)
    val tauJw = argMap.get("--tau-jw").map(_.toDouble).getOrElse(0.8)
    val tauJacc = argMap.get("--tau-jacc").map(_.toDouble).getOrElse(0.95)
    val maxDfFrac = argMap.get("--max-df-frac").map(_.toDouble).getOrElse(0.5)

    val builder = SparkSession.builder()
      .appName("graft-link")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.props.get("spark.master")
      .orElse(sys.env.get("SPARK_MASTER"))
      .map(builder.master)
      .getOrElse(builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.read.parquet(corpusPath).select(col("doc_id"), col("text"))
    // cross-corpus mode (--queries given): unrelated id spaces — a
    // coincidental qid == doc_id is a legitimate candidate, so self
    // exclusion is OFF; self-linkage mode keeps it on.
    val crossMode = argMap.contains("--queries")
    val queries = argMap.get("--queries")
      .map(p => spark.read.parquet(p)
        .select(col("doc_id").as("qid"), col("text").as("qtext")))
      .getOrElse(corpus
        .select(col("doc_id").as("qid"), col("text").as("qtext")))

    val (cands, matched) =
      run(spark, queries, corpus, out, runId, k, tauJw, tauJacc, maxDfFrac,
        excludeSelf = !crossMode)
    println(s"""{"candidates":$cands,"matched":$matched,"run_id":"$runId"}""")
    spark.stop()
  }
}
