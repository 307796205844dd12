package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end near-duplicate pipeline (SURVEY.md §3.1 E1):
  *
  * {{{
  * ingest → signatures → bands → candidates(LSH ∪ SimHash ∪ suffix-array)
  *        → score → top-k → pixel-verify → connected components → clusters
  * }}}
  *
  * Every stage ends in a `TableIO.commit` (atomic snapshot + metrics);
  * rerunning a crashed job resumes after the last committed stage
  * (BASELINE.json:L6/L14).
  */
object Pipeline {

  final case class Result(clusters: DataFrame, verified: DataFrame)

  /** Run without checkpointing (tests / bench). */
  def run(corpus: DataFrame, cfg: DedupConfig): Result =
    runStaged(corpus, cfg, io = None)

  /** Run with staged commits + resume. */
  def runCheckpointed(corpus: DataFrame, cfg: DedupConfig, io: TableIO): Result =
    runStaged(corpus, cfg, Some(io))

  private def runStaged(corpus: DataFrame, cfg: DedupConfig, io: Option[TableIO]): Result = {
    // Without table checkpoints each stage would lazily re-derive its whole
    // upstream DAG — signatures would be recomputed once per candidate path
    // plus twice in scoring. Persist re-used stages in memory (spilling to
    // disk) when no TableIO materializes them.
    def ckpt(stage: String)(df: => DataFrame): DataFrame = io match {
      case Some(t) => t.commit(stage, df)
      case None =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    // stage 0–1: filters + signatures (row-local, one codegen stage)
    val sigs = ckpt("signatures") {
      val clean = corpus
        .where(col("caption").isNotNull && length(col("caption")) > 0)
        .where(col("w") > 0 && col("h") > 0)
      Signatures.signatures(clean, cfg)
    }
    // i64-id collision guard (see Signatures scaladoc): a collision would
    // silently merge two unrelated images, so fail loudly instead.
    val idStats = sigs.agg(count(lit(1)), countDistinct(col("id"))).collect()(0)
    require(idStats.getLong(0) == idStats.getLong(1),
      s"xxhash64(image_id) collision detected (${idStats.getLong(0)} rows, " +
        s"${idStats.getLong(1)} distinct ids) — use a wider internal id")

    // skew census (A3): checkpointed runs record the bucket-size
    // distribution + overflow count alongside the stage tables, so a
    // capped (recall-affecting) run is visible in the metrics, not silent
    io.foreach { t =>
      t.commit("bucket_stats", Lsh.bucketStats(Lsh.bands(sigs, cfg), cfg))
    }

    // stage 2–3: candidate generation (three retrieval paths, unioned)
    val candidates = ckpt("candidates") {
      val bandsDf = Lsh.bands(sigs, cfg)
      val lshPairs = Lsh.lshCandidates(bandsDf, cfg, dedup = false)
      val shPairs = Lsh.simhashCandidates(sigs, cfg, dedup = false)
      val spanPairs = SuffixPass.spanCandidates(sigs.select(col("id"), col("norm")), cfg)
      lshPairs.withColumn("span_len", lit(0))
        .unionByName(shPairs.withColumn("span_len", lit(0)))
        .unionByName(spanPairs.select(col("a"), col("b"), col("src"), col("span_len")))
        .groupBy("a", "b")
        .agg(concat_ws("+", collect_set(col("src"))).as("src"),
          max(col("span_len")).as("span_len"))
    }

    // stage 4: signature-space scoring + keep-rule + top-k. The signature
    // count (already materialized by the stage-1 checkpoint/persist)
    // drives the adaptive broadcast-vs-shuffle-hash join choice.
    val survivors = ckpt("scored") {
      Scoring.filterAndTopK(Scoring.score(candidates, sigs, cfg, sigs.count()), cfg)
    }

    // stage 5: pixel verification (the only stage that touches bytes again)
    val verified = ckpt("verified") {
      Scoring.verify(survivors, corpus, cfg)
    }

    // stage 6–7: connected components over dup edges → stable cluster ids
    val clusters = ckpt("clusters") {
      val edges = verified.where(col("is_dup")).select(col("a"), col("b"))
      ConnectedComponents.cluster(edges, corpus.select(col("image_id")))
    }

    Result(clusters, verified)
  }
}

/** spark-submit entry point (SURVEY.md §3.1/§3.3):
  * `graft.DedupJob --input <parquet> --out <dir> [--resume]`.
  */
object DedupJob {
  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val input = argMap.getOrElse("--input", sys.error("--input required"))
    val out = argMap.getOrElse("--out", sys.error("--out required"))
    val runId = argMap.getOrElse("--run-id", "run-" + System.currentTimeMillis())

    // spark-submit injects --master in production; local runs (sbt runMain)
    // fall back to SPARK_MASTER or all cores.
    val builder = SparkSession.builder()
      .appName("graft-dedup")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.props.get("spark.master")
      .orElse(sys.env.get("SPARK_MASTER"))
      .map(builder.master)
      .getOrElse(builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        // local-mode split sizing: keep scan parallelism ≥ cores on
        // MB-scale corpora (see Bench.session); cluster runs configure
        // this via spark-submit instead.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = DedupConfig()
    val io = new ParquetTableIO(spark, out, runId, cfg.configHash)
    val corpus = spark.read.parquet(input)
    val result = Pipeline.runCheckpointed(corpus, cfg, io)
    val n = result.clusters.count()
    val nClusters = result.clusters.select("cluster_id").distinct().count()
    println(s"""{"images":$n,"clusters":$nClusters,"run_id":"$runId"}""")
    spark.stop()
  }
}
