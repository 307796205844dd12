package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

/** spark-submit main for TEXT corpora: the T38 tiered cascade
  * (exact md5 → MinHash-LSH near-dup → SemDeDup semantic) over a
  * documents parquet `(doc_id: i64, text: string)`, with optional
  * embeddings `(vec_id, embedding)` for the semantic tier, emitting the
  * per-doc tier-provenance assignment plus a one-line run summary.
  *
  * The image+caption surface belongs to [[DedupJob]] (staged, resumable,
  * streaming twin); this is the crawl-dump complement a curation user
  * runs on text corpora. The assignment is committed atomically through
  * [[ParquetTableIO]] (manifest-swap commit point, history, rollback),
  * and each tier sees only the previous tier's survivors — the
  * cascade's 100 TB ordering argument lives in TieredDedup's scaladoc.
  */
object TextDedupJob {
  def main(args: Array[String]): Unit = {
    val (argMap, _) = DedupJob.parseArgs(args)
    val input = argMap.getOrElse("--input", sys.error("--input required"))
    val out = argMap.getOrElse("--out", sys.error("--out required"))
    val runId = argMap.getOrElse("--run-id", "text-" + System.currentTimeMillis())
    val embPath = argMap.get("--emb")
    val tauSem = argMap.get("--tau-sem").map(_.toDouble).getOrElse(0.35)

    val builder = SparkSession.builder()
      .appName("graft-text-dedup")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.props.get("spark.master")
      .orElse(sys.env.get("SPARK_MASTER"))
      .map(builder.master)
      .getOrElse(builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val cfg = DedupConfig()
    val docs = spark.read.parquet(input).select(col("doc_id"), col("text"))
    // no embeddings → empty semantic tier; embedding-less docs degrade
    // to 'kept' inside the cascade (never vanish)
    val emb = embPath
      .map(p => spark.read.parquet(p)
        .select(col("vec_id").as("id"), col("embedding").as("vec")))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("id", LongType),
          StructField("vec", ArrayType(FloatType))))))

    val assignment = TieredDedup.cascade(docs, emb,
      surv => {
        val sdocs = surv.select(col("doc_id").as("id"), col("text"))
        val sigs = sdocs.select(col("id"),
          graft.functions.GraftFunctions.minhashCol(
            graft.functions.GraftFunctions.shinglesCol(col("text"), cfg.shingleK),
            cfg.numPerms).as("minhash")).localCheckpoint()
        SparkEntry.nearDupExact(sdocs, sigs, cfg).select(col("a"), col("b"))
      },
      tauSem = tauSem)

    val io = new ParquetTableIO(spark, out, runId, cfg.configHash)
    val committed = io.commit("assignment", assignment)
    val tiers = committed.groupBy("tier").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def n(t: String) = tiers.getOrElse(t, 0L)
    println(s"""{"docs":${tiers.values.sum},"kept":${n("kept")},""" +
      s""""exact":${n("exact")},"near":${n("near")},""" +
      s""""semantic":${n("semantic")},"run_id":"$runId"}""")
    spark.stop()
  }
}
