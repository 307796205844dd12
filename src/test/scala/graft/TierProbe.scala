package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for the q_tiered_dedup_lsh cascade at a given SF
  * dir. run: sbt "Test/runMain graft.TierProbe /root/testdata/sf0.1"
  */
object TierProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("tier-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val d = args(0)
    val cfg = DedupConfig()

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    val base = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs = base.unionByName(
      base.where(col("doc_id") < 10)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

    // tier 1 alone
    val tag1 = docs.withColumn("h", md5(col("text").cast("binary")))
    val canon = tag1.groupBy("h").agg(min("doc_id").as("canon"))
    val t1 = tag1.join(canon, "h").localCheckpoint(eager = false)
    timed("tier1 (md5 groups)")(t1.count())
    val surv1 = t1.where(col("doc_id") === col("canon"))
      .select(col("doc_id"), col("text"))

    // tier 2 pair generation alone (the LSH tail)
    def pairsOf(s: org.apache.spark.sql.DataFrame) = {
      val sdocs = s.select(col("doc_id").as("id"), col("text"))
      val sigs = sdocs.select(col("id"),
        graft.functions.GraftFunctions.minhashCol(
          graft.functions.GraftFunctions.shinglesCol(col("text"), 5),
          cfg.numPerms).as("minhash")).localCheckpoint()
      SparkEntry.nearDupExact(sdocs, sigs, cfg)
    }
    val pairs = pairsOf(surv1).localCheckpoint()
    timed("tier2 pairs (LSH tail)")(pairs.count())

    // tier 2 CC alone
    val clu = ConnectedComponents.cluster(
      pairs.select(col("a"), col("b")),
      surv1.select(col("doc_id").as("image_id")))
      .select(col("image_id").as("doc_id"), col("cluster_id"))
      .localCheckpoint(eager = false)
    timed("tier2 CC")(clu.count())
    val surv2 = clu.where(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"))

    // tier 3 alone
    val e = emb.join(surv2, emb("id") === surv2("doc_id"))
      .select(emb("id"), emb("vec"))
    timed("tier3 e-join")(e.count())
    val pr = SemDedup.prune(e, tau = 0.35, nList = 1)
    timed("tier3 SemDedup exact")(pr.count())

    // full cascade for reference
    timed("FULL cascade")(TieredDedup.cascade(docs, emb,
      s => pairsOf(s).select(col("a"), col("b")),
      tauSem = 0.35, semNList = 1).count())

    spark.stop()
  }
}
