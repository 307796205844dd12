package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch diagnostic #4: stage decomposition of q_doc_near_dup_lsh at
  * sf0.1 — where do the ~5.7 s go? run: sbt "Test/runMain graft.NearDupProbe4"
  */
object NearDupProbe4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-neardup-probe4")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val d = "/root/testdata/sf0.1"
    val cfg = DedupConfig()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe4] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up
    spark.read.parquet(s"$d/documents.parquet").count()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val sigs = timed("signatures (checkpoint)") {
      docs.select(col("id"),
        graft.functions.GraftFunctions.minhashCol(
          graft.functions.GraftFunctions.shinglesCol(col("text"), 5),
          cfg.numPerms).as("minhash")).localCheckpoint()
    }
    val cands = timed("lsh candidates (count)") {
      val c = Lsh.lshCandidates(Lsh.bands(sigs, cfg), cfg).localCheckpoint()
      println(s"[probe4]   candidates = ${c.count()}")
      c
    }
    val est = timed("estimate gate (checkpoint)") {
      val e = cands
        .join(broadcast(sigs.select(col("id").as("a"), col("minhash").as("ma"))), "a")
        .join(broadcast(sigs.select(col("id").as("b"), col("minhash").as("mb"))), "b")
        .where(aggregate(zip_with(col("ma"), col("mb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v) >= (0.5 * cfg.numPerms).toInt)
        .select(col("a"), col("b"))
        .localCheckpoint()
      println(s"[probe4]   survivors = ${e.count()}")
      e
    }
    timed("exact re-score (count)") {
      val estIds = est.select(col("a").as("id"))
        .union(est.select(col("b").as("id"))).distinct()
      val sh = docs.join(estIds.hint("broadcast"), Seq("id"), "left_semi")
        .select(col("id"),
          array_distinct(transform(
            sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
            i => col("text").substr(i, lit(5)))).as("sh"))
      val n = est
        .join(sh.select(col("id").as("a"), col("sh").as("sha")), "a")
        .join(sh.select(col("id").as("b"), col("sh").as("shb")), "b")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")), 4))
        .where(col("jaccard") >= 0.7)
        .count()
      println(s"[probe4]   final pairs = $n")
    }
    spark.stop()
  }
}
