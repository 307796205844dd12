package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** scratch diagnostic: A/B/C the verify-stage join shapes on the bench
  * corpus, timing each and printing the FINAL adaptive plan's join nodes.
  * run: sbt "Test/runMain graft.VerifyProbe"
  */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-verify-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig()

    val corpus = spark.read.parquet("/tmp/graft_bench_corpus_12000")
    val repairs = IdHash.buildRepairs(corpus.select(col("image_id")))
    val clean = corpus
      .where(col("caption").isNotNull && length(col("caption")) > 0)
      .where(col("w") > 0 && col("h") > 0)
    val sigs = Signatures.signatures(clean, cfg, repairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSigs = sigs.count()
    val candidates = Pipeline.mergeCandidates(Seq(
      Lsh.lshCandidates(Lsh.bands(sigs, cfg), cfg, dedup = false) -> 1,
      Lsh.simhashCandidates(sigs, cfg, dedup = false) -> 2,
      SuffixPass.spanCandidates(sigs.select(col("id"), col("norm")), cfg) -> 4))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    candidates.count()
    val survivors = Scoring.filterAndTopK(
      Scoring.score(candidates, sigs, cfg, nSigs), cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSurv = survivors.count()
    println(s"[probe] sigs=$nSigs survivors=$nSurv")

    val psnrU = udf { (a: Array[Byte], b: Array[Byte]) => Imaging.psnr(a, b) }
    val payload = IdHash.withId(corpus, "image_id", "id", repairs)
      .select(col("id"), col("image_id"), col("bytes"), col("fmt"), col("caption"))
    def pa0 = payload.select(
      col("id").as("a"), col("image_id").as("a_img"), col("bytes").as("bytes_a"),
      col("fmt").as("fmt_a"), col("caption").as("cap_a"))
    def pb0 = payload.select(
      col("id").as("b"), col("image_id").as("b_img"), col("bytes").as("bytes_b"),
      col("fmt").as("fmt_b"), col("caption").as("cap_b"))
    def finish(j: DataFrame): DataFrame = j
      .withColumn("psnr",
        when(col("bytes_a") === col("bytes_b"), lit(Imaging.PsnrExact))
          .otherwise(psnrU(col("bytes_a"), col("bytes_b"))))
      .withColumn("is_dup", col("psnr") >= cfg.psnrThresholdDb)
      .select(col("a_img"), col("b_img"), col("psnr"), col("is_dup"))

    def prune(p: DataFrame, side: String) =
      p.join(broadcast(survivors.select(col(side)).dropDuplicates(side)),
        Seq(side), "left_semi")

    val shapes: Seq[(String, () => DataFrame)] = Seq(
      "A_old_aqe" -> (() => finish(survivors.join(pa0, "a").join(pb0, "b"))),
      "B_prune_bcast" -> (() => finish(
        broadcast(survivors).join(prune(pa0, "a"), "a").join(prune(pb0, "b"), "b"))),
      "C_bcast_only" -> (() => finish(
        broadcast(survivors).join(pa0, "a").join(pb0, "b"))),
      "D_bcast_shj2" -> (() => finish(
        broadcast(survivors).join(pa0, "a").join(pb0.hint("SHUFFLE_HASH"), "b"))))

    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (round <- 1 to 2; (name, mk) <- shapes) {
      val df = mk()
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      times(name) = sec :: times.getOrElse(name, Nil)
      if (round == 2) {
        val joins = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          .linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange"))
          .map(_.trim.take(150)).toList
        println(s"[probe] $name rows=$n joins:")
        joins.foreach(l => println(s"  $l"))
      }
      println(f"[probe] $name round=$round sec=$sec%.2f")
    }
    times.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"[probe] MIN $n = ${ts.min}%.2f s")
    }
    spark.stop()
  }
}
