package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch profiling: per-stage wall times of the pipeline at local[32].
  * run: sbt "Test/runMain graft.StageProbe [nClusters]"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val nClusters = args.headOption.map(_.toInt).getOrElse(3000)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stage-probe")
      .config("spark.sql.shuffle.partitions", math.max(8, 32).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig()

    val path = s"/tmp/graft_bench_corpus_$nClusters"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      Fixtures.corpus(spark, nClusters).write.mode("overwrite").parquet(path)
    }
    val corpus = spark.read.parquet(path)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val n = corpus.count()
    println(s"[stage] corpus rows: $n")

    val sigs = time("signatures") {
      val s = Signatures.signatures(corpus, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val bandsDf = Lsh.bands(sigs, cfg)
    val lshPairs = time("lsh_candidates") {
      val d = Lsh.lshCandidates(bandsDf, cfg).persist()
      println(s"  lsh pairs: ${d.count()}"); d
    }
    val shPairs = time("simhash_candidates") {
      val d = Lsh.simhashCandidates(sigs, cfg).persist()
      println(s"  simhash pairs: ${d.count()}"); d
    }
    val spanPairs = time("span_candidates") {
      val d = SuffixPass.spanCandidates(sigs.select(col("id"), col("norm")), cfg).persist()
      println(s"  span pairs: ${d.count()}"); d
    }
    val candidates = time("union_dedup") {
      val d = lshPairs.withColumn("span_len", lit(0))
        .unionByName(shPairs.withColumn("span_len", lit(0)))
        .unionByName(spanPairs.select(col("a"), col("b"), col("src"), col("span_len")))
        .groupBy("a", "b")
        .agg(concat_ws("+", collect_set(col("src"))).as("src"), max(col("span_len")).as("span_len"))
        .persist()
      println(s"  candidates: ${d.count()}")
      d
    }
    val survivors = time("score_topk") {
      val d = Scoring.filterAndTopK(Scoring.score(candidates, sigs, cfg, n), cfg).persist()
      println(s"  survivors: ${d.count()}")
      d
    }
    val verified = time("psnr_verify") {
      val d = Scoring.verify(survivors, corpus, cfg).persist()
      println(s"  dups: ${d.where(col("is_dup")).count()}")
      d
    }
    time("connected_components") {
      val edges = verified.where(col("is_dup")).select(col("a"), col("b"))
      ConnectedComponents.cluster(edges, corpus.select(col("image_id"))).count()
    }
    spark.stop()
  }
}
