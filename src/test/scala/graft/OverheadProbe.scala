package graft

import org.apache.spark.sql.SparkSession

/** scratch: measure the fixed (data-independent) overhead of a pipeline
  * run — warm session, tiny corpus, cache cleared between runs.
  * run: sbt "Test/runMain graft.OverheadProbe [nClusters] [cpus]"
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val nClusters = args.headOption.map(_.toInt).getOrElse(300)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"/tmp/graft_probe_corpus_$nClusters"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      Fixtures.corpus(spark, nClusters).write.mode("overwrite").parquet(path)
    }
    val corpus = spark.read.parquet(path)
    val n = corpus.count()
    val sc = spark.sparkContext
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val jobs0 = sc.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      Pipeline.run(corpus, DedupConfig()).clusters.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] run$i n=$n cpus=$cpus wall=$sec%6.2f s")
    }
    spark.stop()
  }
}
