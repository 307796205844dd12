package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark contract + scaling evidence (BASELINE.md).
  *
  * Default mode (driver-run): executes every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` plus the end-to-end dedup pipeline on a
  * deterministic fixture corpus, and prints ONE JSON line.
  *
  * `scaling` mode (north rule, BASELINE.json:L14): the sandbox has no
  * multi-executor cluster, so the driver-sanctioned substitute is the SAME
  * pipeline job on the SAME corpus at two parallelism levels — local[8]
  * (N) vs local[32] (4N) — reporting images/sec at both and efficiency =
  * (throughput32 / throughput8) / 4. Run:
  *   sbt "runMain graft.Bench scaling"
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    // shuffle.partitions is held CONSTANT across parallelism levels: the
    // partition count is a property of the data layout, and varying it
    // would confound the N-vs-4N comparison (fewer, fatter partitions
    // spill and skew the local[8] time).
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Generate (once) a bench corpus to parquet and return (path, rows). */
  private def ensureCorpus(spark: SparkSession, nClusters: Int): (String, Long) = {
    val path = s"/tmp/graft_bench_corpus_$nClusters"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      Fixtures.corpus(spark, nClusters).write.mode("overwrite").parquet(path)
    }
    (path, spark.read.parquet(path).count())
  }

  private def runPipeline(spark: SparkSession, corpusPath: String): (Double, Long) = {
    val corpus = spark.read.parquet(corpusPath)
    val t0 = System.nanoTime()
    val n = Pipeline.run(corpus, DedupConfig()).clusters.count()
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("scaling")) scalingMain() else benchMain()
  }

  private def benchMain(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // end-to-end pipeline throughput on the deterministic fixture corpus
    val (corpusPath, nImages) = ensureCorpus(spark, nClusters = 3000)
    val (pipeSec, _) = runPipeline(spark, corpusPath)
    val imagesPerSec = nImages / pipeSec

    val qs = (results :+ ("pipeline_e2e" -> pipeSec))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipeSec
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","pipeline_images":$nImages%d,"pipeline_images_per_sec":$imagesPerSec%.1f}""")
    spark.stop()
  }

  /** One measured level: warm-up run (JIT/codegen), then best-of-2 timed
    * runs. `clearCache()` between runs — Pipeline.run persists its stages
    * and Spark's CacheManager would otherwise serve the measured run from
    * the warm-up's cached stage data (observed: a 2× "speedup" that was
    * pure cache reuse).
    */
  private def measureLevel(cpus: Int, corpusPath: String): Double = {
    val spark = session(cpus)
    try {
      runPipeline(spark, corpusPath) // warm-up
      Seq(1, 2).map { _ =>
        spark.catalog.clearCache()
        runPipeline(spark, corpusPath)._1
      }.min
    } finally {
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }

  private def scalingMain(): Unit = {
    val nClusters = sys.env.getOrElse("SPARK_GRAFT_BENCH_CLUSTERS", "6000").toInt
    // generate corpus once at full parallelism
    val gen = session(32)
    val (corpusPath, nImages) = ensureCorpus(gen, nClusters)
    gen.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    val t32 = measureLevel(32, corpusPath)
    val t8 = measureLevel(8, corpusPath)

    val thr32 = nImages / t32
    val thr8 = nImages / t8
    val eff = (thr32 / thr8) / 4.0
    println(f"""{"images":$nImages,"sec_local8":$t8%.2f,"sec_local32":$t32%.2f,"images_per_sec_local8":$thr8%.1f,"images_per_sec_local32":$thr32%.1f,"scaling_efficiency":$eff%.3f}""")
  }
}
