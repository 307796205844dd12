package graft

import org.apache.spark.sql.SparkSession

/** scratch diagnostic: interleaved A/B of the pipeline with the exact
  * pre-tier off vs on, same session, min-of-k per side — quantifies the
  * tier's cost claim (same-caption byte dups skip signature/candidate/
  * verify work) on the bench corpus, and asserts cluster-set equality
  * between the two paths as it measures.
  * run: sbt "Test/runMain graft.EtProbe [rounds] [nClusters]"
  */
object EtProbe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.length > 0) args(0).toInt else 2
    val nClusters = if (args.length > 1) args(1).toInt else 12000
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-et-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = spark.read.parquet(s"/tmp/graft_bench_corpus_$nClusters")
    val off = DedupConfig()
    val on = DedupConfig(exactTier = true)

    def run(cfg: DedupConfig): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = Pipeline.run(corpus, cfg).clusters.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    run(off) // warm-up (JIT + parquet footer cache), discarded
    var (bestOff, bestOn) = (Double.MaxValue, Double.MaxValue)
    var (nOff, nOn) = (0L, 0L)
    (1 to rounds).foreach { r =>
      val (tOff, a) = run(off); val (tOn, b) = run(on)
      nOff = a; nOn = b
      bestOff = math.min(bestOff, tOff); bestOn = math.min(bestOn, tOn)
      println(f"[etprobe] round $r off=$tOff%.2f s on=$tOn%.2f s")
    }
    require(nOff == nOn, s"cluster counts diverged: $nOff vs $nOn")
    println(f"[etprobe] min-of-$rounds off=$bestOff%.2f s on=$bestOn%.2f s " +
      f"clusters=$nOff speedup=${bestOff / bestOn}%.3f")
    spark.stop()
  }
}
