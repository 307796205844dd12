package graft

import org.apache.spark.sql.SparkSession

/** scratch diagnostic: time StreamJob.runOnce on the bench stream corpus
  * (same config as Bench.benchMain), min-of-2, for A/B across builds.
  * run: sbt "Test/runMain graft.StreamProbe"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val streamIn = "/tmp/graft_bench_stream_in"
    val times = (1 to 2).map { i =>
      val outDir = s"/tmp/graft_stream_probe_$i-${System.nanoTime()}"
      val t0 = System.nanoTime()
      graft.streaming.StreamJob.runOnce(
        spark, streamIn, outDir, s"$outDir/_ckpt", runId = "probe",
        maxFilesPerTrigger = 1, verbose = false)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[streamprobe] run=$i sec=$sec%.2f")
      sec
    }
    println(f"[streamprobe] MIN=${times.min}%.2f s")
    spark.stop()
  }
}
