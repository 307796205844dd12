package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** scratch diagnostic: one warmed pipeline run with job/stage/task-time
  * accounting, to split wall time into parallel compute vs fixed
  * scheduling/serial overhead.
  * run: sbt "Test/runMain graft.PipeProbe <cpus> <aqe:on|off> [nClusters]"
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val aqe = args(1) == "on"
    val nClusters = if (args.length > 2) args(2).toInt else 48000
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipe-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTS", "32"))
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
        }
      }
    })

    val corpus = spark.read.parquet(s"/tmp/graft_bench_corpus_$nClusters")
    val cfg = DedupConfig()
    Pipeline.run(corpus, cfg).clusters.count() // warm-up
    spark.catalog.clearCache()
    jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); cpuNs.set(0)

    val t0 = System.nanoTime()
    val n = Pipeline.run(corpus, cfg).clusters.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener drain
    println(f"[pipeprobe] cpus=$cpus aqe=$aqe clusters_out=$n wall=$wall%.2f s " +
      f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
      f"task_time=${taskMs.get / 1000.0}%.1f s cpu_time=${cpuNs.get / 1e9}%.1f s " +
      f"ideal_wall=${taskMs.get / 1000.0 / cpus}%.1f s")
    spark.stop()
  }
}
