package graft

import org.apache.spark.sql.SparkSession

/** Feasibility probe for `local-cluster[n,cores,memMB]` masters: separate
  * executor JVMs (own heap + GC each) without a real cluster — the
  * sandbox stand-in for the north rule's N vs 4N EXECUTORS criterion.
  * Run: SPARK_HOME=/opt/spark sbt "Test/runMain graft.ClusterProbe"
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse("local-cluster[2,2,2048]")
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-cluster-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.executor.memory", "2g")
      .config("spark.jars", sys.env.getOrElse("SPARK_GRAFT_JAR", ""))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // exercise shuffle + our UDAF-free codegen path AND a graft class on
    // executors (verifies the jar shipped)
    val n = spark.range(1000000).map(x => Hashing.mix64(x)).toDF("h")
      .groupBy(($"h" % 97).as("k")).count().count()
    val execs = spark.sparkContext.statusTracker.getExecutorInfos.map(_.host()).length
    println(s"""{"probe_groups":$n,"executor_infos":$execs,"master":"$master"}""")
    spark.stop()
  }
}
