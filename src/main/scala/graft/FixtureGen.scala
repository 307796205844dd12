package graft

import org.apache.spark.sql.SparkSession

/** Writes a deterministic fixture corpus to parquet — input producer for
  * `graft.DedupJob` and `graft.Bench`.
  * Usage: runMain graft.FixtureGen <nClusters> <outPath> [seed]
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val nClusters = args(0).toInt
    val out = args(1)
    val seed = if (args.length > 2) args(2).toLong else 42L
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-fixture-gen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.corpus(spark, nClusters, seed).write.mode("overwrite").parquet(out)
    println(s"""{"corpus":"$out","rows":${spark.read.parquet(out).count()}}""")
    spark.stop()
  }
}
