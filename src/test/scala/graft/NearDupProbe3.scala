package graft

import org.apache.spark.sql.SparkSession

/** scratch diagnostic #3: timing + correctness of the rewritten
  * q_doc_near_dup_lsh at both SFs. run: sbt "Test/runMain graft.NearDupProbe3"
  */
object NearDupProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-neardup-probe3")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries("q_doc_near_dup_lsh")(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      println(f"[probe] $sf%s min-of-2 warm: ${math.min(once(), once())}%.2f s")
    }
    spark.stop()
  }
}
