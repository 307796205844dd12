package graft

import org.apache.spark.sql.SparkSession

/** Standalone timing probe for the ANN harness queries (q_ann_lsh showed
  * a 38 s outlier in a bench run on 2000 vectors — pure overhead, not
  * data). run: sbt "Test/runMain graft.AnnProbe"
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("ann-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    // warm up
    spark.read.parquet(s"$d/lineitem.parquet").groupBy("l_returnflag").count().count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    time("count")(corpus.count())
    time("norm-project")(corpus
      .withColumn("vecn", Ann.unitCol(col("vec"), Ann.normCol(col("vec"))))
      .select(max(element_at(col("vecn"), 1))).count())
    (1 to 3).foreach { i =>
      time(s"annTopK run $i")(Ann.annTopK(corpus, queries, k = 5).count())
    }
    (1 to 2).foreach { i =>
      time(s"pure JVM busyloop probe $i") {
        var s = 0L; var j = 0L
        while (j < 2000000000L) { s ^= j * 0x9e3779b97f4a7c15L; j += 1 }
        if (s == 42L) 1L else 0L
      }
    }
    spark.stop()
  }
}
