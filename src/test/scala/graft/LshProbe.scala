package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch diagnostic: intra- vs cross-cluster LSH pair split + sample of
  * cross-cluster collisions. run: sbt "Test/runMain graft.LshProbe [n]"
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val nClusters = args.headOption.map(_.toInt).getOrElse(6000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-lsh-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = DedupConfig()

    val corpus = spark.read.parquet(s"/tmp/graft_bench_corpus_$nClusters")
    val sigs = Signatures.signatures(corpus, cfg).persist()
    val golden = Fixtures.goldenClusters(spark, nClusters).toDF()
      .join(sigs.select($"image_id", $"id"), "image_id")
      .select($"id", $"cluster_id").persist()

    val pairs = Lsh.lshCandidates(Lsh.bands(sigs, cfg), cfg).persist()
    val tagged = pairs
      .join(golden.select($"id".as("a"), $"cluster_id".as("ca")), "a")
      .join(golden.select($"id".as("b"), $"cluster_id".as("cb")), "b")
      .withColumn("intra", $"ca" === $"cb")
      .persist()
    tagged.groupBy("intra").count().show()

    // sample cross-cluster collisions with captions
    val idCap = sigs.select($"id", $"norm")
    tagged.filter(!$"intra").limit(10)
      .join(idCap.select($"id".as("a"), $"norm".as("cap_a")), "a")
      .join(idCap.select($"id".as("b"), $"norm".as("cap_b")), "b")
      .select("cap_a", "cap_b")
      .show(10, truncate = false)
    spark.stop()
  }
}
