package graft

import org.apache.spark.sql.functions._

/** scratch diagnostic: where do missed labeled pairs fall out of the
  * pipeline? run: sbt "Test/runMain graft.RecallProbe"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTest.session
    import spark.implicits._
    val cfg = DedupConfig()
    val n = 120
    val corpus = Fixtures.corpus(spark, n).cache()
    val labels = Fixtures.pairLabels(spark, n).toDF().filter($"label" && $"kind" =!= "transitive")

    val sigs = Signatures.signatures(corpus.toDF(), cfg).cache()
    val idMap = sigs.select($"id", $"image_id").cache()
    def toStr(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.join(idMap.select($"id".as("a"), $"image_id".as("a_img")), "a")
        .join(idMap.select($"id".as("b"), $"image_id".as("b_img")), "b")
        .drop("a", "b")
        .withColumn("a", least($"a_img", $"b_img"))
        .withColumn("b", greatest($"a_img", $"b_img"))
        .drop("a_img", "b_img")
    val bandsDf = Lsh.bands(sigs, cfg)
    val lshPairs = Lsh.lshCandidates(bandsDf, cfg).cache()
    val shPairs = Lsh.simhashCandidates(sigs, cfg).cache()
    val spanPairs = SuffixPass.spanCandidates(sigs.select($"id", $"norm"), cfg).cache()

    val cand = toStr(lshPairs.select("a", "b").unionByName(shPairs.select("a", "b"))
      .unionByName(spanPairs.select("a", "b")).distinct())
      .select("a", "b").distinct()
      .withColumn("is_cand", lit(true))

    val allCand = lshPairs.withColumn("span_len", lit(0))
      .unionByName(shPairs.withColumn("span_len", lit(0)))
      .unionByName(spanPairs.select($"a", $"b", $"src", $"span_len"))
      .groupBy("a", "b")
      .agg(concat_ws("+", collect_set($"src")).as("src"), max($"span_len").as("span_len"))
    val scored = Scoring.score(allCand, sigs, cfg)
    val kept = Scoring.filterAndTopK(scored, cfg).withColumn("is_kept", lit(true))
    val verified = Scoring.verify(kept.drop("is_kept"), corpus.toDF(), cfg)

    val diag = labels
      .join(cand, Seq("a", "b"), "left")
      .join(toStr(scored).select($"a", $"b", $"jaccard_sig", $"hamming", $"span_len"), Seq("a", "b"), "left")
      .join(toStr(kept).select($"a", $"b", $"is_kept"), Seq("a", "b"), "left")
      .join(verified.select($"a", $"b", $"psnr", $"is_dup"), Seq("a", "b"), "left")
      .filter($"is_dup".isNull || !$"is_dup")
    println("=== missed direct pairs ===")
    diag.show(50, truncate = false)

    // captions + norm of missed pairs
    val missedIds = diag.select(explode(array($"a", $"b")).as("image_id")).distinct()
    corpus.toDF().join(missedIds, "image_id")
      .select($"image_id", $"fmt", $"w", $"h", substring($"caption", 1, 90).as("caption"))
      .show(20, truncate = false)
  }
}
