package graft

import org.apache.spark.sql.functions._

/** End-to-end golden test (SURVEY.md §5.2): run the full pipeline on the
  * deterministic fixture corpus and assert
  *   - dup-pair recall ≥ 0.99 against planted pair labels (BASELINE.json:L2)
  *   - decoy (negative) pairs are NOT clustered together
  *   - cluster assignments equal the planted golden clusters
  *   - PSNR invariant holds on every verified dup row (BASELINE.json:L15)
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = DedupConfig()
  private lazy val nClusters = 120
  private lazy val corpus = Fixtures.corpus(spark, nClusters).cache()
  private lazy val result = {
    val r = Pipeline.run(corpus.toDF(), cfg)
    r.copy(clusters = r.clusters.cache(), verified = r.verified.cache())
  }

  test("pipeline emits every corpus row exactly once") {
    assert(result.clusters.count() == corpus.count())
    assert(result.clusters.select("image_id").distinct().count() == corpus.count())
  }

  test("dup-pair recall >= 0.99 against planted labels") {
    val labels = Fixtures.pairLabels(spark, nClusters).toDF()
    val assign = result.clusters
    val joined = labels
      .join(assign.select($"image_id".as("a"), $"cluster_id".as("ca")), "a")
      .join(assign.select($"image_id".as("b"), $"cluster_id".as("cb")), "b")
      .withColumn("predicted", $"ca" === $"cb")
      .cache()
    val pos = joined.filter($"label").count()
    val recovered = joined.filter($"label" && $"predicted").count()
    val recall = recovered.toDouble / pos
    val missedByKind = joined.filter($"label" && !$"predicted")
      .groupBy("kind").count().collect().map(r => s"${r.get(0)}=${r.get(1)}").mkString(",")
    assert(recall >= 0.99, s"recall=$recall ($recovered/$pos) missed: $missedByKind")
  }

  test("decoy negatives are never merged") {
    val labels = Fixtures.pairLabels(spark, nClusters).toDF()
    val assign = result.clusters
    val falseMerges = labels.filter(!$"label")
      .join(assign.select($"image_id".as("a"), $"cluster_id".as("ca")), "a")
      .join(assign.select($"image_id".as("b"), $"cluster_id".as("cb")), "b")
      .filter($"ca" === $"cb")
      .count()
    assert(falseMerges == 0)
  }

  test("cluster assignments equal planted golden clusters") {
    val golden = Fixtures.goldenClusters(spark, nClusters).toDF()
    val diff = result.clusters
      .join(golden.withColumnRenamed("cluster_id", "expected"), "image_id")
      .filter($"cluster_id" =!= $"expected")
    val n = diff.count()
    val sample = diff.limit(5).collect().mkString("; ")
    assert(n == 0, s"$n mismatches, e.g. $sample")
  }

  test("PSNR invariant: every dup edge decodes allclose (>=40dB)") {
    val bad = result.verified.filter($"is_dup" && $"psnr" < cfg.psnrThresholdDb).count()
    assert(bad == 0)
  }

  test("determinism: second run yields identical cluster assignment") {
    val again = Pipeline.run(corpus.toDF(), cfg).clusters
    assert(result.clusters.exceptAll(again).isEmpty && again.exceptAll(result.clusters).isEmpty)
  }

  test("exact tier reproduces the golden clusters (byte groups pre-collapsed)") {
    // The fixture corpus plants byte-identical ("exact") variants with the
    // base caption, so BOTH paths must find them: tier-off via caption LSH
    // + PSNR, tier-on via the md5 group — assignments must not move.
    val r = Pipeline.run(corpus.toDF(), cfg.copy(exactTier = true))
    val clusters = r.clusters.cache()
    val golden = Fixtures.goldenClusters(spark, nClusters).toDF()
    val diff = clusters
      .join(golden.withColumnRenamed("cluster_id", "expected"), "image_id")
      .filter($"cluster_id" =!= $"expected").count()
    assert(diff == 0, s"$diff assignments differ from golden under exactTier")
    val labels = Fixtures.pairLabels(spark, nClusters).toDF()
    val falseMerges = labels.filter(!$"label")
      .join(clusters.select($"image_id".as("a"), $"cluster_id".as("ca")), "a")
      .join(clusters.select($"image_id".as("b"), $"cluster_id".as("cb")), "b")
      .filter($"ca" === $"cb").count()
    assert(falseMerges == 0)
    clusters.unpersist()
  }

  test("exact tier merges byte-identical copies even with unrelated captions") {
    // Caption-keyed retrieval can miss a byte-identical refetch whose
    // caption was rewritten; the exact tier must still merge it (the keep
    // rule is pixels-only — PSNR of identical bytes is ∞).
    val copies = corpus.toDF().orderBy("image_id").limit(5)
      .withColumn("image_id", concat(col("image_id"), lit("_bytecopy")))
      .withColumn("caption",
        concat(lit("zz "), reverse(col("caption")), lit(" qq")))
    val r = Pipeline.run(corpus.toDF().unionByName(copies),
      cfg.copy(exactTier = true))
    val clusters = r.clusters.cache()
    val pairs = clusters.as("c").join(clusters.as("o"),
        col("c.image_id") === concat(col("o.image_id"), lit("_bytecopy")))
      .select(col("c.cluster_id").as("cc"), col("o.cluster_id").as("co"))
      .cache()
    assert(pairs.count() == 5)
    assert(pairs.filter($"cc" =!= $"co").count() == 0,
      "byte-identical copy not merged with its original")
    pairs.unpersist(); clusters.unpersist()
  }

  test("exact tier keeps caption-rewritten copies retrievable (no recall loss)") {
    // B = byte copy of image a with rewritten caption g; c = pixel
    // near-dup of a whose caption is ALSO rewritten to g, so g is the
    // ONLY retrieval path to c. Dropping every dup member's signature
    // would silently lose pair (B, c) — the same_caption contract keeps
    // B's row (its caption differs from the canon's), (B, c) buckets and
    // verifies (B carries a's pixels), and the exact edge (a, B) closes
    // the triangle into one cluster.
    val g = "zq xj qv wk jz vq kx"
    val base = corpus.toDF()
    val (aId, cId) = {
      val p = Fixtures.pairLabels(spark, nClusters).toDF()
        .filter($"label").orderBy("a", "b")
        .select("a", "b").as[(String, String)].head()
      (p._1, p._2)
    }
    val rewired = base.withColumn("caption",
      when($"image_id" === cId, g).otherwise($"caption"))
    val bcopy = base.filter($"image_id" === aId)
      .withColumn("image_id", concat($"image_id", lit("_bcopy")))
      .withColumn("caption", lit(g))
    val r = Pipeline.run(rewired.unionByName(bcopy), cfg.copy(exactTier = true))
    val cl = r.clusters
      .filter($"image_id".isin(aId, cId, aId + "_bcopy"))
      .select("image_id", "cluster_id").as[(String, String)].collect().toMap
    assert(cl.size == 3)
    assert(cl(aId) == cl(aId + "_bcopy"), "exact edge must merge the byte copy")
    assert(cl(aId) == cl(cId),
      "the rewritten caption must keep retrieving the pixel near-dup")
  }

  test("requireCaptionEq pins the L15 letter; default pins the pixel-only reading") {
    // The same corpus + byte-copies-with-rewritten-captions scenario as
    // the exact-tier test above, under BOTH semantics:
    //   - default (pixel-only is_dup, the engine's documented reading —
    //     SURVEY.md §1.2): byte-identical copies merge regardless of
    //     caption (pinned by the test above);
    //   - requireCaptionEq (the L15 invariant's letter): the SAME pairs
    //     must stay separate, because caption equality is part of the
    //     dup predicate — while caption-EQUAL dup kinds (exact/reencode/
    //     noise keep the base caption) still merge at full recall.
    val copies = corpus.toDF().orderBy("image_id").limit(5)
      .withColumn("image_id", concat(col("image_id"), lit("_bytecopy")))
      .withColumn("caption",
        concat(lit("zz "), reverse(col("caption")), lit(" qq")))
    val strictCfg = cfg.copy(exactTier = true, requireCaptionEq = true)
    val r = Pipeline.run(corpus.toDF().unionByName(copies), strictCfg)
    val clusters = r.clusters.cache()
    val pairs = clusters.as("c").join(clusters.as("o"),
        col("c.image_id") === concat(col("o.image_id"), lit("_bytecopy")))
      .select(col("c.cluster_id").as("cc"), col("o.cluster_id").as("co"))
      .cache()
    assert(pairs.count() == 5)
    assert(pairs.filter($"cc" === $"co").count() == 0,
      "strict semantics must NOT merge a byte copy whose caption was rewritten")
    // caption-equal dup kinds still recalled in full under strict mode
    val sameCap = Fixtures.pairLabels(spark, nClusters).toDF()
      .filter($"label" && $"kind".isin("exact", "reencode", "noise"))
    val joined = sameCap
      .join(clusters.select($"image_id".as("a"), $"cluster_id".as("ca")), "a")
      .join(clusters.select($"image_id".as("b"), $"cluster_id".as("cb")), "b")
      .cache()
    val pos = joined.count()
    val recovered = joined.filter($"ca" === $"cb").count()
    assert(pos > 0 && recovered == pos,
      s"strict mode lost caption-equal dups: $recovered/$pos")
    // and every verified dup row satisfies BOTH halves of the invariant
    val bad = r.verified.filter($"is_dup" &&
      ($"psnr" < cfg.psnrThresholdDb || !$"caption_eq")).count()
    assert(bad == 0)
    pairs.unpersist(); joined.unpersist(); clusters.unpersist()
  }

  test("OPH signature path reproduces the golden clusters (drop-in sketch swap)") {
    val r = Pipeline.run(corpus.toDF(), cfg.copy(useOphSignatures = true))
    val clusters = r.clusters.cache()
    val golden = Fixtures.goldenClusters(spark, nClusters).toDF()
    val diff = clusters
      .join(golden.withColumnRenamed("cluster_id", "expected"), "image_id")
      .filter($"cluster_id" =!= $"expected").count()
    assert(diff == 0, s"$diff assignments differ from golden under OPH")
    val labels = Fixtures.pairLabels(spark, nClusters).toDF()
    val falseMerges = labels.filter(!$"label")
      .join(clusters.select($"image_id".as("a"), $"cluster_id".as("ca")), "a")
      .join(clusters.select($"image_id".as("b"), $"cluster_id".as("cb")), "b")
      .filter($"ca" === $"cb").count()
    assert(falseMerges == 0)
    clusters.unpersist()
  }
}
