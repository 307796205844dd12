package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the training-data operator modules: ANN, text ops,
  * multimodal kernels.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("ann: cosineCol matches scala dot/norm computation") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na / 1 * nb)
    }
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(Ann.cosineCol(col("a"), col("b"))).as[Double].collect()(0)
    assert(math.abs(got - expected) < 1e-9)
  }

  test("ann: bucketing is deterministic and multi-probe covers 1-bit flips") {
    val v = Seq(0.5f, -0.2f, 0.9f, 0.1f)
    val b1 = Ann.bucketOf(v, 12, 42L)
    assert(b1 == Ann.bucketOf(v, 12, 42L))
    val probes = Ann.probeBuckets(v, 12, 42L)
    assert(probes.length == 13 && probes.head == b1)
    assert(probes.tail.forall(p => java.lang.Integer.bitCount(p ^ b1) == 1))
  }

  /** Planted-twin recall at a given corpus size (n base vectors + their
    * near-identical twins); returns hits/n.
    */
  private def twinRecall(n: Int): Double = {
    val rng = new java.util.SplittableRandom(9)
    val base = (0 until n).map { i =>
      (i.toLong * 2, Array.fill(16)(rng.nextDouble().toFloat - 0.5f))
    }
    val twins = base.map { case (id, v) => (id + 1, v.map(x => x + 0.001f)) }
    val all = (base ++ twins).toDF("id", "vec")
    val queries = base.toDF("qid", "qvec")
    val top1 = Ann.annTopK(all, queries, k = 1)
      .select("qid", "id").as[(Long, Long)].collect().toMap
    base.count { case (id, _) => top1.get(id).contains(id + 1) }.toDouble / n
  }

  test("ann: LSH top-k finds the planted nearest neighbor (recall >= 0.95 at 2 sizes)") {
    // multi-probe recall must hold as the corpus grows, not just at the
    // toy size (scale evidence for the auto-derived plane count)
    assert(twinRecall(40) >= 0.95)
    assert(twinRecall(400) >= 0.95)
  }

  test("ann: plane count scales with corpus size (fixed planes = scale bug)") {
    assert(Ann.derivePlanes(1000) == 8) // clamp floor at toy sizes
    assert(Ann.derivePlanes(1000000) == 14) // ~64/bucket
    assert(Ann.derivePlanes(1000000000L) == 24) // 10^9 → 16M buckets
    assert(Ann.derivePlanes(1000000000000L) == 24) // clamp ceiling
  }

  test("ann: hot-bucket cap drops are observable, never silent") {
    // constant vectors: every corpus row lands in ONE bucket
    val all = (0 until 50).map(i => (i.toLong, Array.fill(8)(1.0f))).toDF("id", "vec")
    val q = Seq((999L, Array.fill(8)(1.0f))).toDF("qid", "qvec")
    val obs = new org.apache.spark.sql.Observation()
    val got = Ann.annTopK(all, q, k = 5, bucketCap = 20, census = Some(obs)).count()
    assert(got == 5)
    val m = obs.get
    assert(m("dropped_vectors").asInstanceOf[Number].longValue == 30L)
    assert(m("max_bucket").asInstanceOf[Number].longValue == 50L)
    assert(m("n_vectors").asInstanceOf[Number].longValue == 50L)
  }

  test("textops: language id is deterministic and sane on english text") {
    val en = "the quick brown fox is in the garden and it is resting there"
    assert(TextOps.detectLang(en) == "en")
    assert(TextOps.detectLang("") == "und")
    assert(TextOps.detectLang("12345 678 @@@") == "und") // no letter bigrams
    assert(TextOps.detectLang(en) == TextOps.detectLang(en))
  }

  test("textops: language id accuracy on a labeled multilingual fixture") {
    // documented accuracy (BASELINE.md): short natural-language samples,
    // one per supported language — the bigram heuristic must identify all
    // (longer texts only improve the bigram statistics)
    val labeled = Seq(
      "en" -> ("the weather in the north of the country is rather cold in " +
        "winter and the people there are used to staying inside of their homes"),
      "de" -> ("die kinder gehen in die schule und der lehrer erzählt eine " +
        "geschichte über die alten zeiten in deutschland und die schönen wälder"),
      "es" -> ("los estudiantes de la universidad estudian las lenguas " +
        "extranjeras para poder trabajar en otros lugares del mundo entero"),
      "fr" -> ("les enfants aiment jouer dans le jardin quand il fait beau " +
        "et que la lumiere du jour est encore presente sur les toits de la " +
        "petite ville"),
      "it" -> ("il bambino gioca nella piazza della citta con gli amici e " +
        "racconta che il castello antico della collina ha una storia molto " +
        "interessante"),
      "pt" -> ("os meninos da escola estudam todos os dias para aprender as " +
        "coisas mais importantes da historia do seu pais e da sua cidade"),
      "nl" -> ("de kinderen van de school gaan elke dag met de fiets naar " +
        "het park en de meester vertelt een verhaal over de oude tijden"))
    val correct = labeled.count { case (lang, text) =>
      TextOps.detectLang(text) == lang
    }
    assert(correct == 7, {
      val got = labeled.map { case (l, t) => s"$l->${TextOps.detectLang(t)}" }
      s"only $correct/7 correct: ${got.mkString(", ")}"
    })
  }

  test("textops: quality columns compute exact ratios on a known string") {
    val s = "the cat!! 123"
    val row = Seq(s).toDF("text")
      .select(TextOps.qualityColumns(col("text")): _*)
      .collect()(0)
    assert(row.getAs[Long]("len") == 13L)
    // letters: thecat = 6 → 6/13
    assert(row.getAs[Double]("alpha_ratio") == math.round(6.0 / 13 * 10000) / 10000.0)
    // punct (non-alnum, non-space): !! = 2
    assert(row.getAs[Double]("punct_ratio") == math.round(2.0 / 13 * 10000) / 10000.0)
    // stopwords: "the" of 3 tokens
    assert(row.getAs[Double]("stopword_ratio") == math.round(1.0 / 3 * 10000) / 10000.0)
    assert(row.getAs[Long]("n_tokens") == 3L)
  }

  test("multimodal: decode meta + resize + phash round-trip on fixture images") {
    val corpus = Fixtures.corpus(spark, 4).toDF()
    val feats = Multimodal.imageFeatures(corpus, side = 8)
      .select("image_id", "w", "h", "dec_w", "dec_h", "decode_ok", "gray", "phash_computed")
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      assert(r.getAs[Boolean]("decode_ok"))
      assert(r.getAs[Int]("dec_w") == r.getAs[Int]("w"))
      assert(r.getAs[Int]("dec_h") == r.getAs[Int]("h"))
      assert(r.getAs[Array[Byte]]("gray").length == 64)
    }
    // phash column of the corpus equals recomputed phash (same kernel)
    val mism = Multimodal.imageFeatures(corpus).alias("f")
      .join(corpus.select(col("image_id"), col("phash")), "image_id")
      .where(col("phash") =!= col("phash_computed")).count()
    assert(mism == 0)
  }

  test("multimodal: corrupt payload yields decode_ok=false, no crash") {
    val bad = Seq(("x", Array[Byte](1, 2, 3), 4, 4, "png", "c", 0L))
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    val r = Multimodal.imageFeatures(bad).collect()(0)
    assert(!r.getAs[Boolean]("decode_ok"))
    assert(r.getAs[Int]("dec_w") == -1)
  }

  test("multimodal stubs: frame sampling bounded fan-out, audio fixed width") {
    val corpus = Fixtures.corpus(spark, 3).toDF()
    val frames = corpus.select(col("image_id"),
      explode(Multimodal.sampleFramesUdf(col("bytes"), lit(2), lit(5))).as("f"))
    assert(frames.groupBy("image_id").count().agg(max("count")).as[Long].collect()(0) <= 5)
    val mfcc = corpus.select(Multimodal.audioFeaturesUdf(col("bytes"), lit(13)).as("m"))
      .select(size(col("m"))).as[Int].collect()
    assert(mfcc.forall(_ == 13))
  }
}
