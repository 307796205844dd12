package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dumps formatted physical plans of the load-bearing operators to
  * PLANS.md — the ".explain and iterate" evidence (builder prompt).
  * run: sbt "Test/runMain graft.PlanDump"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()

    val dir = java.nio.file.Files.createTempDirectory("plandump").toString
    Fixtures.corpus(spark, 20).write.mode("overwrite").parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the load-bearing operators\n\n")
    sb.append("Regenerate: `sbt \"Test/runMain graft.PlanDump\"`. Annotations call out\n")
    sb.append("what each plan must (and must not) contain; SignatureSpec asserts the\n")
    sb.append("same properties mechanically.\n")

    def dump(title: String, note: String, df: org.apache.spark.sql.DataFrame): Unit = {
      sb.append(s"\n## $title\n\n$note\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      sb.append("```\n")
    }

    dump("stage 0 — internal i64 id (IdHash.withId, repairs = None — the universal case)",
      "Ids ride every candidate/scoring/CC shuffle, so their derivation " +
        "must be free: with no repair table (every corpus whose xxhash64 " +
        "is already injective) withId is a pure codegen projection fused " +
        "into the consuming stage — no join, no Exchange. IdHashSpec " +
        "asserts this mechanically.",
      IdHash.withId(corpus, "image_id", "id", None).select(col("image_id"), col("id")))

    dump("stage 0 — id collision repair applied (IdHash.withId with a repair table)",
      "When buildRepairs found collisions (certain at the 10^12 target, " +
        "~54k repaired rows), the repair table rides as ONE BroadcastHashJoin " +
        "LeftOuter into the projection — the corpus is never shuffled for " +
        "id assignment.",
      IdHash.withId(corpus, "image_id", "id",
        Some(corpus.select(col("image_id")).limit(2).withColumn("salt", lit(1L))))
        .select(col("image_id"), col("id")))

    {
      // same construction as IdHash.buildRepairs (idhash.scala) — the
      // real loop localCheckpoints `pending`, truncating the attempt-side
      // lineage shown here to a checkpoint scan
      val baseHashes = corpus.select(xxhash64(col("image_id")).as("h"))
      val dup0 = baseHashes.groupBy(col("h")).count()
        .where(col("count") > 1).select(col("h"))
      val pending = corpus.select(col("image_id"))
        .withColumn("h", xxhash64(col("image_id")))
        .join(broadcast(dup0), Seq("h"), "left_semi")
        .select(col("image_id"))
      dump("stage 0 — collision census (IdHash.buildRepairs round 0)",
        "The ONE corpus-wide shuffle in the repair path: a codegen " +
          "HashAggregate pair (partial below the Exchange) counting hash " +
          "occupancy, its >1 survivors broadcast back into a LeftSemi over " +
          "a second corpus scan. Loop state from here on is O(|colliders|).",
        pending)
      val attempt = pending.limit(10)
        .withColumn("salt", lit(1L))
        .withColumn("h", xxhash64(col("image_id"), col("salt")))
      dump("stage 0 — repair round corpus pass (IdHash.buildRepairs corpusHits)",
        "Each repair round re-reads the corpus with the candidates' salted " +
          "hashes BROADCAST into the scan (BroadcastHashJoin LeftSemi over " +
          "the base-hash projection): no corpus shuffle, no corpus " +
          "checkpoint, ever — the only Exchanges touch the tiny collider " +
          "side. Expected rounds ≈ 1 (each round re-scatters only " +
          "|colliders| ids across 2^64).",
        baseHashes
          .join(broadcast(attempt.select(col("h"))), Seq("h"), "left_semi")
          .distinct())
    }

    val sigs = Signatures.signatures(corpus, cfg)
    dump("stage 1 — signatures",
      "One whole-stage-codegen projection over a pruned scan (no `bytes`, no " +
        "Exchange, no ScalaUDF): normalization built-ins feed the three " +
        "native graft expressions.",
      sigs)

    val sigsP = sigs.persist()
    sigsP.count()
    dump("stage 2–3 — LSH candidates",
      "Band explode (codegen) → ONE hash aggregation with the bounded " +
        "min-set aggregate (look for a single Exchange on (band, " +
        "band_hash) with partial aggregation below it — the skew cap is " +
        "inside the aggregate's O(cap) state, no window sorts) → " +
        "in-bucket pair expansion via transform/flatten HOFs (codegen, " +
        "no UDF).",
      Lsh.lshCandidates(Lsh.bands(sigsP, cfg), cfg))

    val cand = Lsh.lshCandidates(Lsh.bands(sigsP, cfg), cfg).persist()
    cand.count()
    dump("stage 4 — scoring join",
      "Signature table broadcasts (below the configured row bound) → both " +
        "pair-side joins are BroadcastHashJoin; jaccard via zip_with/" +
        "aggregate stays in codegen. At 10^12 scale the same code picks " +
        "SHUFFLE_HASH instead (never sort-merge on the pair side).",
      Scoring.score(cand, sigsP, cfg, sigsP.count()))

    val surv = Scoring.filterAndTopK(Scoring.score(cand, sigsP, cfg, sigsP.count()), cfg)
      .persist()
    dump("stage 5 — pixel verification (bounded survivors: pair side pinned broadcast)",
      "Payload joins read ONLY (image_id, bytes, fmt, caption) — check " +
        "ReadSchema; w/h/phash are pruned. The PSNR UDF sits above the " +
        "join, after the byte-equality short-circuit. Join discipline " +
        "(inverse of stage 4's — the BYTES side must not be the build " +
        "side): the pair side is PINNED broadcast, independent of size " +
        "statistics (a checkpointed stream micro-batch reports none), so " +
        "payload bytes are filtered at the probe, map-side; AQE finishes " +
        "the second join on runtime sizes, with the byte volume it can " +
        "sort there bounded by the regime's survivor bound. Two " +
        "alternatives were measured SLOWER on the 34k bench corpus and " +
        "rejected (VerifyProbe): semi-pruning the payload sides first " +
        "(3× — its dedup shuffles + broadcast builds serialize ahead of " +
        "the scan, and the broadcast probe already filters map-side) and " +
        "hinting the second join SHUFFLE_HASH (2.7× — builds the hash " +
        "map from byte rows to avoid a bounded sort).",
      Scoring.verify(surv, corpus, cfg, None, surv.count()))

    dump("stage 5 — pixel verification (10^12 regime: SHUFFLE_HASH, no byte sorts)",
      "Beyond the pair-broadcast bound the same code plans ShuffledHashJoin " +
        "built from the pair / single-payload side — never sort-merge, " +
        "which would SORT an UNBOUNDED byte relation. Payload bytes ride " +
        "one exchange each; the exchange-free regime is the id-bucketed " +
        "corpus commit (TableIO.commitBucketed), which pre-partitions the " +
        "scan on the join key exactly like the bucketed-signature stage-4 " +
        "dump below.",
      Scoring.verify(surv, corpus, cfg, None, Long.MaxValue))

    dump("stage 3b — suffix-array span pass",
      "ONE exchange for the whole pass: winnow-fingerprint explode " +
        "(row-local UDF) → single ObjectHashAggregate pair " +
        "(partial_boundedminrows below the Exchange — bounded O(cap) " +
        "buffers, map-side combine) → SA+LCP kernel UDF over each capped " +
        "bucket → pair aggregation. No window sorts, no groupByKey, no " +
        "unbounded collect_*.",
      SuffixPass.spanCandidates(sigsP.select(col("id"), col("norm")), cfg))

    dump("stage 3c — candidate union + pair dedup (bit_or provenance)",
      "The highest-volume aggregation in the engine. Both aggregations " +
        "around the final Exchange must be plain HashAggregate (codegen) " +
        "computing bit_or + max — NOT ObjectHashAggregate: collect_set " +
        "provenance previously forced object aggregation here, whose " +
        "128-key sort-based fallback TimSorted the whole pair relation " +
        "per task. The src string is derived AFTER aggregation, " +
        "row-local.",
      {
        val lshPairs = Lsh.lshCandidates(Lsh.bands(sigsP, cfg), cfg, dedup = false)
        val shPairs = Lsh.simhashCandidates(sigsP, cfg, dedup = false)
        val spanPairs = SuffixPass.spanCandidates(sigsP.select(col("id"), col("norm")), cfg)
        lshPairs.drop("src").withColumn("span_len", lit(0)).withColumn("srcb", lit(1))
          .unionByName(shPairs.drop("src").withColumn("span_len", lit(0)).withColumn("srcb", lit(2)))
          .unionByName(spanPairs.select(col("a"), col("b"), col("span_len")).withColumn("srcb", lit(4)))
          .groupBy("a", "b")
          .agg(expr("bit_or(srcb)").as("srcb"), max(col("span_len")).as("span_len"))
      })

    // production shape: CC runs on i64-hashed ids (Pipeline stage 6 uses
    // clusterHashed), so the star rounds aggregate min over LONG
    // production shape: the CC stage consumes the COMMITTED verified table
    // (TableIO checkpoint), so its plan starts from a clean scan — write
    // and re-read the edges so the dump shows that, not the whole cached
    // upstream lineage.
    Scoring.verify(surv, corpus, cfg)
      .where(col("is_dup")).select(col("a"), col("b"))
      .write.mode("overwrite").parquet(s"$dir/edges")
    val edgesPub = spark.read.parquet(s"$dir/edges")
    val edges = edgesPub
      .select(xxhash64(col("a")).as("u"), xxhash64(col("b")).as("v"))
    dump("stage 6 — connected components (one large-star + small-star round)",
      "Both star operations are groupBy-MIN + equi-join-back over " +
        "i64-hashed ids: every aggregate in this plan must be a plain " +
        "HashAggregate over min(bigint) — CONSTANT MUTABLE state per key. " +
        "Two prior hazards are excluded by construction: the old " +
        "small-star collect_set held a hot node's whole neighborhood in " +
        "one buffer, and min over the public STRING ids planned " +
        "SortAggregate (immutable buffer), i.e. two full edge-relation " +
        "sorts per round. Each iteration is localCheckpointed (not shown) " +
        "to truncate lineage; convergence is a count+bit_xor signature, " +
        "one 8-byte row to the driver per round.",
      ConnectedComponents.planProbe(edges))

    dump("stage 7 — cluster finalize (stable public min-id assignment)",
      "clusterHashed's translation tail: the i64 assignment joins the " +
        "(nid, image_id) mapping, then ONE groupBy(rep).min(image_id) " +
        "picks the stable public representative. This is the engine's " +
        "single string-min — a SortAggregate over the n-row assignment, " +
        "once per job, instead of per CC round over the edge relation. " +
        "No window, no collect_*, nothing driver-side.",
      ConnectedComponents.clusterHashed(edgesPub, corpus.select(col("image_id"))))

    {
      // round 3: checkpointed signatures commit BUCKETED by id — the
      // resume-path scoring join shape
      val io = new ParquetTableIO(spark, s"$dir/ckpt", "plandump", cfg.configHash)
      io.commitBucketed("signatures", sigsP, "id", cfg.sigBuckets)
      val sigsB = io.load("signatures").get
      dump("stage 4 (resume path) — scoring join over the BUCKETED signature commit",
        "The committed signature table is bucketed by id (Iceberg bucket " +
          "transform; TableIO.commitBucketed), so this scan reports " +
          "HashPartitioning(id, n): with the SHUFFLE_HASH shape the " +
          "10^12-row regime uses, ONLY the pair side exchanges — check " +
          "`Bucketed: true` on both signature scans and the absence of an " +
          "Exchange above them. Without bucketing the signature relation " +
          "would shuffle twice per run (once per endpoint join).",
        Scoring.score(cand, sigsB, cfg, Long.MaxValue))
    }

    // deterministic synthetic embeddings (hash-derived; no RNG state)
    val emb = spark.range(0, 500).select(col("id"),
      transform(sequence(lit(1), lit(16)),
        i => (pmod(xxhash64(col("id") * lit(31) + i), lit(1000)) / 500.0 - 1.0)
          .cast("float")).as("vec"))
    val embQ = emb.limit(5).select(col("id").as("qid"), col("vec").as("qvec"))
    dump("ANN — LSH-bucketed similarity search (bounded bucket cap + census)",
      "The hot-bucket cap is the bounded-min-ids aggregate: ONE " +
        "ObjectHashAggregate pair (partial below the Exchange — O(cap) " +
        "state, map-side combine) with the drop census read off the " +
        "aggregated relation, then an id equi-join re-attaches the unit " +
        "vectors (they never ride the bucket shuffle). The ONLY Window " +
        "in the plan is the final per-query top-k, and its rank filter " +
        "sits directly above it so WindowGroupLimit prunes before the " +
        "sort — the earlier row_number cap put CollectMetrics between " +
        "filter and Window, losing exactly that. Same shape for IVF " +
        "(Ivf.ivfTopK shares capKeyed/bucketSearch).",
      Ann.annTopK(emb, embQ, k = 5,
        census = Some(new org.apache.spark.sql.Observation())))

    {
      // same construction as IdHash.buildRepairsIncremental's detection
      // (idhash.scala): committed signature ids vs a micro-batch's base
      // hashes
      val histIds = corpus.select(xxhash64(col("image_id")).as("id"))
      val newHashes = corpus.limit(50)
        .select(col("image_id"), xxhash64(col("image_id")).as("h"))
      dump("stream — incremental id-collision detection (IdHash.buildRepairsIncremental)",
        "Per micro-batch the committed side is touched as ONE pruned " +
          "columnar scan of the signature table's i64 id column feeding a " +
          "BroadcastHashJoin LeftSemi against the batch's base hashes — " +
          "no Exchange, no aggregation of committed data (the batch " +
          "buildRepairs pays a corpus-wide groupBy per call, which a " +
          "stream cannot). The batch side (dupNew/broadcast) is the only " +
          "shuffled relation and is micro-batch-sized.",
        histIds.select(col("id").as("h"))
          .join(broadcast(newHashes.select(col("h"))), Seq("h"), "left_semi"))
    }

    {
      // round 3: deterministic split/sample family (T19/T20)
      graft.functions.GraftFunctions.register(spark)
      val docs = spark.range(0, 1000).select(col("id").as("doc_id"),
        pmod(col("id"), lit(20)).cast("string").as("source"))
      dump("T19 — deterministic hash split (content-keyed train/val/test)",
        "A pure codegen projection over the scan — NO Exchange, no sort: " +
          "the assignment is a function of mix64(doc_id) alone, so it is " +
          "identical under any partitioning/ingestion order and costs one " +
          "pass at any corpus size.",
        docs.withColumn("bucket",
          pmod(graft.functions.GraftFunctions.mix64Col(col("doc_id")), lit(10L)))
          .withColumn("split", when(col("bucket") < 8, "train")
            .when(col("bucket") === 8, "val").otherwise("test")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      dump("T20 — per-group deterministic cap-K sample",
        "ONE Exchange on the group key feeding the rank window; the rk " +
          "filter sits directly above row_number so WindowGroupLimit " +
          "prunes each group to K rows BEFORE the sort materializes a " +
          "full per-group ordering.",
        docs.withColumn("h", graft.functions.GraftFunctions.mix64Col(col("doc_id")))
          .withColumn("rk", row_number().over(w)).where(col("rk") <= 5))
    }

    {
      // round 3: curation family (T22 semantic dedup, T23 tf-idf,
      // T24 packing, T25 weighted sample)
      graft.functions.GraftFunctions.register(spark)
      val emb = spark.range(0, 400).select(col("id"),
        expr("transform(sequence(0, 11), i -> cast(pmod(id * (i + 7), 97) / 97.0 as float))")
          .as("vec"))
      dump("T22 — semantic dedup, clustered regime (SemDedup.prune nList>1)",
        "Only (cell, id) rides the bounding aggregation's Exchange — the " +
          "vectors join back by id and move ONCE. The pair join is a " +
          "same-cell equi-join (never a cartesian), the verdict is one " +
          "hash-agg min plus a left join; pair work is O(Σ|cell|²) with " +
          "capped, censused cells.",
        SemDedup.prune(emb, tau = 0.6, nList = 4))
      val tdocs = spark.range(0, 500).select(col("id").as("doc_id"),
        expr("concat_ws(' ', transform(sequence(0, cast(pmod(id, 30) as int) + 5), " +
          "j -> concat('w', pmod(id * j, 50))))").as("text"))
        .withColumn("n_chars", length(col("text")))
      val tf = tdocs
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df2 = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val wTf = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
      dump("T23 — per-doc top TF-IDF terms",
        "Two partial-combining HashAggregates (doc×term tf, then term df " +
          "— NO sort-based aggregation), a term-keyed join for idf, and a " +
          "per-doc rank window with the rk filter directly above " +
          "row_number so WindowGroupLimit cuts to top-3 per doc before a " +
          "full per-doc sort.",
        tf.join(df2, "term")
          .crossJoin(broadcast(tdocs.select(count(lit(1)).as("n_docs"))))
          .withColumn("tfidf", round(col("tf") *
            (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + lit(1.0)), 4))
          .withColumn("rk", row_number().over(wTf))
          .where(col("rk") <= 3))
      val wPk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      dump("T24 — sequence packing (concat-and-chunk layout)",
        "ONE Exchange (the shard window); every pack/offset column is " +
          "codegen arithmetic over the running token count. Shards are " +
          "independent, so 100 TB packs in parallel with no global sort.",
        tdocs
          .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
          .withColumn("h", graft.functions.GraftFunctions.mix64Col(col("doc_id")))
          .withColumn("shard", pmod(col("h"), lit(4L)))
          .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(wPk), lit(0L)))
          .withColumn("pack_id", floor(col("cum_before") / 256L)))
      dump("T25 — weighted deterministic sample (Efraimidis–Spirakis top-k)",
        "MUST physicalize as TakeOrderedAndProject — per-partition top-k " +
          "and a k-row driver merge, never a global Sort/Window over the " +
          "corpus. The score is a codegen projection off the content hash.",
        tdocs
          .withColumn("h", graft.functions.GraftFunctions.mix64Col(col("doc_id")))
          .withColumn("u",
            (shiftrightunsigned(col("h"), 32).cast("double") + lit(0.5)) /
              lit(4294967296.0))
          .withColumn("es_key",
            round(log(col("u")) / greatest(col("n_chars"), lit(1L)).cast("double"), 9))
          .orderBy(col("es_key").desc, col("doc_id")).limit(50))
      // T26 decontamination: the gram join must run on i64 hashes with
      // the common-gram drop upstream of it
      val grams = tdocs
        .withColumn("bucket",
          pmod(graft.functions.GraftFunctions.mix64Col(col("doc_id")), lit(10L)))
        .withColumn("norm", Text.normalizeCol(col("text")))
        .where(length(col("norm")) >= 24)
        .select(col("doc_id"), col("bucket"),
          explode(
            graft.functions.GraftFunctions.shinglesCol(col("norm"), 24)).as("h"))
      val common = grams.groupBy("h").agg(count(lit(1)).as("nd"))
        .where(col("nd") > 64).select("h")
      val kept2 = grams.join(common, Seq("h"), "left_anti")
      dump("T26 — train/eval decontamination (cross-split gram-hash join)",
        "The contamination join is an i64 equi-join on gram HASHES — " +
          "strings never ride the shuffle — and the >64-doc common-gram " +
          "anti-join drops boilerplate (the hot keys) BEFORE the " +
          "cross-side join, so no bucket explodes at scale.",
        kept2.where(col("bucket") < 8)
          .select(col("h"), col("doc_id").as("train_doc"))
          .join(kept2.where(col("bucket") >= 8)
            .select(col("h"), col("doc_id").as("eval_doc")), "h")
          .groupBy("train_doc", "eval_doc").agg(count(lit(1)).as("n_shared")))
      // T26b bloom-pruned variant: the BF filter must sit UNDER the join
      // exchange, on the train-side scan
      val evalG = kept2.where(col("bucket") >= 8)
        .select(col("h"), col("doc_id").as("eval_doc")).localCheckpoint()
      val bf26 = evalG.stat.bloomFilter("h", math.max(evalG.count(), 1L), 0.01)
      val bf26B = spark.sparkContext.broadcast(bf26)
      val might26 = udf((h: Long) => bf26B.value.mightContainLong(h))
      dump("T26b — decontamination with Bloom pre-prune (train >> eval regime)",
        "Same join as T26, but a broadcast Bloom filter over the eval " +
          "grams runs as a plain Filter DIRECTLY over the train-side " +
          "gram projection — BELOW the join's Exchange — so ~99% of " +
          "train grams are dropped map-side and the join shuffle " +
          "shrinks from O(|train|) to O(|hits|). No false negatives; " +
          "false positives fall through to the exact equi-join above, " +
          "which is why this variant shares T26's oracle verbatim.",
        kept2.where(col("bucket") < 8)
          .select(col("h"), col("doc_id").as("train_doc"))
          .where(might26(col("h")))
          .join(evalG, "h")
          .groupBy("train_doc", "eval_doc").agg(count(lit(1)).as("n_shared")))
      // T27 mixture reweighting: stats agg + tiny broadcast back
      val docsU = tdocs
        .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(5))))
        .withColumn("u",
          (shiftrightunsigned(
            graft.functions.GraftFunctions.mix64Col(col("doc_id")), 32)
            .cast("double") + lit(0.5)) / lit(4294967296.0))
      val stats27 = docsU.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val ps27 = stats27
        .crossJoin(broadcast(docsU.select(count(lit(1)).as("n_total"))))
        .withColumn("ratio", lit(0.2) * col("n_total") / col("n_docs"))
      val withP27 = ps27
        .crossJoin(broadcast(ps27.select(max(col("ratio")).as("rmax"))))
        .withColumn("keep_p", least(lit(1.0), col("ratio") / col("rmax")))
        .select(col("lang"), col("n_docs"), col("ratio"), col("keep_p"))
      // J9 as-of join: union-sort encoding — exactly ONE Exchange on the
      // key and one per-key Sort feeding a Window; no join operator at all.
      val evA = tdocs.select(col("doc_id").as("k"),
        col("doc_id").cast("timestamp").as("t"), col("text").as("ltag"))
      val evB = tdocs.select(col("doc_id").as("k"),
        (col("doc_id") + 1).cast("timestamp").as("t"), col("doc_id").as("rv"))
      dump("J9 — as-of join (union-sort encoding, AsOf.asofJoin)",
        "The naive encodings are a within-key range join (O(|L|*|R|) " +
          "expansion) or per-key mapGroups (no codegen). This plan is the " +
          "union-sort form: ONE Exchange of |L|+|R| rows hash-partitioned " +
          "on the key, one per-key Sort, one Window carrying a single " +
          "payload struct of running state — the same physical shape as " +
          "any keyed window aggregation, with no join operator anywhere.",
        AsOf.asofJoin(evA, evB, "k", "t", Seq("rv"), rightTie = "rv"))
      dump("T27 — source-mixture reweighting (downsample to target mixture)",
        "One hash-agg for the per-source stats, a source-cardinality " +
          "(tiny) BroadcastHashJoin back onto the corpus, one final agg — " +
          "the corpus is scanned, never shuffled, regardless of size.",
        docsU.join(broadcast(withP27), "lang")
          .withColumn("kept", (col("u") < col("keep_p")).cast("long"))
          .groupBy(col("lang"), col("n_docs"), col("ratio"), col("keep_p"))
          .agg(sum(col("kept")).as("n_kept")))
      // T33 n-gram novelty: the gram relation is aggregated, never joined
      dump("T33 — per-doc n-gram novelty (first-occurrence census)",
        "n_grams comes from size() on the row-local shingle array — no " +
          "explode and no join for the denominator. The exploded grams " +
          "feed ONE min HashAggregate (partial combine map-side) whose " +
          "output is one row per DISTINCT gram; the count HashAggregate " +
          "above it runs on that collapsed relation. The only join is " +
          "doc-level: gram-cardinality data crosses exactly one " +
          "exchange, as a partial-aggregated (gram, min_doc) stream.",
        Curation.ngramNovelty(tdocs))
      // T34 OPH MinHash: the whole sketch is one codegen projection
      graft.functions.GraftFunctions.register(spark)
      dump("T34 — densified OPH MinHash signature (OphMinHashExpr)",
        "The entire sketch — shingling, the single mix64 per shingle, " +
          "bin routing, per-bin min, rotation densification — is ONE " +
          "whole-stage-codegen Project over the scan: no Exchange, no " +
          "aggregation, no UDF boundary. This is the stage whose per-" +
          "shingle cost the OPH construction cuts 128× vs the per-lane " +
          "MinHash (each output row costs one mix64 per shingle instead " +
          "of numPerms).",
        tdocs.select(col("doc_id"),
          graft.functions.GraftFunctions.ophMinhashCol(
            graft.functions.GraftFunctions.shinglesCol(
              Text.normalizeCol(col("text")), 5), 128).as("oph")))
      // T35 LM cross-entropy: counts are vocab-bounded, joins many-to-one
      dump("T35 — corpus-trained bigram-LM cross-entropy (Curation.lmCrossEntropy)",
        "Tokenization + bigram construction are row-local (one transform " +
          "+ one explode off the checkpointed token projection). The " +
          "count relations c1/c2 are vocab-bounded HashAggregates with " +
          "map-side partial combine; the per-doc side collapses to " +
          "(doc, w1, w2, multiplicity) BEFORE the count joins, so both " +
          "joins are many-to-ONE on hash-partitioned keys — Zipfian hot " +
          "tokens skew partitions but cannot multiply rows, and AQE's " +
          "skew split handles the residue. V rides as a one-row " +
          "BroadcastNestedLoopJoin; the final per-doc NLL is one more " +
          "HashAggregate on doc_id.",
        Curation.lmCrossEntropy(tdocs))
      // T36 source balance: quality row-local, rank-K window per source
      dump("T36 — per-source balanced keep (Curation.sourceBalance)",
        "The quality score is a codegen projection fused into the scan; " +
          "the rank is ONE Exchange on source + ONE Window — and Catalyst " +
          "inserts WindowGroupLimit BOTH below and above the exchange " +
          "(rank-K pushdown): each map task pre-trims to the cap per " +
          "source BEFORE the shuffle, so a mega-source contributes ≤cap " +
          "rows per upstream task — the same bound the W2 aggregate " +
          "enforces by hand on the LSH paths, here for free from the " +
          "rk<=cap filter the optimizer sees.",
        Curation.sourceBalance(tdocs.withColumn("source",
          concat(lit("s"), pmod(col("doc_id"), lit(7))))))
      // T37 Gopher filter: row-local signals + the T21 max-tf aggregation
      dump("T37 — Gopher composite quality filter (Curation.gopherFilter)",
        "Every signal except top_token_frac is computed in the row-local " +
          "projection; top_token_frac adds the T21 explode → two " +
          "HashAggregates (map-side partial combine) → doc-level join. " +
          "Rule booleans and the keep conjunction are pure codegen over " +
          "the joined row — no extra exchange beyond the token " +
          "aggregation.",
        Curation.gopherFilter(tdocs))
      // T39 URL dedup: row-local canonicalization + one keyed aggregation
      dump("T39 — URL canonicalization + canonical-URL dedup (Curation.urlDedup)",
        "The whole normalization — scheme/host case-fold, www/port/" +
          "fragment/utm strips, param sort — is a single codegen Project " +
          "fused into the scan (regex extracts + array HOFs, no UDF). " +
          "Dedup is T1's shape: ONE HashAggregate on the canonical key " +
          "with map-side partial combine, and the join back rides the " +
          "same hash partitioning as the aggregation's exchange. At " +
          "crawl scale this runs BEFORE fetch/decode, so its input is a " +
          "URL list orders of magnitude lighter than the content tiers.",
        Curation.urlDedup(tdocs.select(col("doc_id"),
          concat(lit("http://www.ex.com:80/p/"),
            floor(col("doc_id") / 7).cast("long").cast("string"),
            lit("/?b=2&a="), pmod(col("doc_id"), lit(3)).cast("string"))
            .as("url"))))
      // T38 tiered dedup: tier-1 kernel + the cascade's branch structure
      dump("T38 — tiered dedup, tier-1 exact kernel (TieredDedup.cascade)",
        "The exact tier is ONE HashAggregate on the 128-bit digest " +
          "(partial combine map-side, O(1) min state per content group) " +
          "plus one join back to tag rows — no shingling or signatures " +
          "spent on the 30–50% of a crawl that is byte-identical. In " +
          "cascade() this relation is lazily localCheckpointed because " +
          "THREE downstream branches consume it (exact dups out, " +
          "survivors to the pair generator, survivors to the CC node " +
          "list) — uncheckpointed, each branch would re-run this scan + " +
          "aggregation + join.",
        {
          val tag1 = tdocs.select(col("doc_id"), col("text"))
            .withColumn("h", md5(col("text").cast("binary")))
          tag1.join(tag1.groupBy("h").agg(min("doc_id").as("canon")), "h")
        })
      dump("T38 — tiered dedup cascade (exact → near → semantic union)",
        "The three tier branches union narrow verdict rows (doc_id, " +
          "tier, dup_of) — text and embeddings never ride the union. " +
          "Tier boundaries appear as ExistingRDD scans: those are the " +
          "lazy localCheckpoints of t1 and the CC assignment, each " +
          "computed once and read by every consuming branch. Tier order " +
          "is the scale story: each tier's input is the previous tier's " +
          "survivor set, so the expensive shingle/CC and O(pairs·dim) " +
          "semantic stages see an already-shrunk corpus.",
        TieredDedup.cascade(
          tdocs.select(col("doc_id"), col("text")),
          tdocs.select(col("doc_id").as("id"),
            array(lit(1f), lit(0f), lit(0f)).as("vec")),
          surv => TieredDedup.exactPairsJaccard(surv, tau = 0.4),
          tauSem = 0.9, semNList = 1))
      val tev = spark.range(0, 2000).select(
        pmod(col("id"), lit(50)).as("user_id"),
        (col("id") * 37).cast("timestamp").as("ts"),
        col("id").as("event_id"),
        concat(lit("t"), pmod(col("id"), lit(5))).as("event_type"),
        (col("id") % 100).cast("double").as("value"))
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      dump("W4 — batch sessionization (gaps-and-islands)",
        "ONE Exchange on user_id serves both the lag/running-sum Window " +
          "and the downstream session hash-agg — groupBy(user_id, sid) is " +
          "a strict refinement of the window partitioning, so Catalyst " +
          "reuses the child distribution and no second shuffle appears " +
          "between Window and HashAggregate.",
        tev.withColumn("prev", lag(col("ts"), 1).over(byUser))
          .withColumn("is_new", when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1L)
            .otherwise(0L))
          .withColumn("sid", sum(col("is_new")).over(byUser.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sid"))
          .agg(count(lit(1)).as("n_events")))
      dump("O6 — pivot with pinned values (long→wide)",
        "With the value list pinned, NO distinct-values collect job " +
          "precedes the aggregation (a discovered pivot runs a full " +
          "extra scan + driver collect first) and the output schema is " +
          "static. The plan is Spark's two-phase pivot: a partial+final " +
          "pre-aggregate on (key, pivot value) that collapses the input " +
          "to ≤ |keys|·|values| rows, then the pivot-case aggregate on " +
          "the key — the second Exchange moves only the collapsed rows.",
        tev.groupBy(col("user_id"))
          .pivot("event_type", Seq("t0", "t1", "t2", "t3", "t4"))
          .agg(count(lit(1))))
      dump("A11 — mergeable HLL sketch distinct counts",
        "Per-group sketches build map-side (partial ObjectHashAggregate " +
          "with O(2^lgK) state per group), merge in the final agg, and " +
          "the union rollup merges the 5 per-group sketch BINARIES — " +
          "never rescanning rows. At 100 TB the per-day/per-source " +
          "sketches persist as binary columns and every later rollup is " +
          "register-union arithmetic on kilobytes.",
        tev.groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("event_id"), lit(14)).as("sk"))
          .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
          .select(hll_sketch_estimate(col("sk")).as("n_est")))
      dump("T40 — image-metadata curation filter (Curation.imageMetaFilter)",
        "Every gate (resolution floor, aspect bound, ×100-integer bpp " +
          "plausibility, caption char/token bounds) is a scan-column " +
          "boolean, so the whole filter is ONE Project over the scan — " +
          "no Exchange, no aggregate, no UDF — and whole-stage codegen " +
          "covers it end-to-end. Because the rules use the recorded " +
          "n_bytes rather than length(bytes), a pruned read never " +
          "materializes the pixel column for rows this gate drops.",
        // n_bytes here is a derived stand-in for the crawl's RECORDED
        // file size, deliberately NOT length(bytes): the whole point of
        // the dumped plan is that the scan's ReadSchema excludes the
        // pixel column.
        Curation.imageMetaFilter(corpus
          .select(col("image_id"), col("w"), col("h"),
            (col("w") * col("h") * 3).cast("long").as("n_bytes"),
            col("caption"))))
      dump("T41 — cluster-representative selection (Curation.clusterRepresentatives)",
        "Two codegen HashAggregates and nothing else. The obvious " +
          "one-agg form, max(struct(len, -doc_id)), was written first " +
          "and REJECTED: struct buffers are not hash-aggregable, so " +
          "Spark silently plans it as SortAggregate with a map-side " +
          "sort of the whole doc-level relation. Here the (cluster_id, " +
          "len) → min(doc_id) pre-collapse makes len unique per " +
          "cluster, so the cluster-level max_by(cand_id, len) — " +
          "primitive buffer, hash-eligible — can never tie and is " +
          "deterministic. The plan must contain NO Window and NO " +
          "SortAggregate (CurationSpec asserts both mechanically); both " +
          "exchanges carry partially-combined collapsed rows.",
        {
          val docs = corpus.select(xxhash64(col("image_id")).as("doc_id"),
            col("caption").as("text"))
          val clusters = docs.select(col("doc_id"),
            pmod(col("doc_id"), lit(50L)).as("cluster_id"))
          Curation.clusterRepresentatives(clusters, docs)
        })
      dump("T38/exactTier — byte-identical group edges (TieredDedup.exactImageEdges)",
        "md5 runs IN the scan projection (pixels never shuffle; only the " +
          "i64 id + public id + 32-char digest + caption leave the scan, " +
          "checkpointed once for the two consumers — the Scan " +
          "ExistingRDD below). Canon per digest = min REPAIRED i64 id: " +
          "a codegen HashAggregate with O(1) group state. min over the " +
          "public STRING id was written first and REJECTED — strings " +
          "have no mutable agg buffer, so Spark silently plans that as " +
          "SortAggregate over the corpus-scale digest relation. The " +
          "i64→public translation is one digest-keyed join against the " +
          "canon rows already in the member relation.",
        TieredDedup.exactImageEdges(
          corpus.select(col("image_id"), col("caption"), col("bytes"))))
      dump("T44 — reference-set Hamming decontamination (Curation.hammingDecontaminate)",
        "Decon-regime asymmetry: every join the corpus participates in " +
          "is a BroadcastHashJoin probed map-side (ref subset keys, the " +
          "candidate set, ref hashes for the popcount re-check, the " +
          "per-id hit rollup) — the corpus-scale relation appears only " +
          "as scan+project inputs and crosses NO Exchange. The one " +
          "Exchange in the plan carries the candidate pairs " +
          "(dropDuplicates), which are eval-leakage sized.",
        {
          val sims = corpus.select(xxhash64(col("image_id")).as("id"),
            col("phash").as("simhash"))
          Curation.hammingDecontaminate(sims,
            sims.where(pmod(col("id"), lit(7L)) === 0))
        })
      // deterministic vector column for the ANN-compression dumps
      val vecs = corpus.select(xxhash64(col("image_id")).as("id"),
        transform(sequence(lit(0), lit(15)), i =>
          (pmod(xxhash64(col("image_id"), i), lit(1000)) / lit(1000.0))
            .cast("float")).as("vec"))
      val qvecs = vecs.where(pmod(col("id"), lit(11L)) === 0)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      dump("T45 — PQ-ADC ANN (Pq.adcTopK)",
        "The corpus NEVER shuffles: encode is a map-side UDF projection " +
          "(float vector in, m-int code out — the vector column is " +
          "dropped from the index relation), scoring is a " +
          "BroadcastNestedLoopJoin against the tiny LUT-carrying query " +
          "side, the ADC sum is a codegen zip_with/aggregate HOF (m " +
          "lookups per candidate, not a dim-length dot), and the rank " +
          "filter sits directly above the window so WindowGroupLimit " +
          "pre-trims to top-k per query on both sides of the one " +
          "qid exchange.",
        Pq.adcTopK(vecs, qvecs, k = 5, m = 4, kCent = 16))
      dump("T45 — IVF+PQ composed ANN (Pq.ivfAdcTopK)",
        "The coarse cell prunes WHICH candidates score; the PQ code " +
          "compresses WHAT rides the probe join — the capKeyed bounded " +
          "aggregate and the gkey equi-join carry (cell, id, m-int code), " +
          "never float vectors. Same census'd cell cap " +
          "(ObjectHashAggregate over BoundedMinIds) as IVF-Flat; the " +
          "LUT stays on the query side.",
        Pq.ivfAdcTopK(vecs, qvecs, k = 5, nList = 8, nProbe = 2,
          m = 4, kCent = 16))
      dump("T46 — HTML main-text extraction (Curation.extractHtmlText)",
        "One row-local codegen Project over the scan — regex strips, ONE " +
          "block split, transform/filter/array_join HOFs — zero " +
          "Exchanges, zero UDFs; the only post-projection operators " +
          "belong to the caller (here an orderBy for the golden). The " +
          "whole classifier vanishes into the scan stage at any corpus " +
          "size.",
        {
          val ex = Curation.extractHtmlText(
            concat(lit("<div><a href=\"/\">Home</a></div><p>"),
              col("caption"), lit("</p>")))
          corpus.select(col("image_id"), ex("n_blocks").as("n_blocks"),
            ex("n_kept").as("n_kept"), md5(ex("text").cast("binary")).as("h"))
        })
      dump("T47 — boilerplate line removal (Curation.lineDedup)",
        "DF counting is the two-phase distinct rewrite: a (line-key, doc) " +
          "hash-agg absorbs hot boilerplate keys map-side BEFORE the " +
          "per-key count, the thresholded boilerplate set re-joins the " +
          "occurrences as the SMALL side (it is the crawl's boilerplate " +
          "vocabulary, not the corpus — AQE broadcasts it at scale), and " +
          "the per-doc rebuild is ONE hash aggregation whose " +
          "collect_list state is bounded by the document's own length. " +
          "No window, no sort, no corpus-sized driver state.",
        Curation.lineDedup(
          corpus.select(xxhash64(col("image_id")).as("doc_id"),
            split(col("caption"), " ").as("lines")), minDf = 5))
      dump("T48 — linear-probe embedding gate (Curation.linearProbe)",
        "ONE row-local codegen Project: the head rides as a dim+1 array " +
          "literal, the dot product is a fused zip_with/aggregate HOF — " +
          "zero Exchanges, zero UDFs, no broadcast (the head is bytes). " +
          "The gate fuses into whatever scan feeds it at any corpus " +
          "size; CurationSpec asserts the no-Exchange property " +
          "mechanically.",
        Curation.linearProbe(
          corpus.select(col("image_id"),
            transform(sequence(lit(1), lit(8)), i =>
              (pmod(xxhash64(col("image_id"), i), lit(1000L))
                .cast("double") / 500.0 - 1.0).cast("float")).as("embedding")),
          Curation.probeWeights(8, 7L), tau = 0.0))
      dump("T49 — cross-corpus LSH candidates (Lsh.crossCandidates)",
        "A×B linkage: each side collapses to capped buckets in its OWN " +
          "single hash aggregation (BoundedMinIds with map-side partial " +
          "combine — a hot band key is bounded to cap ids per task " +
          "BEFORE either Exchange), the two bucket tables meet in ONE " +
          "equi-join on (band, band_hash) — one row per band key per " +
          "side, never a row-level band join — and the ≤cap² id×id " +
          "cross pairs explode inside codegen. No payload column " +
          "crosses any Exchange.",
        {
          val sa = Signatures.signatures(corpus, cfg)
            .select(col("id"), col("minhash"))
            .where(pmod(col("id"), lit(2L)) === 0L)
          val sb = Signatures.signatures(corpus, cfg)
            .select(col("id"), col("minhash"))
            .where(pmod(col("id"), lit(2L)) =!= 0L)
          Lsh.crossCandidates(Lsh.bands(sa, cfg), Lsh.bands(sb, cfg), cfg)
        })

      val ldocs = spark.range(0, 400).select(col("id").as("doc_id"),
        expr("concat_ws(' ', transform(sequence(0, cast(pmod(id, 20) as int) + 5), " +
          "j -> concat('w', pmod(id * j, 40))))").as("text"))
      dump("T52 — BM25 top-k retrieval (Retrieval.bm25TopK)",
        "The Solr inverted index as relations: postings and df are " +
          "partial-combining HashAggregates; the tiny query-term side " +
          "is BROADCAST into the postings probe, so the corpus-sized " +
          "postings relation is filtered map-side and never reshuffled " +
          "whole; corpus constants are a one-row broadcast; the rank-k " +
          "cut sits directly above its window.",
        Retrieval.bm25TopK(
          ldocs.where(pmod(col("doc_id"), lit(13L)) === 0L)
            .select(col("doc_id").as("qid"), col("text").as("qtext")),
          ldocs, 5, maxDfFrac = 0.8))
      dump("T60 — BPE pair census, one training round (Bpe.pairCensus)",
        "The per-round heart of distributed BPE training: symbol pairs " +
          "explode in codegen straight off the vocab-bounded word " +
          "table, then ONE partial-combining HashAggregate (map-side " +
          "combine collapses repeated pairs before the Exchange, whose " +
          "volume is at most the pair vocabulary). No SortAggregate, " +
          "no window, no join — the argmax above it is a LIMIT 1 " +
          "TakeOrdered in the driver loop, one row per round.",
        Bpe.pairCensus(
          Bpe.wordCounts(ldocs)
            .select(concat(lit("x y z"), lit(" </w>")).as("seg"), col("cnt"))))
      dump("T56 — blocked sorted-neighborhood (Retrieval.sortedNeighborhood)",
        "ONE Window operator carries all w lead offsets (one Exchange " +
          "on the block key + one in-partition sort); pair expansion is " +
          "a codegen explode above it — no self-join, no second " +
          "shuffle, no global sort.",
        Retrieval.sortedNeighborhood(ldocs))
    }

    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
