package graft

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end near-duplicate pipeline (SURVEY.md §3.1 E1):
  *
  * {{{
  * ingest → signatures → bands → candidates(LSH ∪ SimHash ∪ suffix-array)
  *        → score → top-k → pixel-verify → connected components → clusters
  * }}}
  *
  * Every stage ends in a `TableIO.commit` (atomic snapshot + metrics);
  * rerunning a crashed job resumes after the last committed stage
  * (BASELINE.json:L6/L14).
  */
object Pipeline {

  /** `bucketCensus`: per candidate source, the observed bucket-cap metrics
    * (overflow_buckets / dropped_ids / max_bucket / n_buckets) — empty
    * until the candidate stage has executed at least once. A non-zero
    * overflow means the cap dropped candidates (recall-affecting) — never
    * silent, on every run path (W2).
    *
    * `unpersist()`: release cached intermediate stages once results have
    * been consumed (long-lived sessions would otherwise accumulate
    * MEMORY_AND_DISK blocks across runs).
    */
  final case class Result(
      clusters: DataFrame,
      verified: DataFrame,
      bucketCensus: () => Map[String, Map[String, Any]],
      unpersist: () => Unit)

  /** Union candidate-pair sources into canonical (a, b, src, span_len)
    * rows. Source provenance rides as a BIT MASK (the Int per source),
    * not collect_set: bit_or is a declarative aggregate, so the
    * HIGHEST-VOLUME aggregation in the engine (pair dedup over every
    * emitted candidate) stays a codegen HashAggregate — collect_set
    * forced ObjectHashAggregate, whose 128-key sort-based fallback
    * serialized buffers per row and TimSorted the whole pair relation per
    * task (measured dominant in stage profiles). The readable src string
    * is derived from the mask afterwards, row-local (and
    * deterministically ordered, which collect_set's concat never was).
    * Shared by the batch pipeline and the streaming micro-batch path.
    */
  private[graft] def mergeCandidates(sources: Seq[(DataFrame, Int)]): DataFrame = {
    val tagged = sources.map { case (df, bit) =>
      val withSpan =
        if (df.columns.contains("span_len")) df.select(col("a"), col("b"), col("span_len"))
        else df.select(col("a"), col("b")).withColumn("span_len", lit(0))
      withSpan.withColumn("srcb", lit(bit))
    }
    tagged.reduce(_.unionByName(_))
      .groupBy("a", "b")
      .agg(expr("bit_or(srcb)").as("srcb"), max(col("span_len")).as("span_len"))
      .withColumn("src", concat_ws("+", filter(array(
        when(col("srcb").bitwiseAND(1) =!= 0, "lsh"),
        when(col("srcb").bitwiseAND(2) =!= 0, "simhash"),
        when(col("srcb").bitwiseAND(4) =!= 0, "span")), x => x.isNotNull)))
      .drop("srcb")
  }

  /** Run without checkpointing (tests / bench). */
  def run(corpus: DataFrame, cfg: DedupConfig): Result =
    runStaged(corpus, cfg, io = None)

  /** Run with staged commits + resume. */
  def runCheckpointed(corpus: DataFrame, cfg: DedupConfig, io: TableIO): Result =
    runStaged(corpus, cfg, Some(io))

  private def runStaged(corpus: DataFrame, cfg: DedupConfig, io: Option[TableIO]): Result = {
    // Without table checkpoints each stage would lazily re-derive its whole
    // upstream DAG — signatures would be recomputed once per candidate path
    // plus twice in scoring. Persist re-used stages in memory (spilling to
    // disk) when no TableIO materializes them; track what we persisted so
    // the caller can release it (cache hygiene in long-lived sessions).
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def ckpt(stage: String, partitionBy: Seq[String] = Seq.empty,
        sortedBy: Option[String] = None)(df: => DataFrame): DataFrame = io match {
      case Some(t) =>
        if (sortedBy.isDefined)
          t.commitSorted(stage, df, sortedBy.get,
            corpus.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
        else if (partitionBy.nonEmpty) t.commitPartitioned(stage, df, partitionBy)
        else t.commit(stage, df)
      case None =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persisted += p
        p
    }
    // Wide pair stages commit BUCKETED on their downstream join key "a"
    // (Iceberg bucket transform twin, same as the signatures stage):
    // scoring joins candidates⋈sigs on a, verify joins scored⋈payload on
    // a — with the commit bucketed, those joins skip the bucketed side's
    // exchange in-run and on resume in a fresh JVM (TableIOSpec asserts
    // the plan). `verified` deliberately stays dup_part-PARTITIONED
    // instead: its only consumer (CC) filters dup rows and aggregates —
    // no pair-keyed equi-join to feed — so partition pruning (≥90% of the
    // stage's bytes skipped at realistic dup rates) is worth more than a
    // bucket layout nothing joins on.
    def ckptBucketed(stage: String)(df: => DataFrame): DataFrame = io match {
      case Some(t) => t.commitBucketed(stage, df, "a", cfg.sigBuckets)
      case None =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persisted += p
        p
    }

    // i64-id collision REPAIR (IdHash scaladoc has the envelope math):
    // collisions are certain at the 10¹² target (~27k expected), so the
    // colliding minority is re-salted until the id map is injective and
    // the tiny (image_id, salt) table rides as a broadcast into every
    // id-derivation site — and is committed so resumed runs derive
    // identical ids. None (no collisions) on every sandbox-scale corpus.
    // Doubles as the duplicate-image_id guard: duplicated public ids
    // land in the collider census (equal base hashes) and fail fast
    // inside buildRepairs — checked over the FULL corpus, as the CC
    // stage hashes every corpus id, at no extra corpus pass.
    val repairs = IdHash.buildRepairs(corpus.select(col("image_id")))
      .map(r => io.fold(r)(t => t.commit("id_repairs", r)))

    val clean = corpus
      .where(col("caption").isNotNull && length(col("caption")) > 0)
      .where(col("w") > 0 && col("h") > 0)

    // stage E (cfg.exactTier): byte-identical groups collapse BEFORE any
    // signature work — the crawl-scale lever (30–50% refetches) and the
    // LSH-skew killer (a viral exact-dup group's same-caption copies
    // become ONE signature row instead of a capped bucket with logged
    // drops). Committed, so a resumed run replays the (canon, dup,
    // same_caption) edges without re-digesting bytes. The edges go
    // straight to the CC stage; see TieredDedup.exactImageEdges for the
    // recall contract carried by same_caption and for why the digest is
    // un-gated.
    val exactEdges: Option[DataFrame] =
      if (!cfg.exactTier) None
      else Some(ckpt("exact_groups")(
        TieredDedup.exactImageEdges(clean, repairs)))

    // stage 0–1: filters + signatures (row-local, one codegen stage).
    // Committed BUCKETED by the i64 id (Iceberg bucket transform): the
    // signature table is the build side of the engine's widest joins
    // (scoring attaches both endpoints' signatures to every candidate
    // pair) and at 10¹² rows it cannot broadcast — the bucketed scan
    // reports HashPartitioning(id), so those joins shuffle only the pair
    // side, within this run and on resume in a fresh JVM. With the exact
    // tier on, SAME-CAPTION dup members are dropped from the signature
    // table (recall-safe: the canon's identical caption retrieves every
    // candidate theirs would have, and the pixel verify sees identical
    // bytes) while caption-REWRITTEN byte copies keep their own row —
    // their caption may be the only retrieval path to a third near-dup
    // (the anti-join is narrow — sketch rows against the dup ids, and
    // Catalyst pushes the anti through the sketch projection so dropped
    // rows never pay the MinHash; the commit re-buckets by id anyway).
    def repSigs: DataFrame = {
      val s0 = Signatures.signatures(clean, cfg, repairs)
      exactEdges.fold(s0)(e =>
        s0.join(e.where(col("same_caption")).select(col("b").as("image_id")),
          Seq("image_id"), "left_anti"))
    }
    val sigs = io match {
      case Some(t) => t.commitBucketed("signatures", repSigs, "id", cfg.sigBuckets)
      case None => ckpt("signatures")(repSigs)
    }

    // skew census (A3): checkpointed runs record the bucket-size
    // distribution + overflow count alongside the stage tables, so a
    // capped (recall-affecting) run is visible in the metrics, not silent
    io.foreach { t =>
      t.commit("bucket_stats", Lsh.bucketStats(Lsh.bands(sigs, cfg), cfg))
    }

    // stage 2–3: candidate generation (three retrieval paths, unioned).
    // Observations ride the plan and aggregate the bucket-cap census with
    // no extra job (harvested once the stage first executes).
    val lshObs = new Observation()
    val shObs = new Observation()
    val spanObs = new Observation()
    val spanDocObs = new Observation()
    val candidates = ckptBucketed("candidates") {
      val bandsDf = Lsh.bands(sigs, cfg)
      val lshPairs = Lsh.lshCandidates(bandsDf, cfg, dedup = false, census = Some(lshObs))
      val shPairs = Lsh.simhashCandidates(sigs, cfg, dedup = false, census = Some(shObs))
      val spanPairs = SuffixPass.spanCandidates(
        sigs.select(col("id"), col("norm")), cfg, census = Some(spanObs),
        docCensus = Some(spanDocObs))
      mergeCandidates(Seq(lshPairs -> 1, shPairs -> 2, spanPairs -> 4))
    }

    // stage 4: signature-space scoring + keep-rule + top-k. The signature
    // count (already materialized by the stage-1 checkpoint/persist)
    // drives the adaptive broadcast-vs-shuffle-hash join choice.
    val survivors = ckptBucketed("scored") {
      Scoring.filterAndTopK(Scoring.score(candidates, sigs, cfg, sigs.count()), cfg)
    }

    // stage 5: pixel verification (the only stage that touches bytes
    // again). Committed PARTITIONED on the dup verdict: the only
    // downstream consumer (the CC stage) filters to is_dup rows, so a
    // resumed run reads just the dup partition — at a realistic ~1–10%
    // dup rate that skips ≥90% of the stage's bytes. `dup_part` is an
    // int twin of is_dup because Spark's partition-column type inference
    // reads boolean directory values back as strings (a silent schema
    // change on resume); int round-trips. The candidates stage stays
    // UNPARTITIONED deliberately: its one consumer (scoring) reads every
    // row, so identity-partitioning it would buy no pruning and cost
    // small-file fan-out.
    val verified = ckpt("verified", Seq("dup_part")) {
      // the survivor count (cheap: the scored stage is materialized)
      // drives verify's join discipline — broadcast-pairs + semi-pruned
      // payloads when bounded, SHUFFLE_HASH otherwise
      Scoring.verify(survivors, corpus, cfg, repairs, survivors.count())
        .withColumn("dup_part", col("is_dup").cast("int"))
    }

    // stage 6–7: connected components over dup edges → stable cluster ids.
    // clusterHashed runs the star rounds on i64 ids (hash-aggregable min)
    // and translates the representative back to the public min-image_id
    // once at the end — see its scaladoc for the SortAggregate-per-round
    // hazard this avoids.
    // the assignment commits RANGE-CLUSTERED on cluster_id (zone map per
    // file): cluster audits — churn, representatives, per-cluster
    // inspection — are cluster-id range reads, served by loadRange from
    // the overlapping files instead of a table scan
    val clusters = ckpt("clusters", sortedBy = Some("cluster_id")) {
      // filter on the PARTITION column: a resumed run's scan of the
      // committed verified table prunes to the dup_part=1 directories.
      // Exact-tier groups enter here as ready-made dup edges (every
      // byte-identical pair has PSNR = ∞, so they ARE verified-dup
      // edges by the keep rule, at zero decode cost).
      val dupEdges = verified.where(col("dup_part") === 1).select(col("a"), col("b"))
      // under requireCaptionEq a byte-identical pair with a rewritten
      // caption is NOT a dup (the L15 letter), so only same-caption
      // exact edges enter CC — mirroring the caption_eq gate in verify
      val edges = exactEdges.fold(dupEdges) { e0 =>
        val e = if (cfg.requireCaptionEq) e0.where(col("same_caption")) else e0
        dupEdges.unionByName(e.select(col("a"), col("b")))
      }
      ConnectedComponents.clusterHashed(edges, corpus.select(col("image_id")),
        repairs = repairs)
    }

    // the CC loop's convergence actions have materialized every persisted
    // stage above; sigs/candidates/scored have no remaining consumers —
    // release them now. verified + clusters stay cached for the caller
    // (Result.unpersist releases those).
    val earlyRelease = persisted.filterNot(df => (df eq verified) || (df eq clusters))
    earlyRelease.foreach(_.unpersist(blocking = false))
    val lateRelease = persisted.filter(df => (df eq verified) || (df eq clusters))

    def census(): Map[String, Map[String, Any]] = {
      // non-blocking: future.value is Some only once the observed plan
      // node has executed (get() would hang if the stage never ran)
      def metrics(o: Observation): Map[String, Any] = o.future.value match {
        case Some(scala.util.Success(row)) if row.schema != null =>
          row.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> row.get(i) }.toMap
        case _ => Map.empty
      }
      val m = Map("lsh" -> metrics(lshObs), "simhash" -> metrics(shObs),
        "span" -> (metrics(spanObs) ++ metrics(spanDocObs)))
      m.foreach { case (src, c) =>
        c.get("overflow_buckets").collect { case n: Long if n > 0 =>
          System.err.println(s"[graft] $src bucket cap overflow: $c")
        }
        c.get("oversized_docs").collect { case n: Long if n > 0 =>
          System.err.println(s"[graft] $src oversized-doc drops: $c")
        }
      }
      m
    }

    Result(clusters, verified, () => census(),
      () => lateRelease.foreach(_.unpersist(blocking = false)))
  }
}

/** spark-submit entry point (SURVEY.md §3.1/§3.3):
  * `graft.DedupJob --input <parquet> --out <dir> [--run-id <id>] [--resume]`.
  */
object DedupJob {

  /** Flags (valueless) and key-value options; order-independent. The old
    * `args.sliding(2,2)` pairing misaligned every option after a valueless
    * flag, silently dropping `--out` in `--resume --input x --out y`.
    */
  private[graft] def parseArgs(args: Array[String]): (Map[String, String], Set[String]) = {
    val boolFlags = Set("--resume")
    val kv = scala.collection.mutable.Map.empty[String, String]
    val flags = scala.collection.mutable.Set.empty[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (boolFlags(a)) { flags += a; i += 1 }
      else if (a.startsWith("--") && i + 1 < args.length) { kv(a) = args(i + 1); i += 2 }
      else sys.error(s"unrecognized or valueless argument: $a")
    }
    (kv.toMap, flags.toSet)
  }

  def main(args: Array[String]): Unit = {
    val (argMap, flags) = parseArgs(args)
    val input = argMap.getOrElse("--input", sys.error("--input required"))
    val out = argMap.getOrElse("--out", sys.error("--out required"))
    val runId = argMap.getOrElse("--run-id", "run-" + System.currentTimeMillis())
    val resume = flags("--resume")

    // spark-submit injects --master in production; local runs (sbt runMain)
    // fall back to SPARK_MASTER or all cores.
    val builder = SparkSession.builder()
      .appName("graft-dedup")
      .config("spark.sql.adaptive.enabled", "true")
      // bounded-state UDAF buckets: keep the aggregation hash-based (the
      // 128-key default forces a sort-based fallback; see Bench.session)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.props.get("spark.master")
      .orElse(sys.env.get("SPARK_MASTER"))
      .map(builder.master)
      .getOrElse(builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        // local-mode split sizing: keep scan parallelism ≥ cores on
        // MB-scale corpora (see Bench.session); cluster runs configure
        // this via spark-submit instead.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        // see Bench.session: AQE's byte-based coalescing under-
        // parallelizes the CPU-dense bounded-state aggregates
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --oph-signatures true swaps the signature sketch for the densified
    // OPH form (model.scala useOphSignatures) — flows into configHash, so
    // a resume against classic-sketch snapshots refuses (the sketches are
    // not comparable).
    // --exact-tier true collapses byte-identical groups before signatures
    // (model.scala exactTier) — also in configHash, so resume against
    // snapshots produced without the tier refuses (the signature and
    // candidate tables cover different row sets).
    // --require-caption-eq true enforces the L15 invariant's letter
    // (pixels AND caption equality — model.scala requireCaptionEq); in
    // configHash, so resume against pixel-only snapshots refuses.
    val cfg = DedupConfig(
      useOphSignatures = argMap.get("--oph-signatures").exists(_.toBoolean),
      exactTier = argMap.get("--exact-tier").exists(_.toBoolean),
      requireCaptionEq = argMap.get("--require-caption-eq").exists(_.toBoolean))
    val priorCommits = java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/_manifest/config.hash"))
    if (priorCommits && !resume)
      System.err.println(s"[graft] $out already holds committed snapshots; " +
        "they will be reused (pass --resume to acknowledge explicitly)")
    if (resume && !priorCommits)
      System.err.println(s"[graft] --resume given but $out has no committed " +
        "snapshots; running from scratch")
    val io = new ParquetTableIO(spark, out, runId, cfg.configHash)
    val corpus = spark.read.parquet(input)
    val result = Pipeline.runCheckpointed(corpus, cfg, io)
    val n = result.clusters.count()
    val nClusters = result.clusters.select("cluster_id").distinct().count()
    result.bucketCensus() // logs any cap overflow to stderr
    result.unpersist()
    println(s"""{"images":$n,"clusters":$nClusters,"run_id":"$runId"}""")
    // --inspect <cluster_id>: point lookup on the committed assignment —
    // the zone-map read path (files_read says how many of the snapshot's
    // files the range actually touched; disjoint zones ⇒ 1)
    argMap.get("--inspect").foreach { cid =>
      val pruned = io.loadRange("clusters", "cluster_id", cid, cid)
        .getOrElse(sys.error("clusters stage not committed"))
      println(s"""{"inspect":"$cid","members":${pruned.count()},""" +
        s""""files_read":${pruned.inputFiles.length}}""")
    }
    // --report true: operator-facing run report — the T28 cluster-size
    // histogram over the COMMITTED assignment (how much of the corpus is
    // duplicated, at what cluster granularity), committed as its own
    // `report` snapshot and printed as one JSON line. Reads the clusters
    // commit, not the in-memory result: two hash aggregations over a
    // two-column table, collect bounded by distinct sizes.
    if (argMap.get("--report").exists(_.toBoolean)) {
      val clusters = io.load("clusters")
        .getOrElse(sys.error("clusters stage not committed"))
      val hist = io.commit("report",
        clusters.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
          .groupBy(col("sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs")))
      val rows = hist.orderBy("cluster_size").collect()
        .map(r => s"""{"size":${r.getLong(0)},"n_clusters":${r.getLong(1)},""" +
          s""""n_docs":${r.getLong(2)}}""")
        .mkString(",")
      println(s"""{"report":[$rows]}""")
    }
    // --decontaminate <refs.parquet>: reference-set Hamming
    // decontamination (T44) against this run's committed signatures —
    // the refs corpus (same image+caption shape) goes through the SAME
    // signature kernel, contaminated images are committed as their own
    // snapshot, and the hit count is summarized on stdout. Refs are
    // eval-sized, so their pigeonhole keys broadcast (the T44 regime);
    // the corpus-side signatures come from the committed table, not a
    // recompute.
    // --churn-against <other_out_dir>: T43 churn audit between THIS
    // run's committed clusters and another run's (yesterday's corpus, a
    // config A/B) — one summary JSON line computed off the collapsed
    // (old,new) contingency; nothing rescans images. The other run may
    // well have a different config (that is the POINT of a churn
    // audit), so its clusters are read under ITS OWN recorded config
    // hash — the idempotence guard stays intact for writes.
    argMap.get("--churn-against").foreach { otherOut =>
      val mine = io.load("clusters")
        .getOrElse(sys.error("clusters stage not committed"))
      val otherHash = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$otherOut/_manifest/config.hash")).trim
      val other = new ParquetTableIO(spark, otherOut, runId, otherHash)
        .load("clusters")
        .getOrElse(sys.error(s"$otherOut has no clusters commit"))
      // min-member-id labels are comparable across runs (A5 canon)
      def asDocs(df: DataFrame) = df.select(
        col("image_id").as("doc_id"), col("cluster_id"))
      val r = Curation.clusterChurn(asDocs(other), asDocs(mine)).collect()(0)
      println(s"""{"churn":{"n_docs":${r.getLong(0)},""" +
        s""""n_moved":${r.getLong(1)},"n_old_clusters":${r.getLong(2)},""" +
        s""""n_new_clusters":${r.getLong(3)},"n_split":${r.getLong(4)},""" +
        s""""n_merged":${r.getLong(5)}}}""")
    }
    argMap.get("--decontaminate").foreach { refsPath =>
      val sigs = io.load("signatures")
        .getOrElse(sys.error("signatures stage not committed"))
      val refSigs = Signatures.signatures(spark.read.parquet(refsPath), cfg)
        .select(col("id"), col("simhash"))
      val hits = Curation.hammingDecontaminate(
        sigs.select(col("image_id"), col("id"), col("simhash")), refSigs, cfg)
        .where(col("contaminated"))
        .select(col("image_id"), col("min_hamming"), col("n_refs"))
      val committed = io.commit("decontaminated", hits)
      println(s"""{"decontaminated":${committed.count()},"refs":"$refsPath"}""")
    }
    spark.stop()
  }
}
