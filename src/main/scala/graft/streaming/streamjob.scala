package graft.streaming

import graft._
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Runnable streaming surface: continuous ingest of image+caption rows →
  * incremental near-dup candidates against the committed historical index
  * → score/verify → TableIO commit, all inside `foreachBatch` so every
  * micro-batch reuses the BATCH operators unchanged (one code path,
  * SURVEY.md §2.9; the stateful ST2/ST3/ST5 operators in [[Streaming]]
  * cover the purely-streaming shapes).
  *
  * Retrieval completeness per batch: a micro-batch's rows pair
  *  - with EACH OTHER via the same three batch candidate operators
  *    (LSH bands, SimHash pigeonhole, winnow-fingerprint span pass), and
  *  - with ALL COMMITTED HISTORY via equi-joins of the batch's routing
  *    keys against three committed key tables ("bands", "simhash_keys",
  *    "span_fps") — the committed-snapshot join ST4 described, with the
  *    historical side of each hot key capped by the same
  *    [[graft.functions.BoundedMinIds]] bounded aggregate as batch (W2).
  * Committed-vs-committed pairs were evaluated by earlier batches, so
  * after batch N the accumulated verified-pair set equals the batch run's
  * on the same data (whenever no bucket cap / top-k gate binds — caps are
  * censused in batch and the stream job inherits the same configuration).
  *
  * Exactly-once without a transaction log: every commit is tagged with
  * the micro-batch id — [[TableIO.append]]/[[TableIO.replaceTagged]] make
  * a replayed tag a no-op, and the corpus append runs LAST so a crashed
  * batch replays deterministically from its anti-join against committed
  * image_ids (recomputing identical snapshots into the same tag dirs).
  *
  * Scale notes: per batch, history is touched as (i) pruned columnar
  * scans of the three key tables (i64 keys only — payloads and pixels
  * never ride these joins), (ii) the signature re-join for scoring, and
  * (iii) a CC re-run over accumulated DUP EDGES (≪ corpus; the
  * exact-duplicate canonical assignment that doesn't need edges is the
  * O(1)-state [[Streaming.assignCanonicalStream]]). Cross-batch i64-id
  * collision repair is INCREMENTAL ([[IdHash.buildRepairsIncremental]]):
  * only the batch's base hashes are checked, against the committed
  * signature ids via a shuffle-free scan ⋈ broadcast semi-join — new
  * collisions necessarily involve a new row, because the committed id
  * space is already injective. Clustering is likewise incremental (see
  * the CC block in [[processBatch]]), and so is its SINK: per batch only
  * the re-clustered rows are appended to a delta log
  * ("cluster_deltas"), merged with the base assignment on read
  * ([[liveClusters]]) and folded into a fresh base snapshot every
  * `streamCompactEvery` batches and at end-of-stream
  * ([[compactClusters]]) — the Iceberg MERGE INTO + compaction shape,
  * expressed in the snapshot/manifest TableIO. Per-batch write cost is
  * O(churn + corpus/compactEvery) instead of the O(corpus)
  * full-assignment rewrite.
  */
object StreamJob {

  /** One micro-batch (foreachBatch body). Public so specs can drive it
    * directly; the streaming wiring is [[runOnce]]/[[main]].
    *
    * `tagPrefix` scopes the commit tags to ONE stream run (runOnce
    * passes an id persisted in the checkpoint dir): without it, a fresh
    * checkpoint against an existing table dir restarts batch ids at 0
    * and every tagged append would no-op against the PREVIOUS run's
    * `b0` snapshots — silently dropping all of the new run's data.
    * Replays within one run keep the same prefix (the id file lives in
    * the checkpoint), so the exactly-once no-op behavior is unchanged.
    */
  def processBatch(io: TableIO, cfg: DedupConfig, verbose: Boolean = true,
      tagPrefix: String = "")(
      batch: DataFrame, batchId: Long): Unit = {
    val corpusHist = io.load("corpus")
    // exact-dup suppression + replay guard: rows whose image_id is
    // already committed (same id = same content upstream contract, as in
    // ST3) are dropped; a crash-replayed batch therefore no-ops. The
    // SAME contract makes an in-batch duplicate id legitimate (the same
    // row fetched twice landing in one micro-batch) — without the
    // dropDuplicates it would reach the id-collision repair, whose
    // unique-id require would throw, and AvailableNow would replay the
    // identical batch into the identical crash forever.
    val newRows = corpusHist
      .fold(batch)(h => batch.join(h.select("image_id"), Seq("image_id"), "left_anti"))
      .dropDuplicates("image_id")
      .localCheckpoint()
    val nNew = newRows.count()
    if (nNew == 0) return
    val corpusAll = corpusHist.fold(newRows)(h => h.unionByName(newRows))

    // committed index tables are loaded BEFORE this batch's keys append
    val sigsHist = io.load("signatures")
    val bandsHist = io.load("bands")
    val simKeysHist = io.load("simhash_keys")
    val fpsHist = io.load("span_fps")

    // Incremental id-collision repair: only the new rows are checked —
    // against the committed id space (one narrow scan of the signature
    // table's id column), never by re-aggregating the full accumulated
    // corpus per batch (the batch buildRepairs cost model, prohibitive at
    // stream scale). Replay guard: a crashed batch may have committed its
    // signatures/id_repairs before the corpus append, so the committed
    // side is anti-joined down to the PRE-batch space first — the replay
    // then re-derives byte-identical repairs and every tagged commit
    // no-ops.
    val newIds = newRows.select(col("image_id"))
    val preBatch = (df: DataFrame) =>
      df.join(broadcast(newIds), Seq("image_id"), "left_anti")
    // the committed id space is derived from the CORPUS (one pruned
    // image_id column scan + the codegen hash projection under the
    // committed repairs), NOT from the signatures table: exact-tier
    // suppression commits same-caption dup rows to the corpus WITHOUT
    // signature rows, and a new row colliding with such a row's id
    // would go undetected — two corpus rows sharing one i64 id is
    // exactly the corruption IdHash exists to prevent
    val repairsHist = io.load("id_repairs").map(preBatch)
    val repairs = IdHash.buildRepairsIncremental(
        newIds,
        corpusHist.map(h => IdHash.withId(
          preBatch(h).select(col("image_id")), "image_id", "id", repairsHist)
          .select(col("id"))),
        repairsHist)
      .map(r => io.replaceTagged("id_repairs", r, s"${tagPrefix}b$batchId"))

    val clean = newRows
      .where(col("caption").isNotNull && length(col("caption")) > 0)
      .where(col("w") > 0 && col("h") > 0)
    val tag = s"${tagPrefix}b$batchId"

    // stage E (cfg.exactTier), the streaming twin of the batch exact
    // pre-tier: the committed "exact_keys" index carries every clean
    // row's (md5(bytes), md5(caption)); a batch's keys probe it as a
    // scan ⋈ broadcast(batch keys) join — shuffle-free like every other
    // history touch — and within-batch groups come from the SAME
    // TieredDedup.exactImageEdges operator as batch. The same_caption
    // recall contract carries over verbatim: a batch row byte-identical
    // AND caption-identical to some committed/batch row is dropped from
    // signature + routing-key commits (its retrieval is covered by the
    // covering row's identical caption against identical bytes — the
    // first committed row of every (ek, ck) class keeps live signatures,
    // so the cover holds transitively across batches), while a
    // caption-REWRITTEN byte copy keeps its own keys. The committed side
    // is pre-batch-pruned like the repair path, so a crash-replayed
    // batch cannot self-match; the tagged appends make the replay a
    // no-op anyway.
    val exactTierState: Option[(DataFrame, DataFrame, Option[DataFrame])] =
      if (!cfg.exactTier) None
      else {
        val ekNew = clean.select(col("image_id"),
          md5(col("bytes")).as("ek"),
          md5(col("caption").cast("binary")).as("ck"))
          .localCheckpoint()
        val within = TieredDedup.exactImageEdges(clean, repairs)
        val hist = io.load("exact_keys").map(preBatch)
        val cross = hist.map { h =>
          h.join(broadcast(ekNew.select(col("ek"), col("ck").as("__ckn"),
              col("image_id").as("b"))), Seq("ek"))
            .select(col("image_id").as("a"), col("b"),
              (col("ck") === col("__ckn")).as("same_caption"))
        }
        val edges = cross.fold(within)(within.unionByName(_)).localCheckpoint()
        Some((edges, ekNew, hist))
      }
    val exactEdges: Option[DataFrame] = exactTierState.map(_._1)

    // rows whose signatures are suppressed by the tier's same-caption
    // cover (shared by the signature anti-join and the index-rep choice
    // below — the cover row of a class must be one that KEEPS live
    // signatures)
    val suppressedIds: Option[DataFrame] = exactEdges.map(e =>
      e.where(col("same_caption")).select(col("b").as("image_id"))
        .dropDuplicates("image_id").localCheckpoint())

    val sigsNew = {
      val s0 = Signatures.signatures(clean, cfg, repairs)
      suppressedIds.fold(s0)(sup =>
        s0.join(sup, Seq("image_id"), "left_anti"))
    }.localCheckpoint()

    // the committed exact-keys index keeps ONE representative per
    // (ek, ck) class, appended only for classes not already present —
    // bounding the index at DISTINCT content classes and the per-probe
    // fanout at caption-variants per byte content instead of O(class
    // members): a viral byte-identical image previously joined every
    // committed member per new copy (O(N) edges per arrival, O(N²)
    // accumulated — exactly the skew this tier exists to remove).
    // Connectivity is preserved (every arrival edges to its class rep,
    // so classes are stars), and the rep is chosen among rows whose
    // signatures stayed LIVE after this batch's suppression — for the
    // canon-caption class that is exactly the byte-group keeper — so
    // the same_caption retrieval cover holds across batches.
    exactTierState.foreach { case (_, ekNew, hist) =>
      val live = suppressedIds.fold(ekNew)(sup =>
        ekNew.join(sup, Seq("image_id"), "left_anti"))
      val ekReps = live.groupBy("ek", "ck")
        .agg(min(col("image_id")).as("image_id"))
        .select(col("image_id"), col("ek"), col("ck"))
      val ekCommit = hist.fold(ekReps)(h =>
        ekReps.join(h.select("ek", "ck"), Seq("ek", "ck"), "left_anti"))
      io.append("exact_keys", ekCommit, tag)
    }

    val bandsNew = Lsh.bands(sigsNew, cfg)
    val simKeysNew = Lsh.simhashKeys(sigsNew, cfg)
    // winnow fingerprints derived ONCE per batch (localCheckpoint) and
    // shared by the committed key table, the cross-history probe, and
    // the within-batch span pass — previously the winnowing expression
    // (the span path's most expensive row-local stage) ran twice over
    // every caption, once for the keys and once inside spanCandidates
    val fpsWithNorm = SuffixPass.spanFps(
      sigsNew.select(col("id"), col("norm")), cfg).localCheckpoint()
    val fpsNew = fpsWithNorm.select(col("id"), col("fp"))

    // within-batch candidates: the three batch operators, fed the SAME
    // key relations the history probes and commits use
    val within = Seq(
      Lsh.lshCandidates(bandsNew, cfg, dedup = false) -> 1,
      Lsh.emitPairs(simKeysNew, Seq("cid", "key"), "simhash", cfg,
        dedup = false, census = None) -> 2,
      SuffixPass.spanCandidatesFromFps(fpsWithNorm, cfg) -> 4)

    // cross candidates: batch keys equi-joined against committed history
    val sigsAll = sigsHist.fold(sigsNew)(_.unionByName(sigsNew))
    val cross: Seq[(DataFrame, Int)] =
      (bandsHist, simKeysHist, fpsHist) match {
        case (Some(bh), Some(sh), Some(fh)) =>
          val norms = sigsAll.select(col("id"), col("norm"))
          // dedup BEFORE the span kernel: crossPairs emits one row per
          // (pair, shared fingerprint), and cluster-mates share most of
          // their ~|caption| fingerprints — running the per-pair
          // suffix-array UDF on every duplicate multiplied the batch's
          // most expensive stage ~50× (measured: the verified commit
          // dominated micro-batch wall time before this dedup)
          val spanIds = crossPairs(fpsNew, fh, Seq("fp"), cfg)
            .dropDuplicates("a", "b")
          val spanScored = spanIds
            .join(norms.select(col("id").as("a"), col("norm").as("na")), "a")
            .join(norms.select(col("id").as("b"), col("norm").as("nb")), "b")
            .withColumn("span_len",
              SuffixPass.pairSpanUdf(col("na"), col("nb"), lit(cfg.saMinSpan)))
            .where(col("span_len") >= cfg.saMinSpan)
            .select(col("a"), col("b"), col("span_len"))
          Seq(
            crossPairs(bandsNew, bh, Seq("band", "band_hash"), cfg) -> 1,
            crossPairs(simKeysNew, sh, Seq("cid", "key"), cfg) -> 2,
            spanScored -> 4)
        case _ => Seq.empty // first batch: no history
      }
    // ONE materialization of the candidate DAG (span kernel + cross-key
    // joins — the batch's most expensive derivation): it feeds both the
    // endpoint projection and the scoring join, which without the
    // checkpoint re-executed the whole DAG each.
    val candidates = Pipeline.mergeCandidates(within ++ cross).localCheckpoint()

    // Scoring/verify touch committed history ONLY through batch-bounded
    // pruned slices: candidate endpoints are batch-bounded (new-row
    // endpoints × bounded caps), so they broadcast into shuffle-free
    // semi-joins that cut the signature and payload relations down BEFORE
    // the scoring joins. Without this, score's SHUFFLE_HASH regime would
    // shuffle the full committed signature table per micro-batch, and the
    // payload join could put committed pixel bytes on a shuffle — the
    // pruned payload side stays broadcast-sized, so bytes never leave
    // their scan tasks (the stream twin of the batch path's
    // payload-pruning discipline).
    val endpointIds = candidates.select(col("a").as("id"))
      .unionByName(candidates.select(col("b").as("id")))
      .dropDuplicates("id")
    val sigsTouched = sigsAll
      .join(broadcast(endpointIds), Seq("id"), "left_semi").localCheckpoint()
    val survivors = Scoring.filterAndTopK(
      Scoring.score(candidates, sigsTouched, cfg, sigsTouched.count()), cfg)
      .localCheckpoint() // consumed by the id projection AND verify
    val survIds = survivors.select(col("a").as("id"))
      .unionByName(survivors.select(col("b").as("id"))).dropDuplicates("id")
    // checkpointed: verify builds BOTH payload sides from this slice, so
    // without the checkpoint the committed-corpus byte scan (+ id
    // projection + semi-join) executed twice per batch — and the
    // checkpointed slice is survivor-bounded, so the verify joins run
    // over batch-sized relations regardless of accumulated history.
    val corpusTouched = IdHash.withId(corpusAll, "image_id", "id", repairs)
      .join(broadcast(survIds), Seq("id"), "left_semi")
      .drop("id")
      .localCheckpoint()
    val verifiedNew =
      Scoring.verify(survivors, corpusTouched, cfg, repairs, survivors.count())

    // commits: index tables + verified pairs appended, clusters replaced,
    // corpus appended LAST (the batch's replay guard)
    io.append("signatures", sigsNew, tag)
    io.append("bands", bandsNew, tag)
    io.append("simhash_keys", simKeysNew, tag)
    io.append("span_fps", fpsNew, tag)
    io.append("verified", verifiedNew, tag)
    exactEdges.foreach(e => io.append("exact_edges", e, tag))
    // Fold the PROBE-PATH key tables when their append chains get long
    // (same schedule and cost model as the cluster sink): every batch's
    // history joins open each chain's snapshot dirs, so an uncompacted
    // stream pays O(batches) file-opens per batch — at 10⁴ micro-batches
    // the metadata cost dwarfs the scans. A compaction rewrites the table
    // once per `streamCompactEvery` batches — amortized O(rows/
    // compactEvery) per batch on NARROW (i64-key) tables. `verified`/
    // `exact_edges` stay append-only: nothing re-reads them in full
    // (CC reads star-compressed assignments), and append chains are what
    // FeedJob consumers tail. The corpus stays append-only too — its
    // rows carry image bytes, and rewriting O(corpus) payload bytes per
    // interval is the one cost this schedule cannot amortize (Iceberg's
    // bin-packing data compaction owns that in production). Replay-safe
    // in the crash window between this fold and the corpus append because
    // TableIO.append no-ops on tags found anywhere in HISTORY, not just
    // the live entry.
    for (st <- Seq("signatures", "bands", "simhash_keys", "span_fps") ++
               (if (cfg.exactTier) Seq("exact_keys") else Nil))
      if (io.appendChainLength(st) >= cfg.streamCompactEvery)
        io.replaceTagged(st, io.load(st).get, s"compact-$tag")
    // Incremental connected components: re-clustering over ALL accumulated
    // dup edges per batch reads a table that grows without bound (dup
    // pairs are superlinear in dup-heavy streams). Instead, history is
    // compressed into the committed ASSIGNMENT's star edges — image_id →
    // cluster_id has exactly the same connected components as the full
    // historical edge set — and only clusters actually touched by this
    // batch's edges are re-clustered (every new edge has a new-row
    // endpoint, so untouched clusters cannot change). Per-batch CC cost is
    // O(|new edges| + |rows of affected clusters|), independent of the
    // accumulated pair count. The endpoint/affected relations are
    // batch-bounded, so they ride as broadcasts into pruned semi-joins of
    // the committed assignment.
    // exact-tier group edges are verified-dup edges by the keep rule
    // (identical bytes ⇒ PSNR = ∞) and enter CC at zero decode cost
    val dupEdges = io.loadTagged("verified", tag).get
      .where(col("is_dup")).select(col("a"), col("b"))
    val newEdges = io.loadTagged("exact_edges", tag)
      .map { e0 =>
        // requireCaptionEq: same-caption exact edges only (the batch
        // pipeline's gate, mirrored — stream ≡ batch under the flag)
        val e = if (cfg.requireCaptionEq) e0.where(col("same_caption")) else e0
        dupEdges.unionByName(e.select(col("a"), col("b")))
      }
      .getOrElse(dupEdges)
    val clusters = liveClusters(io) match {
      case None => // first batch: plain CC, committed as the base snapshot
        val cc = ConnectedComponents.clusterHashed(
          newEdges, corpusAll.select(col("image_id")), repairs = repairs)
        io.replaceTagged("clusters", cc, tag)
      case Some(ch) =>
        val endpoints = newEdges.select(col("a").as("image_id"))
          .union(newEdges.select(col("b").as("image_id"))).distinct()
        val affected = ch
          .join(broadcast(endpoints), Seq("image_id"), "left_semi")
          .select(col("cluster_id")).distinct()
        val affRows = ch.join(broadcast(affected), Seq("cluster_id"), "left_semi")
        // the representative is itself a member, so rep vertices survive in
        // `verts`; self-edges are dropped (CC treats them as no-ops anyway)
        val starEdges = affRows.where(col("image_id") =!= col("cluster_id"))
          .select(col("image_id").as("a"), col("cluster_id").as("b"))
        val verts = affRows.select(col("image_id"))
          .unionByName(newRows.select(col("image_id")))
          // replay hygiene: a crashed batch may have committed its cluster
          // delta before the corpus append, so the batch's rows can already
          // sit in affRows — dedup instead of assuming disjointness
          .dropDuplicates("image_id")
        val sub = ConnectedComponents.clusterHashed(
          starEdges.unionByName(newEdges), verts, repairs = repairs)
        // MERGE-ON-READ cluster sink (Iceberg MERGE INTO / equality-delete
        // twin): only the re-clustered rows are WRITTEN per batch — the
        // full-assignment rewrite was the stream's one remaining
        // O(corpus)-per-batch cost (every other per-batch computation is
        // batch-bounded). Readers merge base + delta log via
        // [[liveClusters]]; the log is folded into a fresh base snapshot
        // every `streamCompactEvery` batches and at end-of-stream
        // ([[compactClusters]]), so the at-rest table stays a complete
        // assignment for external readers.
        io.append("cluster_deltas",
          sub.select(col("image_id"), col("cluster_id"))
            .withColumn("delta_batch", lit(batchId)), tag)
        val liveNow = ch
          .join(broadcast(affected), Seq("cluster_id"), "left_anti")
          // same replay window as `verts`: rows re-derived in `sub` must
          // not ALSO survive on the history side (no-op in the normal
          // path — new rows aren't committed yet)
          .join(broadcast(newIds), Seq("image_id"), "left_anti")
          .select(col("image_id"), col("cluster_id"))
          .unionByName(sub.select(col("image_id"), col("cluster_id")))
        if (io.appendChainLength("cluster_deltas") >= cfg.streamCompactEvery) {
          io.replaceTagged("clusters", liveNow, tag)
          io.resetStage("cluster_deltas")
        }
        liveNow
    }
    io.append("corpus", newRows, tag)

    if (verbose) {
      val nClusters = clusters.select("cluster_id").distinct().count()
      println(s"""{"batch":$batchId,"new_rows":$nNew,"clusters":$nClusters,"run_id":"${io.runId}"}""")
    }
  }

  /** Live cluster assignment = base snapshot merged with the delta log
    * (Iceberg merge-on-read): delta keys win over base (anti-join), the
    * newest delta wins per key. Both delta-side relations are bounded by
    * churn since the last compaction (≤ `streamCompactEvery` batches of
    * re-clustered rows), so they ride as broadcasts — the base assignment
    * is never shuffled to read it.
    */
  private[graft] def liveClusters(io: TableIO): Option[DataFrame] =
    io.load("clusters").map { base =>
      io.load("cluster_deltas") match {
        case None => base.select(col("image_id"), col("cluster_id"))
        case Some(d) =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("image_id")).orderBy(col("delta_batch").desc)
          val lww = d.withColumn("rk", row_number().over(w))
            .where(col("rk") === 1).select(col("image_id"), col("cluster_id"))
          base
            .join(broadcast(d.select(col("image_id")).dropDuplicates("image_id")),
              Seq("image_id"), "left_anti")
            .select(col("image_id"), col("cluster_id"))
            .unionByName(lww)
      }
    }

  /** Fold the cluster delta log into a full base snapshot (Iceberg table
    * compaction). The tag derives from the newest delta batch, so a
    * replayed compaction no-ops; the reset is manifest-level and atomic.
    */
  private[graft] def compactClusters(io: TableIO): Unit =
    for (d <- io.load("cluster_deltas"); live <- liveClusters(io)) {
      val maxBatch = d.agg(max(col("delta_batch"))).head.getLong(0)
      io.replaceTagged("clusters", live, s"compact-b$maxBatch")
      io.resetStage("cluster_deltas")
    }

  /** New-vs-history pair generation for one routing-key family: the
    * committed side is first pruned to the keys this batch actually
    * touches — a shuffle-free scan ⋈ broadcast(batch keys) semi-join
    * (keys absent from the batch can produce no pairs, so this is
    * lossless) — and only then capped to the `bucketCap` smallest ids
    * per key inside one bounded hash aggregation (map-side combine, the
    * same W2 skew discipline as the batch self-join). Without the prune
    * the bounded aggregation ran over the FULL committed key table every
    * micro-batch — a corpus-wide shuffle per batch, the same cost model
    * the incremental repair/CC steps exist to avoid. One equi-join then
    * emits canonical (a < b) pairs.
    */
  private[streaming] def crossPairs(
      newKeys: DataFrame, histKeys: DataFrame, keys: Seq[String],
      cfg: DedupConfig): DataFrame = {
    val wanted = newKeys.select(keys.map(col): _*).dropDuplicates(keys)
    val touched = histKeys.join(broadcast(wanted), keys, "left_semi")
    val capped = touched
      .groupBy(keys.map(col): _*)
      .agg(graft.functions.GraftAggregates.boundedMinIds(cfg.bucketCap)(col("id")).as("b"))
      .select((keys.map(col) :+ explode(col("b.ids")).as("hid")): _*)
    newKeys.join(capped, keys)
      .where(col("id") =!= col("hid"))
      .select(least(col("id"), col("hid")).as("a"),
        greatest(col("id"), col("hid")).as("b"))
  }

  /** Wire a parquet-directory file stream through [[processBatch]] and
    * process everything currently available (Trigger.AvailableNow), then
    * stop — restart-safe via the stream checkpoint + tagged commits.
    */
  def runOnce(
      spark: SparkSession,
      inputDir: String,
      outDir: String,
      checkpointDir: String,
      runId: String,
      maxFilesPerTrigger: Int = 1,
      verbose: Boolean = true,
      cfg: DedupConfig = DedupConfig(),
      expireKeep: Int = 0): Unit = {
    val io = new ParquetTableIO(spark, outDir, runId, cfg.configHash)
    // Stream identity, persisted IN the checkpoint dir: commit tags are
    // scoped to it, so a fresh checkpoint against an existing table dir
    // gets fresh tags (batch ids restart at 0 — unscoped `b0` tags
    // would no-op against the previous run's snapshots and silently
    // drop every row of the new run), while a restart of the SAME
    // checkpoint reads the same id and keeps the exactly-once replay
    // no-ops.
    val idPath = java.nio.file.Paths.get(checkpointDir, "graft_stream_id")
    java.nio.file.Files.createDirectories(idPath.getParent)
    if (!java.nio.file.Files.exists(idPath)) {
      // pre-upgrade checkpoint (offsets already exist but no id file):
      // keep the LEGACY EMPTY prefix, persisted, so an in-flight batch
      // replayed from that checkpoint no-ops against the prior attempt's
      // untagged 'bN' snapshots instead of re-committing under fresh
      // '<id>-bN' tags — the exactly-once tag guarantee holds across the
      // upgrade, not just for checkpoints born after it.
      val offsets = new java.io.File(checkpointDir, "offsets").list()
      val legacy = offsets != null && offsets.nonEmpty
      java.nio.file.Files.writeString(idPath,
        if (legacy) "" else java.util.UUID.randomUUID().toString.take(8))
    }
    val streamId = java.nio.file.Files.readString(idPath).trim
    val tagPrefix = if (streamId.isEmpty) "" else streamId + "-"
    val stream = spark.readStream
      .schema(Encoders.product[ImageRow].schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    stream.writeStream
      .foreachBatch(processBatch(io, cfg, verbose, tagPrefix) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    // end-of-stream compaction: the at-rest `clusters` table is always the
    // complete assignment, so external readers (duckdb over the snapshot
    // dir, the batch CC resume path) need no merge-on-read logic
    compactClusters(io)
    // optional table maintenance while the table is quiesced: every
    // compaction above left a full-assignment snapshot in `clusters`
    // history (O(corpus) bytes EACH) and resetStage orphaned the folded
    // delta-log dirs — a stream that never expires grows its at-rest
    // storage by a full corpus copy per compaction interval. minAge 0 is
    // safe here and only here: no write is in flight after
    // awaitTermination, which is why this doesn't run per-batch.
    if (expireKeep > 0) {
      // every stage the stream writes: replaced histories (clusters,
      // id_repairs, the folded key tables) reclaim bytes; append-only
      // chains (corpus, verified, exact_edges) just trim manifest lines —
      // expireSnapshots never deletes dirs shared with the live entry
      val expired = Seq("clusters", "signatures", "bands", "simhash_keys",
          "span_fps", "exact_keys", "id_repairs", "corpus", "verified",
          "exact_edges", "cluster_deltas")
        .map(st => io.expireSnapshots(st, expireKeep).length).sum
      val orphans = io.vacuumOrphans(minAgeMs = 0L)
      if (verbose)
        println(s"""{"maintenance":"expire","snapshots_expired":$expired,"orphans_removed":${orphans.length}}""")
    }
  }

  /** `graft.StreamJob --input <parquet dir> --out <table dir>
    *  [--checkpoint <dir>] [--run-id <id>] [--max-files-per-trigger N]
    *  [--exact-tier true] [--oph-signatures true] [--expire-keep K]` — the config flags
    * mirror DedupJob's and flow into configHash, so a stream resumed
    * against tables committed under a different tier/sketch refuses.
    */
  def main(args: Array[String]): Unit = {
    val (argMap, _) = DedupJob.parseArgs(args)
    val input = argMap.getOrElse("--input", sys.error("--input required"))
    val out = argMap.getOrElse("--out", sys.error("--out required"))
    val ckpt = argMap.getOrElse("--checkpoint", s"$out/_stream_checkpoint")
    val runId = argMap.getOrElse("--run-id", "stream-" + System.currentTimeMillis())
    val maxFiles = argMap.getOrElse("--max-files-per-trigger", "1").toInt
    val expireKeep = argMap.getOrElse("--expire-keep", "0").toInt
    val cfg = DedupConfig(
      useOphSignatures = argMap.get("--oph-signatures").exists(_.toBoolean),
      exactTier = argMap.get("--exact-tier").exists(_.toBoolean),
      requireCaptionEq = argMap.get("--require-caption-eq").exists(_.toBoolean))

    val builder = SparkSession.builder()
      .appName("graft-stream")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.props.get("spark.master")
      .orElse(sys.env.get("SPARK_MASTER"))
      .map(builder.master)
      .getOrElse(builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    runOnce(spark, input, out, ckpt, runId, maxFiles, cfg = cfg,
      expireKeep = expireKeep)
    spark.stop()
  }
}
