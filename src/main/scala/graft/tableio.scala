package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed stage commits with atomic manifests, per-partition lineage
  * + metrics, and idempotent resume (SURVEY.md §7.4; BASELINE.json:L6/L14
  * "checkpoints every stage … with per-partition lineage and metrics
  * tables, and resumes idempotently from the last committed snapshot").
  *
  * The sandbox has no Iceberg runtime jar (SURVEY.md §0.1), so this is the
  * Iceberg-*semantics* implementation over Parquet: data lands in a
  * snapshot directory, then a single-file atomic manifest rename is the
  * commit point — a crashed stage leaves only an unreferenced snapshot dir
  * that the rerun overwrites. In production the same trait maps 1:1 onto
  * `df.writeTo(table).overwritePartitions()` + Iceberg snapshot ids.
  */
trait TableIO {
  def commit(stage: String, df: DataFrame): DataFrame

  /** Like [[commit]] but hash-partitions the snapshot files by the given
    * columns (Iceberg: identity partition transform) — downstream
    * equi-joins/aggregations on those columns read pruned subsets.
    */
  def commitPartitioned(stage: String, df: DataFrame, partitionCols: Seq[String]): DataFrame

  /** Like [[commit]] but BUCKETED by `bucketCol` into `nBuckets`
    * (Iceberg: bucket transform): the committed scan reports
    * `HashPartitioning(bucketCol, nBuckets)`, so every downstream
    * equi-join or aggregation on that key skips the bucketed side's
    * exchange — within the committing run AND on resume in a fresh JVM
    * (the bucket spec is persisted beside the manifest and re-registered
    * on load). The payoff is the widest join in the engine: at 10¹² rows
    * the signature table cannot broadcast into scoring, and without
    * bucketing it would shuffle twice per run.
    */
  def commitBucketed(stage: String, df: DataFrame, bucketCol: String, nBuckets: Int): DataFrame

  /** Like [[commit]] but RANGE-CLUSTERS the snapshot on `sortCol`
    * (Iceberg: a write sort order + per-file column bounds in the
    * manifest): rows land in up to `nFiles` range partitions, sorted
    * within each, and the commit records every file's [min, max] of
    * `sortCol` as a zone map beside the manifest. [[loadRange]] then
    * serves range predicates from only the overlapping files — with
    * disjoint ranges that is ONE file per point lookup, the difference
    * between scanning a table and scanning a file at 10¹² rows. The
    * pipeline commits the final cluster assignment this way: cluster
    * audits (churn, representatives, per-cluster inspection) are
    * cluster-id range reads. `sortCol` must be an integral or string
    * column (the engine's two key shapes); the zone map keys the LIVE
    * snapshot like the bucket spec — [[replace]]/[[rollback]] on a
    * sorted stage drop the pruning (reads stay correct via fallback).
    */
  def commitSorted(stage: String, df: DataFrame, sortCol: String, nFiles: Int): DataFrame

  /** Range-pruned scan: rows with `sortCol` in [lo, hi] (inclusive),
    * reading ONLY the files whose committed zone overlaps when the stage
    * was [[commitSorted]] on that column; any other stage falls back to
    * a full scan + filter (correct, just unpruned). None if the stage
    * was never committed.
    */
  def loadRange(stage: String, sortCol: String, lo: Any, hi: Any): Option[DataFrame]

  def load(stage: String): Option[DataFrame]

  /** Snapshot directories for a stage, oldest → newest (Iceberg: snapshot
    * history). The manifest's head entry is the live snapshot.
    */
  def history(stage: String): Seq[String]

  /** Point the stage's manifest back at an earlier snapshot (Iceberg:
    * rollback-to-snapshot). No data is deleted; the atomic-manifest-swap
    * commit discipline applies.
    */
  def rollback(stage: String, snapshotDir: String): Unit

  /** Time-travel read (Iceberg: `VERSION AS OF`): read any entry still in
    * [[history]] WITHOUT mutating the manifest — the read twin of
    * [[rollback]]. The operational consumer is the churn audit
    * ([[Curation.clusterChurn]]): diff the live assignment against the
    * pre-change snapshot directly, no rollback/re-rollback dance. Throws
    * if the entry was expired or never committed (an expired snapshot's
    * files are gone — a silent partial read would be worse).
    */
  def loadAt(stage: String, entry: String): DataFrame

  /** Write a NEW snapshot for a stage that may already be committed
    * (Iceberg: every write is a new snapshot; prior ones stay in
    * [[history]] for rollback). Unlike [[commit]], does NOT short-circuit
    * on an existing manifest.
    */
  def replace(stage: String, df: DataFrame): DataFrame

  /** APPEND `df` to a stage (Iceberg: append snapshot — the new live
    * snapshot is the old one's files plus the batch's). `tag` makes the
    * append IDEMPOTENT: re-appending an already-committed tag (a replayed
    * micro-batch after a crash) is a no-op, so exactly-once stream commits
    * need no external transaction log. The replay check scans the WHOLE
    * manifest history, not just the live entry — a tag whose rows were
    * folded into a compacted snapshot since its commit must still no-op,
    * or a crash between compaction and the batch's final commit would
    * duplicate its rows on replay.
    */
  def append(stage: String, df: DataFrame, tag: String): DataFrame

  /** [[replace]] with an idempotence tag: re-replacing a tag already at
    * the manifest head is a no-op (crash-replay safety for streaming).
    */
  def replaceTagged(stage: String, df: DataFrame, tag: String): DataFrame

  /** Read ONE tagged snapshot's rows (Iceberg: incremental read of a
    * single append snapshot) — the stream's way to get "this batch's
    * committed rows" without scanning the accumulated table.
    */
  def loadTagged(stage: String, tag: String): Option[DataFrame]

  /** Snapshot count of the live entry's append chain (1 = a single
    * snapshot, no appends yet; 0 = stage never committed). The stream's
    * compaction trigger reads this instead of counting rows.
    */
  def appendChainLength(stage: String): Int

  /** The live manifest entry (opaque cursor for [[incrementalScan]]) —
    * an Iceberg reader would record the snapshot id it consumed; here the
    * entry string plays that role.
    */
  def liveEntry(stage: String): Option[String]

  /** Incremental append scan (Iceberg: incremental read between two
    * snapshots): the rows ADDED after `sinceEntry` — i.e. the files of
    * the live entry that `sinceEntry` did not already contain. Only
    * meaningful along an append chain; if the table was REPLACED since
    * the cursor (live entry is not a superset of `sinceEntry`), the
    * cursor is stale and this throws rather than silently re-reading the
    * whole table — the caller must restart from a full [[load]].
    * Returns None when nothing was appended since the cursor.
    */
  def incrementalScan(stage: String, sinceEntry: String): Option[DataFrame]

  /** Drop the stage's live view — load() returns None afterwards
    * (manifest-level, atomic; snapshot files stay on disk for audit,
    * matching [[rollback]]'s non-deleting contract). Used to clear a
    * delta log once compaction has folded it into a base snapshot.
    */
  def resetStage(stage: String): Unit

  /** Expire old snapshots (Iceberg: `expire_snapshots`): truncate the
    * stage's history to the newest `keepLast` manifest entries and DELETE
    * the snapshot directories referenced only by the expired entries.
    * Directories shared with a kept entry are never touched — along an
    * un-compacted append chain every historical entry is a prefix of the
    * live file set, so expiry there trims only manifest lines; it is the
    * REPLACED tables (per-compaction full assignment rewrites, rolled-back
    * experiments) whose bytes this reclaims. Without it a long-running
    * sink's storage grows O(corpus · compactions), which at 10¹² rows is
    * the dominant cost of the table, not a hygiene detail. `keepLast ≥ 1`:
    * the live snapshot is not expirable. The manifest truncation is the
    * atomic commit point and happens BEFORE any delete — a crash
    * mid-delete leaves unreferenced dirs that [[vacuumOrphans]] reclaims,
    * never a referenced-but-deleted snapshot. Returns the deleted dirs.
    */
  def expireSnapshots(stage: String, keepLast: Int): Seq[String]

  /** Delete snapshot directories no manifest entry references (Iceberg:
    * `remove_orphan_files`) — debris of writes that crashed before their
    * manifest swap, delta logs cleared by [[resetStage]], and the tail of
    * an interrupted [[expireSnapshots]]. Only dirs whose last modification
    * is older than `minAgeMs` are touched, so a concurrent in-flight
    * write (its manifest swap not yet landed) is never vacuumed — the
    * same age guard Iceberg's procedure defaults to. Returns deleted dirs.
    */
  def vacuumOrphans(minAgeMs: Long = 3600000L): Seq[String]
  def runId: String
}

final class ParquetTableIO(
    spark: SparkSession,
    root: String,
    val runId: String,
    configHash: String
) extends TableIO {

  private val rootPath: Path = Paths.get(root)
  Files.createDirectories(rootPath.resolve("_manifest"))
  Files.createDirectories(rootPath.resolve("_metrics"))

  // idempotence guard: refuse to resume under a different config
  private val cfgFile = rootPath.resolve("_manifest/config.hash")
  if (Files.exists(cfgFile)) {
    val prior = Files.readString(cfgFile).trim
    require(
      prior == configHash,
      s"checkpoint dir $root was written with config $prior; current config " +
        s"$configHash — refusing to resume (SURVEY.md §3.3 idempotence guard)")
  } else Files.writeString(cfgFile, configHash)

  private def manifestPath(stage: String): Path =
    rootPath.resolve(s"_manifest/$stage.json")

  /** Manifest = newline list of snapshot dirs, LIVE snapshot first,
    * older history after (newest → oldest). Swapped atomically.
    */
  private def readManifest(stage: String): Seq[String] = {
    val m = manifestPath(stage)
    if (!Files.exists(m)) Seq.empty
    else Files.readString(m).trim.split('\n').toSeq.filter(_.nonEmpty)
  }

  /** Serializes manifest read-modify-write sequences for one stage
    * across processes (file lock) and threads (JVM lock — FileChannel
    * locks are per-JVM and non-reentrant, so same-JVM callers must be
    * mutually excluded before touching the channel). Without this, a
    * concurrent writer's read-prepend-write and the maintenance job's
    * read-truncate-write (expireSnapshots) interleave as lost updates:
    * a committed append could vanish from the manifest (then be
    * vacuumed) or expired entries could resurrect pointing at deleted
    * dirs. Lock scope is the manifest mutation only — data writes run
    * outside it, so expiry blocks a writer for milliseconds, not for
    * the duration of a parquet write.
    */
  private def withStageLock[T](stage: String)(body: => T): T =
    ParquetTableIO.jvmLock(root, stage).synchronized {
      val ch = java.nio.channels.FileChannel.open(
        rootPath.resolve(s"_manifest/.$stage.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val fl = ch.lock()
        try body finally fl.release()
      } finally ch.close()
    }

  private def writeManifest(stage: String, lines: Seq[String]): Unit = {
    val tmp = rootPath.resolve(s"_manifest/.$stage.json.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(stage),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def bucketSpecPath(stage: String): Path =
    rootPath.resolve(s"_manifest/$stage.bucketspec")

  /** Session-catalog name for a bucketed snapshot. Bucket metadata lives
    * in the catalog, not the parquet files, so resumed sessions must
    * re-register the table (CREATE TABLE … CLUSTERED BY … LOCATION) to
    * get the exchange-free scan back — a plain `read.parquet` of the same
    * files is correct but loses the bucketing.
    */
  private def bucketTableName(stage: String, dir: String): String =
    s"graft_${stage}_${java.lang.Long.toHexString(Hashing.hashString(dir))}"

  private def bucketedTable(stage: String, dir: String): DataFrame = {
    val Array(bcol, n) = Files.readString(bucketSpecPath(stage)).trim.split(',')
    val tbl = bucketTableName(stage, dir)
    if (!spark.catalog.tableExists(tbl)) {
      val ddlSchema = spark.read.parquet(dir).schema.toDDL
      spark.sql(s"CREATE TABLE $tbl ($ddlSchema) USING parquet " +
        s"CLUSTERED BY ($bcol) INTO $n BUCKETS LOCATION '$dir'")
    }
    spark.table(tbl)
  }

  /** A manifest ENTRY is one live snapshot: either a single dir or a
    * ';'-joined dir list (append snapshots share their ancestors' files,
    * Iceberg-style — an append rewrites nothing).
    */
  override def load(stage: String): Option[DataFrame] =
    readManifest(stage).headOption.map { e =>
      if (!e.contains(';') && Files.exists(bucketSpecPath(stage))) bucketedTable(stage, e)
      else spark.read.parquet(e.split(';').toSeq: _*)
    }

  override def history(stage: String): Seq[String] = readManifest(stage).reverse

  override def loadAt(stage: String, entry: String): DataFrame = {
    val lines = readManifest(stage)
    require(lines.contains(entry),
      s"snapshot $entry is not in $stage's history (expired or never " +
        s"committed): $lines")
    if (!entry.contains(';') && Files.exists(bucketSpecPath(stage)))
      bucketedTable(stage, entry)
    else spark.read.parquet(entry.split(';').toSeq: _*)
  }

  override def rollback(stage: String, snapshotDir: String): Unit =
    withStageLock(stage) {
      val lines = readManifest(stage)
      require(lines.contains(snapshotDir),
        s"snapshot $snapshotDir is not in $stage's history: $lines")
      writeManifest(stage, snapshotDir +: lines.filterNot(_ == snapshotDir))
    }

  private def writeSnapshot(
      stage: String, df: DataFrame, partitionCols: Seq[String],
      tag: Option[String] = None, appendTo: Option[String] = None): DataFrame = {
    val t0 = System.currentTimeMillis()
    val name = tag.map(t => s"snapshot-$t").getOrElse(s"snapshot-${System.nanoTime()}")
    val snapshot = s"$root/$stage/$name"
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(snapshot)
    val committed = spark.read.parquet(snapshot)
    // per-partition lineage + metrics (BASELINE.json:L14): which files
    // back each partition, and its row count
    val metrics = committed
      .select(spark_partition_id().as("partition_id"),
        input_file_name().as("file"))
      .groupBy("partition_id", "file")
      .agg(count(lit(1)).as("rows"))
      .withColumn("run_id", lit(runId))
      .withColumn("stage", lit(stage))
      .withColumn("wall_ms", lit(System.currentTimeMillis() - t0))
    metrics.write.mode("append").parquet(s"$root/_metrics/rows")
    // atomic commit point: prepend the new live entry, keep history.
    // The re-read happens INSIDE the stage lock so a concurrent
    // expireSnapshots truncation is never overwritten with a stale list.
    val entry = appendTo.fold(snapshot)(prior => s"$prior;$snapshot")
    withStageLock(stage) {
      writeManifest(stage, entry +: readManifest(stage))
    }
    // a plain (non-bucketed) snapshot is now the live entry: any bucket
    // spec from an earlier commitBucketed no longer describes it, and a
    // later single-dir entry (e.g. a compaction fold) must NOT be
    // registered CLUSTERED BY over unbucketed files — Spark would elide
    // exchanges and silently drop join matches. Correctness over speed:
    // history reads fall back to plain parquet.
    Files.deleteIfExists(bucketSpecPath(stage))
    if (appendTo.isEmpty) committed else load(stage).get
  }

  override def commit(stage: String, df: DataFrame): DataFrame =
    load(stage) match {
      case Some(cached) => cached // resume: stage already committed
      case None => writeSnapshot(stage, df, Seq.empty)
    }

  override def commitPartitioned(
      stage: String, df: DataFrame, partitionCols: Seq[String]): DataFrame =
    load(stage) match {
      case Some(cached) => cached
      case None => writeSnapshot(stage, df, partitionCols)
    }

  override def replace(stage: String, df: DataFrame): DataFrame =
    writeSnapshot(stage, df, Seq.empty)

  override def commitBucketed(
      stage: String, df: DataFrame, bucketCol: String, nBuckets: Int): DataFrame =
    load(stage) match {
      case Some(cached) => cached
      case None =>
        val t0 = System.currentTimeMillis()
        val snapshot = s"$root/$stage/snapshot-${System.nanoTime()}"
        // repartition on the SAME murmur3 hash bucketBy uses → each write
        // task holds exactly one bucket → nBuckets files, not
        // tasks×buckets small files
        df.repartition(nBuckets, col(bucketCol))
          .write.mode("overwrite")
          .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
          .option("path", snapshot)
          .format("parquet")
          .saveAsTable(bucketTableName(stage, snapshot))
        Files.writeString(bucketSpecPath(stage), s"$bucketCol,$nBuckets")
        val committed = bucketedTable(stage, snapshot)
        val metrics = committed
          .select(spark_partition_id().as("partition_id"),
            input_file_name().as("file"))
          .groupBy("partition_id", "file")
          .agg(count(lit(1)).as("rows"))
          .withColumn("run_id", lit(runId))
          .withColumn("stage", lit(stage))
          .withColumn("wall_ms", lit(System.currentTimeMillis() - t0))
        metrics.write.mode("append").parquet(s"$root/_metrics/rows")
        withStageLock(stage) {
          writeManifest(stage, snapshot +: readManifest(stage))
        }
        committed
    }

  private def zoneMapPath(stage: String): Path =
    rootPath.resolve(s"_manifest/$stage.zonemap")

  /** Zone-map encoding: header `sortCol,type`, then `mn,mx,file` lines.
    * String bounds ride Base64(UTF-8) so arbitrary key bytes survive the
    * CSV framing; pruning compares the DECODED bytes unsigned-lexically,
    * matching Spark's UTF8String binary ordering.
    */
  private def encodeBound(v: Any): String = v match {
    case s: String => java.util.Base64.getEncoder
      .encodeToString(s.getBytes(StandardCharsets.UTF_8))
    case n => n.toString
  }

  override def commitSorted(
      stage: String, df: DataFrame, sortCol: String, nFiles: Int): DataFrame =
    load(stage) match {
      case Some(cached) => cached
      case None =>
        val keyType = df.schema(sortCol).dataType.typeName
        require(Set("long", "integer", "string")(keyType),
          s"commitSorted keys are integral or string, got $keyType for $sortCol")
        val t0 = System.currentTimeMillis()
        val snapshot = s"$root/$stage/snapshot-${System.nanoTime()}"
        df.repartitionByRange(nFiles, col(sortCol))
          .sortWithinPartitions(sortCol)
          .write.mode("overwrite").parquet(snapshot)
        val committed = spark.read.parquet(snapshot)
        // per-file key bounds — ≤ nFiles driver rows, read from the one
        // stats column. Null-key rows never match a range predicate, so
        // they are excluded here (an all-null file simply has no zone).
        val zones = committed.where(col(sortCol).isNotNull)
          .groupBy(input_file_name().as("file"))
          .agg(min(col(sortCol)).as("mn"), max(col(sortCol)).as("mx"))
          .collect()
        val tag = if (keyType == "string") "string" else "long"
        val lines = s"$sortCol,$tag" +: zones.toSeq.map(r =>
          s"${encodeBound(r.get(1))},${encodeBound(r.get(2))},${r.getString(0)}")
        Files.write(zoneMapPath(stage),
          lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
        val metrics = committed
          .select(spark_partition_id().as("partition_id"),
            input_file_name().as("file"))
          .groupBy("partition_id", "file")
          .agg(count(lit(1)).as("rows"))
          .withColumn("run_id", lit(runId))
          .withColumn("stage", lit(stage))
          .withColumn("wall_ms", lit(System.currentTimeMillis() - t0))
        metrics.write.mode("append").parquet(s"$root/_metrics/rows")
        withStageLock(stage) {
          writeManifest(stage, snapshot +: readManifest(stage))
        }
        committed
    }

  override def loadRange(
      stage: String, sortCol: String, lo: Any, hi: Any): Option[DataFrame] =
    load(stage).map { full =>
      val pred = col(sortCol) >= lit(lo) && col(sortCol) <= lit(hi)
      val zm = zoneMapPath(stage)
      val lines =
        if (Files.exists(zm))
          Files.readString(zm).trim.split('\n').toSeq.filter(_.nonEmpty)
        else Seq.empty
      // prune only when the zone map is for THIS column, the live entry
      // is the sorted snapshot (single dir, its files in the map), and
      // the bound types line up — anything else reads unpruned
      val header = lines.headOption.map(_.split(',').toSeq)
      val usable = header.exists(h => h.headOption.contains(sortCol)) &&
        readManifest(stage).headOption.exists(e => !e.contains(';') &&
          lines.drop(1).forall(_.split(",", 3)(2).contains(e)))
      def bytes(s: String) = java.util.Base64.getDecoder.decode(s)
      def leqBytes(a: Array[Byte], b: Array[Byte]): Boolean = {
        val n = math.min(a.length, b.length)
        var i = 0
        var c = 0
        while (i < n && c == 0) { c = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
        if (c != 0) c < 0 else a.length <= b.length
      }
      // None = no safe pruning (wrong column/type, stale map) → full scan
      val filesOpt: Option[Seq[String]] =
        if (!usable) None
        else (header.get.lift(1), lo, hi) match {
          case (Some("long"), l: Number, h: Number) =>
            Some(lines.drop(1).flatMap { ln =>
              val Array(mn, mx, f) = ln.split(",", 3)
              if (mx.toLong >= l.longValue && mn.toLong <= h.longValue)
                Some(f) else None
            })
          case (Some("string"), l: String, h: String) =>
            val (lb, hb) = (l.getBytes(StandardCharsets.UTF_8),
              h.getBytes(StandardCharsets.UTF_8))
            Some(lines.drop(1).flatMap { ln =>
              val Array(mn, mx, f) = ln.split(",", 3)
              if (leqBytes(lb, bytes(mx)) && leqBytes(bytes(mn), hb))
                Some(f) else None
            })
          case _ => None
        }
      filesOpt match {
        case None => full.where(pred)
        case Some(Seq()) => full.where(lit(false)).where(pred)
        case Some(files) =>
          spark.read.schema(full.schema).parquet(files: _*).where(pred)
      }
    }

  override def append(stage: String, df: DataFrame, tag: String): DataFrame = {
    val manifest = readManifest(stage)
    val dir = s"$root/$stage/snapshot-$tag"
    // replay no-op if the tag appears ANYWHERE in history: a compaction
    // may have folded it out of the live entry since (trait scaladoc)
    if (manifest.exists(_.split(';').contains(dir))) load(stage).get
    else writeSnapshot(stage, df, Seq.empty, Some(tag), appendTo = manifest.headOption)
  }

  override def replaceTagged(stage: String, df: DataFrame, tag: String): DataFrame = {
    val dir = s"$root/$stage/snapshot-$tag"
    if (readManifest(stage).headOption.contains(dir)) load(stage).get
    else writeSnapshot(stage, df, Seq.empty, Some(tag))
  }

  override def loadTagged(stage: String, tag: String): Option[DataFrame] = {
    val dir = s"$root/$stage/snapshot-$tag"
    // only snapshots reachable from the manifest are committed (a crashed
    // write can leave an orphan dir whose files are incomplete)
    val committed = readManifest(stage).exists(_.split(';').contains(dir))
    if (committed) Some(spark.read.parquet(dir)) else None
  }

  override def appendChainLength(stage: String): Int =
    readManifest(stage).headOption.map(_.split(';').length).getOrElse(0)

  override def liveEntry(stage: String): Option[String] =
    readManifest(stage).headOption

  override def incrementalScan(stage: String, sinceEntry: String): Option[DataFrame] = {
    val live = readManifest(stage).headOption.getOrElse(
      throw new IllegalStateException(s"stage $stage has no committed snapshot"))
    val seen = sinceEntry.split(';').toSet
    val cur = live.split(';').toSeq
    // append-only check: a replace/compaction rewrote the table and the
    // cursor no longer names a prefix of the live file set — re-reading
    // everything here would double-count rows the consumer already saw
    require(seen.subsetOf(cur.toSet),
      s"incremental cursor for $stage is stale (table was replaced since); " +
        s"restart from a full load")
    val fresh = cur.filterNot(seen)
    if (fresh.isEmpty) None else Some(spark.read.parquet(fresh: _*))
  }

  override def resetStage(stage: String): Unit =
    withStageLock(stage) {
      writeManifest(stage, Seq.empty)
      Files.deleteIfExists(bucketSpecPath(stage))
    }

  private def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }

  /** Drop a bucketed snapshot's catalog registration if one exists —
    * catalog metadata only (the table is LOCATION-external); data deletion
    * is the caller's. Safe for non-bucketed dirs (name never registered).
    */
  private def dropCatalogEntry(stage: String, dir: String): Unit =
    if (Files.exists(bucketSpecPath(stage)))
      spark.sql(s"DROP TABLE IF EXISTS ${bucketTableName(stage, dir)}")

  override def expireSnapshots(stage: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1,
      s"keepLast must be ≥ 1 (the live snapshot is not expirable), got $keepLast")
    // read + truncate under the stage lock: interleaving with a
    // writer's read-prepend-write would otherwise lose one side's
    // update (a committed append vanishing, or expired entries
    // resurrecting after their dirs are deleted). Deletes run outside
    // the lock — they touch only dirs unreachable from the kept prefix.
    val doomed = withStageLock(stage) {
      val lines = readManifest(stage)
      if (lines.length <= keepLast) Seq.empty[String]
      else {
        val (kept, expired) = lines.splitAt(keepLast)
        val keptDirs = kept.flatMap(_.split(';')).toSet
        val d = expired.flatMap(_.split(';')).distinct.filterNot(keptDirs)
        writeManifest(stage, kept) // atomic commit point, then delete
        d
      }
    }
    doomed.foreach { d =>
      dropCatalogEntry(stage, d)
      deleteRecursively(Paths.get(d))
    }
    doomed
  }

  override def vacuumOrphans(minAgeMs: Long): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val manifestDir = rootPath.resolve("_manifest")
    val referenced: Set[String] = {
      val ms = Files.list(manifestDir)
      try ms.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json"))
        .flatMap(m => Files.readString(m).trim.split('\n').iterator)
        .filter(_.nonEmpty).flatMap(_.split(';').iterator)
        .map(Paths.get(_).normalize().toString).toSet
      finally ms.close()
    }
    val cutoff = System.currentTimeMillis() - minAgeMs
    val stagesList = Files.list(rootPath)
    val stageDirs =
      try stagesList.iterator().asScala.filter(Files.isDirectory(_))
        .filterNot(p => Set("_manifest", "_metrics").contains(p.getFileName.toString))
        .toList
      finally stagesList.close()
    stageDirs.flatMap { sd =>
      val snaps = Files.list(sd)
      val orphans =
        try snaps.iterator().asScala.filter(Files.isDirectory(_))
          // only snapshot dirs are vacuum candidates: a table root also
          // hosts non-snapshot state (the stream's checkpoint offsets/
          // commits live under the same out dir) that no manifest will
          // ever reference — deleting it would silently reset the
          // stream's progress tracking
          .filter(_.getFileName.toString.startsWith("snapshot-"))
          .filterNot(p => referenced.contains(p.normalize().toString))
          .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
          .toList
        finally snaps.close()
      orphans.map { p =>
        dropCatalogEntry(sd.getFileName.toString, p.toString)
        deleteRecursively(p)
        p.toString
      }
    }
  }

  def metrics(): Option[DataFrame] = {
    val p = s"$root/_metrics/rows"
    if (Files.exists(Paths.get(p))) Some(spark.read.parquet(p)) else None
  }
}

object ParquetTableIO {
  // FileChannel locks are per-JVM and non-reentrant: same-JVM threads
  // (e.g. a spec driving a writer and MaintenanceJob concurrently) must
  // serialize on a JVM monitor BEFORE touching the file lock, or the
  // second acquire throws OverlappingFileLockException.
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[graft] def jvmLock(root: String, stage: String): Object =
    locks.computeIfAbsent(s"$root|$stage", _ => new Object)
}
