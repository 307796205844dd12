package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production [[TableIO]] over real Apache Iceberg tables (round-4
  * VERDICT item 7: BASELINE.json's north rule says "Iceberg tables", and
  * until now the binding lived only in ParquetTableIO's scaladoc).
  *
  * COMPILES AGAINST PLAIN SPARK, RUNS ONLY WITH ICEBERG. Everything here
  * is the public Spark API (`DataFrameWriterV2`, partition-transform
  * functions, SQL strings): the Iceberg runtime jar and a configured
  * catalog are needed only at RUNTIME, which is exactly the gating the
  * sandbox requires — no `*iceberg*` jar exists here (SURVEY.md §0.1),
  * so this class cannot be exercised end-to-end in-repo, but its
  * interface contract is the [[TableIO]] trait that TableIOSpec pins
  * against the Parquet implementation, and the missing-catalog guard IS
  * testable (TableIOSpec "IcebergTableIO refuses an unconfigured
  * catalog").
  *
  * Production wiring (spark-submit):
  * {{{
  * --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
  * --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
  * --conf spark.sql.catalog.graft=org.apache.iceberg.spark.SparkCatalog
  * --conf spark.sql.catalog.graft.type=rest            # or hive / hadoop
  * --conf spark.sql.catalog.graft.uri=<catalog uri>
  * }}}
  * then `new IcebergTableIO(spark, "graft", "dedup.run1", runId, cfgHash)`
  * drops into DedupJob/StreamJob wherever ParquetTableIO is constructed.
  *
  * Mapping of the trait contract onto Iceberg features:
  *  - commit/replace        → `writeTo(t).create()` / `.createOrReplace()`
  *  - commitPartitioned     → `partitionedBy(identity cols)`
  *  - commitBucketed        → `partitionedBy(bucket(n, col))`; Iceberg's
  *    storage-partitioned join reads both bucketed sides exchange-free
  *    (the same plan shape ParquetTableIO's persisted bucket spec buys)
  *  - commitSorted/loadRange→ range-partitioned sorted write; Iceberg
  *    keeps per-file column bounds in its manifests, so the range filter
  *    in [[loadRange]] is served by metadata file pruning — the zone map
  *    is native, no side file needed
  *  - history/loadAt/rollback → the `.snapshots` metadata table,
  *    `VERSION AS OF`, and the `rollback_to_snapshot` procedure
  *  - append/replaceTagged/loadTagged → append snapshots carrying a
  *    `graft.tag` snapshot summary property (set via the documented
  *    `snapshot-property.` write option); the replay check scans ALL
  *    snapshot summaries, mirroring ParquetTableIO's whole-history scan
  *  - liveEntry/incrementalScan → snapshot ids + Iceberg's incremental
  *    read (`start-snapshot-id`/`end-snapshot-id`)
  *  - expireSnapshots/vacuumOrphans → the `expire_snapshots` and
  *    `remove_orphan_files` procedures (same age-guard default)
  *  - per-partition lineage metrics → appended to `<ns>.graft_metrics`,
  *    same schema as ParquetTableIO's `_metrics/rows`
  */
final class IcebergTableIO(
    spark: SparkSession,
    catalog: String,
    namespace: String,
    val runId: String,
    configHash: String
) extends TableIO {

  // fail fast with the wiring recipe instead of an opaque analyzer error
  // twenty method calls later — this is the one behavior testable without
  // the runtime jar
  require(spark.conf.getOption(s"spark.sql.catalog.$catalog").isDefined,
    s"Spark catalog '$catalog' is not configured — IcebergTableIO needs " +
      "the Iceberg runtime jar plus spark.sql.catalog.<name>=" +
      "org.apache.iceberg.spark.SparkCatalog (see the class scaladoc for " +
      "the full spark-submit wiring)")

  private def tbl(stage: String): String = s"$catalog.$namespace.$stage"
  private def exists(stage: String): Boolean =
    spark.catalog.tableExists(tbl(stage))

  // idempotence guard (ParquetTableIO's config.hash file, as a one-row
  // table): refuse to resume a namespace written under another config
  private val cfgTable: String = s"$catalog.$namespace.graft_config"
  locally {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $catalog.$namespace")
    if (spark.catalog.tableExists(cfgTable)) {
      val prior = spark.table(cfgTable).select("config_hash")
        .collect()(0).getString(0)
      require(prior == configHash,
        s"namespace $namespace was written with config $prior; current " +
          s"config $configHash — refusing to resume (idempotence guard)")
    } else {
      import spark.implicits._
      Seq(configHash).toDF("config_hash").writeTo(cfgTable).using("iceberg").create()
    }
  }

  /** Per-partition lineage rows (run_id, stage, partition_id, file, rows,
    * wall_ms) appended to the metrics table — BASELINE.json:L6/L14's
    * "per-partition lineage and metrics tables".
    */
  private def writeMetrics(stage: String, committed: DataFrame, t0: Long): Unit = {
    val m = committed
      .select(spark_partition_id().as("partition_id"),
        input_file_name().as("file"))
      .groupBy("partition_id", "file")
      .agg(count(lit(1)).as("rows"))
      .withColumn("run_id", lit(runId))
      .withColumn("stage", lit(stage))
      .withColumn("wall_ms", lit(System.currentTimeMillis() - t0))
    val mt = s"$catalog.$namespace.graft_metrics"
    if (spark.catalog.tableExists(mt)) m.writeTo(mt).append()
    else m.writeTo(mt).using("iceberg").create()
  }

  private def created(stage: String, t0: Long): DataFrame = {
    val committed = spark.table(tbl(stage))
    writeMetrics(stage, committed, t0)
    committed
  }

  override def commit(stage: String, df: DataFrame): DataFrame =
    if (exists(stage)) spark.table(tbl(stage)) // resume: already committed
    else {
      val t0 = System.currentTimeMillis()
      df.writeTo(tbl(stage)).using("iceberg").create()
      created(stage, t0)
    }

  override def commitPartitioned(
      stage: String, df: DataFrame, partitionCols: Seq[String]): DataFrame =
    if (exists(stage)) spark.table(tbl(stage))
    else {
      val t0 = System.currentTimeMillis()
      df.writeTo(tbl(stage)).using("iceberg")
        .partitionedBy(col(partitionCols.head), partitionCols.tail.map(col): _*)
        .create()
      created(stage, t0)
    }

  override def commitBucketed(
      stage: String, df: DataFrame, bucketCol: String, nBuckets: Int): DataFrame =
    if (exists(stage)) spark.table(tbl(stage))
    else {
      val t0 = System.currentTimeMillis()
      // Iceberg bucket transform; pair with
      // spark.sql.sources.v2.bucketing.enabled=true (+ .pushPartValues)
      // so the storage-partitioned join elides the bucketed exchange
      df.repartition(nBuckets, col(bucketCol))
        .writeTo(tbl(stage)).using("iceberg")
        .partitionedBy(bucket(nBuckets, col(bucketCol)))
        .create()
      created(stage, t0)
    }

  override def commitSorted(
      stage: String, df: DataFrame, sortCol: String, nFiles: Int): DataFrame =
    if (exists(stage)) spark.table(tbl(stage))
    else {
      val t0 = System.currentTimeMillis()
      // range-clustered files; Iceberg records each file's [min, max] of
      // sortCol in its manifests — loadRange's filter prunes on metadata
      df.repartitionByRange(nFiles, col(sortCol))
        .sortWithinPartitions(sortCol)
        .writeTo(tbl(stage)).using("iceberg")
        .create()
      created(stage, t0)
    }

  override def loadRange(
      stage: String, sortCol: String, lo: Any, hi: Any): Option[DataFrame] =
    load(stage).map(_.where(col(sortCol) >= lit(lo) && col(sortCol) <= lit(hi)))

  override def load(stage: String): Option[DataFrame] =
    if (exists(stage)) Some(spark.table(tbl(stage))) else None

  override def history(stage: String): Seq[String] =
    if (!exists(stage)) Seq.empty
    else spark.sql(
      s"SELECT snapshot_id FROM ${tbl(stage)}.snapshots ORDER BY committed_at")
      .collect().map(_.get(0).toString).toSeq

  override def rollback(stage: String, snapshotDir: String): Unit =
    spark.sql(s"CALL $catalog.system.rollback_to_snapshot(" +
      s"'$namespace.$stage', $snapshotDir)")

  override def loadAt(stage: String, entry: String): DataFrame = {
    require(history(stage).contains(entry),
      s"snapshot $entry of $stage is not in history (expired or never " +
        "committed) — refusing a partial read")
    spark.sql(s"SELECT * FROM ${tbl(stage)} VERSION AS OF $entry")
  }

  override def replace(stage: String, df: DataFrame): DataFrame = {
    val t0 = System.currentTimeMillis()
    df.writeTo(tbl(stage)).using("iceberg").createOrReplace()
    created(stage, t0)
  }

  /** Snapshot ids (newest first) whose summary carries `graft.tag`=tag. */
  private def taggedSnapshots(stage: String, tag: String): Seq[String] =
    if (!exists(stage)) Seq.empty
    else spark.sql(
      s"SELECT snapshot_id FROM ${tbl(stage)}.snapshots " +
        s"WHERE summary['graft.tag'] = '$tag' ORDER BY committed_at DESC")
      .collect().map(_.get(0).toString).toSeq

  override def append(stage: String, df: DataFrame, tag: String): DataFrame = {
    // whole-history replay check, same contract as ParquetTableIO: a tag
    // folded into a later compaction must still no-op
    if (taggedSnapshots(stage, tag).isEmpty) {
      if (exists(stage))
        df.writeTo(tbl(stage))
          .option("snapshot-property.graft.tag", tag).append()
      else
        df.writeTo(tbl(stage)).using("iceberg")
          .option("snapshot-property.graft.tag", tag).create()
    }
    spark.table(tbl(stage))
  }

  override def replaceTagged(stage: String, df: DataFrame, tag: String): DataFrame = {
    val liveTag =
      if (!exists(stage)) None
      else spark.sql(
        s"SELECT summary['graft.tag'] FROM ${tbl(stage)}.snapshots " +
          "ORDER BY committed_at DESC LIMIT 1")
        .collect().headOption.flatMap(r => Option(r.getString(0)))
    if (!liveTag.contains(tag))
      df.writeTo(tbl(stage)).using("iceberg")
        .option("snapshot-property.graft.tag", tag).createOrReplace()
    spark.table(tbl(stage))
  }

  override def loadTagged(stage: String, tag: String): Option[DataFrame] =
    taggedSnapshots(stage, tag).headOption.map { id =>
      // incremental read of exactly that append snapshot
      spark.read.format("iceberg")
        .option("start-snapshot-id",
          spark.sql(s"SELECT parent_id FROM ${tbl(stage)}.snapshots " +
            s"WHERE snapshot_id = $id").collect()(0).get(0).toString)
        .option("end-snapshot-id", id)
        .load(tbl(stage))
    }

  override def appendChainLength(stage: String): Int =
    if (!exists(stage)) 0
    else {
      val ops = spark.sql(
        s"SELECT operation FROM ${tbl(stage)}.snapshots ORDER BY committed_at DESC")
        .collect().map(_.getString(0))
      // trailing appends above the last full rewrite, plus that base —
      // unless the whole history is appends (table born by append), in
      // which case the first append IS the base (contract: 1 = a single
      // snapshot with no appends yet)
      val trail = ops.takeWhile(_ == "append").length
      if (ops.isEmpty) 0 else if (trail == ops.length) trail else trail + 1
    }

  override def liveEntry(stage: String): Option[String] =
    history(stage).lastOption

  override def incrementalScan(stage: String, sinceEntry: String): Option[DataFrame] = {
    val hist = history(stage)
    require(hist.contains(sinceEntry),
      s"cursor $sinceEntry of $stage is stale (expired or replaced) — " +
        "restart from a full load()")
    if (hist.lastOption.contains(sinceEntry)) None // nothing appended
    else Some(spark.read.format("iceberg")
      .option("start-snapshot-id", sinceEntry)
      .option("end-snapshot-id", hist.last)
      .load(tbl(stage)))
  }

  override def resetStage(stage: String): Unit =
    if (exists(stage)) spark.sql(s"DROP TABLE ${tbl(stage)}")

  override def expireSnapshots(stage: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "the live snapshot is not expirable")
    if (!exists(stage)) Seq.empty
    else spark.sql(s"CALL $catalog.system.expire_snapshots(" +
      s"table => '$namespace.$stage', retain_last => $keepLast, " +
      "older_than => TIMESTAMP '9999-01-01 00:00:00')")
      .collect().map(_.toString).toSeq
  }

  override def vacuumOrphans(minAgeMs: Long): Seq[String] = {
    // per-table procedure: sweep every stage table in the namespace
    val tables = spark.sql(s"SHOW TABLES IN $catalog.$namespace")
      .select("tableName").collect().map(_.getString(0))
    val cutoff = new java.sql.Timestamp(System.currentTimeMillis() - minAgeMs)
    tables.toSeq.flatMap { t =>
      spark.sql(s"CALL $catalog.system.remove_orphan_files(" +
        s"table => '$namespace.$t', older_than => TIMESTAMP '$cutoff')")
        .collect().map(_.getString(0))
    }
  }
}
