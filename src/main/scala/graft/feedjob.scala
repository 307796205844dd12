package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Change-data-feed export: the downstream consumer of
  * [[TableIO.incrementalScan]] (Iceberg: incremental read between the
  * snapshot a consumer last processed and the current one). Each run
  * exports ONLY the rows appended to a committed stage since the persisted
  * cursor, then advances the cursor — so an external indexer, replication
  * target, or downstream Spark job tails a stage (verified pairs, the
  * corpus itself; `cluster_deltas` is tailable BETWEEN compactions —
  * each fold resets its chain, which the consumer acknowledges with one
  * `--restart true` pull, the fold's content being the compacted
  * `clusters` base) without ever rescanning the accumulated table. This is the batch pull twin of the stream's own history touches
  * (those prune via broadcast semi-joins because they need keyed LOOKUP;
  * a feed needs everything-new-once, which is exactly the append-chain
  * delta).
  *
  * Delivery contract: exactly-once per cursor position. The delta
  * directory name is derived from the cursor transition (digest of the
  * live manifest entry), and the cursor file is renamed into place
  * ATOMICALLY after the export lands — a crash between export and cursor
  * advance re-runs the SAME transition into the SAME directory (an
  * overwrite, not a duplicate). If the stage was replaced/compacted since
  * the cursor, [[TableIO.incrementalScan]] refuses (a silent full re-read
  * would double-count rows the consumer already saw); re-running with
  * `--restart true` re-exports the full table under a fresh cursor, which
  * is the documented Iceberg-consumer recovery path too.
  */
object FeedJob {

  /** One feed pull. Returns (rows exported, delta dir) — (0, None) when
    * nothing was appended since the cursor.
    */
  def pull(io: TableIO, spark: SparkSession, stage: String,
           exportDir: String, restart: Boolean = false): (Long, Option[String]) = {
    val cursorPath = Paths.get(exportDir, "_cursor", s"$stage.entry")
    Files.createDirectories(cursorPath.getParent)
    val live = io.liveEntry(stage).getOrElse {
      // a reset stage (e.g. cluster_deltas after a compaction fold) has
      // an EMPTY manifest: with --restart the consumer acknowledges the
      // fold (its content lives in the compacted base table) and the
      // cursor clears so the next append starts a fresh chain; without
      // it, a held cursor means the reset happened mid-tail — refuse
      // with the recovery path instead of a generic missing-stage error
      if (restart || !Files.exists(cursorPath)) {
        Files.deleteIfExists(cursorPath)
        return (0L, None)
      }
      sys.error(s"stage $stage has no committed snapshot but a cursor " +
        "exists — the stage was reset (compaction fold) since the last " +
        "pull; re-run with --restart true to acknowledge")
    }
    val prior = if (restart || !Files.exists(cursorPath)) None
                else Some(Files.readString(cursorPath).trim)

    // every delta below is computed against the CAPTURED `live` entry —
    // never against a re-read of the live manifest — so rows appended
    // between the capture and the scan are excluded now and exported by
    // the NEXT pull exactly once (the cursor advances to `live`, not to
    // whatever the manifest says later).
    val delta: Option[DataFrame] = prior match {
      case Some(cur) if cur == live => None // cursor already at head
      case Some(cur) =>
        val seen = cur.split(';').toSet
        val curDirs = live.split(';').toSeq
        require(seen.subsetOf(curDirs.toSet),
          s"incremental cursor for $stage is stale (table was replaced " +
            "since); restart from a full load")
        val fresh = curDirs.filterNot(seen)
        if (fresh.isEmpty) None else Some(spark.read.parquet(fresh: _*))
      case None => // first pull (or --restart): full export of `live`
        Some(spark.read.parquet(live.split(';').toSeq: _*))
    }
    delta match {
      case None => (0L, None)
      case Some(df) =>
        // dir named by the live entry the export corresponds to: a crash
        // before the cursor advance replays the same transition into the
        // same dir (overwrite), never a second copy under a new name
        val tag = java.security.MessageDigest.getInstance("MD5")
          .digest(live.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val dir = s"$exportDir/$stage-delta-$tag"
        df.write.mode("overwrite").parquet(dir)
        val rows = spark.read.parquet(dir).count()
        // atomic cursor advance (same rename discipline as the manifests)
        val tmp = cursorPath.resolveSibling(s"$stage.entry.tmp")
        Files.writeString(tmp, live)
        Files.move(tmp, cursorPath, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        (rows, Some(dir))
    }
  }

  /** `graft.FeedJob --tables <TableIO root> --stage <name>
    *  --export <dir> [--restart true]` — prints one JSON line:
    * `{"stage":…,"rows":N,"delta_dir":…}` (rows = 0, delta_dir = null
    * when the cursor is already at the head).
    */
  def main(args: Array[String]): Unit = {
    val (argMap, _) = DedupJob.parseArgs(args)
    val tables = argMap.getOrElse("--tables", sys.error("--tables required"))
    val stage = argMap.getOrElse("--stage", sys.error("--stage required"))
    val export = argMap.getOrElse("--export", sys.error("--export required"))
    val restart = argMap.get("--restart").exists(_.toBoolean)

    val builder = SparkSession.builder()
      .appName("graft-feed")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.props.get("spark.master")
      .orElse(sys.env.get("SPARK_MASTER"))
      .map(builder.master)
      .getOrElse(builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // read-side config handshake: a feed consumer adopts the producer's
    // committed config hash (it validates nothing config-dependent itself;
    // the guard exists to stop WRITERS mixing configs)
    val cfgFile = Paths.get(tables, "_manifest", "config.hash")
    require(Files.exists(cfgFile), s"$tables is not a committed TableIO dir")
    val io = new ParquetTableIO(spark, tables, "feed", Files.readString(cfgFile).trim)
    val (rows, dir) = pull(io, spark, stage, export, restart)
    println(s"""{"stage":"$stage","rows":$rows,"delta_dir":${dir.map("\"" + _ + "\"").getOrElse("null")}}""")
    spark.stop()
  }
}

/** Standalone table maintenance (the Iceberg `expire_snapshots` +
  * `remove_orphan_files` procedures as a CLI, decoupled from any
  * producing job): `graft.MaintenanceJob --tables <TableIO root>
  * [--expire-keep K] [--vacuum-min-age-ms M] [--stages a,b,c]`.
  * Without `--expire-keep` only the orphan vacuum runs; `--stages`
  * defaults to every committed stage in the manifest dir. The vacuum age
  * guard defaults to one hour so the job is safe to run beside a LIVE
  * writer (an in-flight snapshot write is younger than that); expiry's
  * read-truncate-write runs under the per-stage manifest lock
  * (file-level, cross-process), so it serializes against a live
  * writer's read-prepend-write instead of losing one side's update, and
  * a concurrent reader holding the old live entry keeps a consistent
  * (already-materialized) view, same as Iceberg.
  */
object MaintenanceJob {

  def run(io: ParquetTableIO, tablesRoot: String, expireKeep: Int,
          vacuumMinAgeMs: Long, stagesArg: Option[String]): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    val stages = stagesArg.map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse {
        val ls = Files.list(Paths.get(tablesRoot, "_manifest"))
        try ls.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".json")).map(_.stripSuffix(".json"))
          .filterNot(_.startsWith(".")).toList.sorted
        finally ls.close()
      }
    val expired =
      if (expireKeep < 1) 0
      else stages.map(st => io.expireSnapshots(st, expireKeep).length).sum
    val orphans = io.vacuumOrphans(vacuumMinAgeMs).length
    (expired, orphans)
  }

  def main(args: Array[String]): Unit = {
    val (argMap, _) = DedupJob.parseArgs(args)
    val tables = argMap.getOrElse("--tables", sys.error("--tables required"))
    val expireKeep = argMap.getOrElse("--expire-keep", "0").toInt
    val minAge = argMap.getOrElse("--vacuum-min-age-ms", "3600000").toLong

    val builder = SparkSession.builder()
      .appName("graft-maintenance")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.props.get("spark.master")
      .orElse(sys.env.get("SPARK_MASTER"))
      .map(builder.master)
      .getOrElse(builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfgFile = Paths.get(tables, "_manifest", "config.hash")
    require(Files.exists(cfgFile), s"$tables is not a committed TableIO dir")
    val io = new ParquetTableIO(spark, tables, "maintenance",
      Files.readString(cfgFile).trim)
    val (expired, orphans) =
      run(io, tables, expireKeep, minAge, argMap.get("--stages"))
    println(s"""{"snapshots_expired":$expired,"orphans_removed":$orphans}""")
    spark.stop()
  }
}
