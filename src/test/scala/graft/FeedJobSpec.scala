package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Change-data-feed consumer over TableIO's incremental append scan
  * (SURVEY.md §7.4 — the Iceberg incremental-read consumer shape).
  */
class FeedJobSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-feed").toString

  test("feed exports the full table first, then only appended deltas, then no-ops") {
    val root = tmpDir(); val exp = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.commit("verified", Seq((1L, 2L), (3L, 4L)).toDF("a", "b"))

    // first pull: no cursor yet → full export
    val (n1, d1) = FeedJob.pull(io, spark, "verified", exp)
    assert(n1 == 2 && d1.isDefined)
    assert(spark.read.parquet(d1.get).as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (3L, 4L)))

    // cursor at head → nothing to do, no new delta dir
    val (n2, d2) = FeedJob.pull(io, spark, "verified", exp)
    assert(n2 == 0 && d2.isEmpty)

    // append → next pull exports ONLY the appended rows
    io.append("verified", Seq((5L, 6L)).toDF("a", "b"), "t1")
    val (n3, d3) = FeedJob.pull(io, spark, "verified", exp)
    assert(n3 == 1 && d3.isDefined && d3.get != d1.get)
    assert(spark.read.parquet(d3.get).as[(Long, Long)].collect().toSet ==
      Set((5L, 6L)))

    // two appends before one pull arrive together
    io.append("verified", Seq((7L, 8L)).toDF("a", "b"), "t2")
    io.append("verified", Seq((9L, 10L)).toDF("a", "b"), "t3")
    val (n4, _) = FeedJob.pull(io, spark, "verified", exp)
    assert(n4 == 2)
    val (n5, _) = FeedJob.pull(io, spark, "verified", exp)
    assert(n5 == 0)
  }

  test("crash between export and cursor advance replays into the same dir") {
    val root = tmpDir(); val exp = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.commit("s", Seq(1L).toDF("x"))
    val (_, d1) = FeedJob.pull(io, spark, "s", exp)
    val cursor = Paths.get(exp, "_cursor", "s.entry")
    val pre = Files.readString(cursor) // the pre-append cursor
    io.append("s", Seq(2L).toDF("x"), "t1")
    val (_, d2) = FeedJob.pull(io, spark, "s", exp)
    // simulate the crash: cursor file rolled back to the pre-pull entry
    Files.writeString(cursor, pre)
    val (n3, d3) = FeedJob.pull(io, spark, "s", exp)
    // same transition digest → same dir, overwritten — no duplicate copy
    assert(d3 == d2 && n3 == 1)
    // exactly the two transition dirs exist — digest order is arbitrary
    assert((d1.toSet ++ d3.toSet) == new java.io.File(exp).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("s-delta-"))
      .map(_.getPath).toSet)
  }

  test("MaintenanceJob: default stage enumeration expires replaced history and vacuums") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.commit("a", Seq(1L).toDF("x"))
    io.replace("a", Seq(2L).toDF("x"))
    io.replace("a", Seq(3L).toDF("x"))
    io.commit("b", Seq(4L).toDF("x")) // single snapshot: nothing to expire
    val orphan = Paths.get(root, "b", "snapshot-crashed")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("junk"), "debris")
    // without --expire-keep: vacuum only
    val (e0, o0) = MaintenanceJob.run(io, root, expireKeep = 0,
      vacuumMinAgeMs = 0L, stagesArg = None)
    assert(e0 == 0 && o0 == 1 && !Files.exists(orphan))
    // with it: stage `a`'s two replaced snapshots go, live survives
    val (e1, o1) = MaintenanceJob.run(io, root, expireKeep = 1,
      vacuumMinAgeMs = 0L, stagesArg = None)
    assert(e1 == 2 && o1 == 0)
    assert(io.load("a").get.as[Long].collect().toSeq == Seq(3L))
    assert(io.load("b").get.count() == 1)
  }

  test("replace since the cursor refuses rather than double-counting; --restart recovers") {
    val root = tmpDir(); val exp = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.commit("s", Seq(1L, 2L).toDF("x"))
    FeedJob.pull(io, spark, "s", exp)
    io.replace("s", Seq(7L, 8L, 9L).toDF("x")) // compaction/rewrite
    intercept[IllegalArgumentException] { FeedJob.pull(io, spark, "s", exp) }
    val (n, d) = FeedJob.pull(io, spark, "s", exp, restart = true)
    assert(n == 3 && d.isDefined)
    assert(spark.read.parquet(d.get).as[Long].collect().toSet == Set(7L, 8L, 9L))
    // and the fresh cursor tails appends again
    io.append("s", Seq(10L).toDF("x"), "t9")
    val (n2, _) = FeedJob.pull(io, spark, "s", exp)
    assert(n2 == 1)
  }

  test("a reset stage (compaction fold) refuses without --restart, recovers with it") {
    val root = tmpDir(); val exp = tmpDir()
    val io = new ParquetTableIO(spark, root, "r", "cfgA")
    io.append("cluster_deltas", Seq(1L).toDF("x"), "t0")
    val (n1, _) = FeedJob.pull(io, spark, "cluster_deltas", exp)
    assert(n1 == 1)
    io.resetStage("cluster_deltas") // the per-compaction fold
    val e = intercept[Exception](FeedJob.pull(io, spark, "cluster_deltas", exp))
    assert(e.getMessage.contains("restart"), e.getMessage)
    val (n2, d2) = FeedJob.pull(io, spark, "cluster_deltas", exp, restart = true)
    assert(n2 == 0 && d2.isEmpty)
    // cursor cleared: the next delta chain exports from its start
    io.append("cluster_deltas", Seq(2L, 3L).toDF("x"), "t1")
    val (n3, _) = FeedJob.pull(io, spark, "cluster_deltas", exp)
    assert(n3 == 2)
  }
}
