package graft

import graft.streaming.TextStreamJob
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming text cascade ≡ batch cascade (round-4 VERDICT item 2).
  *
  * The fixture is built adversarially for the class-keyed state design:
  * exact-dup group {10,11,12} arrives LARGEST-id-first so the class
  * canon improves twice; the near-dup (20) arrives before most of its
  * cluster; the cluster label therefore changes across batches (11 → 10)
  * — which kills the old semantic representative and invalidates a
  * committed `dup_of`; and a later LOWER-id semantic twin (25 of 50)
  * must flip an already-kept representative's verdict. If any of the
  * incremental paths (min-fold classes, affected-component CC,
  * invalidated/flipped rep rescore) is wrong, some prefix comparison
  * below fails.
  */
class TextStreamingSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = DedupConfig()
  private val tauSem = 0.35

  private val t1 =
    "the quick brown fox jumps over the lazy dog near the river bank today again"
  private val t1near = t1.dropRight(5) + "often" // 5-gram J ≈ 0.8 with t1
  private val t2 = "completely unrelated subject matter about cooking pasta recipes"
  private val t3 = "astronomy observations of distant galaxies and nebulae tonight"
  private val t4 = "gardening advice for growing tomatoes in raised garden beds"
  private val t5 = "mountain hiking trails with scenic viewpoints and waterfalls"

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
  private val emb = Seq(
    (10L, vec(1, 0, 0, 0)), (11L, vec(1, 0, 0, 0)), (12L, vec(1, 0, 0, 0)),
    (20L, vec(1, 0, 0, 0)),
    (30L, vec(0.99, 0.14, 0, 0)), // cos ≈ 0.99 with the t1 family
    (40L, vec(0, 1, 0, 0)), // orthogonal: stays kept
    (50L, vec(0, 0, 1, 0)),
    (25L, vec(0, 0.1, 0.995, 0)) // cos ≈ 0.995 with 50; 25 < 50
  ).toDF("id", "vec")

  private val allDocs = Seq(
    10L -> t1, 11L -> t1, 12L -> t1, 20L -> t1near,
    30L -> t2, 40L -> t3, 50L -> t4, 25L -> t5)
  private val batches: Seq[Seq[(Long, String)]] = Seq(
    Seq(11L -> t1, 20L -> t1near, 40L -> t3), // canon 11; label 11
    Seq(12L -> t1, 30L -> t2), // 30 semantic dup_of 11 (intermediate)
    Seq(10L -> t1, 50L -> t4), // canon/label → 10; 30's dup_of invalidated
    Seq(25L -> t5)) // lower-id twin flips kept rep 50

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  /** The batch cascade exactly as TextDedupJob assembles it (LSH
    * candidates + estimate gate + exact-Jaccard verify; exact nList=1
    * semantic tier).
    */
  private def cascade(docs: DataFrame): DataFrame =
    TieredDedup.cascade(docs, emb, surv => {
      val sdocs = surv.select(col("doc_id").as("id"), col("text"))
      val sigs = sdocs.select(col("id"),
        graft.functions.GraftFunctions.minhashCol(
          graft.functions.GraftFunctions.shinglesCol(col("text"), cfg.shingleK),
          cfg.numPerms).as("minhash")).localCheckpoint()
      SparkEntry.nearDupExact(sdocs, sigs, cfg).select(col("a"), col("b"))
    }, tauSem = tauSem, semNList = 1)

  private def collectAssign(df: DataFrame): Seq[(Long, String, Option[Long])] =
    df.select(col("doc_id"), col("tier"), col("dup_of"))
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq

  test("stream tiers equal the batch cascade after EVERY adversarial batch") {
    val out = Files.createTempDirectory("graft-tstream").toString
    val io = new ParquetTableIO(spark, out, "ts1", cfg.configHash)
    batches.zipWithIndex.foreach { case (rows, i) =>
      TextStreamJob.processBatch(io, Some(emb), cfg, tauSem,
        verbose = false)(docsDf(rows), i.toLong)
      val arrived = batches.take(i + 1).flatten
      val streamed = collectAssign(TextStreamJob.liveAssignment(io).get)
      val batch = collectAssign(cascade(docsDf(arrived)))
      assert(streamed == batch, s"prefix ${i + 1}: $streamed vs $batch")
    }
    // final-state spot checks (the scenario the fixture encodes)
    val fin = collectAssign(TextStreamJob.liveAssignment(io).get).map(r =>
      r._1 -> ((r._2, r._3))).toMap
    assert(fin(11L) == (("exact", Some(10L))))
    assert(fin(12L) == (("exact", Some(10L))))
    assert(fin(20L) == (("near", Some(10L))))
    assert(fin(30L) == (("semantic", Some(10L))))
    assert(fin(50L) == (("semantic", Some(25L))))
    assert(fin(10L) == (("kept", None)) && fin(25L) == (("kept", None)) &&
      fin(40L) == (("kept", None)))
  }

  test("replayed micro-batch is a no-op (tagged commits + docs replay guard)") {
    val out = Files.createTempDirectory("graft-tstream").toString
    val io = new ParquetTableIO(spark, out, "ts2", cfg.configHash)
    batches.take(3).zipWithIndex.foreach { case (rows, i) =>
      TextStreamJob.processBatch(io, Some(emb), cfg, tauSem,
        verbose = false)(docsDf(rows), i.toLong)
    }
    val before = collectAssign(TextStreamJob.liveAssignment(io).get)
    val docsBefore = io.load("docs").get.count()
    // crash-redelivery of batch 1: every commit must no-op
    TextStreamJob.processBatch(io, Some(emb), cfg, tauSem,
      verbose = false)(docsDf(batches(1)), 1L)
    assert(collectAssign(TextStreamJob.liveAssignment(io).get) == before)
    assert(io.load("docs").get.count() == docsBefore)
    // and the stream continues correctly after the replay
    TextStreamJob.processBatch(io, Some(emb), cfg, tauSem,
      verbose = false)(docsDf(batches(3)), 3L)
    assert(collectAssign(TextStreamJob.liveAssignment(io).get) ==
      collectAssign(cascade(docsDf(allDocs))))
  }

  test("compaction folds chains without changing the assignment") {
    val out = Files.createTempDirectory("graft-tstream").toString
    val compactCfg = cfg.copy(streamCompactEvery = 2)
    val io = new ParquetTableIO(spark, out, "ts3", compactCfg.configHash)
    batches.zipWithIndex.foreach { case (rows, i) =>
      TextStreamJob.processBatch(io, Some(emb), compactCfg, tauSem,
        verbose = false)(docsDf(rows), i.toLong)
    }
    // folds actually ran: the delta log was reset below the threshold
    assert(io.appendChainLength("cc_deltas") < 3)
    assert(io.appendChainLength("classes") < 3)
    assert(collectAssign(TextStreamJob.liveAssignment(io).get) ==
      collectAssign(cascade(docsDf(allDocs))))
  }

  test("crash before the docs append, AFTER per-batch compaction, replays clean") {
    // the worst replay window: with streamCompactEvery = 1 every batch
    // folds classes/cc/sem and RESETS the cc delta log before the docs
    // append — a crash there leaves all value commits + folds done, tag
    // history of cc_deltas wiped, and the docs replay guard not yet
    // armed. The replay must converge to the same committed state (the
    // cc view is deliberately unfiltered for exactly this window — a
    // vb-filtered view reconstructs an empty base and would append an
    // incomplete re-clustering under the wiped tag).
    val out = Files.createTempDirectory("graft-tstream").toString
    val compactCfg = cfg.copy(streamCompactEvery = 1)
    val real = new ParquetTableIO(spark, out, "ts5", compactCfg.configHash)
    // delegate everything; throw on the docs append while armed
    class CrashingIO extends TableIO {
      var armed = false
      def commit(s: String, df: org.apache.spark.sql.DataFrame) = real.commit(s, df)
      def commitPartitioned(s: String, df: org.apache.spark.sql.DataFrame, p: Seq[String]) =
        real.commitPartitioned(s, df, p)
      def commitBucketed(s: String, df: org.apache.spark.sql.DataFrame, c: String, n: Int) =
        real.commitBucketed(s, df, c, n)
      def commitSorted(s: String, df: org.apache.spark.sql.DataFrame, c: String, n: Int) =
        real.commitSorted(s, df, c, n)
      def loadRange(s: String, c: String, lo: Any, hi: Any) = real.loadRange(s, c, lo, hi)
      def load(s: String) = real.load(s)
      def history(s: String) = real.history(s)
      def rollback(s: String, d: String) = real.rollback(s, d)
      def loadAt(s: String, e: String) = real.loadAt(s, e)
      def replace(s: String, df: org.apache.spark.sql.DataFrame) = real.replace(s, df)
      def append(s: String, df: org.apache.spark.sql.DataFrame, t: String) = {
        if (armed && s == "docs") { armed = false; throw new RuntimeException("injected crash") }
        real.append(s, df, t)
      }
      def replaceTagged(s: String, df: org.apache.spark.sql.DataFrame, t: String) =
        real.replaceTagged(s, df, t)
      def loadTagged(s: String, t: String) = real.loadTagged(s, t)
      def appendChainLength(s: String) = real.appendChainLength(s)
      def liveEntry(s: String) = real.liveEntry(s)
      def incrementalScan(s: String, e: String) = real.incrementalScan(s, e)
      def resetStage(s: String) = real.resetStage(s)
      def expireSnapshots(s: String, k: Int) = real.expireSnapshots(s, k)
      def vacuumOrphans(m: Long) = real.vacuumOrphans(m)
      def runId = real.runId
    }
    val io = new CrashingIO
    batches.take(2).zipWithIndex.foreach { case (rows, i) =>
      TextStreamJob.processBatch(io, Some(emb), compactCfg, tauSem,
        verbose = false)(docsDf(rows), i.toLong)
    }
    // batch 2 crashes in the window (all value commits + folds landed)
    io.armed = true
    intercept[RuntimeException] {
      TextStreamJob.processBatch(io, Some(emb), compactCfg, tauSem,
        verbose = false)(docsDf(batches(2)), 2L)
    }
    // replay of batch 2, then batch 3: final state equals the cascade
    TextStreamJob.processBatch(io, Some(emb), compactCfg, tauSem,
      verbose = false)(docsDf(batches(2)), 2L)
    TextStreamJob.processBatch(io, Some(emb), compactCfg, tauSem,
      verbose = false)(docsDf(batches(3)), 3L)
    assert(collectAssign(TextStreamJob.liveAssignment(real).get) ==
      collectAssign(cascade(docsDf(allDocs))))
  }

  test("runOnce end-to-end: checkpointed stream, no-op rerun, incremental file") {
    val in = Files.createTempDirectory("graft-tstream-in").toString
    val out = Files.createTempDirectory("graft-tstream-out").toString
    val ckpt = Files.createTempDirectory("graft-tstream-ck").toString
    def addFile(rows: Seq[(Long, String)], name: String): Unit =
      docsDf(rows).coalesce(1).write.mode("overwrite").parquet(s"$in/_tmp_$name")
        .ensuring(_ => {
          val part = new java.io.File(s"$in/_tmp_$name").listFiles()
            .find(_.getName.endsWith(".parquet")).get
          Files.move(part.toPath, java.nio.file.Paths.get(s"$in/$name.parquet"))
          true
        })
    batches.take(3).zipWithIndex.foreach { case (rows, i) => addFile(rows, s"f$i") }
    TextStreamJob.runOnce(spark, in, out, ckpt, "ts4", Some(emb), tauSem,
      maxFilesPerTrigger = 1, verbose = false)
    val io = new ParquetTableIO(spark, out, "ts4", cfg.configHash)
    val after3 = collectAssign(io.load("assignment").get)
    assert(after3 == collectAssign(cascade(docsDf(batches.take(3).flatten))))
    // rerun with nothing new: a no-op
    TextStreamJob.runOnce(spark, in, out, ckpt, "ts4", Some(emb), tauSem,
      maxFilesPerTrigger = 1, verbose = false)
    assert(collectAssign(io.load("assignment").get) == after3)
    // add one file; only it is processed, and the assignment catches up
    addFile(batches(3), "f3")
    TextStreamJob.runOnce(spark, in, out, ckpt, "ts4", Some(emb), tauSem,
      maxFilesPerTrigger = 1, verbose = false)
    assert(collectAssign(io.load("assignment").get) ==
      collectAssign(cascade(docsDf(allDocs))))
  }
}
