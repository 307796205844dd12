package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Resume / idempotence tests (SURVEY.md §5.2, E3 lifecycle). */
class TableIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-tableio").toString

  test("commit + load round-trip; resume skips recompute") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    var evaluations = 0
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val committed = io.commit("stage1", { evaluations += 1; df })
    assert(committed.count() == 2)
    assert(evaluations == 1)
    // second commit with same stage: must load the snapshot, not recompute
    val again = io.commit("stage1", { evaluations += 1; df.limit(0) })
    assert(again.count() == 2) // got the committed data, ignored new df
    assert(evaluations == 2) // by-name arg evaluated but df never executed
    assert(io.load("stage1").get.count() == 2)
    assert(io.load("nope").isEmpty)
  }

  test("metrics table captures per-partition lineage rows") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.commit("s", spark.range(100).toDF("x").repartition(4))
    val m = io.metrics().get
    assert(m.columns.toSet ==
      Set("partition_id", "file", "rows", "run_id", "stage", "wall_ms"))
    val total = m.agg(sum("rows")).as[Long].collect()(0)
    assert(total == 100)
    assert(m.select("file").as[String].collect().forall(_.nonEmpty))
  }

  test("partitioned commit lays out files by column and round-trips") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    val df = Seq((1, "x", 10), (2, "y", 20), (3, "x", 30)).toDF("k", "part", "v")
    val committed = io.commitPartitioned("staged", df, Seq("part"))
    assert(committed.count() == 3)
    // physical layout: one subdir per partition value (prunable reads)
    val snap = io.history("staged").last
    val dirs = new java.io.File(snap).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("part=x", "part=y")))
    // partition-pruned scan reads only the matching subdir
    val plan = io.load("staged").get.where(col("part") === "x")
      .queryExecution.executedPlan.toString
    assert(io.load("staged").get.where(col("part") === "x").count() == 2)
    assert(plan.contains("PartitionFilters: [isnotnull(part"), plan)
  }

  test("pipeline commits verified partitioned by dup verdict; resume prunes the scan") {
    val root = tmpDir()
    val corpus = Fixtures.corpus(spark, 25).toDF()
    val io = new ParquetTableIO(spark, root, "runP", DedupConfig().configHash)
    val r = Pipeline.runCheckpointed(corpus, DedupConfig(), io)
    r.clusters.count()
    r.unpersist()
    // physical layout: verified split into dup_part=0/1 directories
    val snap = io.history("verified").last
    val dirs = new java.io.File(snap).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("dup_part=")), dirs.mkString(","))
    // the CC stage's resumed read (dup edges only) prunes to dup_part=1
    val plan = io.load("verified").get.where(col("dup_part") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dup_part"), plan)
  }

  test("IcebergTableIO implements the TableIO contract and guards its wiring") {
    // compile-time contract: the production binding is a TableIO, so every
    // job constructing a ParquetTableIO can take it unchanged; the trait
    // semantics themselves are pinned by this whole suite against the
    // Parquet implementation (the Iceberg runtime jar is absent in the
    // sandbox — SURVEY.md §0.1 — so only the wiring guard runs here)
    def asTableIO(io: TableIO): TableIO = io
    assert(classOf[TableIO].isAssignableFrom(classOf[IcebergTableIO]))
    // runtime guard: an unconfigured catalog must fail fast with the
    // wiring recipe, not an opaque analyzer error on first use
    val e = intercept[IllegalArgumentException] {
      asTableIO(new IcebergTableIO(spark, "graft_missing_cat", "ns", "r", "cfg"))
    }
    assert(e.getMessage.contains("spark.sql.catalog"), e.getMessage)
  }

  test("IcebergSql statement builders are golden-pinned (round-4 VERDICT #3)") {
    // The sandbox has no Iceberg runtime, so these statements never
    // execute in-repo — pinning their exact text is the falsifiability
    // gate: a typo'd metadata-table name, procedure argument, or clause
    // now fails here instead of only in production. Each golden was
    // checked against the published Iceberg Spark docs (snapshots/refs
    // metadata tables, VERSION AS OF, rollback_to_snapshot,
    // expire_snapshots, remove_orphan_files).
    assert(IcebergSql.table("graft", "dedup.run1", "docs") ==
      "graft.dedup.run1.docs")
    assert(IcebergSql.createNamespace("graft", "dedup.run1") ==
      "CREATE NAMESPACE IF NOT EXISTS graft.dedup.run1")
    assert(IcebergSql.refsHead("graft.ns.docs") ==
      "SELECT snapshot_id FROM graft.ns.docs.refs " +
        "WHERE name = 'main' AND type = 'BRANCH'")
    assert(IcebergSql.snapshotGraph("graft.ns.docs") ==
      "SELECT snapshot_id, parent_id, operation, summary['graft.tag'] " +
        "FROM graft.ns.docs.snapshots")
    assert(IcebergSql.versionAsOf("graft.ns.docs", "8512930764662570091") ==
      "SELECT * FROM graft.ns.docs VERSION AS OF 8512930764662570091")
    assert(IcebergSql.rollbackTo("graft", "ns", "docs", "42") ==
      "CALL graft.system.rollback_to_snapshot('ns.docs', 42)")
    assert(IcebergSql.expireSnapshots("graft", "ns", "docs", 3) ==
      "CALL graft.system.expire_snapshots(table => 'ns.docs', " +
        "retain_last => 3, older_than => TIMESTAMP '9999-01-01 00:00:00')")
    assert(IcebergSql.removeOrphanFiles("graft", "ns", "docs",
        java.sql.Timestamp.valueOf("2026-01-02 03:04:05.6")) ==
      "CALL graft.system.remove_orphan_files(table => 'ns.docs', " +
        "older_than => TIMESTAMP '2026-01-02 03:04:05.6')")
    assert(IcebergSql.showTables("graft", "ns") == "SHOW TABLES IN graft.ns")
    assert(IcebergSql.dropTable("graft.ns.docs") == "DROP TABLE graft.ns.docs")
  }

  test("Iceberg ancestor-chain ordering logic is deterministic (no committed_at)") {
    // IcebergSnapshots.chain/appendChainLength are the REAL code
    // IcebergTableIO runs (only the SQL reads are stubbed by the
    // fixture graph): head from the main ref, parents walked, orphaned
    // (rolled-back) branches excluded, insensitive to row order / equal
    // timestamps.
    val graph = Seq(
      IcebergSnapshot("30", Some("20"), "append", Some("b2")),
      IcebergSnapshot("10", None, "append", Some("b0")),
      IcebergSnapshot("99", Some("10"), "append", Some("orphaned")),
      IcebergSnapshot("20", Some("10"), "overwrite", None))
    val byId = graph.map(s => s.id -> s).toMap
    val chain = IcebergSnapshots.chain(Some("30"), byId)
    assert(chain.map(_.id) == Seq("10", "20", "30"))
    assert(!chain.exists(_.id == "99")) // rolled-back snapshot excluded
    assert(IcebergSnapshots.chain(None, byId).isEmpty) // no main ref yet
    // append-chain contract over the chain's operations
    assert(IcebergSnapshots.appendChainLength(chain.map(_.operation)) == 2)
    assert(IcebergSnapshots.appendChainLength(Seq("append", "append")) == 2)
    assert(IcebergSnapshots.appendChainLength(Seq.empty) == 0)
    assert(IcebergSnapshots.appendChainLength(Seq("overwrite")) == 1)
  }

  test("pipeline commits candidates/scored bucketed: resumed joins skip their exchange") {
    // round-2 item 6 completed (round 4): the wide pair stages commit
    // bucketed on the downstream join key "a", so the scoring join
    // (candidates ⋈ signatures) and the verify join (scored ⋈ payload)
    // read pre-partitioned sides on resume in a fresh catalog.
    val root = tmpDir()
    val corpus = Fixtures.corpus(spark, 25).toDF()
    val io = new ParquetTableIO(spark, root, "runBk", DedupConfig().configHash)
    val r = Pipeline.runCheckpointed(corpus, DedupConfig(), io)
    r.clusters.count()
    r.unpersist()
    // fresh-catalog resume: bucket metadata must come from the persisted
    // bucket spec, not this session's catalog state
    spark.catalog.listTables().collect()
      .filter(t => t.name.startsWith("graft_candidates_") ||
        t.name.startsWith("graft_scored_") || t.name.startsWith("graft_signatures_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    // broadcast off: a tiny test relation would otherwise broadcast and
    // make the zero-exchange assertion vacuous
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // scoring-shaped join: BOTH sides bucketed on the key (candidates
      // on a, signatures on id aliased to a) ⇒ ZERO exchanges
      val cand = io.load("candidates").get
      val sigs = io.load("signatures").get
      val scoringPlan = cand
        .join(sigs.select(col("id").as("a"), col("minhash")), Seq("a"))
        .queryExecution.executedPlan.toString
      assert(scoringPlan.contains("Bucketed: true"), scoringPlan)
      assert("Exchange hashpartitioning".r.findAllIn(scoringPlan).isEmpty,
        scoringPlan)
      // verify-shaped join: scored bucketed, the (unbucketed) payload
      // side hinted SHUFFLE_HASH ⇒ exactly ONE exchange, payload only
      val scored = io.load("scored").get
      val payload = corpus.select(xxhash64(col("image_id")).as("a"), col("bytes"))
      val verifyPlan = scored
        .join(payload.hint("SHUFFLE_HASH"), Seq("a"))
        .queryExecution.executedPlan.toString
      assert(verifyPlan.contains("Bucketed: true"), verifyPlan)
      assert("Exchange hashpartitioning".r.findAllIn(verifyPlan).size == 1,
        verifyPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("bucketed commit: the committed side joins with NO exchange of its own") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "runB", "cfgA")
    val sigs = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    io.commitBucketed("sigs", sigs, "id", 8)
    val pairsSide = (0 until 500).map(i => (i.toLong, i * 2)).toDF("id", "w")
    def joinPlan: String = io.load("sigs").get
      .join(pairsSide.hint("SHUFFLE_HASH"), "id")
      .queryExecution.executedPlan.toString
    val plan = joinPlan
    // the bucketed scan feeds the join directly; only the pair side
    // shuffles — the exact shape the 10^12-row scoring join needs
    assert(plan.contains("Bucketed: true"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    // resume in a FRESH catalog (bucket metadata is catalog state, not
    // parquet state): drop the registered table; load must re-register
    // from the persisted bucket spec and keep the exchange-free shape
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_sigs_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val resumed = joinPlan
    assert(resumed.contains("Bucketed: true"), resumed)
    assert("Exchange hashpartitioning".r.findAllIn(resumed).size == 1, resumed)
    // data round-trips
    assert(io.load("sigs").get.count() == 1000)
  }

  test("commitSorted + loadRange: range reads touch only overlapping files") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    val df = spark.range(10000).toDF("id").withColumn("v", col("id") * 2)
    io.commitSorted("sorted", df, "id", 8)
    val full = io.load("sorted").get
    assert(full.inputFiles.length >= 4) // range partitioner made real files
    // point-ish range: same rows as a full filter, from a file subset
    val pruned = io.loadRange("sorted", "id", 100L, 200L).get
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
      (100L to 200L).toSeq)
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"${pruned.inputFiles.length} vs ${full.inputFiles.length}")
    assert(pruned.inputFiles.length <= 2) // disjoint zones: 1–2 files
    // empty range beyond the max zone: zero rows, zero files
    assert(io.loadRange("sorted", "id", 50000L, 60000L).get.count() == 0)
    // stage committed WITHOUT a sort: fallback full scan, same answer
    io.commit("plain", df)
    val fb = io.loadRange("plain", "id", 100L, 200L).get
    assert(fb.count() == 101)
    assert(io.loadRange("nope", "id", 0L, 1L).isEmpty)
  }

  test("loadRange: string zone map prunes; replace staleness falls back") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    val df = spark.range(2000).toDF("n")
      .select(format_string("img%08d", col("n")).as("cid"), col("n"))
    io.commitSorted("clusters", df, "cid", 8)
    val pruned = io.loadRange("clusters", "cid", "img00000100", "img00000200").get
    assert(pruned.count() == 101)
    assert(pruned.inputFiles.length <= 2)
    // wrong-column range: correct via unpruned fallback
    assert(io.loadRange("clusters", "n", 100L, 200L).get.count() == 101)
    // replace makes the zone map stale → loadRange must NOT prune with it
    io.replace("clusters", df.where(col("n") < 500))
    val afterReplace = io.loadRange("clusters", "cid", "img00000100", "img00000200").get
    assert(afterReplace.count() == 101)
    assert(afterReplace.inputFiles.toSet == io.load("clusters").get.inputFiles.toSet)
  }

  test("append: tagged snapshots accumulate; a replayed tag is a no-op") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.append("t", Seq((1, "a")).toDF("k", "v"), "b0")
    io.append("t", Seq((2, "b")).toDF("k", "v"), "b1")
    assert(io.load("t").get.as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    val before = io.history("t")
    io.append("t", Seq((99, "zzz")).toDF("k", "v"), "b1") // crash replay
    assert(io.load("t").get.count() == 2)
    assert(io.history("t") == before)
    // replaceTagged: same-tag replace is also a no-op
    io.replaceTagged("c", Seq((1, "x")).toDF("k", "v"), "b0")
    io.replaceTagged("c", Seq((9, "y")).toDF("k", "v"), "b0")
    assert(io.load("c").get.as[(Int, String)].collect().toSeq == Seq((1, "x")))
  }

  test("incremental scan reads only rows appended after the cursor") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.append("t", Seq((1, "a")).toDF("k", "v"), "b0")
    val cursor = io.liveEntry("t").get
    // nothing appended yet: None, not an empty frame
    assert(io.incrementalScan("t", cursor).isEmpty)
    io.append("t", Seq((2, "b")).toDF("k", "v"), "b1")
    io.append("t", Seq((3, "c")).toDF("k", "v"), "b2")
    // only b1+b2 rows, never the already-consumed b0
    assert(io.incrementalScan("t", cursor).get
      .as[(Int, String)].collect().toSet == Set((2, "b"), (3, "c")))
    // advancing the cursor makes the earlier increment invisible
    val cursor2 = io.liveEntry("t").get
    io.append("t", Seq((4, "d")).toDF("k", "v"), "b3")
    assert(io.incrementalScan("t", cursor2).get
      .as[(Int, String)].collect().toSet == Set((4, "d")))
    // a REPLACE (compaction/rewrite) invalidates cursors: re-reading the
    // whole table would double-count, so the scan must refuse
    io.replace("t", Seq((9, "z")).toDF("k", "v"))
    intercept[IllegalArgumentException] { io.incrementalScan("t", cursor2) }
    // a never-committed stage is an error, not an empty increment
    intercept[IllegalStateException] { io.incrementalScan("nope", "x") }
  }

  test("snapshot history + rollback restore an earlier snapshot atomically") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.commit("s", Seq((1, "old")).toDF("k", "v"))
    val first = io.history("s").head
    io.replace("s", Seq((2, "new"), (3, "newer")).toDF("k", "v"))
    assert(io.history("s").size == 2)
    assert(io.load("s").get.count() == 2) // live = newest
    io.rollback("s", first)
    assert(io.load("s").get.as[(Int, String)].collect().toSeq == Seq((1, "old")))
    assert(io.history("s").size == 2) // nothing deleted
    intercept[IllegalArgumentException] { io.rollback("s", "/nope/snapshot") }
  }

  test("loadAt: time-travel read of a historical snapshot, live untouched") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.commit("s", Seq((1, "old")).toDF("k", "v"))
    val first = io.history("s").head
    io.replace("s", Seq((2, "new")).toDF("k", "v"))
    // read the pre-change snapshot without a rollback — the churn-audit
    // shape: clusterChurn(loadAt(old), load(live))
    assert(io.loadAt("s", first).as[(Int, String)].collect().toSeq == Seq((1, "old")))
    assert(io.load("s").get.as[(Int, String)].collect().toSeq == Seq((2, "new")))
    assert(io.history("s").size == 2) // manifest not mutated
    // an append-chain entry time-travels to its prefix of the chain
    io.append("t", Seq(1L).toDF("x"), "b0")
    val chainFirst = io.liveEntry("t").get
    io.append("t", Seq(2L).toDF("x"), "b1")
    assert(io.loadAt("t", chainFirst).count() == 1)
    assert(io.load("t").get.count() == 2)
    // expired → refuses instead of a partial read
    io.expireSnapshots("s", keepLast = 1)
    intercept[IllegalArgumentException] { io.loadAt("s", first) }
  }

  test("append: a tag folded into a compacted snapshot still no-ops on replay") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.append("s", Seq((1, "a")).toDF("k", "v"), "b0")
    io.append("s", Seq((2, "b")).toDF("k", "v"), "b1")
    io.replaceTagged("s", io.load("s").get, "compact-b1") // fold the chain
    assert(io.appendChainLength("s") == 1)
    // the crash window: batch b1 replays AFTER its rows were folded out of
    // the live entry — head-only replay detection would duplicate them
    val replayed = io.append("s", Seq((2, "b")).toDF("k", "v"), "b1")
    assert(replayed.count() == 2)
    assert(io.load("s").get.count() == 2)
    assert(io.appendChainLength("s") == 1) // still the compacted entry
  }

  test("expireSnapshots: replaced history reclaims bytes, live + kept survive") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.commit("s", Seq((1, "v1")).toDF("k", "v"))
    io.replace("s", Seq((2, "v2")).toDF("k", "v"))
    io.replace("s", Seq((3, "v3")).toDF("k", "v"))
    val hist = io.history("s") // oldest → newest
    assert(hist.size == 3)
    val deleted = io.expireSnapshots("s", keepLast = 2)
    assert(deleted == Seq(hist.head)) // only the oldest dir goes
    assert(!Files.exists(java.nio.file.Paths.get(hist.head)))
    assert(Files.exists(java.nio.file.Paths.get(hist(1))))
    assert(io.history("s").size == 2)
    assert(io.load("s").get.as[(Int, String)].collect().toSeq == Seq((3, "v3")))
    // an expired snapshot is no longer a rollback target
    intercept[IllegalArgumentException] { io.rollback("s", hist.head) }
    // idempotent: nothing left past the horizon
    assert(io.expireSnapshots("s", keepLast = 2).isEmpty)
    intercept[IllegalArgumentException] { io.expireSnapshots("s", 0) }
  }

  test("expireSnapshots: append-chain ancestors shared with live are never deleted") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.append("s", Seq((1, "a")).toDF("k", "v"), "t1")
    io.append("s", Seq((2, "b")).toDF("k", "v"), "t2")
    io.append("s", Seq((3, "c")).toDF("k", "v"), "t3")
    assert(io.history("s").size == 3) // entries: t1 / t1;t2 / t1;t2;t3
    // every historical entry is a prefix of the live file set → expiry
    // trims manifest lines only, all data dirs survive
    assert(io.expireSnapshots("s", keepLast = 1).isEmpty)
    assert(io.history("s").size == 1)
    assert(io.load("s").get.count() == 3)
    // a compaction REPLACES the chain; expiring now reclaims the chain dirs
    val chainDirs = io.liveEntry("s").get.split(';').toSeq
    io.replace("s", io.load("s").get)
    val deleted = io.expireSnapshots("s", keepLast = 1)
    assert(deleted.toSet == chainDirs.toSet)
    chainDirs.foreach(d => assert(!Files.exists(java.nio.file.Paths.get(d))))
    assert(io.load("s").get.count() == 3)
  }

  test("vacuumOrphans: unreferenced dirs go, referenced and fresh dirs stay") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "run1", "cfgA")
    io.commit("s", Seq((1, "a")).toDF("k", "v"))
    // a crashed write: snapshot dir on disk, no manifest entry
    val orphan = java.nio.file.Paths.get(root, "s", "snapshot-crashed")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-0.parquet"), "debris")
    // a delta log cleared by resetStage orphans its dirs the same way
    io.append("deltas", Seq((9, "d")).toDF("k", "v"), "t1")
    val deltaDir = io.liveEntry("deltas").get
    io.resetStage("deltas")
    // non-snapshot state sharing the out dir (stream checkpoint offsets)
    // is never a vacuum candidate, referenced or not
    val ckptState = java.nio.file.Paths.get(root, "_stream_checkpoint", "offsets")
    Files.createDirectories(ckptState)
    Files.writeString(ckptState.resolve("0"), "offset state")
    // age guard: nothing young enough to be in-flight is touched
    assert(io.vacuumOrphans(minAgeMs = 3600000L).isEmpty)
    val gone = io.vacuumOrphans(minAgeMs = 0L)
    assert(gone.toSet == Set(orphan.toString, deltaDir))
    assert(!Files.exists(orphan))
    assert(!Files.exists(java.nio.file.Paths.get(deltaDir)))
    assert(Files.exists(ckptState.resolve("0"))) // checkpoint spared
    assert(io.load("s").get.count() == 1) // committed data untouched
  }

  test("config hash mismatch refuses resume") {
    val root = tmpDir()
    new ParquetTableIO(spark, root, "run1", "cfgA")
    val e = intercept[IllegalArgumentException] {
      new ParquetTableIO(spark, root, "run2", "cfgB")
    }
    assert(e.getMessage.contains("refusing to resume"))
  }

  test("checkpointed pipeline resumes to byte-identical clusters") {
    val root = tmpDir()
    val cfg = DedupConfig()
    val corpus = Fixtures.corpus(spark, 30).toDF().cache()
    val io1 = new ParquetTableIO(spark, root, "runA", cfg.configHash)
    val r1 = Pipeline.runCheckpointed(corpus, cfg, io1)
    val c1 = r1.clusters.orderBy("image_id").collect()
    // fresh TableIO over the same dir = crashed-driver restart
    val io2 = new ParquetTableIO(spark, root, "runB", cfg.configHash)
    val r2 = Pipeline.runCheckpointed(corpus, cfg, io2)
    val c2 = r2.clusters.orderBy("image_id").collect()
    assert(c1.sameElements(c2))
  }

  test("DedupJob CLI args: valueless --resume parses in any position") {
    val (kv, flags) = DedupJob.parseArgs(
      Array("--resume", "--input", "in.parquet", "--out", "outdir"))
    assert(kv == Map("--input" -> "in.parquet", "--out" -> "outdir"))
    assert(flags == Set("--resume"))
    val (kv2, flags2) = DedupJob.parseArgs(
      Array("--input", "i", "--resume", "--run-id", "r7"))
    assert(kv2 == Map("--input" -> "i", "--run-id" -> "r7") && flags2("--resume"))
    intercept[RuntimeException] { DedupJob.parseArgs(Array("--input")) }
    intercept[RuntimeException] { DedupJob.parseArgs(Array("bogus")) }
  }

  test("partial run (crash after stage 2) resumes and completes") {
    val root = tmpDir()
    val cfg = DedupConfig()
    val corpus = Fixtures.corpus(spark, 25).toDF().cache()
    // simulate a crash: run only the first two stages
    val io1 = new ParquetTableIO(spark, root, "runA", cfg.configHash)
    io1.commit("signatures", Signatures.signatures(corpus, cfg))
    assert(io1.load("signatures").isDefined && io1.load("candidates").isEmpty)
    // restart: full pipeline picks up the committed signatures
    val io2 = new ParquetTableIO(spark, root, "runB", cfg.configHash)
    val done = Pipeline.runCheckpointed(corpus, cfg, io2)
    assert(done.clusters.count() == corpus.count())
    assert(io2.load("clusters").isDefined)
  }

  test("replace after a bucketed commit invalidates the stale bucket spec") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "runBS", "cfgA")
    val sigs = (0 until 200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    io.commitBucketed("s", sigs, "id", 4)
    val probe = (0 until 300).map(i => i.toLong).toDF("id")
    def joinPlan: String = io.load("s").get
      .join(probe.hint("SHUFFLE_HASH"), "id")
      .queryExecution.executedPlan.toString
    assert(joinPlan.contains("Bucketed: true"), joinPlan)
    // a plain rewrite (compaction fold / replace) produces UNBUCKETED
    // files; registering them CLUSTERED BY would let Spark elide
    // exchanges and silently drop join matches
    val folded = (0 until 300).map(i => (i.toLong, s"w$i")).toDF("id", "v")
    io.replace("s", folded)
    assert(!joinPlan.contains("Bucketed: true"), joinPlan)
    assert(io.load("s").get.count() == 300)
    // and an equi-join on the folded table is CORRECT (every key matches)
    assert(io.load("s").get.join(probe, "id").count() == 300)
  }

  test("expireSnapshots concurrent with appends never loses a committed append") {
    val root = tmpDir()
    val io = new ParquetTableIO(spark, root, "runCC", "cfgA")
    io.commit("s", Seq(0L).toDF("x"))
    val dfs = (1 to 12).map(i => Seq(i.toLong).toDF("x"))
    val fails = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val writer = new Thread(() => try {
      dfs.zipWithIndex.foreach { case (d, i) => io.append("s", d, s"t$i") }
    } catch { case t: Throwable => fails.set(t) })
    writer.start()
    // the maintenance side: read-truncate-write loops racing the writer's
    // read-prepend-write — without the stage lock one side's manifest
    // update is lost (a committed append vanishing from the chain)
    while (writer.isAlive) io.expireSnapshots("s", 1)
    writer.join()
    assert(fails.get() == null, String.valueOf(fails.get()))
    io.expireSnapshots("s", 1)
    assert(io.load("s").get.count() == 13,
      "every appended row must survive concurrent expiry")
  }
}
