package graft

import graft.streaming.{StreamJob, Streaming}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("ST2: tumbling windowed counts with watermark drop late rows") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = Streaming
      .windowedIngestMetrics(input.toDF().toDF("ts", "v"), "ts", "1 minute", "5 minutes")
      .writeStream.format("memory").queryName("win_counts").outputMode("update").start()
    input.addData((ts(1), 1L), (ts(1), 2L), (ts(2), 3L))
    q.processAllAvailable()
    input.addData((ts(30), 4L)) // advances watermark to 10:25
    q.processAllAvailable()
    input.addData((ts(2), 5L)) // late beyond watermark → dropped
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .groupBy("window_start").agg(max("n_rows").as("n"))
      .as[(Timestamp, Long)].collect().toMap
    assert(rows(ts(1)) == 2L)
    assert(rows(ts(2)) == 1L) // late row did NOT bump this window
    assert(rows(ts(30)) == 1L)
    q.stop()
  }

  test("ST3: dropDuplicatesWithinWatermark suppresses repeated image_ids") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val q = Streaming
      .dedupStream(input.toDF().toDF("image_id", "ts"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    input.addData(("a", ts(1)), ("b", ts(1)), ("a", ts(2)))
    q.processAllAvailable()
    input.addData(("a", ts(3)), ("c", ts(4)))
    q.processAllAvailable()
    val seen = spark.table("dedup_stream").select("image_id").as[String].collect().sorted
    assert(seen.toSeq == Seq("a", "b", "c"))
    q.stop()
  }

  test("ST1: signature stream equals batch signatures on the same rows") {
    implicit val sq = spark.sqlContext
    val cfg = DedupConfig()
    val rows = Fixtures.corpus(spark, 5).collect().toSeq
    val input = MemoryStream[ImageRow]
    val q = Streaming.signatureStream(input.toDF(), cfg)
      .writeStream.format("memory").queryName("sig_stream").outputMode("append").start()
    input.addData(rows)
    q.processAllAvailable()
    val streamed = spark.table("sig_stream")
      .select("image_id", "minhash", "simhash")
      .as[(String, Array[Int], Long)].collect()
      .map(r => (r._1, r._2.toSeq, r._3)).sortBy(_._1)
    val batch = Signatures.signatures(spark.createDataset(rows).toDF(), cfg)
      .select("image_id", "minhash", "simhash")
      .as[(String, Array[Int], Long)].collect()
      .map(r => (r._1, r._2.toSeq, r._3)).sortBy(_._1)
    assert(streamed.sameElements(batch))
    q.stop()
  }

  test("ST5: canonical state survives a stream RESTART (checkpoint recovery)") {
    // the streaming twin of the batch engine's resume guarantee: stop the
    // query, deliver a duplicate of an already-canonicalized key to a NEW
    // query on the same checkpoint — the state store must restore the
    // canonical choice, not re-elect the newcomer
    val dir = java.nio.file.Files.createTempDirectory("st5restart").toString
    val src = s"$dir/src"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "image_id string, caption string, phash bigint, ts timestamp")
    def startQuery() = Streaming
      .assignCanonicalStream(spark.readStream.schema(schema).parquet(src), "ts")
      .toDF("image_id", "canonical_id", "is_dup")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    Seq(("a1", "same content", 7L, ts(1)), ("b1", "other", 9L, ts(1)))
      .toDF("image_id", "caption", "phash", "ts")
      .write.mode("append").parquet(src)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    // a2 carries the SAME content key as a1 but arrives only after restart
    Seq(("a2", "same content", 7L, ts(2)))
      .toDF("image_id", "caption", "phash", "ts")
      .write.mode("append").parquet(src)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(out)
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a1", "a1", false), ("a2", "a1", true), ("b1", "b1", false)),
      s"restart lost canonical state: ${got.toSeq}")
  }

  test("ST5: custom-state canonical assignment emits lineage and evicts state") {
    implicit val sq = spark.sqlContext
    // (image_id, caption, phash, ts) — same caption+phash ⇒ same content key
    val input = MemoryStream[(String, String, Long, Timestamp)]
    val q = Streaming
      .assignCanonicalStream(
        input.toDF().toDF("image_id", "caption", "phash", "ts"),
        "ts", watermark = "5 minutes", horizonMs = 5L * 60 * 1000)
      .writeStream.format("memory").queryName("canon_stream")
      .outputMode("append").start()
    def table() = spark.table("canon_stream")
      .as[(String, String, Boolean)].collect().toSeq

    input.addData(
      ("a", "same cap", 7L, ts(1)), ("b", "same cap", 7L, ts(2)),
      ("d", "other cap", 9L, ts(1)))
    q.processAllAvailable()
    // first-seen a is canonical for the shared key; d is its own canonical
    assert(table().toSet == Set(("a", "a", false), ("b", "a", true), ("d", "d", false)))

    input.addData(("c", "same cap", 7L, ts(3)))
    q.processAllAvailable()
    // later arrival within the horizon maps onto the EXISTING canonical
    assert(table().contains(("c", "a", true)))

    // push the watermark far past the key's timeout (ts3 + 5 min), then
    // re-send the same content: state must have been evicted, so the new
    // arrival becomes a fresh canonical instead of mapping onto `a`
    input.addData(("w", "unrelated", 1L, ts(40)))
    q.processAllAvailable()
    input.addData(("e", "same cap", 7L, ts(45)))
    q.processAllAvailable()
    assert(table().contains(("e", "e", false)),
      s"state not evicted after timeout: ${table()}")
    q.stop()
  }

  test("ST4: incremental candidates find historical near-dups") {
    val cfg = DedupConfig()
    val corpus = Fixtures.corpus(spark, 20).toDF()
    val sigs = Signatures.signatures(corpus, cfg)
    val committed = Lsh.bands(sigs, cfg) // "historical" snapshot
    // new batch: re-use 3 existing rows with new ids (exact caption dups)
    val newRows = corpus.limit(3)
      .withColumn("image_id", concat(lit("new_"), col("image_id")))
    val newSigs = Signatures.signatures(newRows, cfg)
    val cands = Streaming.incrementalCandidates(newSigs, committed, cfg)
    // candidates carry i64 ids — translate both sides via the sig mappings
    val newMap = newSigs.select(col("id").as("a"), col("image_id").as("a_img"))
    val histMap = sigs.select(col("id").as("b"), col("image_id").as("b_img"))
    val found = cands.join(newMap, "a").join(histMap, "b")
      .where(expr("substring(a_img, 5) = b_img"))
      .count()
    assert(found == 3, s"expected each new row to hit its historical twin")
  }

  // ---- StreamJob end-to-end ----

  /** Write batches `from until until` of an `n`-way deterministic hash
    * split of `corpus` as parquet files into `dir`, in batch order so the
    * file stream ingests b0, b1, … .
    */
  private def writeBatchFiles(corpus: org.apache.spark.sql.DataFrame,
      dir: java.nio.file.Path, n: Int, from: Int = 0, until: Int = -1): Unit = {
    (from until (if (until < 0) n else until)).foreach { b =>
      val tmp = java.nio.file.Files.createTempDirectory(s"sj_tmp$b")
      corpus.where(pmod(xxhash64(col("image_id")), lit(n)) === b)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        dir.resolve(f"batch$b%03d.parquet"))
      Thread.sleep(5) // distinct mtimes → stable file-stream batch order
    }
  }

  private def clusterSet(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.select("image_id", "cluster_id").as[(String, String)].collect().toSet

  test("StreamJob e2e: multi-batch stream commits clusters identical to the batch run") {
    val corpus = Fixtures.corpus(spark, 60).toDF().localCheckpoint()
    val batchRef = Pipeline.run(corpus, DedupConfig())
    val expected = clusterSet(batchRef.clusters)
    batchRef.unpersist()

    val in = java.nio.file.Files.createTempDirectory("sj_in")
    val out = java.nio.file.Files.createTempDirectory("sj_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sj_ckpt").toString
    writeBatchFiles(corpus, in, 3)
    StreamJob.runOnce(spark, in.toString, out, ckpt, "sj1") // 3 micro-batches
    val io = new ParquetTableIO(spark, out, "sj1", DedupConfig().configHash)
    assert(clusterSet(io.load("clusters").get) == expected)
    // the corpus table accumulated exactly the 3 appends
    assert(io.load("corpus").get.count() == corpus.count())
  }

  test("StreamJob e2e: --expire-keep trims cluster history + orphans, output unchanged") {
    val corpus = Fixtures.corpus(spark, 60).toDF().localCheckpoint()
    val batchRef = Pipeline.run(corpus, DedupConfig())
    val expected = clusterSet(batchRef.clusters)
    batchRef.unpersist()

    val in = java.nio.file.Files.createTempDirectory("sj4_in")
    val out = java.nio.file.Files.createTempDirectory("sj4_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sj4_ckpt").toString
    writeBatchFiles(corpus, in, 3)
    // compactEvery=1 forces a full-assignment rewrite per batch — the
    // regime expiry exists for (history grows one corpus copy per batch)
    StreamJob.runOnce(spark, in.toString, out, ckpt, "sj4",
      cfg = DedupConfig(streamCompactEvery = 1), expireKeep = 1)
    val io = new ParquetTableIO(spark, out, "sj4",
      DedupConfig(streamCompactEvery = 1).configHash)
    assert(clusterSet(io.load("clusters").get) == expected) // output intact
    assert(io.history("clusters").size == 1) // history trimmed to live
    // probe-path key tables were folded per batch (compactEvery=1) and
    // their pre-compact chains expired: one live snapshot each, with the
    // full accumulated content
    for (st <- Seq("signatures", "bands", "simhash_keys", "span_fps")) {
      assert(io.appendChainLength(st) == 1, s"$st chain not folded")
      assert(io.history(st).size == 1, s"$st history not expired")
    }
    assert(io.load("signatures").get.count() == io.load("corpus").get
      .where(length(col("caption")) > 0 && col("w") > 0 && col("h") > 0).count())
    // and the bytes are actually gone: live dirs are all that remain on
    // disk for every replaced/folded stage (expired dirs deleted, folded
    // deltas vacuumed)
    for (stage <- Seq("clusters", "cluster_deltas", "signatures", "bands",
        "simhash_keys", "span_fps")) {
      val live = io.liveEntry(stage).toSeq.flatMap(_.split(';')).map(
        p => java.nio.file.Paths.get(p).normalize().toString).toSet
      val dir = java.nio.file.Paths.get(out, stage)
      if (java.nio.file.Files.exists(dir)) {
        val onDisk = java.nio.file.Files.list(dir).toArray
          .map(_.toString).filterNot(_.contains("_SUCCESS")).toSet
        assert(onDisk.subsetOf(live), s"$stage retains expired dirs: ${onDisk -- live}")
      }
    }
  }

  test("StreamJob e2e: incremental CC merges two clusters committed in different batches") {
    // the adversarial incremental-CC case: rows A (batch 0) and B (batch 1)
    // are committed as SEPARATE clusters — disjoint-alphabet captions, so
    // no candidate path links them — then bridge row C (batch 2) shares a
    // long caption span AND pixels with BOTH, so batch 2's new edges must
    // merge two previously-committed clusters. A control cluster (D1, D2)
    // is never touched after batch 0 and must keep its assignment.
    val capA = (0 until 30).map(i => s"alba${('a' + i % 13).toChar}med").mkString(" ")
    val capB = (0 until 30).map(i => s"zorn${('n' + i % 13).toChar}qux").mkString(" ")
    val base = Imaging.encodePng(Fixtures.renderBase(99L, 64, 48))
    val noisy = Imaging.encodePng(Fixtures.renderBase(99L, 64, 48)) // identical render
    val dImg = Imaging.encodePng(Fixtures.renderBase(123L, 64, 48))
    def row(id: String, bytes: Array[Byte], cap: String) =
      ImageRow(id, bytes, 64, 48, "png", cap, Imaging.phash(bytes))
    val batches = Seq(
      Seq(row("bridge_a", base, capA),
        row("ctl_d1", dImg, "quiet harbor boats resting at golden dusk water"),
        row("ctl_d2", dImg, "quiet harbor boats resting at golden dusk water")),
      Seq(row("bridge_b", noisy, capB)),
      Seq(row("bridge_c", base, capA + " " + capB)))

    val in = java.nio.file.Files.createTempDirectory("sj3_in")
    val out = java.nio.file.Files.createTempDirectory("sj3_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sj3_ckpt").toString
    def writeBatch(b: Int): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"sj3_tmp$b")
      spark.createDataset(batches(b)).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        in.resolve(f"batch$b%03d.parquet"))
      Thread.sleep(5)
    }
    writeBatch(0); writeBatch(1)
    StreamJob.runOnce(spark, in.toString, out, ckpt, "sj3")
    val io = new ParquetTableIO(spark, out, "sj3", DedupConfig().configHash)
    val mid = io.load("clusters").get.select("image_id", "cluster_id")
      .as[(String, String)].collect().toMap
    assert(mid("bridge_a") != mid("bridge_b"),
      "precondition: A and B must be separate committed clusters before the bridge")
    assert(mid("ctl_d1") == mid("ctl_d2"))

    writeBatch(2)
    StreamJob.runOnce(spark, in.toString, out, ckpt, "sj3")
    val fin = io.load("clusters").get.select("image_id", "cluster_id")
      .as[(String, String)].collect().toMap
    assert(fin("bridge_a") == fin("bridge_c") && fin("bridge_b") == fin("bridge_c"),
      s"bridge row must merge both committed clusters: $fin")
    assert(fin("bridge_a") == "bridge_a", "cluster_id must be the min member id")
    assert(fin("ctl_d1") == mid("ctl_d1") && fin("ctl_d2") == mid("ctl_d2"),
      "untouched committed cluster must keep its assignment")
  }

  test("StreamJob merge-on-read cluster sink: delta log + compaction converge to the batch result") {
    val corpus = Fixtures.corpus(spark, 50, seed = 11L).toDF().localCheckpoint()
    val batchRef = Pipeline.run(corpus, DedupConfig())
    val expected = clusterSet(batchRef.clusters)
    batchRef.unpersist()

    val out = java.nio.file.Files.createTempDirectory("sjc_out").toString
    val cfg = DedupConfig(streamCompactEvery = 2) // force mid-stream compactions
    val io = new ParquetTableIO(spark, out, "sjc", cfg.configHash)
    val n = 5
    (0 until n).foreach { b =>
      val part = corpus.where(pmod(xxhash64(col("image_id")), lit(n)) === b)
      StreamJob.processBatch(io, cfg, verbose = false)(part, b)
      // the delta chain stays bounded by the compaction cadence at every
      // point in the stream — the write cost the sink exists to bound
      assert(io.appendChainLength("cluster_deltas") < cfg.streamCompactEvery,
        s"delta chain must compact at $b")
      // the merged view is correct mid-stream, deltas pending or not
      val liveIds = StreamJob.liveClusters(io).get.select("image_id")
      assert(liveIds.count() == liveIds.distinct().count(), s"dup assignment rows at $b")
    }
    assert(clusterSet(StreamJob.liveClusters(io).get) == expected)

    // end-of-stream compaction folds any pending log: the at-rest table is
    // the complete assignment, no merge logic needed by external readers
    StreamJob.compactClusters(io)
    assert(io.load("cluster_deltas").isEmpty, "compaction must clear the delta log")
    assert(clusterSet(io.load("clusters").get) == expected)

    // crash-replayed batch after compaction: corpus rows already committed
    // → no-op, view unchanged
    val replay = corpus.where(pmod(xxhash64(col("image_id")), lit(n)) === (n - 1))
    StreamJob.processBatch(io, cfg, verbose = false)(replay, n - 1)
    assert(clusterSet(StreamJob.liveClusters(io).get) == expected)
  }

  test("StreamJob e2e: restart resumes from checkpoint and converges to the batch result") {
    val corpus = Fixtures.corpus(spark, 40, seed = 7L).toDF().localCheckpoint()
    val batchRef = Pipeline.run(corpus, DedupConfig())
    val expected = clusterSet(batchRef.clusters)
    batchRef.unpersist()

    val in = java.nio.file.Files.createTempDirectory("sj2_in")
    val out = java.nio.file.Files.createTempDirectory("sj2_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sj2_ckpt").toString
    // compactEvery=2 puts a key-table fold INSIDE the first run, so the
    // restart also proves appends stay idempotent across fold boundaries
    val cfg = DedupConfig(streamCompactEvery = 2)
    // first run sees only batches 0–1 of the 3-way split
    writeBatchFiles(corpus, in, 3, until = 2)
    StreamJob.runOnce(spark, in.toString, out, ckpt, "sj2", cfg = cfg)
    val io = new ParquetTableIO(spark, out, "sj2", cfg.configHash)
    val afterTwo = io.load("corpus").get.count()
    assert(afterTwo < corpus.count())
    assert(io.appendChainLength("bands") == 1) // folded at batch 2
    // RESTART: the third batch file arrives; the same checkpoint must
    // skip the two committed batches and process only the new file
    writeBatchFiles(corpus, in, 3, from = 2)
    StreamJob.runOnce(spark, in.toString, out, ckpt, "sj2", cfg = cfg)
    assert(clusterSet(io.load("clusters").get) == expected)
    assert(io.load("corpus").get.count() == corpus.count())
    // key chains stay bounded by the fold cadence across restarts
    for (st <- Seq("signatures", "bands", "simhash_keys", "span_fps"))
      assert(io.appendChainLength(st) <= cfg.streamCompactEvery, st)
  }

  /** Write one explicit DataFrame as one batch file (ordered names). */
  private def writeOneBatch(df: org.apache.spark.sql.DataFrame,
      dir: java.nio.file.Path, b: Int): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory(s"sjx_tmp$b")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      dir.resolve(f"batch$b%03d.parquet"))
    Thread.sleep(5)
  }

  test("StreamJob exact tier: stream clusters equal the batch exact-tier run") {
    val cfg = DedupConfig(exactTier = true)
    val corpus = Fixtures.corpus(spark, 40, seed = 11L).toDF().localCheckpoint()
    val batchRef = Pipeline.run(corpus, cfg)
    val expected = clusterSet(batchRef.clusters)
    batchRef.unpersist()
    val in = java.nio.file.Files.createTempDirectory("sjet_in")
    val out = java.nio.file.Files.createTempDirectory("sjet_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sjet_ckpt").toString
    writeBatchFiles(corpus, in, 3)
    StreamJob.runOnce(spark, in.toString, out, ckpt, "sjet1", cfg = cfg)
    val io = new ParquetTableIO(spark, out, "sjet1", cfg.configHash)
    assert(clusterSet(io.load("clusters").get) == expected)
  }

  test("StreamJob exact tier: cross-batch byte copies merge; same-caption copies suppressed") {
    val cfg = DedupConfig(exactTier = true)
    val corpus = Fixtures.corpus(spark, 15, seed = 5L).toDF().localCheckpoint()
    val base = corpus.orderBy("image_id").limit(1)
      .select("image_id").as[String].head()
    // batch 1 arrives LATER with two byte copies of a batch-0 row: one
    // caption-identical (must merge via the cross exact edge AND commit
    // no signature row — the committed canon's identical caption covers
    // its retrieval) and one caption-rewritten (must merge via the exact
    // edge AND keep its own signature row — its caption is a retrieval
    // path the canon does not cover)
    val sameCap = corpus.filter($"image_id" === base)
      .withColumn("image_id", concat($"image_id", lit("_sc")))
    val rewCap = corpus.filter($"image_id" === base)
      .withColumn("image_id", concat($"image_id", lit("_rw")))
      .withColumn("caption", lit("totally unrelated rewritten words zz"))
    val in = java.nio.file.Files.createTempDirectory("sjet2_in")
    val out = java.nio.file.Files.createTempDirectory("sjet2_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sjet2_ckpt").toString
    writeOneBatch(corpus, in, 0)
    writeOneBatch(sameCap.unionByName(rewCap), in, 1)
    StreamJob.runOnce(spark, in.toString, out, ckpt, "sjet2", cfg = cfg)
    val io = new ParquetTableIO(spark, out, "sjet2", cfg.configHash)
    val cl = io.load("clusters").get
      .filter($"image_id".isin(base, base + "_sc", base + "_rw"))
      .select("image_id", "cluster_id").as[(String, String)].collect().toMap
    assert(cl.size == 3)
    assert(cl(base) == cl(base + "_sc") && cl(base) == cl(base + "_rw"))
    val sigIds = io.load("signatures").get
      .select("image_id").as[String].collect().toSet
    assert(!sigIds.contains(base + "_sc"),
      "same-caption byte copy must not bloat the signature index")
    assert(sigIds.contains(base + "_rw"),
      "caption-rewritten byte copy must keep its signature row")
  }

  test("StreamJob: an in-batch duplicate image_id is tolerated, not a poison pill") {
    val cfg = DedupConfig()
    val corpus = Fixtures.corpus(spark, 20, seed = 9L).toDF().localCheckpoint()
    val out = java.nio.file.Files.createTempDirectory("sj_dup_out").toString
    val io = new ParquetTableIO(spark, out, "sjdup", cfg.configHash)
    // the same row fetched twice landing in ONE micro-batch is legitimate
    // under the same-id-same-content contract; before the in-batch dedup
    // it reached the id-collision repair's unique-id require and threw —
    // and AvailableNow replayed the identical batch into the identical
    // crash forever
    val dupped = corpus.unionByName(corpus.limit(4))
    StreamJob.processBatch(io, cfg, verbose = false)(dupped, 0L)
    assert(io.load("corpus").get.count() == corpus.count())
  }

  test("StreamJob: a fresh checkpoint against an existing out dir commits its own data") {
    val corpus = Fixtures.corpus(spark, 40, seed = 11L).toDF().localCheckpoint()
    val ids = corpus.select("image_id").as[String].collect().sorted
    val (idsA, idsB) = ids.splitAt(ids.length / 2)
    val a = corpus.filter($"image_id".isin(idsA: _*)).localCheckpoint()
    val b = corpus.filter($"image_id".isin(idsB: _*)).localCheckpoint()
    val in1 = java.nio.file.Files.createTempDirectory("sj_r1_in")
    val in2 = java.nio.file.Files.createTempDirectory("sj_r2_in")
    val out = java.nio.file.Files.createTempDirectory("sj_r_out").toString
    val ck1 = java.nio.file.Files.createTempDirectory("sj_r1_ck").toString
    val ck2 = java.nio.file.Files.createTempDirectory("sj_r2_ck").toString
    writeOneBatch(a, in1, 0)
    StreamJob.runOnce(spark, in1.toString, out, ck1, "r1", verbose = false)
    // run 2: NEW checkpoint, SAME table dir — its batch ids restart at 0;
    // without run-scoped tags its b0 appends would no-op against run 1's
    // snapshots and every row of run 2 would silently vanish
    writeOneBatch(b, in2, 0)
    StreamJob.runOnce(spark, in2.toString, out, ck2, "r2", verbose = false)
    val io = new ParquetTableIO(spark, out, "r2", DedupConfig().configHash)
    assert(io.load("corpus").get.count() == corpus.count(),
      "run 2's batch 0 must not no-op against run 1's tags")
  }

  test("StreamJob exact tier: committed exact-keys index is one row per class") {
    val cfg = DedupConfig(exactTier = true)
    val corpus = Fixtures.corpus(spark, 15, seed = 7L).toDF().localCheckpoint()
    val base = corpus.orderBy("image_id").limit(1)
      .select("image_id").as[String].head()
    // 4 byte-and-caption-identical copies of one committed row arrive in a
    // later batch: the viral-class shape whose index previously gained a
    // row PER member (O(N) probe fanout per arrival, O(N²) edges)
    val copies = (1 to 4).map(i => corpus.filter($"image_id" === base)
      .withColumn("image_id", concat($"image_id", lit(s"_c$i"))))
      .reduce(_ unionByName _)
    val in = java.nio.file.Files.createTempDirectory("sjek_in")
    val out = java.nio.file.Files.createTempDirectory("sjek_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sjek_ck").toString
    writeOneBatch(corpus, in, 0)
    writeOneBatch(copies, in, 1)
    StreamJob.runOnce(spark, in.toString, out, ckpt, "sjek", cfg = cfg)
    val io = new ParquetTableIO(spark, out, "sjek", cfg.configHash)
    val ek = io.load("exact_keys").get
    assert(ek.count() == ek.select("ek", "ck").distinct().count(),
      "index must hold exactly one representative per (ek, ck) class")
    // all 5 members of the viral class still share one cluster
    val cl = io.load("clusters").get.filter($"image_id".startsWith(base))
      .select("cluster_id").distinct().count()
    assert(cl == 1L)
  }
}
