package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark contract + scaling evidence (BASELINE.md).
  *
  * Default mode (driver-run): executes every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` plus the end-to-end dedup pipeline on a
  * deterministic fixture corpus, and prints ONE JSON line.
  *
  * `scaling` mode (north rule, BASELINE.json:L14): the sandbox has no
  * multi-executor cluster, so the driver-sanctioned substitute is the SAME
  * pipeline job on the SAME corpus at two parallelism levels (N and 4N
  * cores), reporting images/sec at both and efficiency =
  * (throughput_4N / throughput_N) / 4.
  *
  * Default pair is local[4] vs local[16], NOT local[8] vs local[32]:
  * `nproc` reports 32, but a pure-JVM busy-loop probe measures the host
  * capping 8→32 threads at 2.7× (frequency/quota throttle above ~20
  * active cores — an efficiency ceiling of 0.68 for PERFECTLY parallel
  * work), while 4→16 threads measures 3.99×. The 4/16 pair therefore
  * measures the ENGINE's scaling rather than the host's throttle curve.
  * Override with SPARK_GRAFT_SCALE_N / SPARK_GRAFT_SCALE_4N. Run:
  *   sbt "runMain graft.Bench scaling"
  */
object Bench {

  private def session(cpus: Int, shuffleParts: Int = 32): SparkSession = {
    // shuffle.partitions is held CONSTANT across parallelism levels: the
    // partition count is a property of the data layout, and varying it
    // would confound the N-vs-4N comparison (fewer, fatter partitions
    // spill and skew the local[8] time).
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", shuffleParts.toString)
      // Bounded-state UDAF aggregations (BoundedMinIds/Rows) have O(cap)
      // per-key buffers, so a large in-memory hash map is safe; the
      // default 128-key fallback made every bucket aggregation sort-based
      // (per-row buffer serialization + TimSort of the widest relations).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK", "65536"))
      .config("spark.eventLog.enabled",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "false"))
      .config("spark.eventLog.dir", "/tmp/spark-events")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Split sizing: the default 128 MB maxPartitionBytes + 4 MB file
      // open cost bin-packs a ~150 MB/32-file corpus into 2–3 scan tasks,
      // serializing the signature stage at EVERY parallelism level
      // (measured: local[8] == local[32] wall time). 8 MB splits give the
      // scan ≥ cores tasks at bench scale; at production scale (TB-range
      // inputs) the default is correct and this knob is cluster config.
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      // AQE's BYTE-based partition coalescing under-parallelizes the
      // CPU-dense bounded-state aggregates: their shuffle input is
      // compact (hashed shingles, bounded min-sets) but each row costs
      // real CPU (suffix-array kernel, 128-lane signature compares).
      // Event-log diagnosis at 535k images / 16 cores: the span-pass
      // ObjectHashAggregate was coalesced 64 → 22 partitions (~64 MB
      // advisory), leaving a 1.4-wave stage whose last wave idled 10 of
      // 16 cores for 40 s — half the job's CPU in one mis-coalesced
      // stage. 8 MB advisory (matching the split sizing above) keeps the
      // declared 4-waves-per-core layout; production tunes this per
      // cluster instead.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Generate (once) a bench corpus to parquet and return (path, rows). */
  private def ensureCorpus(spark: SparkSession, nClusters: Int): (String, Long) = {
    val path = s"/tmp/graft_bench_corpus_$nClusters"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      Fixtures.corpus(spark, nClusters).write.mode("overwrite").parquet(path)
    }
    (path, spark.read.parquet(path).count())
  }

  private def runPipeline(spark: SparkSession, corpusPath: String): (Double, Long) = {
    val corpus = spark.read.parquet(corpusPath)
    val t0 = System.nanoTime()
    val r = Pipeline.run(corpus, DedupConfig())
    val n = r.clusters.count()
    val sec = (System.nanoTime() - t0) / 1e9
    r.unpersist()
    (sec, n)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("scaling")) scalingMain()
    else if (args.headOption.contains("streamsweep")) streamSweepMain()
    else if (args.headOption.contains("textstreamsweep")) textStreamSweepMain()
    else benchMain()
  }

  /** TEXT-cascade batch-size amortization curve (round-4 VERDICT item 2:
    * the image stream's measured constant was extended to the text
    * cascade by analogy only). Same protocol as [[streamSweepMain]]: the
    * driver documents+embeddings corpus, split into 16 files, run through
    * TextStreamJob at 1 / 4 / 16 files per trigger (16/4/1 micro-batches,
    * fresh table+checkpoint dirs, min-of-2), reported beside the batch
    * TieredDedup cascade rate measured in-session on the same corpus and
    * cores — the exact machinery q_tiered_dedup_lsh runs.
    *
    *   sbt "runMain graft.Bench textstreamsweep"
    */
  private def textStreamSweepMain(): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SHUFFLE", "32").toInt)
    graft.functions.GraftFunctions.register(spark)
    val cfg = DedupConfig()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val nDocs = docs.count()

    def runBatchCascade(): Double = {
      val t0 = System.nanoTime()
      TieredDedup.cascade(docs, emb,
        surv => {
          val sdocs = surv.select(col("doc_id").as("id"), col("text"))
          val sigs = sdocs.select(col("id"),
            graft.functions.GraftFunctions.minhashCol(
              graft.functions.GraftFunctions.shinglesCol(col("text"), cfg.shingleK),
              cfg.numPerms).as("minhash")).localCheckpoint()
          SparkEntry.nearDupExact(sdocs, sigs, cfg).select(col("a"), col("b"))
        },
        tauSem = 0.35).count()
      (System.nanoTime() - t0) / 1e9
    }
    runBatchCascade() // warm-up (JIT/codegen)
    val batchSec = (1 to 2).map { _ =>
      spark.catalog.clearCache(); runBatchCascade()
    }.min
    val batchRate = nDocs / batchSec

    // cache key includes the corpus dir: unlike streamSweepMain's fixed
    // ensureCorpus corpus, this input follows SPARK_GRAFT_SF_DIR — a
    // shared dir would silently time a STALE corpus after an env change
    val streamIn =
      s"/tmp/graft_bench_tsweep_in_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
    if (!new java.io.File(s"$streamIn/_SUCCESS").exists())
      docs.repartition(16).write.mode("overwrite").parquet(streamIn)
    val levels = Seq(1, 4, 16) // files/trigger → 16 / 4 / 1 micro-batches
    val sweep = levels.map { mft =>
      val sec = (1 to 2).map { i =>
        val outDir = s"/tmp/graft_tsweep_out_${mft}_$i-${System.nanoTime()}"
        val t0 = System.nanoTime()
        graft.streaming.TextStreamJob.runOnce(
          spark, streamIn, outDir, s"$outDir/_ckpt", runId = "tsweep",
          emb = Some(emb), tauSem = 0.35, maxFilesPerTrigger = mft,
          verbose = false)
        val s = (System.nanoTime() - t0) / 1e9
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
        s
      }.min
      (mft, sec, nDocs / sec)
    }
    val levelsJson = sweep.map { case (mft, sec, rate) =>
      f"""{"files_per_trigger":$mft,"batches":${16 / mft},"sec":$sec%.2f,"docs_per_sec":$rate%.1f,"frac_of_batch_rate":${rate / batchRate}%.3f}"""
    }.mkString("[", ",", "]")
    println(
      f"""{"metric":"text_stream_amortization","docs":$nDocs%d,"batch_sec":$batchSec%.2f,"batch_docs_per_sec":$batchRate%.1f,"levels":$levelsJson%s}""")
    spark.stop()
  }

  /** Streaming batch-size amortization curve (round-4 VERDICT item 1: the
    * claim "per-batch constant cost amortizes toward batch rate as
    * rows/batch grows" was design reasoning backed by ONE ~2.2k-row
    * measurement). Runs StreamJob over the SAME corpus the pipeline_e2e
    * number uses (12k clusters ≈ 34k images), split into 16 ≈2.1k-row
    * files, at 1 / 4 / 16 files per trigger (≈2.1k / 8.5k / 34k rows per
    * batch — 16/4/1 micro-batches), min-of-2 each with a fresh
    * table+checkpoint dir per run, and prints one JSON line with img/s
    * per level beside the batch pipeline rate measured in-session on the
    * same corpus and cores.
    *
    *   sbt "runMain graft.Bench streamsweep"
    */
  private def streamSweepMain(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SHUFFLE", "32").toInt)
    val (corpusPath, nImages) = ensureCorpus(spark, nClusters = 12000)
    // batch-rate reference measured in the SAME session/corpus/cores
    runPipeline(spark, corpusPath) // warm-up (JIT/codegen)
    val pipeSec = (1 to 2).map { _ =>
      spark.catalog.clearCache()
      runPipeline(spark, corpusPath)._1
    }.min
    val batchRate = nImages / pipeSec
    val streamIn = "/tmp/graft_bench_sweep_in"
    if (!new java.io.File(s"$streamIn/_SUCCESS").exists())
      spark.read.parquet(corpusPath).repartition(16)
        .write.mode("overwrite").parquet(streamIn)
    val levels = Seq(1, 4, 16) // files/trigger ≈ 2.1k / 8.5k / 34k rows/batch
    val sweep = levels.map { mft =>
      val sec = (1 to 2).map { i =>
        val outDir = s"/tmp/graft_sweep_out_${mft}_$i-${System.nanoTime()}"
        val t0 = System.nanoTime()
        graft.streaming.StreamJob.runOnce(
          spark, streamIn, outDir, s"$outDir/_ckpt", runId = "sweep",
          maxFilesPerTrigger = mft, verbose = false)
        val s = (System.nanoTime() - t0) / 1e9
        // bound /tmp growth: six table dirs of a 34k-image corpus each
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
        s
      }.min
      (mft, sec, nImages / sec)
    }
    val levelsJson = sweep.map { case (mft, sec, rate) =>
      f"""{"files_per_trigger":$mft,"batches":${16 / mft},"sec":$sec%.2f,"images_per_sec":$rate%.1f,"frac_of_batch_rate":${rate / batchRate}%.3f}"""
    }.mkString("[", ",", "]")
    println(
      f"""{"metric":"stream_amortization","images":$nImages%d,"pipeline_sec":$pipeSec%.2f,"pipeline_images_per_sec":$batchRate%.1f,"levels":$levelsJson%s}""")
    spark.stop()
  }

  private def benchMain(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 32 stays the right default HERE: the wave-packing fix that took the
    // 535k-image multi-JVM scaling run from 0.723 to 0.854 (256 partitions;
    // see BASELINE.md) was tried on this bench too and HURT it
    // (pipeline_e2e 13.1 s → 20.8 s at 128): the 34k-image corpus's tasks
    // are sub-second, so finer partitions just multiply per-task overhead.
    // Partition granularity follows task CPU cost, not core count.
    val spark = session(cpus,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SHUFFLE", "32").toInt)

    // Untimed warm-up: the first measured query otherwise absorbs all
    // JIT/codegen/parquet-reader initialization (measured: q_agg_pricing
    // 10.7 s as the first query vs ~0.7 s steady-state class).
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }

    // min-of-2 per query: the host's effective CPU fluctuates up to ~3×
    // between runs (BASELINE.md scaling methodology), so a single timed
    // run can charge one query tens of seconds of hypervisor stall. The
    // per-level minimum is the same noisy-host estimator the scaling
    // bench uses.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
        // plan fully executed: drop this run's ANN codebook broadcasts
        // (outside the timed window they'd accumulate across 100+ queries)
        AnnBroadcasts.release()
        (System.nanoTime() - t0) / 1e9
      }
      name -> math.min(once(), once())
    }

    // end-to-end pipeline throughput on the deterministic fixture corpus.
    // One warm-up run first: the cold run is dominated by JIT/codegen of
    // the whole pipeline (round-1 measured 659 img/s cold vs 3.2k warm on
    // the same engine) and would misstate steady-state throughput.
    // 12k clusters ≈ 34k images: large enough that the ~10 s of fixed
    // AQE/stage-scheduling latency (constant in corpus size) stops
    // dominating pipeline_e2e — 3k clusters measured 833 img/s where the
    // same engine does 2,371 img/s on 133k images (multi-JVM bench).
    val (corpusPath, nImages) = ensureCorpus(spark, nClusters = 12000)
    runPipeline(spark, corpusPath)
    // min-of-2 timed runs, same estimator as the per-query loop above: a
    // single timed pipeline run let one hypervisor stall misstate
    // throughput by >2× between builder and driver runs of the same build
    val pipeSec = (1 to 2).map { _ =>
      spark.catalog.clearCache() // don't serve the timed run from cache
      runPipeline(spark, corpusPath)._1
    }.min
    val imagesPerSec = nImages / pipeSec

    // Streaming-surface throughput: the incremental path is a DIFFERENT
    // cost model from batch (per-batch committed-key equi-joins + CC
    // re-run over accumulated dup edges), so it gets its own measured
    // number instead of inheriting the batch one. A 3k-cluster slice in 4
    // micro-batches keeps the measurement inside the bench budget while
    // still exercising every cross-batch join; min-of-2 with a fresh
    // table/checkpoint dir per run (same noisy-host estimator as above —
    // resume would no-op a reused dir).
    val (streamSrc, nStream) = ensureCorpus(spark, nClusters = 3000)
    val streamIn = "/tmp/graft_bench_stream_in"
    if (!new java.io.File(s"$streamIn/_SUCCESS").exists())
      spark.read.parquet(streamSrc).repartition(4)
        .write.mode("overwrite").parquet(streamIn)
    val streamSec = (1 to 2).map { i =>
      val outDir = s"/tmp/graft_bench_stream_out_$i-${System.nanoTime()}"
      val t0 = System.nanoTime()
      graft.streaming.StreamJob.runOnce(
        spark, streamIn, outDir, s"$outDir/_ckpt", runId = "bench",
        maxFilesPerTrigger = 1, verbose = false)
      (System.nanoTime() - t0) / 1e9
    }.min
    val streamImagesPerSec = nStream / streamSec

    val qs = (results :+ ("pipeline_e2e" -> pipeSec))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipeSec
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","pipeline_images":$nImages%d,"pipeline_images_per_sec":$imagesPerSec%.1f,"stream_images":$nStream%d,"stream_batches":4,"stream_sec":$streamSec%.2f,"stream_images_per_sec":$streamImagesPerSec%.1f}""")
    spark.stop()
  }

  /** Session on a `local-cluster[workers,coresPerWorker,memMB]` master:
    * SEPARATE executor JVMs (own heap + GC each) — the sandbox's closest
    * stand-in for the north rule's "N vs 4N executors on a multi-executor
    * cluster" (the thread-mode local[N] pair shares one heap between both
    * "cluster sizes", which is exactly the confound being tested).
    * Requires the packaged engine jar (`sbt package`) so executor
    * processes can load graft classes.
    */
  private def clusterSession(
      workers: Int, coresPerWorker: Int, memMb: Int, shuffleParts: Int): SparkSession = {
    // Worker/launcher need the Spark install location. Preferred: run with
    // env SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13. Fallback (env
    // absent): spark.testing + spark.test.home — NOTE spark.testing ships
    // to executors in SparkConf and flips Utils.isTesting code paths, so
    // the env route is the one used for recorded measurements.
    if (!sys.env.contains("SPARK_HOME")) {
      System.setProperty("spark.testing", "true")
      System.setProperty("spark.test.home", "/opt/spark")
    }
    val jar = new java.io.File("target/scala-2.13")
      .listFiles((_, n) => n.endsWith(".jar") && !n.endsWith("-tests.jar"))
    require(jar != null && jar.nonEmpty,
      "scaling jvm mode needs the packaged engine jar: run `sbt package` first")
    val s = SparkSession.builder()
      .master(s"local-cluster[$workers,$coresPerWorker,$memMb]")
      .appName(s"graft-scaling-$workers-x-$coresPerWorker")
      .config("spark.executor.memory", s"${memMb}m")
      // the host stalls for tens of seconds under hypervisor contention;
      // the default 60 s worker timeout then declares live workers lost
      // and respawns executors while the old PROCESSES keep running
      // (observed: 8 executors competing for 16 cores). Long timeouts
      // ride the stall out instead.
      .config("spark.worker.timeout", "300")
      .config("spark.network.timeout", "300s")
      .config("spark.executor.heartbeatInterval", "30s")
      .config("spark.executorEnv.SPARK_HOME", "/opt/spark")
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .config("spark.jars", jar.head.getAbsolutePath)
      .config("spark.sql.shuffle.partitions", shuffleParts.toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK", "65536"))
      .config("spark.eventLog.enabled",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "false"))
      .config("spark.eventLog.dir", "/tmp/spark-events")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m") // see session()
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m") // see session()
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One measured level: warm-up run (JIT/codegen), then best-of-k timed
    * runs. `clearCache()` between runs — Pipeline.run persists its stages
    * and Spark's CacheManager would otherwise serve the measured run from
    * the warm-up's cached stage data (observed: a 2× "speedup" that was
    * pure cache reuse). The warm-up runs on a SMALL corpus (`warmupPath`):
    * it only needs to trigger JIT/codegen of the pipeline's classes, and a
    * full-size warm-up would double each round's wall time.
    */
  // shuffle partitions are held CONSTANT across the two parallelism
  // levels (a property of the data layout, not the cluster size) at 4x
  // the high level's cores: 2 waves at 16 cores left stage-tail stragglers
  // idling half the cores; 4 waves measured ~25% faster at the high level
  // with no measurable cost at the low level.
  private def measureLevel(mkSession: () => SparkSession, corpusPath: String,
      warmupPath: String, timedRuns: Int): Double = {
    val spark = mkSession()
    try {
      runPipeline(spark, warmupPath) // warm-up (JIT/codegen)
      (1 to timedRuns).map { _ =>
        spark.catalog.clearCache()
        runPipeline(spark, corpusPath)._1
      }.min
    } finally {
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }

  private def scalingMain(): Unit = {
    // 192k clusters ≈ 535k images. Corpus size is the honesty knob of the
    // scaling measurement: the pipeline carries ~19 s of parallelism-
    // INDEPENDENT latency (driver plan compilation, AQE re-planning, CC
    // convergence stages — measured by solving {W/4+F=168.2, W/16+F=56.4}
    // from the 133k-image runs), so a job whose 16-core wall time is ~56 s
    // measures the scheduler's constant term, not the engine's scaling.
    // A real 100 TB job runs for hours against the same ~constant driver
    // overhead; a corpus big enough that the high-level run takes minutes
    // is the representative measurement, not a flattering one.
    val nClusters = sys.env.getOrElse("SPARK_GRAFT_BENCH_CLUSTERS", "192000").toInt
    // jvm mode (default): 1 vs 4 SEPARATE executor JVMs at fixed
    // cores/executor — the north-rule shape. threads mode: legacy
    // local[N] vs local[4N] single-JVM pair.
    val mode = sys.env.getOrElse("SPARK_GRAFT_SCALE_MODE", "jvm")
    // generate corpora once at full parallelism (timed + small warm-up)
    val gen = session(32)
    val (corpusPath, nImages) = ensureCorpus(gen, nClusters)
    val (warmupPath, _) = ensureCorpus(gen, nClusters = 12000)
    gen.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    val coresPerExec = sys.env.getOrElse("SPARK_GRAFT_SCALE_CORES_PER_EXEC", "4").toInt
    val nLo = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", coresPerExec.toString).toInt
    val nHi = sys.env.getOrElse("SPARK_GRAFT_SCALE_4N", (nLo * 4).toString).toInt
    val memMb = sys.env.getOrElse("SPARK_GRAFT_SCALE_EXEC_MB", "8192").toInt
    // Default 16× the high level's cores (was 4×): the span-pass bucket
    // partitions carry ragged CPU costs (SA kernel ∝ bucket content;
    // event-log measured 2–23 s per task at 64 partitions), and 4 waves
    // of ragged tasks strand cores in every wave tail at the HIGH level
    // while costing nothing measurable at the low one. Constant across
    // levels, as before: partition count is a property of the data.
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SCALE_SHUFFLE", (nHi * 16).toString).toInt
    def mk(cores: Int): () => SparkSession = mode match {
      case "threads" => () => session(cores, shuffleParts)
      case _ => // cores/coresPerExec separate executor JVMs
        val workers = math.max(1, cores / coresPerExec)
        () => clusterSession(workers, coresPerWorker = coresPerExec, memMb, shuffleParts)
    }
    // The sandbox host's effective CPU fluctuates (hypervisor neighbors:
    // identical probe runs varied up to 5×), so a single timed run per
    // level is meaningless. Alternate levels and keep the per-level MIN —
    // min-of-k is the standard noisy-host estimator of the true cost.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROUNDS", "3").toInt
    // hi / lo / both: single-level runs for methodology experiments
    // (e.g. shuffle-granularity sweeps measure only the high level)
    val levels = sys.env.getOrElse("SPARK_GRAFT_SCALE_LEVELS", "both")
    var tHi = Double.MaxValue
    var tLo = Double.MaxValue
    (1 to rounds).foreach { r =>
      if (levels != "lo")
        tHi = math.min(tHi, measureLevel(mk(nHi), corpusPath, warmupPath, timedRuns = 1))
      if (levels != "hi")
        tLo = math.min(tLo, measureLevel(mk(nLo), corpusPath, warmupPath, timedRuns = 1))
      // unmeasured level prints "-" (single-level runs leave MaxValue)
      def fmt(v: Double) = if (v == Double.MaxValue) "-" else f"$v%.2f"
      System.err.println(s"[scaling] round $r ($mode): best sec_$nHi=${fmt(tHi)} sec_$nLo=${fmt(tLo)}")
    }
    if (levels != "both") {
      // unmeasured level stays Double.MaxValue — print null, not a
      // ~310-digit literal that breaks downstream parsers of the line
      def j(v: Double) = if (v == Double.MaxValue) "null" else f"$v%.2f"
      println(s"""{"level_only":"$levels","sec_hi":${j(tHi)},"sec_lo":${j(tLo)},"shuffle_parts":$shuffleParts}""")
      return
    }

    val thrHi = nImages / tHi
    val thrLo = nImages / tLo
    val eff = (thrHi / thrLo) / (nHi.toDouble / nLo)
    println(f"""{"images":$nImages,"mode":"$mode%s","cores_n":$nLo,"cores_4n":$nHi,"sec_n":$tLo%.2f,"sec_4n":$tHi%.2f,"images_per_sec_n":$thrLo%.1f,"images_per_sec_4n":$thrHi%.1f,"scaling_efficiency":$eff%.3f}""")
  }
}
