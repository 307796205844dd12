package graft

import org.apache.spark.sql.functions._

/** IVF-Flat ANN: codebook training, recall vs planted structure,
  * determinism, and the hot-cell cap census.
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("ivf: nList scales with corpus size (fixed nList = scale bug)") {
    assert(Ivf.deriveNList(1000) == 16) // clamp floor at toy sizes
    assert(Ivf.deriveNList(1000000) == 977) // ~1024/cell
    assert(Ivf.deriveNList(100000000L) == 65536) // clamp ceiling
  }

  test("ivf: trained centroids are unit-norm and deterministic") {
    val rng = new java.util.SplittableRandom(3)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(12)(rng.nextDouble().toFloat - 0.5f))
    }.toDF("id", "vec")
    val c1 = Ivf.trainCentroids(vecs, nList = 8, iters = 4)
    val c2 = Ivf.trainCentroids(vecs, nList = 8, iters = 4)
    assert(c1.length == 8)
    c1.foreach { c =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9)
    }
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
  }

  /** Planted-twin recall (same protocol as the LSH ANN test): n base
    * vectors plus near-identical twins; a twin is its base's true nearest
    * neighbor and must surface as top-1.
    */
  private def twinRecall(n: Int): Double = {
    val rng = new java.util.SplittableRandom(9)
    val base = (0 until n).map { i =>
      (i.toLong * 2, Array.fill(16)(rng.nextDouble().toFloat - 0.5f))
    }
    val twins = base.map { case (id, v) => (id + 1, v.map(x => x + 0.001f)) }
    val all = (base ++ twins).toDF("id", "vec")
    val queries = base.toDF("qid", "qvec")
    val top1 = Ivf.ivfTopK(all, queries, k = 1)
      .select("qid", "id").as[(Long, Long)].collect().toMap
    base.count { case (id, _) => top1.get(id).contains(id + 1) }.toDouble / n
  }

  test("ivf: top-k finds the planted nearest neighbor (recall >= 0.95 at 2 sizes)") {
    // a twin differs from its base by 1e-3 per component, so both land in
    // the same Voronoi cell except exactly on a centroid border — nProbe
    // covers the border case; recall must hold as the corpus grows
    assert(twinRecall(40) >= 0.95)
    assert(twinRecall(400) >= 0.95)
  }

  test("ivf: result is deterministic across runs") {
    val rng = new java.util.SplittableRandom(5)
    val all = (0 until 300).map { i =>
      (i.toLong, Array.fill(8)(rng.nextDouble().toFloat - 0.5f))
    }.toDF("id", "vec")
    val q = all.limit(5).select(col("id").as("qid"), col("vec").as("qvec"))
    val r1 = Ivf.ivfTopK(all, q, k = 3).orderBy("qid", "rk").collect()
    val r2 = Ivf.ivfTopK(all, q, k = 3).orderBy("qid", "rk").collect()
    assert(r1.sameElements(r2))
  }

  test("ivf: two-level codebook — probe covers assignment, exhaustive covers all cells") {
    val rng = new java.util.SplittableRandom(11)
    val sample = Array.fill(500)(Array.fill(12)(rng.nextDouble() - 0.5))
    val cb = Ivf.trainTwoLevel(sample, nList = 16, iters = 4)
    assert(cb.nCells >= 16)
    sample.take(50).foreach { v =>
      // nProbe=1 must surface exactly the greedy assignment cell
      assert(cb.probeCells(v, 1).toSeq == Seq(cb.cellOf(v)))
      // exhaustive probe enumerates every cell exactly once
      assert(cb.probeCells(v, cb.nCells).sorted.toSeq == (0 until cb.nCells))
    }
  }

  test("ivf: two-level recall and determinism (forced via twoLevelFrom)") {
    val rng = new java.util.SplittableRandom(9)
    val base = (0 until 200).map { i =>
      (i.toLong * 2, Array.fill(16)(rng.nextDouble().toFloat - 0.5f))
    }
    val twins = base.map { case (id, v) => (id + 1, v.map(x => x + 0.001f)) }
    val all = (base ++ twins).toDF("id", "vec")
    val queries = base.toDF("qid", "qvec")
    def run() = Ivf.ivfTopK(all, queries, k = 1, nList = 16, twoLevelFrom = 1)
      .orderBy("qid").select("qid", "id").as[(Long, Long)].collect()
    val r1 = run()
    val recall = base.count { case (id, _) =>
      r1.toMap.get(id).contains(id + 1) }.toDouble / base.size
    assert(recall >= 0.95, s"two-level twin recall $recall")
    assert(r1.sameElements(run()))
  }

  test("ivf: large derived nList no longer exceeds the training sample (fixed crash)") {
    // the old fixed sampleN=32768 + require(sample >= nList) threw for any
    // nList > 32768 — exactly the documented 2^16-cell scale path; now the
    // sample auto-scales and sparse cells pad instead of failing
    val rng = new java.util.SplittableRandom(13)
    val all = (0 until 400).map { i =>
      (i.toLong, Array.fill(8)(rng.nextDouble().toFloat - 0.5f))
    }.toDF("id", "vec")
    val q = all.limit(3).select(col("id").as("qid"), col("vec").as("qvec"))
    // nList far above both the corpus and the sample: must run, not throw
    val n = Ivf.ivfTopK(all, q, k = 2, nList = 40000, nProbe = 64).count()
    assert(n > 0)
  }

  test("ivf: 2^16-cell two-level training completes, correct shape, deterministic") {
    // the scale ceiling nList=65536 trains k1=256 coarse x k2=256 fine;
    // per-branch fine training runs in parallel — the codebook must be
    // bit-identical across runs (thread-schedule-invariant)
    val rng = new java.util.SplittableRandom(31)
    val sample = Array.fill(4096)(Array.fill(16)(rng.nextDouble() - 0.5))
    val t0 = System.nanoTime()
    val cb1 = Ivf.trainTwoLevel(sample, nList = 65536, iters = 2)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(cb1.nCells == 65536 && cb1.k1 == 256 && cb1.k2 == 256)
    assert(sec < 120.0, f"2^16-cell training took $sec%.1f s")
    val cb2 = Ivf.trainTwoLevel(sample, nList = 65536, iters = 2)
    assert(cb1.coarse.zip(cb2.coarse).forall { case (a, b) => a.sameElements(b) })
    (0 until cb1.k1).foreach { c =>
      assert(cb1.fine(c).zip(cb2.fine(c)).forall { case (a, b) => a.sameElements(b) })
    }
  }

  test("ivf: training-sample collect is byte-bounded, not just row-bounded") {
    val rng = new java.util.SplittableRandom(37)
    val all = (0 until 300).map { i =>
      (i.toLong, Array.fill(12)(rng.nextDouble().toFloat - 0.5f))
    }.toDF("id", "vec")
    // dim 12 → rowBytes = 8*12+64 = 160; a 1600-byte budget admits 10 rows
    val clipped = Ivf.sampleVectors(all, sampleN = 300, seed = 42L, maxBytes = 1600L)
    assert(clipped.length == 10)
    // and the same call under the default budget honors the row bound
    val full = Ivf.sampleVectors(all, sampleN = 300, seed = 42L)
    assert(full.length == 300)
    // clipped prefix is the same deterministic hash order
    assert(clipped.zip(full.take(10)).forall { case (a, b) => a.sameElements(b) })
  }

  test("ivf: distributed Lloyd is bit-deterministic under any partitioning") {
    // the design constraint of trainCentroidsDistributed: a float sum
    // across partitions is order-dependent, so accumulation runs in
    // fixed-point longs — the codebook must be IDENTICAL from 1 and 8
    // partitions, and across repeated runs
    val rng = new java.util.SplittableRandom(23)
    val rows = (0 until 400).map { i =>
      (i.toLong, Array.fill(12)(rng.nextDouble().toFloat - 0.5f))
    }
    val one = rows.toDF("id", "vec").repartition(1)
    val eight = rows.toDF("id", "vec").repartition(8)
    val c1 = Ivf.trainCentroidsDistributed(one, nList = 8, iters = 4)
    val c8 = Ivf.trainCentroidsDistributed(eight, nList = 8, iters = 4)
    assert(c1.length == 8)
    c1.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    assert(c1.zip(c8).forall { case (a, b) => a.sameElements(b) },
      "distributed codebook differs across partitionings")
    val c8b = Ivf.trainCentroidsDistributed(eight, nList = 8, iters = 4)
    assert(c8.zip(c8b).forall { case (a, b) => a.sameElements(b) })
  }

  test("ivf: distributed-trained index matches the sample-trained recall") {
    val rng = new java.util.SplittableRandom(9)
    val base = (0 until 200).map { i =>
      (i.toLong * 2, Array.fill(16)(rng.nextDouble().toFloat - 0.5f))
    }
    val twins = base.map { case (id, v) => (id + 1, v.map(x => x + 0.001f)) }
    val all = (base ++ twins).toDF("id", "vec")
    val queries = base.toDF("qid", "qvec")
    val top1 = Ivf.ivfTopK(all, queries, k = 1, nList = 16,
        distributedTrain = true)
      .select("qid", "id").as[(Long, Long)].collect().toMap
    val recall = base.count { case (id, _) =>
      top1.get(id).contains(id + 1) }.toDouble / base.size
    assert(recall >= 0.95, s"distributed-trained twin recall $recall")
  }

  test("ivf: codebook broadcasts are released — 20 calls don't accumulate blocks") {
    // round-3 ADVICE leak: every ivfTopK call broadcast a codebook that
    // was never destroyed, so a long-lived session accumulated up to
    // ~67 MB of broadcast blocks per call until plan GC. Contract now:
    // builders register in AnnBroadcasts, the caller releases after
    // materializing (Verify/Bench do this between queries).
    val rng = new java.util.SplittableRandom(17)
    val all = (0 until 200).map { i =>
      (i.toLong, Array.fill(8)(rng.nextDouble().toFloat - 0.5f))
    }.toDF("id", "vec")
    val q = all.limit(3).select(col("id").as("qid"), col("vec").as("qvec"))
    AnnBroadcasts.release() // clean slate (other suites may have tracked)
    def broadcastBlocks(): Int = org.apache.spark.SparkEnv.get.blockManager
      .getMatchingBlockIds(_.isBroadcast).size
    // the registry holds WeakReferences (round-4 ADVICE), so the counts
    // below are deterministic only while the plan — whose UDF closures
    // hold the broadcast strongly — is itself kept reachable across the
    // assertion; the reachabilityFence pins it (a GC between collect()
    // and the assert could otherwise clear the weak ref and flake this)
    val firstDf = Ivf.ivfTopK(all, q, k = 3).orderBy("qid", "rk")
    val first = firstDf.collect()
    assert(AnnBroadcasts.liveCount == 1, "one codebook broadcast per call")
    AnnBroadcasts.release()
    java.lang.ref.Reference.reachabilityFence(firstDf)
    val before = broadcastBlocks()
    val results = (1 to 20).map { _ =>
      val df = Ivf.ivfTopK(all, q, k = 3).orderBy("qid", "rk")
      val r = df.collect()
      assert(AnnBroadcasts.release() == 1)
      java.lang.ref.Reference.reachabilityFence(df)
      r
    }
    assert(results.forall(_.sameElements(first)),
      "releasing between materialized calls must not change rows")
    assert(AnnBroadcasts.liveCount == 0)
    // destroy is async and join-broadcast blocks are ContextCleaner-GC'd;
    // poll (with GC nudges) until the block count returns to ~baseline —
    // 20 leaked codebooks would hold it 20 blocks high forever
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var now = broadcastBlocks()
    while (now > before + 4 && System.nanoTime() < deadline) {
      System.gc(); Thread.sleep(200); now = broadcastBlocks()
    }
    assert(now <= before + 4,
      s"broadcast blocks grew $before -> $now across 20 released ANN calls")
  }

  test("ivf: hot-cell cap drops are observable, never silent") {
    // constant vectors: every corpus row lands in ONE cell
    val all = (0 until 50).map(i => (i.toLong, Array.fill(8)(1.0f))).toDF("id", "vec")
    val q = Seq((999L, Array.fill(8)(1.0f))).toDF("qid", "qvec")
    val obs = new org.apache.spark.sql.Observation()
    val got = Ivf.ivfTopK(all, q, k = 5, nList = 4, cellCap = 20,
      census = Some(obs)).count()
    assert(got == 5)
    val m = obs.get
    assert(m("dropped_vectors").asInstanceOf[Number].longValue == 30L)
    assert(m("max_cell").asInstanceOf[Number].longValue == 50L)
    assert(m("n_vectors").asInstanceOf[Number].longValue == 50L)
  }
}
