package graft

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication over an embedding column
  * (Abbas, Tirumala, Simig, Ganguli, Morcos, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication",
  * arXiv:2303.09540): partition the embedding space with the spherical
  * k-means quantizer from [[Ivf]], then within each cell prune every
  * vector whose cosine to a LOWER-id cell-mate reaches `tau`. The rule is
  * deterministic and order-free — prune i iff ∃ j < i in i's cell with
  * round(cos(i,j), 4) ≥ tau; `dup_of` records the MINIMUM such j — so the
  * survivor set is a pure function of the input, independent of partition
  * layout and scheduling.
  *
  * Two regimes share one code path:
  *  - `nList = 1` is the provably-EXACT configuration: one cell means
  *    every pair is compared, so the output is SQL-expressible and
  *    DuckDB-oracled end-to-end (q_semantic_dedup). Pair volume is
  *    O(n²) — callers bound the slice, exactly like q_emb_near_dup.
  *  - `nList > 1` (or 0 → derived from the corpus count, ~1k vectors per
  *    cell) is the scale regime: pair work drops from O(n²) to
  *    O(Σ |cell|²) ≈ O(n · targetCell), and hot cells are capped at
  *    `cellCap` through the same bounded-min-ids aggregation as the ANN
  *    paths (drops censused, never silent). Clustered pruning can only
  *    MISS relative to the exact rule, never false-prune: a capped-out or
  *    cross-cell vector appears on neither side of the pair join, so
  *    every emitted (i, dup_of) pair still satisfies the cosine
  *    predicate (asserted in SemDedupSpec against brute force).
  *
  * Cosine uses the same FP sequence as q_emb_near_dup's oracle —
  * Σ(aᵢ·bᵢ) / (√Σaᵢ² · √Σbᵢ²) on double-cast elements, rounded to 4 —
  * with per-side norms computed ONCE in the row projection, so a pair
  * costs one dot product instead of three.
  *
  * Like [[Ivf.ivfTopK]], the clustered regime scans `emb` more than once
  * (count when nList=0, the training sample, keys + vectors projections):
  * callers with an expensive upstream plan should persist; parquet-backed
  * tables get pruned columnar re-reads.
  */
object SemDedup {

  /** Semantic-dedup verdict per input row: (id, dup_of, keep).
    * `keep` is int 1/0 (not boolean) so the verdict can partition a
    * commit — boolean partition columns read back as strings — and
    * hash-compare stably across engines.
    *
    * @param emb    (id: long, vec: array&lt;float&gt;)
    * @param tau    cosine threshold on the ROUNDED (4 dp) score
    * @param nList  1 = exact all-pairs; 0 = derive from corpus count;
    *               else explicit cell count
    * @param census clustered regime only (it reports the cell-cap drops,
    *               and the exact path has no cells): passing one with
    *               nList = 1 is rejected loudly — silently never
    *               attaching it would make `Observation.get` hang
    * @param probeAll clustered regime only: replicate the LOWER-id (j)
    *               side of the pair join into every cell, so each (i, j)
    *               pair meets in i's true cell exactly once and the
    *               output equals the exact all-pairs rule — the same
    *               provably-exact-configuration trick as
    *               [[Ivf.ivfTopK]]'s probe-all twin. With `cellCap` above
    *               the slice size this value-checks the multi-cell
    *               machinery (training, codebook broadcast, assignment,
    *               bounded-cell aggregation, cell-key pair join) against
    *               a SQL oracle. Pair volume is O(n²) like the exact
    *               path, plus an n·nList replication — a verification
    *               configuration, not a scale path
    */
  def prune(
      emb: DataFrame,
      tau: Double,
      nList: Int = 0,
      iters: Int = 8,
      seed: Long = 42L,
      cellCap: Int = 65536,
      census: Option[Observation] = None,
      corpusCount: Long = -1L,
      probeAll: Boolean = false): DataFrame = {
    val lists =
      if (nList > 0) nList
      else Ivf.deriveNList(if (corpusCount >= 0) corpusCount else emb.count())
    require(census.isEmpty || lists > 1,
      "census reports cell-cap drops and applies to the clustered regime " +
        s"only (nList > 1, got $lists) — it would never be attached, and " +
        "Observation.get would hang")

    val withNorm = emb.select(col("id"), col("vec"),
      Ann.normCol(col("vec")).as("nrm"))

    // shared pair → verdict tail: score, threshold on the rounded value,
    // min earlier neighbor per pruned id — one hash aggregation.
    // Zero-norm guard: a failed-embedder all-zero vector gives
    // cos = 0/0 = NaN, and Spark orders NaN ABOVE every double, so
    // `NaN >= tau` is TRUE — without the guard one low-id zero vector
    // would mark every higher-id cell-mate as its semantic duplicate
    // (the training path already filters zero vectors,
    // Ivf.sampleVectors; scoring must too).
    def dupOf(pairs: DataFrame): DataFrame =
      pairs
        .where(col("ni") > 0 && col("nj") > 0)
        .withColumn("cos",
          round(Ann.dotCastCol(col("vi"), col("vj")) / (col("ni") * col("nj")), 4))
        .where(col("cos") >= tau)
        .groupBy(col("i")).agg(min(col("j")).as("dup_of"))

    val dup: DataFrame =
      if (lists <= 1) {
        // exact configuration — bounded-slice semantics, broadcast the
        // lower-id side rather than shuffling on a constant cell key
        val l = withNorm.select(
          col("id").as("i"), col("vec").as("vi"), col("nrm").as("ni"))
        val r = withNorm.select(
          col("id").as("j"), col("vec").as("vj"), col("nrm").as("nj"))
        dupOf(l.join(broadcast(r), col("j") < col("i")))
      } else {
        val sample = Ivf.sampleVectors(emb, Ivf.autoSampleN(lists), seed)
        val cb: Ivf.Codebook =
          if (lists <= 4096) Ivf.FlatCodebook(Ivf.lloyd(sample, lists, iters))
          else Ivf.trainTwoLevel(sample, lists, iters)
        val bc = AnnBroadcasts.track(emb.sparkSession.sparkContext.broadcast(cb))
        val cellU = udf((v: Seq[Float]) =>
          bc.value.cellOf(Ivf.normalize(v.map(_.toDouble).toArray)))
        // keys/vecs split as in Ann.capKeyed: only (cell, id) rides the
        // bounding aggregation's shuffle; vectors move once, via the id
        // join. The struct payload passes through capKeyed untouched.
        val keys = emb.select(cellU(col("vec")).as("gkey"), col("id"))
        val vecs = withNorm.select(
          col("id"), struct(col("vec"), col("nrm")).as("vecn"))
        val cells = Ann.capKeyed(keys, vecs, cellCap, census, "max_cell")
        val l = cells.select(col("gkey"), col("id").as("i"),
          col("vecn.vec").as("vi"), col("vecn.nrm").as("ni"))
        // probeAll: j-side in EVERY cell — each pair meets once, in i's
        // true cell, so the join reduces to the exact all-pairs rule
        // while still flowing through the trained assignment on i
        val r =
          if (probeAll)
            withNorm.select(
              explode(sequence(lit(0), lit(lists - 1))).as("gkey"),
              col("id").as("j"), col("vec").as("vj"), col("nrm").as("nj"))
          else cells.select(col("gkey"), col("id").as("j"),
            col("vecn.vec").as("vj"), col("vecn.nrm").as("nj"))
        dupOf(l.join(r, Seq("gkey")).where(col("j") < col("i")))
      }

    // verdict join: dup holds only pruned ids (≤ n rows, usually ≪),
    // AQE picks broadcast when it is small; ids-only on the left side
    emb.select(col("id"))
      .join(dup, col("id") === col("i"), "left")
      .select(col("id"), col("dup_of"),
        when(col("dup_of").isNull, 1).otherwise(0).as("keep"))
  }
}
