package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Jaro / Jaro-Winkler string similarity — the fuzzy-ratio pair feature
  * of the reference's scoring stage (kkonevets/dedup scores Solr
  * candidate pairs with fuzzy string ratios before thresholding; the
  * mount is empty, so the binding spec is SURVEY.md §1.4's feature-table
  * row). Implemented from the published definition (Winkler, 1990,
  * "String Comparator Metrics and Enhanced Decision Rules in the
  * Fellegi-Sunter Model of Record Linkage") with the de-facto standard
  * parameterization, pinned against DuckDB's independent native
  * implementation (the q_jaro_winkler oracle):
  *
  *   - match window = max(|a|,|b|)/2 - 1 (floor, min 0);
  *   - transpositions t = k/2 with INTEGER division, where k = positions
  *     at which the two matched-character sequences disagree (probed:
  *     jaro("abczzzz","bcazzzz") = 0.952381 ⇒ floor, not k/2.0);
  *   - empty-vs-anything (including empty-vs-empty) = 0.0;
  *   - Winkler boost only when jaro > 0.7, prefix capped at 4, scale 0.1.
  *
  * Comparison is per Java char; DuckDB compares per BYTE, so the SQL twin
  * is exact on ASCII input only — the query guards its input accordingly
  * (the engine itself is correct for any BMP string).
  */
object StringSim {

  /** Jaro similarity in [0,1]. O(|a|·window) time, two boolean arrays. */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) k += 1
        j += 1
      }
      i += 1
    }
    val t = k / 2
    (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
  }

  /** Jaro-Winkler: boost by the common prefix (≤4 chars, weight 0.1),
    * applied only above the standard 0.7 threshold.
    */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val cap = math.min(4, math.min(a.length, b.length))
    var l = 0
    while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** BM25 top-k retrieval + rule-scored record linkage — the Spark-native
  * replacement for the reference's Solr round trip (SURVEY.md §1.4:
  * "Solr index (inverted index over name tokens) → LSH band table";
  * BASELINE.json:L6 "ad-hoc Solr-candidate-generation +
  * feature-scoring scripts"). The LSH path replaced Solr for the DEDUP
  * use; this module replaces it for the RETRIEVAL use — ranked top-k
  * lexical candidates per query — so a reference user's full
  * candidate-generation surface exists in-engine, with no external
  * service and no network hop.
  *
  * Scale shape (the inverted index as relations, not a service):
  *
  *   - postings = ONE explode + ONE (doc,term) hash aggregation with
  *     map-side combine; doc length rides the aggregation (`max(dl)` —
  *     constant per doc) so no doc-level rejoin is needed;
  *   - document frequency = ONE term-keyed hash aggregation over the
  *     postings (map-side combined; a Zipfian hot term arrives
  *     pre-collapsed to one row per map partition);
  *   - the stopword guard (`maxDfFrac`) drops terms present in more than
  *     that fraction of the corpus BEFORE the probe join — the same
  *     hot-key discipline as T26's common-gram drop: a term with df ≈ N
  *     would otherwise emit an O(N) candidate row per query containing
  *     it, and carries no ranking signal (its idf ≈ 0);
  *   - the probe: query terms (tiny side) join the postings on term —
  *     AQE broadcasts the query side, so the corpus-sized postings
  *     relation is probed MAP-SIDE and never reshuffled; only surviving
  *     (query, doc) candidate rows enter the scoring aggregation;
  *   - corpus-wide constants (N, Σdl) are a one-row broadcast;
  *   - top-k per query = one rank-K window; Catalyst's WindowGroupLimit
  *     pre-trims to k rows per query on both sides of its exchange.
  *
  * Scoring is the Lucene/ES BM25 form: idf = ln(1 + (N-df+.5)/(df+.5)),
  * tf_norm = tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)). Per-candidate
  * contributions are summed in double and ROUNDED to 4 dp, and the rank
  * orders by (rounded score desc, doc_id) — the T23 FP-divergence
  * discipline, so rank order is reproducible across engines.
  */
object Retrieval {

  /** Shared tokenizer: \s+ split with the empty-token filter (the same
    * filter TextOps.qualityColumns applies) — an empty or whitespace-only
    * doc yields ZERO terms, not one phantom '' term through which blank
    * docs would retrieve/link each other. Mirrored as `list_filter` in
    * every retrieval oracle twin.
    */
  private def toks(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(trim(c), "\\s+"), x => x =!= "")

  /** Top-k BM25 candidates per query. `queries` = (qid, qtext),
    * `corpus` = (doc_id, text); emits (qid, rk, doc_id, score).
    * `excludeSelf` drops doc_id == qid rows (queries drawn from the
    * corpus itself — the dedup-retrieval shape).
    *
    * The corpus is scanned twice (the one-row stats aggregate and the
    * postings build); persist upstream if the input is not a cheap scan.
    */
  def bm25TopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      maxDfFrac: Double = 0.5,
      excludeSelf: Boolean = true): DataFrame = {
    val base = corpus.select(col("doc_id"), toks(col("text")).as("toks"))
    val stats = base.agg(
      count(lit(1)).as("n_docs"), sum(size(col("toks"))).as("sum_dl"))
    val postings = base
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfT = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .where(col("df") <= col("n_docs") * maxDfFrac)
      .select("term", "df")
    val qt = queries.select(col("qid"),
      explode(array_distinct(toks(col("qtext")))).as("term"))
    // hot-term drop BEFORE the probe: the query-term side (tiny) joins
    // the vocab-sized df table first, so a df≈N stopword leaves the
    // probe side here — at a cost proportional to the QUERY terms — and
    // never emits its O(N) candidate rows against the postings. The
    // surviving (term, qid, df) side then broadcasts into the postings
    // probe (AQE), which is filtered map-side and never reshuffled.
    val qtKept = qt.join(dfT, "term")
    val cand = postings.join(qtKept, "term")
      .where(if (excludeSelf) col("doc_id") =!= col("qid") else lit(true))
      .crossJoin(broadcast(stats))
    val scored = cand
      .withColumn("contrib",
        log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * (col("dl") * col("n_docs") / col("sum_dl").cast("double")))))
      .groupBy("qid", "doc_id")
      .agg(round(sum(col("contrib")), 4).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("doc_id"), col("score"))
  }

  /** The reference's end-to-end linkage flow as ONE composed operator:
    * BM25 top-k candidate generation → per-pair features (BM25 score,
    * Jaro-Winkler on an 80-char text prefix, token-set Jaccard) → a
    * deterministic decision rule replacing the reference's learned
    * scorer (SURVEY.md §1.4: rule-based per BASELINE.json:L6).
    * `matched` thresholds the ROUNDED features, so the boolean is
    * bit-identical across engines.
    *
    * The feature joins re-attach each side's text by key — candidate
    * volume is bounded at k rows per query, so both joins carry the
    * bounded side against a pruned (doc_id, text) projection; the
    * Jaro-Winkler kernel is a codegen-native expression
    * ([[graft.functions.JaroWinklerExpr]]), not a UDF boundary.
    */
  def linkCandidates(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      tauJw: Double = 0.8,
      tauJacc: Double = 0.95,
      maxDfFrac: Double = 0.5,
      excludeSelf: Boolean = true): DataFrame = {
    // excludeSelf is only meaningful when queries are drawn FROM the
    // corpus (self-linkage / dedup-retrieval); in cross-corpus mode the
    // two id spaces are unrelated and a coincidental qid == doc_id must
    // NOT suppress a true match — callers pass excludeSelf = false.
    val cands = bm25TopK(queries, corpus, k, maxDfFrac = maxDfFrac,
      excludeSelf = excludeSelf)
    def pfx(c: org.apache.spark.sql.Column) = substring(c, 1, 80)
    def tokset(c: org.apache.spark.sql.Column) = array_distinct(toks(c))
    val q = queries.select(col("qid"), col("qtext"))
    val d = corpus.select(col("doc_id"), col("text"))
    cands.join(q, "qid").join(d, "doc_id")
      .withColumn("jw", round(
        graft.functions.GraftFunctions.jaroWinklerCol(
          pfx(col("qtext")), pfx(col("text"))), 4))
      .withColumn("jacc", round(
        size(array_intersect(tokset(col("qtext")), tokset(col("text"))))
          .cast("double") /
          greatest(size(array_union(tokset(col("qtext")), tokset(col("text")))),
            lit(1)), 4))
      .withColumn("matched", col("jw") >= tauJw || col("jacc") >= tauJacc)
      .select(col("qid"), col("rk"), col("doc_id"), col("score"),
        col("jw"), col("jacc"), col("matched"))
  }

  /** TF-IDF cosine pair similarity — the third of the reference's pair
    * features (SURVEY.md §3.0: "fuzzy ratios, n-gram jaccard, tf-idf
    * cosine"; T4 and T53 cover the first two). Weights are the T23
    * smoothed form (tf · (ln((N+1)/(df+1))+1)) so the two features share
    * one definition; cosine = Σ w_a·w_b / (‖a‖·‖b‖) computed entirely in
    * relational algebra: ONE term-keyed self-join of the weight table
    * restricted to `a < b` (shared terms only — disjoint docs never pair),
    * one dot-product hash-agg, two norm lookups. At corpus scale the pair
    * set comes from a candidate generator (T2/T49/T52/`sortedNeighborhood`)
    * and the same projection scores it; the all-pairs form here is the
    * exact-semantics pin for the oracle (q_emb_near_dup pattern).
    * Output is rounded to 4 dp (T23 FP discipline).
    */
  def tfidfCosinePairs(corpus: DataFrame): DataFrame = {
    val tf = corpus
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nd = corpus.agg(count(lit(1)).as("n_docs"))
    val w = tf.join(dfT, "term").crossJoin(broadcast(nd))
      .withColumn("w", col("tf") *
        (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + lit(1.0)))
      .select("doc_id", "term", "w")
    val nrm = w.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val x = w.select(col("doc_id").as("a"), col("term"), col("w").as("wa"))
    val y = w.select(col("doc_id").as("b"), col("term"), col("w").as("wb"))
    x.join(y, Seq("term")).where(col("a") < col("b"))
      .groupBy("a", "b").agg(sum(col("wa") * col("wb")).as("dot"))
      .join(nrm.select(col("doc_id").as("a"), col("nrm").as("na")), "a")
      .join(nrm.select(col("doc_id").as("b"), col("nrm").as("nb")), "b")
      .select(col("a"), col("b"),
        round(col("dot") / (col("na") * col("nb")), 4).as("cos"))
  }

  /** Blocked sorted-neighborhood candidate generation (Hernández &
    * Stolfo, "The merge/purge problem for large databases", SIGMOD 1995)
    * — the OTHER classic linkage candidate generator beside retrieval
    * (T52) and LSH (T2/T49): sort records by a discriminating key and
    * pair every record with its `w` successors in sort order. The
    * single-sequence textbook form needs a GLOBAL sort whose window runs
    * in one partition; this is the standard blocked variant — records
    * partition into blocks (a key prefix), the rank window runs PER
    * BLOCK (parallel, one shuffle on the block key), and pairs never
    * cross blocks (recovered in practice by multi-pass runs with
    * different keys, which is how merge/purge is actually deployed).
    * Pure integer semantics end-to-end (rank arithmetic, no FP), so the
    * oracle recomputes it exactly: rank per block on (key, doc_id), pair
    * iff 1 ≤ rank_b − rank_a ≤ w.
    */
  def sortedNeighborhood(
      corpus: DataFrame,
      keyLen: Int = 24,
      blockLen: Int = 4,
      w: Int = 3): DataFrame = {
    val k = substring(trim(col("text")), 1, keyLen)
    sortedNeighborhoodBy(corpus, k, substring(k, 1, blockLen), w)
  }

  /** General form: caller-supplied sort key and block key — the
    * multi-pass merge/purge runs this once per key family (text prefix,
    * [[soundexCol]], reversed name, …) and unions the pair sets; each
    * pass is one block-keyed window.
    */
  def sortedNeighborhoodBy(
      corpus: DataFrame,
      key: org.apache.spark.sql.Column,
      block: org.apache.spark.sql.Column,
      w: Int): DataFrame = {
    val keyed = corpus.select(col("doc_id"), key.as("k"), block.as("block"))
    val win = Window.partitionBy(col("block"))
      .orderBy(col("k"), col("doc_id"))
    // all w leads share ONE WindowSpec ⇒ one Window operator, one
    // shuffle+sort — not w unioned passes over the corpus; the explode
    // runs in a SECOND projection (a generator may not contain window
    // expressions directly)
    val withLeads = keyed.select(col("doc_id") +: (1 to w).map { off =>
      lead(col("doc_id"), off).over(win).as(s"b$off")
    }: _*)
    val leads = array((1 to w).map { off =>
      struct(col(s"b$off").as("b_id"), lit(off).as("dist"))
    }: _*)
    withLeads.select(col("doc_id"), explode(leads).as("p"))
      .where(col("p.b_id").isNotNull)
      .select(least(col("doc_id"), col("p.b_id")).as("a"),
        greatest(col("doc_id"), col("p.b_id")).as("b"),
        col("p.dist").as("dist"))
  }

  /** American Soundex blocking key (Russell/Odell; the classic phonetic
    * blocking key of merge/purge record linkage — the second-pass key a
    * multi-pass [[sortedNeighborhood]] run uses so spelling variants
    * land in one block). Built ENTIRELY from Spark built-ins (upper /
    * regexp_replace / translate / rpad) so it stays one row-local
    * codegen projection, and the identical chain runs in the DuckDB
    * oracle. Rules implemented: first letter kept verbatim; H/W
    * transparent in the tail (same-code consonants collapse across
    * them); vowels A,E,I,O,U,Y act as separators; adjacent equal codes
    * collapse (per-digit regex, no backreferences — RE2-safe); the
    * first letter's own code participates in collapsing (Pfister →
    * P236); pad/truncate to letter + 3 digits. Verified against the
    * canonical test vector (Robert/Rupert → R163, Ashcraft → A261,
    * Tymczak → T522, Pfister → P236, Honeyman → H555).
    */
  def soundexCol(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val big = 1 << 24
    val letters = regexp_replace(upper(s), "[^A-Z]", "")
    val f = substring(letters, 1, 1)
    val t = concat(f, regexp_replace(substring(letters, 2, big), "[HW]", ""))
    val coded = translate(translate(t,
      "BFPVCGJKQSXZDTLMNR", "111122222222334556"), "AEIOUY", "......")
    val collapsed = (1 to 6).foldLeft(coded)((c, d) =>
      regexp_replace(c, s"$d$d+", s"$d"))
    val digits = regexp_replace(substring(collapsed, 2, big), "[^1-6]", "")
    when(length(letters) === 0, lit(""))
      .otherwise(concat(f, rpad(substring(digits, 1, 3), 3, "0")))
  }

  /** One comparison field of the Fellegi-Sunter model: an agreement
    * predicate over the pair-feature columns plus its m = P(agree|match)
    * and u = P(agree|non-match) priors. `name` becomes the emitted
    * agreement column.
    */
  case class FsField(agree: org.apache.spark.sql.Column, m: Double,
      u: Double, name: String)

  /** Agreement/disagreement log₂ weights for (m, u), ROUNDED to 4 dp.
    * The rounding is the cross-engine determinism trick: both the Spark
    * plan and the SQL oracle embed the same 4-dp decimal literal, so the
    * per-row score is a sum of IDENTICAL doubles in identical order —
    * bit-equal across engines, no FP tolerance needed anywhere.
    */
  def fsWeights(m: Double, u: Double): (Double, Double) = {
    def w4(x: Double) = math.rint(x * 1e4) / 1e4
    (w4(math.log(m / u) / math.log(2.0)),
      w4(math.log((1 - m) / (1 - u)) / math.log(2.0)))
  }

  /** Fellegi-Sunter probabilistic linkage decision (Fellegi & Sunter,
    * "A Theory for Record Linkage", JASA 1969) — the statistical
    * framework the reference's learned scorer approximates (SURVEY.md
    * §1.4; the deterministic rule of [[linkCandidates]] is the
    * always-on decision, this is the classical weighted alternative).
    * Each field contributes log₂(m/u) on agreement and
    * log₂((1−m)/(1−u)) on disagreement; the composite weight thresholds
    * into link / possible / nonlink (the three-region decision rule of
    * the paper — `possible` is the clerical-review band). m/u arrive as
    * priors (production estimates them offline via EM); with the
    * weights folded to literals the whole operator is ONE row-local
    * codegen projection over the feature table — zero additional
    * shuffles on top of the feature computation.
    */
  def fellegiSunter(
      pairs: DataFrame,
      fields: Seq[FsField],
      tauLink: Double,
      tauNonlink: Double): DataFrame = {
    val score = fields.map { f =>
      val (wa, wd) = fsWeights(f.m, f.u)
      when(f.agree, lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    val withA = fields.foldLeft(pairs)((df, f) => df.withColumn(f.name, f.agree))
    withA.withColumn("fs_score", round(score, 4))
      .withColumn("decision",
        when(col("fs_score") >= tauLink, lit("link"))
          .when(col("fs_score") >= tauNonlink, lit("possible"))
          .otherwise(lit("nonlink")))
  }
}
