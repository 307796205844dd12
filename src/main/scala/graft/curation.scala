package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines, round-3
  * additions: PII redaction (T29) and paragraph-level exact dedup (T30,
  * Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL 2022 — the ExactSubstr family, here at fixed token-window
  * granularity so the keeper rule is deterministic and SQL-oracle-able).
  * Both are designed for the 100 TB regime: PII is a pure row-local
  * codegen projection; chunk dedup is one bounded explode, ONE hash
  * aggregation on a 128-bit content key, one co-located join back, and a
  * per-doc rollup whose state is bounded by document length.
  */
object Curation {

  /** PII patterns, written in the Java-regex ∩ RE2 common subset (no
    * lookaround, no backreferences) so the DuckDB oracle can run the
    * exact same patterns. Deliberately the high-precision core of each
    * family: a production pass would widen these, not restructure the
    * plan.
    */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePat = "\\+1-555-\\d{4}"

  /** Number of non-overlapping matches of `pat` in `s`: split keeps empty
    * fields (limit -1), so matches = fields - 1. Same contract as
    * DuckDB's string_split_regex, which the oracle uses.
    */
  def countMatches(s: Column, pat: String): Column =
    (size(split(s, pat, -1)) - 1).cast("long")

  /** Replace every email/IPv4/phone match with a typed placeholder.
    * Emails first: the other two patterns cannot match inside an email or
    * a placeholder, so the chain is order-insensitive beyond that.
    */
  def redactPii(s: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(s, EmailPat, "[EMAIL]"),
        Ipv4Pat, "[IP]"),
      PhonePat, "[PHONE]")

  /** T46 — HTML main-text extraction (boilerplate removal): the FIRST
    * content step of every web-crawl pipeline (C4 strips lines by
    * rule, CCNet/RefinedWeb run jusText/trafilatura-style block
    * classifiers) — raw crawl HTML goes in, the article text comes out,
    * nav/footer/script chrome is dropped. This is the jusText-lite block
    * form (Pomikálek 2011): kill non-content elements, split on closing
    * block tags, score each block, keep content-like blocks.
    *
    * Per block the classifier keeps text with ≥ `minWords` words AND
    * link density ≤ linkNum/linkDen — the two strongest jusText
    * signals; the comparison is INTEGER-scaled (`links·linkDen ≤
    * words·linkNum`), no FP boundary to diverge across engines (the T40
    * bpp discipline). Everything is a row-local codegen projection —
    * regex strips + ONE split + transform/filter/array_join HOFs, zero
    * shuffles, and the whole rule set lives in the Java-regex ∩ RE2
    * subset so the DuckDB oracle runs the same patterns verbatim.
    */
  // (?i): HTML element names are case-insensitive and legacy upper-case
  // markup ("<SCRIPT>", "</P>") is common in real crawls — without the
  // flag, upper-case script/style CONTENT leaked into the extracted
  // text and upper-case closing block tags never split blocks. RE2 and
  // Java both support the inline flag.
  val BlockClosePat = "(?i)</(?:p|div|h[1-6]|li|ul|ol|table|tr|blockquote)>"
  val HtmlTagPat = "<[^>]*>"

  /** Remove the elements whose CONTENT must never reach text: script,
    * style, comments ((?s): a block may span lines; .*? : nearest close).
    */
  def stripNonContent(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** Decode the core HTML entities, single pass; `&amp;` LAST so entity
    * names it produces are not re-decoded (`&amp;lt;` → the literal text
    * `&lt;`, the HTML-correct result).
    */
  def decodeEntities(t: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(t,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&nbsp;", " "), "&amp;", "&")

  /** Extracted main text + block census as a struct column
    * `(n_blocks, n_kept, text)`. See the T46 scaladoc above for the
    * block rule.
    */
  def extractHtmlText(html: Column, minWords: Int = 3,
                      linkNum: Int = 1, linkDen: Int = 3): Column = {
    val blocks = split(stripNonContent(html), BlockClosePat)
    // score each block ONCE (text + link count as a struct), then filter
    val scored = transform(blocks, b => {
      val raw = regexp_replace(b, HtmlTagPat, " ")
      val txt = trim(regexp_replace(decodeEntities(raw), "\\s+", " "))
      struct(txt.as("t"),
        (size(split(b, "(?i)<a[\\s>]", -1)) - 1).as("l"))
    })
    val kept = filter(scored, s => {
      val w = size(split(s("t"), " "))
      s("t") =!= "" && w >= minWords && s("l") * linkDen <= w * linkNum
    })
    struct(
      size(blocks).as("n_blocks"),
      size(kept).as("n_kept"),
      array_join(transform(kept, s => s("t")), " ").as("text"))
  }

  /** T39 — URL canonicalization (RFC 3986 §6 normalization, the
    * crawl-frontier subset every web pipeline applies before URL-level
    * dedup: C4/CCNet drop refetches of the same canonical URL before any
    * content pass). Rules, in order: lowercase scheme and host, strip a
    * leading `www.`, strip the scheme's default port (:80 http / :443
    * https), drop the fragment, drop empty and `utm_*` tracking query
    * params, sort the remaining params, strip trailing path slashes.
    *
    * Pure row-local codegen — regexp extracts plus an array
    * filter/sort/join, no UDF, no shuffle. Patterns live in the
    * Java-regex ∩ RE2 common subset so the DuckDB oracle runs the same
    * ones (same discipline as the PII patterns above).
    */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val path = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    // fragment dropped BEFORE the query extract: a '?' is legal INSIDE a
    // fragment (RFC 3986 §3.5), and matching it as the query would keep
    // "#sec?a=1" alive as "?a=1" — two fetches differing only in their
    // fragment anchor would then fail to dedup
    val noFrag = regexp_replace(u, "#.*", "")
    val params = filter(split(regexp_extract(noFrag, "\\?(.*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val q = array_join(array_sort(params), "&")
    // non-authority / schemeless inputs (mailto:, tel:, bare hostnames —
    // all common in raw crawl URL columns) have no extractable
    // scheme://host and previously ALL collapsed to the constant "://",
    // making urlDedup mark every such row a duplicate of one keeper;
    // they fall back to their own trimmed text — never canonicalized,
    // never falsely merged
    when(scheme === "" || noWww === "", trim(u))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** T39 — canonical-URL dedup: every row gets its canonical form, the
    * min-id fetch per canonical URL is the keeper, the rest are dups.
    * The 100 TB shape is T1's: a row-local canonicalization projection,
    * ONE hash aggregation on the canonical key (O(1) min state per
    * group, map-side combine), and the occurrences rejoin the keeper
    * table on that same key — both sides hash-partitioned on it, so the
    * join is co-located with the aggregation's exchange. URL-level dedup
    * runs BEFORE content fetch/decode in a crawl pipeline, which is why
    * it earns its own operator instead of riding the content tiers of
    * [[TieredDedup.cascade]].
    */
  def urlDedup(docs: DataFrame, urlCol: String = "url",
               idCol: String = "doc_id"): DataFrame = {
    val c = docs.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
    val keeper = c.groupBy("canon_url")
      .agg(min(col(idCol)).as("canon_of"))
    c.join(keeper, "canon_url")
      .select(col(idCol), col(urlCol), col("canon_url"), col("canon_of"),
        (col(idCol) =!= col("canon_of")).cast("int").as("is_dup"))
  }

  /** T30 — paragraph-level exact dedup over fixed `w`-token windows.
    *
    * Unit = the non-overlapping w-token chunk (the driver corpus is
    * single-line word text, so token windows stand in for the
    * line/paragraph unit CCNet/C4 dedup on). Keeper rule: for every
    * distinct chunk the occurrence with the smallest (doc_id, pos) is
    * kept; every other occurrence — in other docs AND later repeats in
    * the same doc — is dropped. Content key = md5(chunk), 128-bit like
    * q_dedup_exact's key, so collisions are out of the error budget
    * without a repair pass (unlike 64-bit keys, which this repo repairs —
    * idhash.scala).
    *
    * Plan shape (the 100 TB story): chunking is ROW-LOCAL
    * (transform+slice over the token array — no explode of tokens, no
    * shuffle); one posexplode to chunk granularity (w-fold smaller than
    * token granularity); keeper = ONE hash aggregation `min(struct(doc,
    * pos))` with map-side partial combine on the md5 key; occurrences
    * rejoin the keeper table on that key (both sides hash-partitioned on
    * it — co-located); the per-doc rollup state (collect_list of kept
    * chunks) is bounded by the document's own length, the same bound any
    * per-doc operator carries.
    *
    * Returns one row per input doc: n_chunks, n_dropped, clean_len,
    * clean_hash (md5 of the surviving text, chunks rejoined in order with
    * single spaces).
    */
  def chunkDedup(docs: DataFrame, w: Int = 8,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val toks = split(trim(col(textCol)), "\\s+")
    val nChunks = floor((size(toks) + w - 1) / w).cast("int")
    // sequence(0, -1) would generate a DESCENDING range — guard empties.
    val chunks = when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * lit(w) + lit(1), lit(w)), " ")))
    // posexplode_OUTER + left join: an empty/whitespace-only/null doc
    // yields one (null pos, null chunk) row instead of vanishing — the
    // "one row per input doc" contract holds, and input-vs-output row
    // accounting stays exact (null chunks never enter the keeper
    // aggregation, and count(chunk) skips them)
    val occ = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode_outer(chunks).as(Seq("pos", "chunk")))
      .withColumn("ck", md5(col("chunk").cast("binary")))
    val keeper = occ.where(col("chunk").isNotNull).groupBy("ck")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    occ.join(keeper, Seq("ck"), "left")
      .withColumn("kept",
        col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos"))
      .groupBy("doc_id")
      .agg(
        count(col("chunk")).as("n_chunks"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(array_sort(collect_list(when(col("kept"), struct(col("pos"), col("chunk"))))),
            x => x.getField("chunk")),
          " ").as("clean"))
      .select(col("doc_id"), col("n_chunks"), col("n_dropped"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean").cast("binary")).as("clean_hash"))
  }

  /** T47 — boilerplate line removal (CCNet, Wenzek et al., LREC 2020
    * §4.1: drop every line whose document frequency reaches `minDf` —
    * navigation menus, footers, cookie banners — from ALL documents,
    * including the first). The complement of [[chunkDedup]]: that keeps
    * FIRST occurrences (content dedup), this removes EVERY occurrence of
    * high-DF lines (boilerplate is defined by ubiquity, not precedence).
    *
    * Input: (idCol: long, linesCol: array&lt;string&gt;) — the caller owns
    * line segmentation (real pages split on newline; the driver corpus
    * has none, so q_line_dedup synthesizes page structure the way
    * q_html_extract does).
    *
    * Plan shape (the 100 TB story): one posexplode to line granularity;
    * the boilerplate set is ONE two-level hash aggregation —
    * count_distinct(doc) per 128-bit line key, map-side partial — then a
    * threshold filter, leaving the crawl's boilerplate VOCABULARY (tiny
    * vs corpus; AQE broadcasts the rejoin, and a hot boilerplate key is
    * exactly what the distinct-agg absorbs map-side). Per-doc rebuild is
    * one hash aggregation with doc-length-bounded state, as in
    * chunkDedup. Content key = md5(line), 128-bit, collisions out of the
    * error budget without a repair pass.
    *
    * Returns one row per doc: n_lines, n_kept, clean_len, clean_hash
    * (md5 of survivors rejoined in order with " | ").
    */
  def lineDedup(docs: DataFrame, minDf: Int, idCol: String = "doc_id",
                linesCol: String = "lines"): DataFrame = {
    require(minDf >= 2, s"minDf < 2 would drop every line, got $minDf")
    // posexplode_OUTER so a doc whose segmentation produced zero lines
    // still reports (n_lines = 0) instead of vanishing from the output —
    // the "one row per doc" contract; null line rows are excluded from
    // the DF aggregation and never counted kept
    val occ = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode_outer(col(linesCol)).as(Seq("pos", "line")))
      .withColumn("lk", md5(col("line").cast("binary")))
    val boiler = occ.where(col("line").isNotNull).groupBy("lk")
      .agg(count_distinct(col("doc_id")).as("df"))
      .where(col("df") >= minDf)
      .select(col("lk"), lit(true).as("is_boiler"))
    occ.join(boiler, Seq("lk"), "left")
      .withColumn("kept", col("is_boiler").isNull && col("line").isNotNull)
      .groupBy("doc_id")
      .agg(
        count(col("line")).as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          " | ").as("clean"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean").cast("binary")).as("clean_hash"))
  }

  /** T35 — corpus-trained bigram-LM cross-entropy (the CCNet perplexity
    * quality filter, Wenzek et al., LREC 2020, self-trained instead of
    * Wikipedia-trained so it needs no external model): add-one-smoothed
    * bigram probabilities p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) are estimated
    * on the corpus itself, and each doc is scored by the average negative
    * log-likelihood of its bigrams (cross_entropy; ppl = exp of it).
    * High-ppl docs are the gibberish tail, low-ppl docs the boilerplate
    * tail — CCNet keeps the middle.
    *
    * The 100 TB shape: tokenization and bigram construction are ROW-LOCAL
    * (one transform over the token array, one explode at bigram
    * granularity); the count relations c1/c2 are vocab- and
    * bigram-vocab-bounded hash aggregates with map-side partial combine
    * (far below corpus cardinality); the per-doc relation is collapsed to
    * (doc, w1, w2, multiplicity) BEFORE the count joins, so each join is
    * many-to-ONE on a hash-partitioned key — Zipfian hot tokens skew
    * partition sizes but can't explode rows, and AQE's skew-join split
    * handles the residual imbalance. V rides as a broadcast one-row
    * aggregate; the corpus is never collected. Docs under 2 tokens have
    * no bigrams and are excluded.
    */
  def lmCrossEntropy(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(Text.normalizeCol(col(textCol)), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      // three consumers (doc bigrams, bigram counts, unigram counts) —
      // materialize the tokenized projection once
      .localCheckpoint()
    val bg = base.select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("w1"),
            element_at(col("toks"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val docBg = bg.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
    // corpus bigram counts roll up from the ALREADY-collapsed per-doc
    // relation — not from bg, which would explode and shuffle the full
    // occurrence stream a second time
    val c2 = docBg.groupBy("w1", "w2").agg(sum(col("m")).as("c2"))
    val uni = base.select(explode(col("toks")).as("w1"))
    val c1 = uni.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vdf = c1.agg(count(lit(1)).as("v"))
    docBg.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vdf))
      .withColumn("nll",
        col("m") * log((col("c1") + col("v")).cast("double") / (col("c2") + 1)))
      .groupBy("doc_id")
      .agg(sum(col("m")).as("n_bigrams"), sum(col("nll")).as("s"))
      // rounded at the output boundary: the sum order differs between
      // engines, so raw doubles diverge in the last ulps
      .select(col("doc_id"), col("n_bigrams"),
        round(col("s") / col("n_bigrams"), 4).as("cross_entropy"),
        round(exp(col("s") / col("n_bigrams")), 2).as("ppl"))
  }

  /** T36 — per-source balanced keep (the C4/RefinedWeb domain-cap move:
    * no single domain may dominate the corpus): keep the `cap` best docs
    * per source, ranked by ROUNDED alpha-ratio quality (desc) with doc_id
    * as the total-order tiebreak — both engine and oracle rank identical
    * 4-decimal values, so no FP-order divergence can flip a keep.
    *
    * The 100 TB shape: quality is a row-local codegen projection; the
    * rank is ONE exchange on source + ONE window — and Catalyst's rank-K
    * pushdown inserts WindowGroupLimit on BOTH sides of the exchange
    * (PLANS.md T36), so every map task pre-trims to `cap` rows per
    * source BEFORE the shuffle. A pathological mega-source (10⁹ docs on
    * one domain) therefore contributes ≤cap rows per upstream task to
    * the exchange — the same bound the W2 bounded-min-set aggregate
    * enforces by hand on the LSH paths, obtained for free from the
    * rk <= cap filter the optimizer can see.
    */
  /** Rounded alpha-ratio quality signal, shared by [[sourceBalance]]'s
    * rank key and [[gopherFilter]]'s ok_alpha rule (one definition — a
    * tweak to the character class must move both rankings together).
    */
  private[graft] def alphaRatio(text: Column): Column = round(
    length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
      greatest(length(text), lit(1)), 4)

  def sourceBalance(docs: DataFrame, cap: Int = 10): DataFrame = {
    val q = alphaRatio(col("text"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("q").desc, col("doc_id"))
    docs
      .select(col("doc_id").cast("long").as("doc_id"), col("source"), q.as("q"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= cap)
  }

  /** T37 — Gopher-style composite quality filter (Rae et al. 2021 §A1.1,
    * the rule family C4/RefinedWeb/Gopher pipelines apply): each rule is
    * a threshold on one of the engine's measured signals (the same
    * expressions as q_doc_quality_full / q_doc_repetition, so their SQL
    * twins oracle this too), `keep` is their conjunction. Thresholds are
    * pinned on ROUNDED signals — boundary docs cannot flip on FP order.
    * Rules (adapted to the driver corpus's short-doc regime):
    * n_tokens ∈ [30, 100000], mean token length ∈ [3, 10],
    * stopword_ratio ≥ 0.02, alpha_ratio ≥ 0.82, dup-2gram fraction
    * ≤ 0.2 and top-token concentration ≤ 0.2.
    *
    * The 100 TB shape: every signal except top_token_frac is row-local
    * (one codegen projection); top_token_frac is the T21 explode → two
    * hash-aggs → doc-level join. No corpus-cardinality shuffle beyond
    * the token aggregation, which partial-combines map-side.
    */
  def gopherFilter(docs: DataFrame): DataFrame = {
    val base = docs
      // THE shared tokenizer (TextOps.tokensCol): script-gated CJK/Thai
      // segmentation + \s+ split + empty-token filter — n_tokens,
      // stopword_ratio, mean_tok_len and the repetition signals all
      // measure the same token stream the quality ops use
      .withColumn("toks", TextOps.tokensCol(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("g2", when(size(col("toks")) >= 2,
        expr("transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))"))
        .otherwise(expr("cast(array() as array<string>)")))
    val stop = Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")
    val nStop = size(filter(col("toks"), x => x.isin(stop: _*)))
    val maxTf = base.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("max_tf"))
    base.join(maxTf, Seq("doc_id"))
      .select(col("doc_id").cast("long").as("doc_id"), col("n_tokens"),
        alphaRatio(col("text")).as("alpha_ratio"),
        round(nStop.cast("double") / greatest(size(col("toks")), lit(1)), 4)
          .as("stopword_ratio"),
        round(aggregate(transform(col("toks"), t => length(t)), lit(0),
          (a, x) => a + x).cast("double") /
          greatest(size(col("toks")), lit(1)), 4).as("mean_tok_len"),
        when(size(col("g2")) === 0, lit(0.0))
          .otherwise(round(lit(1.0) -
            size(array_distinct(col("g2"))).cast("double") / size(col("g2")), 4))
          .as("frac_dup_2grams"),
        round(col("max_tf").cast("double") / col("n_tokens"), 4)
          .as("top_token_frac"))
      .withColumn("ok_tokens", col("n_tokens").between(30L, 100000L))
      .withColumn("ok_mean_tok", col("mean_tok_len").between(3.0, 10.0))
      .withColumn("ok_stopwords", col("stopword_ratio") >= 0.02)
      .withColumn("ok_alpha", col("alpha_ratio") >= 0.82)
      .withColumn("ok_repetition",
        col("frac_dup_2grams") <= 0.2 && col("top_token_frac") <= 0.2)
      .withColumn("keep", col("ok_tokens") && col("ok_mean_tok") &&
        col("ok_stopwords") && col("ok_alpha") && col("ok_repetition"))
  }

  /** T33: per-doc n-gram novelty — the memorization/duplication census of
    * Gopher (§A.2) and Pile-style corpus analyses: the fraction of a
    * doc's distinct char-k-grams whose FIRST corpus occurrence (min
    * doc_id) is this doc. A corpus full of low-novelty docs is a corpus
    * the dedup stages will collapse.
    *
    * The 100 TB shape: `n_grams` is `size()` on the row-local
    * distinct-shingle array (no explode, no join); the exploded grams
    * feed ONE min hash-agg (map-side partial combine) whose output —
    * already collapsed to one row per distinct gram — feeds ONE count
    * hash-agg keyed by the first doc; the only join is doc-level
    * (corpus-cardinality, never gram-cardinality). The shingled
    * projection is materialized once (localCheckpoint) because two
    * consumers read it — swap for a table checkpoint when the corpus
    * exceeds cluster storage. Docs under k normalized chars are excluded
    * (shingles() falls back to whole-string hashing below k, which has
    * no SQL gram twin).
    */
  def ngramNovelty(docs: DataFrame, k: Int = 24,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = docs
      .withColumn("__norm", Text.normalizeCol(col(textCol)))
      .where(length(col("__norm")) >= k)
      .select(col(idCol).cast("long").as("doc_id"),
        graft.functions.GraftFunctions.shinglesCol(col("__norm"), k).as("hs"))
      .localCheckpoint()
    val nGrams = base.select(col("doc_id"), size(col("hs")).cast("long").as("n_grams"))
    val novel = base.select(col("doc_id"), explode(col("hs")).as("h"))
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    nGrams.join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 6))
  }

  /** T40: image-metadata curation filter — the LAION/DataComp gate family
    * (Schuhmann et al., NeurIPS 2022 §2.2; Gadre et al. 2023) over the
    * crawl's CHEAP columns, run BEFORE any decode/signature work:
    * resolution floor, aspect-ratio bound (banner/sliver rejection),
    * bytes-per-pixel plausibility (truncated/corrupt files sit near 0;
    * decompression bombs far above any codec's ceiling), and caption
    * length + token-count bounds. Every rule reads scan columns only, so
    * the whole filter is one row-local codegen projection with zero
    * shuffles — and because it uses the RECORDED n_bytes rather than
    * length(bytes), the parquet scan never materializes the pixel column
    * for rows this gate will drop.
    *
    * The bpp rule compares in ×100 scaled INTEGER space
    * (n_bytes·100 vs w·h·bppLo/HiX100) — no FP division, so the keep
    * booleans are bit-identical across engines (the same rounded-signal
    * discipline as [[sourceBalance]]/[[gopherFilter]]). All arithmetic is
    * widened to i64 first: w·h·1200 overflows i32 at ~1.8 Mpx.
    */
  def imageMetaFilter(imgs: DataFrame,
      minSide: Int = 64, maxAspect: Int = 4,
      bppLoX100: Int = 2, bppHiX100: Int = 1200,
      minCapChars: Int = 5, maxCapChars: Int = 512,
      minCapToks: Int = 2, maxCapToks: Int = 128): DataFrame = {
    val w = col("w").cast("long")
    val h = col("h").cast("long")
    val nb = col("n_bytes").cast("long")
    // every gate coalesces NULL → false: a row with a missing caption or
    // dimension plainly fails that gate. Without this, NULL propagates
    // through the conjunction and the row vanishes from BOTH
    // filter(keep) and filter(!keep) — kept + dropped ≠ input, a silent
    // accounting leak on raw crawl metadata (this gate runs FIRST,
    // before any isNotNull clean stage).
    def gate(c: Column): Column = coalesce(c, lit(false))
    imgs
      .withColumn("n_cap_toks",
        size(split(trim(col("caption")), "\\s+")).cast("long"))
      .withColumn("ok_size", gate(w >= minSide && h >= minSide))
      .withColumn("ok_aspect",
        gate(greatest(w, h) <= lit(maxAspect.toLong) * least(w, h)))
      .withColumn("ok_bpp",
        gate(nb * 100L >= w * h * bppLoX100.toLong &&
          nb * 100L <= w * h * bppHiX100.toLong))
      .withColumn("ok_caption",
        gate(length(col("caption")).between(minCapChars, maxCapChars)))
      .withColumn("ok_cap_toks",
        gate(col("n_cap_toks").between(minCapToks.toLong, maxCapToks.toLong)))
      .withColumn("keep", col("ok_size") && col("ok_aspect") && col("ok_bpp") &&
        col("ok_caption") && col("ok_cap_toks"))
  }

  /** T41: cluster-representative selection — the emit step after dedup:
    * ONE keeper per cluster by (integer quality key desc, doc_id asc);
    * here the key is text length (for images it would be w·h), and the
    * id tiebreak makes the choice a total order, so the output is
    * deterministic and oracle-able.
    *
    * The 100 TB shape: TWO codegen HashAggregates and nothing else — no
    * window, no sort, O(1) state per group. The obvious one-agg form,
    * max(struct(len, -doc_id)), was written first and REJECTED from the
    * plan: struct buffers are not hash-aggregable, so Spark silently
    * plans it as SortAggregate with a map-side sort of the whole
    * doc-level relation (PLANS.md T41 — the same trap CcSpec guards
    * against in CC). Instead the tiebreak is resolved by construction:
    * the first agg collapses (cluster_id, len) → min(doc_id), after
    * which len is UNIQUE within each cluster, so the cluster-level
    * max_by(cand_id, len) — primitive buffer, HashAggregate-eligible —
    * can never see a tie and is therefore deterministic. Both exchanges
    * carry partially-combined collapsed rows; a 10M-member viral cluster
    * costs the same group state as a pair. Contrast [[sourceBalance]]'s
    * rank-K window, the right shape only when K &gt; 1 survivors are
    * kept. The docs join is doc-level (corpus cardinality) and
    * co-locates when both sides are bucketed by doc_id.
    */
  def clusterRepresentatives(clusters: DataFrame, docs: DataFrame): DataFrame =
    clusters
      .join(docs.select(col("doc_id"),
        length(col("text")).cast("long").as("len")), "doc_id")
      .groupBy("cluster_id", "len")
      .agg(min(col("doc_id")).as("cand_id"), count(lit(1)).as("cnt"))
      .groupBy("cluster_id")
      .agg(max(col("len")).as("rep_len"),
        max_by(col("cand_id"), col("len")).as("rep_id"),
        sum(col("cnt")).as("n_members"))
      .select(col("cluster_id"), col("rep_id"), col("rep_len"),
        col("n_members"))

  /** T42: leakage-safe corpus split — train/val/test assignment hashed on
    * the dedup CLUSTER id, not the doc id. The eval-contamination failure
    * mode of doc-level splitting (q_hash_split / T19) is that near-dup
    * pairs straddle the split: the model trains on one copy and is
    * evaluated on the other, inflating eval scores (Lee et al., ACL 2022
    * §6.2 measure exactly this). Hashing the cluster id makes straddling
    * STRUCTURALLY impossible — every member of a near-dup cluster shares
    * the same mix64(cluster_id) bucket by construction, so no
    * doc-vs-doc comparison, no pair table, no second pass.
    *
    * Scale shape: a pure row-local codegen projection over the
    * (doc_id, cluster_id) assignment table — zero joins, zero shuffles;
    * the clustering that produced the input already paid the hard cost.
    * mix64 is the engine's shared splitmix64 finalizer, so the split is
    * deterministic across runs, engines (SQL twin), and input order.
    */
  def clusterSplit(clusters: DataFrame,
      trainBuckets: Int = 8, valBuckets: Int = 1): DataFrame = {
    require(trainBuckets + valBuckets < 10, "test split must be non-empty")
    graft.functions.GraftFunctions.register(clusters.sparkSession)
    clusters
      .withColumn("bucket",
        pmod(graft.functions.GraftFunctions.mix64Col(col("cluster_id")),
          lit(10L)))
      .withColumn("split",
        when(col("bucket") < trainBuckets, "train")
          .when(col("bucket") < trainBuckets + valBuckets, "val")
          .otherwise("test"))
  }

  /** T43: dedup-run churn audit — the operational question after any
    * config or code change to the dedup stack: how much did cluster
    * assignments MOVE? Takes two assignments over the same doc
    * population (yesterday/today, config A/B) and emits one summary row:
    * doc count, per-side cluster counts, docs whose label changed
    * (labels are comparable because both sides use the engine's
    * canonical min-member-id labeling), old clusters that split across
    * &gt;1 new cluster, and new clusters that merged &gt;1 old cluster.
    *
    * Scale shape: ONE doc-level join, then every statistic reads the
    * (old_cid, new_cid) CONTINGENCY table — a hash-agg whose output is
    * at most one row per surviving cluster pair, far smaller than the
    * corpus. The contingency is localCheckpointed because three
    * single-row aggregates consume it (swap for a table checkpoint when
    * cluster-pair cardinality exceeds cluster storage). Fan-out/fan-in
    * are counts over that collapsed relation — nothing rescans docs.
    */
  def clusterChurn(oldC: DataFrame, newC: DataFrame): DataFrame = {
    val pairAgg = oldC.select(col("doc_id"), col("cluster_id").as("old_cid"))
      .join(newC.select(col("doc_id"), col("cluster_id").as("new_cid")),
        "doc_id")
      .groupBy("old_cid", "new_cid").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val totals = pairAgg.agg(
      sum(col("n")).as("n_docs"),
      sum(when(col("old_cid") =!= col("new_cid"), col("n")).otherwise(0L))
        .as("n_moved"))
    val oldSide = pairAgg.groupBy("old_cid").agg(count(lit(1)).as("fanout"))
      .agg(count(lit(1)).as("n_old_clusters"),
        sum(when(col("fanout") > 1, 1L).otherwise(0L)).as("n_split"))
    val newSide = pairAgg.groupBy("new_cid").agg(count(lit(1)).as("fanin"))
      .agg(count(lit(1)).as("n_new_clusters"),
        sum(when(col("fanin") > 1, 1L).otherwise(0L)).as("n_merged"))
    totals.crossJoin(oldSide).crossJoin(newSide)
      .select(col("n_docs"), col("n_moved"), col("n_old_clusters"),
        col("n_new_clusters"), col("n_split"), col("n_merged"))
  }

  /** T44: reference-set decontamination by Hamming radius over a 64-bit
    * perceptual signature — pHash for images, SimHash for text: flag
    * every corpus row within `cfg.simhashMaxHamming` of ANY reference
    * row. The image-side analogue of T26's gram-overlap text
    * decontamination: eval-set images leak into crawls as re-encoded
    * near-copies, which byte/md5 checks miss but a perceptual-hash
    * radius catches (the DataComp/LAION eval-dedup step).
    *
    * Scale shape: refs are eval-set sized, so their pigeonhole subset
    * keys ([[Lsh.simhashKeys]] — agree-on-some-(q−h)-block-subset, a
    * COMPLETE prefilter for Hamming ≤ h by pigeonhole) BROADCAST; the
    * corpus derives the same keys row-locally and probes map-side. The
    * candidate set is decon-regime small (eval leakage, not corpus
    * dedup), so candidates, the exact-popcount re-check against
    * broadcast ref hashes, and the per-id hit rollup all broadcast back
    * — the corpus is scanned twice (key probe + final annotate) and
    * never shuffled. If contamination were corpus-scale the broadcast
    * hints would be the wrong shape — that regime is corpus dedup and
    * belongs to the J3/LSH self-join paths, as with T26b's
    * train≫eval asymmetry.
    *
    * Output: `corpus.*` + min_hamming (null when clean), n_refs (refs
    * within radius, 0 when clean), contaminated.
    */
  def hammingDecontaminate(corpus: DataFrame, refs: DataFrame,
      cfg: DedupConfig = DedupConfig()): DataFrame = {
    val ck = Lsh.simhashKeys(corpus.select(col("id"), col("simhash")), cfg)
    val rk = Lsh.simhashKeys(refs.select(col("id"), col("simhash")), cfg)
      .select(col("id").as("ref_id"), col("cid"), col("key"))
    val cand = ck.join(broadcast(rk), Seq("cid", "key"))
      .select(col("id"), col("ref_id")).dropDuplicates("id", "ref_id")
    val hits = corpus.select(col("id"), col("simhash"))
      .join(broadcast(cand), "id")
      .join(broadcast(refs.select(col("id").as("ref_id"),
        col("simhash").as("__rsim"))), "ref_id")
      .withColumn("hamming",
        bit_count(col("simhash").bitwiseXOR(col("__rsim"))).cast("long"))
      .where(col("hamming") <= cfg.simhashMaxHamming)
      .groupBy("id")
      .agg(min(col("hamming")).as("min_hamming"),
        count(lit(1)).as("n_refs"))
    corpus.join(broadcast(hits), Seq("id"), "left")
      .withColumn("n_refs", coalesce(col("n_refs"), lit(0L)))
      .withColumn("contaminated", col("min_hamming").isNotNull)
  }

  /** T48 — linear-probe classifier gate over frozen embeddings: the
    * LAION-aesthetics / CLIP-NSFW head shape (Schuhmann et al. 2022;
    * Gadre et al. 2023). Web-scale curation models are tiny linear heads
    * trained offline on a few thousand labels over embeddings the
    * pipeline already carries; the INFERENCE pass is the 10¹²-row job,
    * and it is a pure row-local codegen projection — one fused
    * zip_with/aggregate dot product per row, zero shuffles, no model
    * runtime. The head ships as a plain array literal in the plan
    * (dim+1 doubles — bytes, far below broadcast relevance).
    *
    * Determinism discipline (the T40/T46 integer/rounded-space rule):
    *   logit = round(Σ_j w_j·v_j + b, 4)  — products in double, fold in
    *           list order (= DuckDB's sequential list_dot_product);
    *   score = round(σ(logit), 4) — the transcendental is evaluated on
    *           the already-ROUNDED logit, so both engines feed exp() the
    *           same exact double and any libm last-ulp divergence sits
    *           ~8 decimal orders below the 4-dp boundary;
    *   keep  = logit ≥ τ — the gate thresholds the rounded logit, never
    *           the transcendental.
    *
    * `weights(0)` is the bias; `weights(1..dim)` the per-component head.
    */
  def linearProbe(embs: DataFrame, weights: Array[Double], tau: Double,
      vecCol: String = "embedding"): DataFrame = {
    require(weights.length >= 2, "need bias + at least one weight")
    val w = typedlit(weights.drop(1).toSeq)
    val dot = aggregate(
      zip_with(col(vecCol), w, (v, wj) => v.cast("double") * wj),
      lit(0.0), (acc, x) => acc + x)
    // null/dimension guard: a NULL embedding or one shorter than the
    // head makes zip_with pad with nulls, so dot/logit/score/keep all
    // go NULL and the row vanishes from BOTH keep filters — the silent
    // accounting leak imageMetaFilter's gate() exists to prevent. A
    // malformed row is explicitly NOT kept (keep = false, logit/score
    // null), so kept + dropped == input always.
    embs
      .withColumn("logit",
        when(col(vecCol).isNotNull && size(col(vecCol)) === weights.length - 1,
          round(dot + lit(weights(0)), 4)))
      .withColumn("score",
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 4))
      .withColumn("keep", coalesce(col("logit") >= lit(tau), lit(false)))
  }

  /** Deterministic probe head for tests/oracles: component i (0 = bias)
    * is mix64(seed + i)'s top 32 bits mapped to [-1, 1) — k/2³¹−1 with
    * k < 2³², every value exactly representable (the T25 uniform trick),
    * so the DuckDB twin rebuilds the identical head bit-for-bit.
    */
  def probeWeights(dim: Int, seed: Long): Array[Double] =
    Array.tabulate(dim + 1)(i =>
      (Hashing.mix64(seed + i) >>> 32).toDouble / 2147483648.0 - 1.0)
}
