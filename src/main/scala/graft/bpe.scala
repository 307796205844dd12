package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T60: distributed byte-pair-encoding merge training (Sennrich,
  * Haddow & Birch, ACL 2016) — the step AFTER T32's vocabulary census in
  * an LLM training-data pipeline: learn the first `nMerges` BPE merges
  * from the corpus itself.
  *
  * Scale shape (the whole point at 100 TB): the corpus is touched ONCE —
  * a word-frequency hash aggregation (map-side combined, output bounded
  * by the type vocabulary, not the token count). Every merge round after
  * that operates on the vocab-bounded word table: one pair-census hash
  * aggregation (pairs per word ≤ symbols per word, so the census input
  * is O(vocab·avg_word_len)) plus one argmax LIMIT 1. Driver state per
  * round is exactly one row (the winning pair) — the same bounded-collect
  * discipline as the CC convergence counter. This is why production BPE
  * trainers (SentencePiece in word-dict mode, HF tokenizers) are
  * word-dict-based too: 10^12 tokens collapse to ~10^7 types before any
  * iteration starts.
  *
  * Determinism: ties in the pair census break on (freq DESC, lft ASC,
  * rgt ASC) — byte ordering, identical in Spark and DuckDB for the
  * ASCII-only `[a-z]+` + `</w>` symbol alphabet.
  *
  * Merge application is the canonical leftmost-greedy single pass
  * (Sennrich's `re.sub` with boundary lookarounds): fold the symbol
  * sequence left to right; when the accumulated tail token equals `lft`
  * and the next symbol equals `rgt`, concatenate (the merged token
  * `lft||rgt` differs from `lft`, so a just-merged token can never
  * re-merge — the boundary check is token-exact because the pattern
  * includes the separator space). Expressed as a Spark `aggregate` HOF
  * here and the byte-identical `list_reduce` in the DuckDB oracle
  * (SparkEntry.bpeOracleSql), so q_bpe_train value-checks every round's
  * census, argmax, and re-segmentation end-to-end at both SFs.
  */
object Bpe {

  /** One learned merge: at `step`, symbols `lft`+`rgt` (joint corpus
    * frequency `freq`) became the single symbol `lft||rgt`.
    */
  final case class Merge(step: Int, lft: String, rgt: String, freq: Long)

  /** Word-frequency census — the single corpus-wide pass. `[a-z]+` over
    * lowercased text: deterministic, engine-identical (the pattern is
    * regex-dialect-free), and non-Latin rows simply contribute no types
    * (script-aware alphabets would extend the extraction pattern, not
    * the algorithm).
    */
  def wordCounts(docs: DataFrame): DataFrame =
    docs
      .select(explode(regexp_extract_all(
        lower(col("text")), lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Initial segmentation: characters joined by spaces, plus the classic
    * `</w>` end-of-word symbol (so merges distinguish word-final
    * contexts; it cannot collide with `[a-z]+` symbols).
    */
  private def initialSeg(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      array_join(transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))), " "),
      lit(" </w>"))

  /** Leftmost-greedy merge application over the space-joined symbol
    * string (see object scaladoc for why this equals Sennrich's regex
    * pass and why re-merge is impossible).
    */
  private def applyMerge(seg: org.apache.spark.sql.Column,
                         lft: String, rgt: String): org.apache.spark.sql.Column = {
    val toks = split(seg, " ")
    aggregate(
      slice(toks, lit(2), size(toks) - 1),
      element_at(toks, 1),
      (acc, x) =>
        when(x === lit(rgt) &&
            (acc === lit(lft) || acc.endsWith(" " + lft)),
          concat(acc, x))
        .otherwise(concat(acc, lit(" "), x)))
  }

  /** One round's adjacent-pair census over the word table: explode the
    * symbol pairs, hash-aggregate their weighted counts. Exposed for
    * PlanDump — the scale property is that this is a partial-combining
    * HashAggregate over a codegen explode (no SortAggregate, no window,
    * one Exchange of at most the pair-vocabulary).
    */
  private[graft] def pairCensus(words: DataFrame): DataFrame = {
    val toks = split(col("seg"), " ")
    words
      .select(col("cnt"), explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("lft"), b.as("rgt")))).as("p"))
      .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
      .agg(sum("cnt").as("freq"))
  }

  /** Learn the first `nMerges` merges. Returns (step, lft, rgt, freq),
    * step ascending — the merges table a tokenizer ships with.
    */
  def train(docs: DataFrame, nMerges: Int): DataFrame =
    trainWithSegments(docs, nMerges)._1

  /** The subword vocabulary AFTER training: every symbol of the final
    * word segmentations, weighted by word frequency — the (token, freq)
    * table a trained tokenizer's coverage/fertility analysis starts
    * from. Same scale shape as training (the segmentations are already
    * materialized per round; this is one more explode + hash-agg over
    * the vocab-bounded word table).
    */
  def subwordVocab(docs: DataFrame, nMerges: Int): DataFrame =
    vocabFromSegments(trainWithSegments(docs, nMerges)._2)

  /** Post-merge vocabulary from a (seg, cnt) word table — split out so
    * TokenizerJob derives both artifacts from ONE training pass.
    */
  private[graft] def vocabFromSegments(words: DataFrame): DataFrame =
    words
      .select(explode(split(col("seg"), " ")).as("token"), col("cnt"))
      .groupBy("token")
      .agg(sum("cnt").as("freq"))
      .orderBy(desc("freq"), asc("token"))

  /** Apply the trained tokenizer to the corpus: per-doc word and BPE
    * token counts plus fertility (BPE tokens per word) — the measurement
    * data-mixing and packing decisions read. Scale shape: the corpus
    * explodes to words ONCE and joins the BROADCAST word→segment-count
    * dict (vocab-bounded, the same reason the trainer is word-dict
    * based), then one hash-agg by doc_id — no shuffle ever carries more
    * than (doc_id, word). Docs with no `[a-z]+` words have no tokens
    * under this alphabet and drop out (the oracle's inner join mirrors
    * that).
    */
  def encodeStats(docs: DataFrame, nMerges: Int): DataFrame = {
    val words = trainWithSegments(docs, nMerges)._2
    val dict = words.select(col("word"),
      size(split(col("seg"), " ")).cast("long").as("n_sub"))
    docs
      .select(col("doc_id"), explode(regexp_extract_all(
        lower(col("text")), lit("[a-z]+"), lit(0))).as("word"))
      .join(broadcast(dict), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_bpe_tokens"))
      .withColumn("fertility",
        round(col("n_bpe_tokens") / col("n_words").cast("double"), 4))
      .orderBy("doc_id")
  }

  /** Training loop returning (merges, final word segmentations). */
  private[graft] def trainWithSegments(docs: DataFrame, nMerges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    // vocab-bounded working table; checkpointed per round so the plan
    // doesn't deepen by one fold per merge (k rounds of lineage over a
    // tiny relation is still k codegen stages if left lazy)
    var words = wordCounts(docs)
      .select(col("word"), initialSeg(col("word")).as("seg"), col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val best = pairCensus(words)
        .orderBy(desc("freq"), asc("lft"), asc("rgt"))
        .limit(1)
        .collect() // exactly one row of driver state per round
      if (best.isEmpty) exhausted = true
      else {
        val r = best(0)
        val (l, rt, f) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += Merge(step, l, rt, f)
        words = words
          .select(col("word"), applyMerge(col("seg"), l, rt).as("seg"), col("cnt"))
          .localCheckpoint()
        step += 1
      }
    }
    import spark.implicits._
    (merges.toSeq.toDF("step", "lft", "rgt", "freq"), words)
  }
}
