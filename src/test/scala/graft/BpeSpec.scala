package graft

import org.apache.spark.sql.functions.col

/** T60: BPE merge training — hand-computed golden merges pin the census
  * weighting, the (freq DESC, lft, rgt) tie-break, and the
  * leftmost-greedy merge fold (the DuckDB side of the same semantics is
  * value-checked by q_bpe_train's oracle at both SFs).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] =
    Bpe.train(texts.toDF("text"), k)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("classic low/lower corpus: merges and tie-breaks by hand") {
    // words: low×2, lower×1. Round 1 pairs: (l,o)=3, (o,w)=3, (w,</w>)=2,
    // (w,e)=1, (e,r)=1, (r,</w>)=1 — freq tie at 3 broken by lft asc.
    assert(merges(Seq("low low lower"), 4) == Seq(
      (1, "l", "o", 3L),
      (2, "lo", "w", 3L),
      (3, "low", "</w>", 2L),
      (4, "e", "r", 1L))) // final tie at 1: "e" < "low" < "r"
  }

  test("same-symbol runs: greedy fold merges leftmost, never re-merges") {
    // "aaa" → [a,a,a,</w>]: (a,a) occurs at two adjacent positions
    // (census 2, Sennrich's get_stats counts positions), but applying the
    // merge greedily yields [aa, a, </w>] — the merged "aa" must NOT
    // re-merge with the trailing "a". Round 2's census proves the
    // resulting segmentation: (aa,a)=1 and (a,</w>)=1 tie, "a" < "aa".
    assert(merges(Seq("aaa"), 2) == Seq(
      (1, "a", "a", 2L),
      (2, "a", "</w>", 1L)))
  }

  test("subword vocabulary reflects the applied merges") {
    // after the 4 merges above: low→[low</w>]×2, lower→[low, er, </w>]
    val vocab = Bpe.subwordVocab(Seq("low low lower").toDF("text"), 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(vocab == Seq( // (freq DESC, token ASC); '<' sorts before letters
      ("low</w>", 2L), ("</w>", 1L), ("er", 1L), ("low", 1L)))
  }

  test("exhaustion: training stops when no pairs remain; vocab keeps the last segmentation") {
    // 'ab' fully merges in 2 rounds; rounds 3..8 must produce no rows
    // and subwordVocab must return the round-2 state (the DuckDB oracle
    // mirrors this via the LEFT JOIN fallback in wN — verified against
    // this exact corpus by hand in round 5)
    assert(merges(Seq("ab"), 8) == Seq(
      (1, "a", "b", 1L), (2, "ab", "</w>", 1L)))
    val vocab = Bpe.subwordVocab(Seq("ab").toDF("text"), 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(vocab == Seq(("ab</w>", 1L)))
  }

  test("encode stats re-tokenize with the trained segmentations") {
    // after the 4 merges of the classic corpus: low→[low</w>] (1 token),
    // lower→[low, er, </w>] (3) ⇒ the one doc has 3 words, 5 BPE tokens
    val stats = Bpe.encodeStats(
      Seq((7L, "low low lower")).toDF("doc_id", "text"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(stats.toSeq == Seq((7L, 3L, 5L, 1.6667)))
  }

  test("pair census plans as hash aggregation (no sort aggregate)") {
    // the PLANS.md T60 property, asserted mechanically: the per-round
    // census must stay a partial-combining HashAggregate over a codegen
    // explode — a SortAggregate here would full-sort the pair relation
    // every round
    val plan = Bpe.pairCensus(
      Bpe.wordCounts(Seq("a corpus of words").toDF("text"))
        .select(col("word").as("seg"), col("cnt")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("case folding and non-letter stripping feed the census") {
    // "Ab ab AB" lowercases to ab×3; digits/punctuation never form words
    assert(merges(Seq("Ab ab, AB! 7"), 1) == Seq((1, "a", "b", 3L)))
  }
}
