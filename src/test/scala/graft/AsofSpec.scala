package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** AsOf.asofJoin semantics the driver's events data may not exercise:
  * equal-timestamp inclusivity, the right-side tiebreak, unmatched-left
  * nulls, and key isolation. Oracle = hand-computed expectations plus a
  * driver-side brute force over random data.
  */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asof picks latest right <= left, inclusive, per key") {
    val left = Seq(("k1", ts(10), "L1"), ("k1", ts(20), "L2"), ("k2", ts(15), "L3"))
      .toDF("k", "t", "ltag")
    val right = Seq(("k1", ts(5), 100L), ("k1", ts(20), 200L), ("k2", ts(16), 300L))
      .toDF("k", "t", "rv")
    val got = AsOf.asofJoin(left, right, "k", "t", Seq("rv"), rightTie = "rv")
      .select($"ltag", $"asof_rv").as[(String, Option[Long])].collect().toMap
    // L1@10: only right@5 precedes. L2@20: right@20 ties — inclusive, wins
    // over right@5. L3@15 on k2: right@16 is later — no match, null.
    assert(got == Map("L1" -> Some(100L), "L2" -> Some(200L), "L3" -> None))
  }

  test("ties among right rows at one (key, ts) break to the largest tie column") {
    val left = Seq(("k", ts(10), "L")).toDF("k", "t", "ltag")
    val right = Seq(("k", ts(10), 1L), ("k", ts(10), 7L), ("k", ts(10), 3L))
      .toDF("k", "t", "rv")
    val got = AsOf.asofJoin(left, right, "k", "t", Seq("rv"), rightTie = "rv")
      .select($"asof_rv").as[Long].collect().toSeq
    assert(got == Seq(7L))
  }

  test("random data matches a driver-side brute force") {
    val rng = new java.util.SplittableRandom(11)
    val leftRows = (0 until 300).map(i =>
      (s"k${rng.nextInt(8)}", ts(rng.nextInt(1000).toLong), i.toLong))
    val rightRows = (0 until 300).map(i =>
      (s"k${rng.nextInt(8)}", ts(rng.nextInt(1000).toLong), i.toLong, rng.nextInt(50).toLong))
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "t", "rid", "rv")
    val got = AsOf.asofJoin(left, right, "k", "t", Seq("rid", "rv"), rightTie = "rid")
      .select($"lid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    val expected = leftRows.map { case (k, t, lid) =>
      val cands = rightRows.filter(r => r._1 == k && !r._2.after(t))
      // latest ts wins; equal ts breaks to largest rid (the tie column)
      lid -> cands.sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
    }.toMap
    assert(got == expected)
  }

  test("left columns pass through untouched and row count is preserved") {
    val left = Seq(("k", ts(1), "a", 1.5), ("k", ts(2), "b", 2.5), ("j", ts(3), "c", 3.5))
      .toDF("k", "t", "name", "score")
    val right = Seq(("k", ts(1), 9L)).toDF("k", "t", "rv")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("rv"), rightTie = "rv")
    assert(out.columns.toSeq == Seq("k", "t", "name", "score", "asof_t", "asof_rv"))
    assert(out.count() == 3)
    assert(out.select($"name", $"score").as[(String, Double)].collect().toSet ==
      Set(("a", 1.5), ("b", 2.5), ("c", 3.5)))
  }
}
