package graft

import org.scalatest.funsuite.AnyFunSuite

class SuffixSpec extends AnyFunSuite {

  private def naiveSa(s: Array[Int]): Array[Int] =
    s.indices.toArray.sortWith { (a, b) =>
      val cmp = java.util.Arrays.compare(s.drop(a), s.drop(b))
      cmp < 0
    }

  test("suffix array matches naive sort on random strings (seeded property)") {
    val rng = new java.util.SplittableRandom(3)
    (0 until 40).foreach { _ =>
      val n = 1 + rng.nextInt(200)
      val arr = Array.fill(n)(1 + rng.nextInt(4))
      assert(SuffixPass.suffixArray(arr).sameElements(naiveSa(arr)),
        s"mismatch on ${arr.mkString(",")}")
    }
  }

  test("suffix array rejects char codes that would overflow the r2 field") {
    // a code of exactly 2^21-1 passes a naive `< 2^21` bound but its
    // first-round r2 = code+1 needs 22 bits, silently corrupting the
    // packed sort key — the guard must be strict
    val bad = Array(5, (1 << 21) - 1, 3)
    intercept[IllegalArgumentException](SuffixPass.suffixArray(bad))
    // the largest admissible code still round-trips correctly
    val ok = Array(5, (1 << 21) - 2, 3, (1 << 21) - 2, 5)
    assert(SuffixPass.suffixArray(ok).sameElements(naiveSa(ok)))
  }

  test("suffix array correct for n >= 2^20 (packed-sort sign-bit range)") {
    // ranks >= 2^20 used to set the packed long's sign bit and corrupt the
    // sort order; verify the sorted-suffix property across that range.
    // Small alphabet forces many equal-rank rounds (deep rank growth).
    val rng = new java.util.SplittableRandom(7)
    val n = (1 << 20) + 4096
    val arr = Array.fill(n)(1 + rng.nextInt(3))
    val sa = SuffixPass.suffixArray(arr)
    assert(sa.toSet == (0 until n).toSet, "not a permutation")
    var i = 1
    while (i < n) {
      val a = sa(i - 1); val b = sa(i)
      // lexicographic comparison with early exit (random text → O(1) avg)
      var k = 0
      while (a + k < n && b + k < n && arr(a + k) == arr(b + k)) k += 1
      val ok =
        if (a + k >= n) true // shorter suffix sorts first
        else if (b + k >= n) false
        else arr(a + k) < arr(b + k)
      assert(ok, s"suffixes out of order at $i (sa=$a,$b)")
      i += 1
    }
  }

  test("lcp array matches naive pairwise LCP") {
    val s = "banana".map(_.toInt).toArray
    val sa = SuffixPass.suffixArray(s)
    val lcp = SuffixPass.lcpArray(s, sa)
    def naiveLcp(a: Int, b: Int): Int = {
      var l = 0
      while (a + l < s.length && b + l < s.length && s(a + l) == s(b + l)) l += 1
      l
    }
    (1 until s.length).foreach { i =>
      assert(lcp(i) == naiveLcp(sa(i - 1), sa(i)))
    }
  }

  test("spanPairs finds pairs sharing a long substring and skips unrelated docs") {
    val shared = "the quick brown fox jumped over the lazy dog near the river"
    val docs = Seq(
      1L -> s"aaa bbb $shared ccc",
      2L -> s"xxx $shared yyy zzz",
      3L -> "completely unrelated caption about mountains and sunsets")
    val pairs = SuffixPass.spanPairs(docs, 24).toVector
    assert(pairs.map(p => (p._1, p._2)) == Vector((1L, 2L)))
    assert(pairs.head._3 >= shared.length)
  }

  test("spanPairs: no false positives below minSpan") {
    val docs = Seq(1L -> "short shared bit here", 2L -> "short shared bit there")
    // common prefix "short shared bit " = 17 chars < 24
    assert(SuffixPass.spanPairs(docs, 24).isEmpty)
    assert(SuffixPass.spanPairs(docs, 10).nonEmpty)
  }

  test("winnowing guarantee: strings sharing a span >= L share a fingerprint") {
    val rng = new java.util.SplittableRandom(11)
    def randStr(n: Int) = {
      val sb = new StringBuilder
      (0 until n).foreach(_ => sb.append(('a' + rng.nextInt(26)).toChar))
      sb.toString
    }
    (0 until 50).foreach { _ =>
      val span = randStr(30)
      val s1 = randStr(rng.nextInt(40)) + span + randStr(rng.nextInt(40))
      val s2 = randStr(rng.nextInt(40)) + span + randStr(rng.nextInt(40))
      val f1 = SuffixPass.winnowFingerprints(s1, 8, 24).toSet
      val f2 = SuffixPass.winnowFingerprints(s2, 8, 24).toSet
      assert(f1.intersect(f2).nonEmpty, s"no shared fingerprint for span=$span")
    }
  }
}
