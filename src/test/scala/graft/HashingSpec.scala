package graft

import org.scalatest.funsuite.AnyFunSuite

class HashingSpec extends AnyFunSuite {

  test("shingles: distinct hashed k-grams, deterministic") {
    val a = Hashing.shingles("abcdefgh", 5)
    assert(a.length == 4) // abcde bcdef cdefg defgh
    assert(a.sameElements(Hashing.shingles("abcdefgh", 5)))
    assert(a.toSet == a.toSet.map((x: Long) => x)) // distinct
    // short string falls back to whole-string hash
    assert(Hashing.shingles("ab", 5).sameElements(Array(Hashing.hashString("ab"))))
    assert(Hashing.shingles("", 5).isEmpty)
  }

  test("shingles of repeated text dedupe") {
    val s = "ababababab"
    val sh = Hashing.shingles(s, 2)
    assert(sh.length == 2) // "ab", "ba"
  }

  test("minhash: identical sets → identical signatures; disjoint sets differ") {
    val x = Hashing.shingles("the quick brown fox jumps over the lazy dog", 5)
    val y = Hashing.shingles("completely different caption text entirely", 5)
    val mx = Hashing.minHash(x, 128)
    assert(mx.length == 128)
    assert(mx.sameElements(Hashing.minHash(x, 128)))
    val my = Hashing.minHash(y, 128)
    assert(mx.zip(my).count { case (a, b) => a == b } < 16)
  }

  test("minhash estimates Jaccard within CLT bounds (Broder 1997)") {
    // build two sets with known overlap: 60 shared + 40/40 unique → J = 0.4286
    val rng = new java.util.SplittableRandom(7)
    val shared = Array.fill(60)(rng.nextLong())
    val ua = Array.fill(40)(rng.nextLong())
    val ub = Array.fill(40)(rng.nextLong())
    val a = shared ++ ua
    val b = shared ++ ub
    val trueJ = 60.0 / 140.0
    val ma = Hashing.minHash(a, 128)
    val mb = Hashing.minHash(b, 128)
    val est = ma.zip(mb).count { case (x, y) => x == y } / 128.0
    // sd = sqrt(J(1-J)/128) ≈ 0.0437; allow 3.5 sd
    assert(math.abs(est - trueJ) < 3.5 * math.sqrt(trueJ * (1 - trueJ) / 128),
      s"est=$est trueJ=$trueJ")
  }

  test("simhash: hamming distance correlates with token overlap (Charikar 2002)") {
    def sh(s: String) = Hashing.simHash(
      graft.functions.SimHashExpr.tokenHashes(s), 0L, 0)
    val base = "a b c d e f g h i j k l m n o p"
    val near = "a b c d e f g h i j k l m n o q"
    val far = "q r s t u v w x y z aa bb cc dd ee ff"
    val hNear = java.lang.Long.bitCount(sh(base) ^ sh(near))
    val hFar = java.lang.Long.bitCount(sh(base) ^ sh(far))
    assert(hNear < hFar)
    assert(sh(base) == sh(base))
  }

  test("simhash folds phash: same caption, different phash → different simhash") {
    val toks = graft.functions.SimHashExpr.tokenHashes("one two three")
    val s1 = Hashing.simHash(toks, 0x1234L, 8)
    val s2 = Hashing.simHash(toks, -0x7777777L, 8)
    assert(s1 != s2)
  }

  test("ophMinHash: deterministic, numBins-wide, power-of-two enforced") {
    val x = Hashing.shingles("the quick brown fox jumps over the lazy dog", 5)
    val o = Hashing.ophMinHash(x, 128)
    assert(o.length == 128)
    assert(o.sameElements(Hashing.ophMinHash(x, 128)))
    intercept[IllegalArgumentException](Hashing.ophMinHash(x, 100))
    // 1 is a power of two but shift=64 is a JVM no-op — must be rejected
    intercept[IllegalArgumentException](Hashing.ophMinHash(x, 1))
    // empty input → all-empty sentinel (two empty docs compare equal)
    assert(Hashing.ophMinHash(Array.emptyLongArray, 16)
      .forall(_ == Hashing.OphEmpty))
  }

  test("ophMinHash densification: one shingle fills every bin via circular borrow") {
    val sh = Array(12345L)
    val h = Hashing.mix64(12345L ^ Hashing.OphSeed)
    val g = (h >>> 57).toInt // the single genuine bin
    val v = h.toInt.toLong
    val o = Hashing.ophMinHash(sh, 128)
    assert(o(g) == v)
    for (b <- 0 until 128 if b != g) {
      val t = ((g - b) & 127).toLong // distance to the genuine bin, rightward circular
      assert(o(b) == v + t * 0x100000000L, s"bin $b")
    }
  }

  test("ophMinHash estimates Jaccard like full MinHash once sets >> bins") {
    // 600 shared + 400/400 unique → J = 0.4286, load factor ~11 per bin
    val rng = new java.util.SplittableRandom(11)
    val shared = Array.fill(600)(rng.nextLong())
    val a = shared ++ Array.fill(400)(rng.nextLong())
    val b = shared ++ Array.fill(400)(rng.nextLong())
    val trueJ = 600.0 / 1400.0
    val oa = Hashing.ophMinHash(a, 128)
    val ob = Hashing.ophMinHash(b, 128)
    val est = oa.zip(ob).count { case (x, y) => x == y } / 128.0
    assert(math.abs(est - trueJ) < 4 * math.sqrt(trueJ * (1 - trueJ) / 128),
      s"est=$est trueJ=$trueJ")
  }

  test("exactJaccard oracle") {
    assert(Hashing.exactJaccard(Array(1L, 2L, 3L).sorted, Array(2L, 3L, 4L).sorted) == 0.5)
    assert(Hashing.exactJaccard(Array.emptyLongArray, Array.emptyLongArray) == 1.0)
  }
}
