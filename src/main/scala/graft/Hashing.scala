package graft

/** Deterministic, allocation-light hash kernels shared by the Catalyst
  * expressions, fixture generator and tests. Pure JVM, no deps.
  *
  * Hash family: splitmix64 finalizer (Steele et al., "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA 2014) — a full-avalanche 64-bit
  * mix. Lane i of MinHash uses `mix64(x ^ seed_i)` with lane seeds drawn
  * from a seeded splitmix stream; this is the standard
  * one-hash-per-permutation construction (Broder 1997 requires only
  * min-wise independent approximations in practice).
  */
object Hashing {

  @inline final def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  /** splitmix64 stream — used to derive lane seeds deterministically. */
  final def seeds(n: Int, seed: Long): Array[Long] = {
    val out = new Array[Long](n)
    var s = seed
    var i = 0
    while (i < n) {
      s += 0x9e3779b97f4a7c15L
      out(i) = mix64(s)
      i += 1
    }
    out
  }

  /** 64-bit string hash (FNV-style seed + splitmix finalize). */
  final def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h = (h ^ s.charAt(i)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Hash of a char window [from, from+k) of s — used for k-gram shingles
    * without substring allocation.
    */
  final def hashWindow(s: String, from: Int, k: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + k
    while (i < end) {
      h = (h ^ s.charAt(i)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  // Lane seeds for the pinned 128-perm MinHash config (BASELINE.json:L6).
  // Derived once from the fixed family seed; the family seed participates
  // in DedupConfig.configHash so a changed config invalidates checkpoints.
  final val MinHashSeedBase = 0x5eed0fda7a5eedL
  private val laneSeeds256 = seeds(256, MinHashSeedBase)

  /** Batched MinHash: all `numPerms` lanes in ONE pass over the shingle set
    * (SURVEY.md §2.4 A1 "batched = all 128 lanes in one pass"). Row-local;
    * no shuffle. Lane value is the low 32 bits of the lane hash (signed
    * min) — halves signature width vs i64 with no loss for Jaccard
    * estimation.
    */
  final def minHash(shingles: Array[Long], numPerms: Int): Array[Int] = {
    val out = new Array[Int](numPerms)
    java.util.Arrays.fill(out, Int.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val x = shingles(i)
      var lane = 0
      while (lane < numPerms) {
        val v = mix64(x ^ laneSeeds256(lane)).toInt
        if (v < out(lane)) out(lane) = v
        lane += 1
      }
      i += 1
    }
    out
  }

  /** 64-bit SimHash (Charikar, STOC 2002) over token hashes plus the
    * perceptual hash: each 8-bit byte of `phash` is folded in as an extra
    * weighted feature so that images vote alongside caption tokens
    * (BASELINE.json:L6 "64-bit SimHash over pHash+caption tokens").
    */
  final def simHash(tokenHashes: Array[Long], phash: Long, phashWeight: Int): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokenHashes.length) {
      val h = tokenHashes(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    // fold the 8 bytes of phash as 8 features of weight `phashWeight`
    var byteIdx = 0
    while (byteIdx < 8) {
      val feat = mix64(((phash >>> (byteIdx * 8)) & 0xffL) | (byteIdx.toLong << 32) | 0xbeefL << 40)
      var b = 0
      while (b < 64) {
        if (((feat >>> b) & 1L) == 1L) counts(b) += phashWeight
        else counts(b) -= phashWeight
        b += 1
      }
      byteIdx += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Distinct hashed char k-grams of a (pre-normalized) string. */
  final def shingles(s: String, k: Int): Array[Long] = {
    if (s == null || s.length < k) {
      if (s != null && s.nonEmpty) Array(hashString(s)) else Array.emptyLongArray
    } else {
      val n = s.length - k + 1
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) {
        set.add(hashWindow(s, i, k))
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      out
    }
  }

  /** Exact Jaccard of two sorted long arrays (test oracle for MinHash). */
  final def exactJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}
