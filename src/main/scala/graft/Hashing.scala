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

  // Seed for the single OPH hash pass — independent of every MinHash lane
  // seed (drawn from the same splitmix64 family at a distinct offset).
  final val OphSeed: Long = mix64(MinHashSeedBase ^ 0x09f4a7c15L)

  /** Sentinel for a bin no shingle landed in (genuine bin minima are
    * signed-i32-ranged, borrowed values < 2^39 — MaxValue collides with
    * neither).
    */
  final val OphEmpty: Long = Long.MaxValue

  /** One Permutation Hashing (Li, Owen, Zhang, NIPS 2012) with rotation
    * densification (Shrivastava, Li, ICML 2014): ONE `mix64` per shingle
    * fills `numBins` bins — the top log2(numBins) bits route to a bin, the
    * signed low 32 bits are the candidate value, min per bin — instead of
    * the 128 lane hashes per shingle the classic batched MinHash pays.
    * Empty bins borrow from the nearest GENUINE (pre-densification)
    * non-empty bin to the right (circular), offset by `t * 2^32` so a
    * borrow at distance t can only match another borrow of the same
    * source at the same distance — exactly the collision the estimator
    * needs (two docs empty in the same bin for the same reason match; a
    * genuine min never matches a borrow). P[bin_i(A)=bin_i(B)] ≈ J(A,B)
    * and the estimate concentrates like full MinHash once sets are a few
    * times larger than numBins.
    *
    * All-empty input (no shingles) returns all-OphEmpty — two empty docs
    * compare equal, matching exactJaccard's empty-empty convention.
    */
  final def ophMinHash(shingles: Array[Long], numBins: Int): Array[Long] = {
    // ≥2: numBins=1 would make shift=64, a no-op on the JVM (shift counts
    // are mod 64), routing every shingle to an arbitrary out-of-range bin
    require(numBins > 1 && (numBins & (numBins - 1)) == 0,
      s"numBins must be a power of two >= 2, got $numBins")
    val shift = 64 - Integer.numberOfTrailingZeros(numBins)
    val mask = numBins - 1
    val out = new Array[Long](numBins)
    java.util.Arrays.fill(out, OphEmpty)
    var i = 0
    while (i < shingles.length) {
      val h = mix64(shingles(i) ^ OphSeed)
      val bin = (h >>> shift).toInt
      val v = h.toInt.toLong // signed low 32 bits, same lane math as minHash
      if (v < out(bin)) out(bin) = v
      i += 1
    }
    if (shingles.length == 0) return out
    // rotation densification over the genuine minima only: `filled` is the
    // pre-densification occupancy, so a borrow never chains off a borrow
    val filled = new Array[Boolean](numBins)
    var b = 0
    while (b < numBins) { filled(b) = out(b) != OphEmpty; b += 1 }
    b = 0
    while (b < numBins) {
      if (!filled(b)) {
        var t = 1
        while (t < numBins && !filled((b + t) & mask)) t += 1
        if (t < numBins) out(b) = out((b + t) & mask) + t.toLong * 0x100000000L
      }
      b += 1
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
