package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Output of [[BoundedMinIds]]: the kept ids plus how many values the
  * group actually saw — `n_seen > ids.length` means the cap dropped
  * overflow, which callers surface via `observe()` (W2: no silent
  * truncation).
  */
final case class CappedIds(ids: Array[Long], n_seen: Long)

/** Bounded min-set aggregate: per group, keep the `cap` smallest i64 ids
  * (ascending, distinct) with O(cap) aggregation state, plus a count of
  * everything seen (overflow visibility).
  *
  * This is the skew-killer for bucket-shaped shuffles (LSH bands, SimHash
  * block keys): the previous two-phase salted window cap needed THREE
  * exchanges + two full sorts of the widest relation in the engine; a
  * bounded aggregate needs ONE exchange, and Spark's partial aggregation
  * (map-side combine) means a pathological hot bucket — 10^9 rows of one
  * band hash at 10^12-image scale — contributes at most `cap` values PER
  * MAP TASK to the shuffle, with at most `cap+2` longs of heap state per
  * group at every point. No salting, no sort, no unbounded
  * `collect_set`.
  *
  * State layout: slot 0 = live size, slot 1 = values seen, slots
  * 2..size+1 = binary MAX-heap (logical 1-based index j at physical j+1)
  * of the kept (smallest) values, so eviction replaces the root. Inputs
  * are expected distinct per group (band explode emits one row per (id,
  * band)); duplicates are tolerated and collapsed in `finish`.
  */
final class BoundedMinIds(cap: Int)
    extends Aggregator[Long, Array[Long], CappedIds] {
  require(cap > 0)

  override def zero: Array[Long] = new Array[Long](2) // size 0, seen 0

  @inline private def get(b: Array[Long], j: Int): Long = b(j + 1)
  @inline private def set(b: Array[Long], j: Int, v: Long): Unit = b(j + 1) = v

  @inline private def siftUp(b: Array[Long], j0: Int): Unit = {
    var j = j0
    while (j > 1 && get(b, j) > get(b, j >> 1)) {
      val t = get(b, j); set(b, j, get(b, j >> 1)); set(b, j >> 1, t)
      j = j >> 1
    }
  }

  private def siftDown(b: Array[Long], size: Int): Unit = {
    var j = 1
    var done = false
    while (!done) {
      val l = j << 1; val r = l + 1
      var m = j
      if (l <= size && get(b, l) > get(b, m)) m = l
      if (r <= size && get(b, r) > get(b, m)) m = r
      if (m == j) done = true
      else { val t = get(b, j); set(b, j, get(b, m)); set(b, m, t); j = m }
    }
  }

  private def insert(b0: Array[Long], v: Long): Array[Long] = {
    var b = b0
    b(1) += 1
    val size = b(0).toInt
    if (size < cap) {
      if (b.length < size + 3) {
        // long arithmetic: cap + 2 overflows Int at cap = Int.MaxValue
        // (the exhaustive-probe "cap > corpus" configuration)
        val g = new Array[Long](
          math.min(cap.toLong + 2, math.max(6L, b.length * 2L)).toInt)
        System.arraycopy(b, 0, g, 0, size + 2)
        b = g
      }
      set(b, size + 1, v)
      b(0) = size + 1
      siftUp(b, size + 1)
    } else if (v < get(b, 1)) { // full: evict current max iff v is smaller
      set(b, 1, v)
      siftDown(b, size)
    }
    b
  }

  override def reduce(b: Array[Long], v: Long): Array[Long] = insert(b, v)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var b = b1
    val n = b2(0).toInt
    var j = 1
    while (j <= n) { b = insert(b, get(b2, j)); j += 1 }
    b(1) += b2(1) - n // insert() counted the n kept values; add b2's drops
    b
  }

  override def finish(b: Array[Long]): CappedIds = {
    val n = b(0).toInt
    val out = java.util.Arrays.copyOfRange(b, 2, n + 2)
    java.util.Arrays.sort(out)
    // collapse tolerated duplicates
    var w = 0; var i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    CappedIds(if (w == out.length) out else java.util.Arrays.copyOf(out, w), b(1))
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[CappedIds] = Encoders.product[CappedIds]
}

/** Bounded buffer of (id, payload) rows: the `cap` smallest ids with
  * their payloads. Same max-heap discipline as [[BoundedMinIds]]; the
  * payload rides alongside in a parallel array. `n_seen` counts every
  * row the group saw — `n_seen > size` means the cap dropped overflow,
  * which callers surface via `observe()` (W2: no silent truncation,
  * same contract as [[CappedIds]]).
  */
final case class IdPayloadBuf(
    size: Int, n_seen: Long, ids: Array[Long], payloads: Array[String])

/** Per group, keep the `cap` (id, payload) rows with the smallest ids —
  * O(cap) state, partial-aggregation-safe. Used by the suffix-array pass
  * to cap winnow-fingerprint buckets in the SAME single aggregation that
  * assembles the per-bucket document set, replacing two salted window
  * shuffles + a `groupByKey` (3 exchanges of (fp, id, caption) rows)
  * with ONE exchange of bounded partial states.
  */
final class BoundedMinRows(cap: Int)
    extends Aggregator[(Long, String), IdPayloadBuf, IdPayloadBuf] {
  require(cap > 0)

  override def zero: IdPayloadBuf =
    IdPayloadBuf(0, 0L, Array.emptyLongArray, Array.empty[String])

  // max-heap over slots 0..size-1 keyed by ids
  private def swap(b: IdPayloadBuf, i: Int, j: Int): Unit = {
    val ti = b.ids(i); b.ids(i) = b.ids(j); b.ids(j) = ti
    val tp = b.payloads(i); b.payloads(i) = b.payloads(j); b.payloads(j) = tp
  }

  private def insert(b0: IdPayloadBuf, id: Long, p: String): IdPayloadBuf = {
    var b = b0
    if (b.size < cap) {
      if (b.ids.length < b.size + 1) {
        val n = math.min(cap, math.max(4, b.ids.length * 2))
        b = IdPayloadBuf(b.size, b.n_seen,
          java.util.Arrays.copyOf(b.ids, n),
          java.util.Arrays.copyOf(b.payloads, n))
      }
      b.ids(b.size) = id; b.payloads(b.size) = p
      var i = b.size
      b = b.copy(size = b.size + 1)
      while (i > 0 && b.ids(i) > b.ids((i - 1) >> 1)) {
        swap(b, i, (i - 1) >> 1); i = (i - 1) >> 1
      }
      b
    } else if (id < b.ids(0)) {
      b.ids(0) = id; b.payloads(0) = p
      var i = 0; var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1; var m = i
        if (l < b.size && b.ids(l) > b.ids(m)) m = l
        if (r < b.size && b.ids(r) > b.ids(m)) m = r
        if (m == i) done = true else { swap(b, i, m); i = m }
      }
      b
    } else b
  }

  override def reduce(b: IdPayloadBuf, v: (Long, String)): IdPayloadBuf = {
    val r = insert(b, v._1, v._2)
    r.copy(n_seen = b.n_seen + 1)
  }

  override def merge(b1: IdPayloadBuf, b2: IdPayloadBuf): IdPayloadBuf = {
    var b = b1
    var i = 0
    while (i < b2.size) { b = insert(b, b2.ids(i), b2.payloads(i)); i += 1 }
    // insert() does not count; totals are exact under partial aggregation
    b.copy(n_seen = b1.n_seen + b2.n_seen)
  }

  /** Ascending by id, duplicates (same id) collapsed to the first. */
  override def finish(b: IdPayloadBuf): IdPayloadBuf = {
    val idx = Array.range(0, b.size).sortBy(b.ids)
    val ids = new Array[Long](b.size)
    val ps = new Array[String](b.size)
    var w = 0; var i = 0
    while (i < b.size) {
      val j = idx(i)
      if (w == 0 || b.ids(j) != ids(w - 1)) { ids(w) = b.ids(j); ps(w) = b.payloads(j); w += 1 }
      i += 1
    }
    IdPayloadBuf(w, b.n_seen,
      java.util.Arrays.copyOf(ids, w), java.util.Arrays.copyOf(ps, w))
  }

  override def bufferEncoder: Encoder[IdPayloadBuf] = Encoders.product[IdPayloadBuf]
  override def outputEncoder: Encoder[IdPayloadBuf] = Encoders.product[IdPayloadBuf]
}

object GraftAggregates {
  /** `bounded_min_ids(idCol)`: struct(ids = the `cap` smallest distinct
    * ids ascending, n_seen = total values seen).
    */
  def boundedMinIds(cap: Int): Column => Column = {
    val f = udaf(new BoundedMinIds(cap), Encoders.scalaLong)
    (c: Column) => f(c)
  }

  /** `bounded_min_rows(idCol, payloadCol)`: struct(size, ids, payloads)
    * of the `cap` smallest-id rows.
    */
  def boundedMinRows(cap: Int): (Column, Column) => Column = {
    val f = udaf(new BoundedMinRows(cap), Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
    (id: Column, p: Column) => f(id, p)
  }
}
