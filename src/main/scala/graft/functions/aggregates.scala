package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded min-set aggregate: per group, keep the `cap` smallest i64 ids
  * (ascending, distinct) with O(cap) aggregation state.
  *
  * This is the skew-killer for bucket-shaped shuffles (LSH bands, SimHash
  * block keys): the previous two-phase salted window cap needed THREE
  * exchanges + two full sorts of the widest relation in the engine; a
  * bounded aggregate needs ONE exchange, and Spark's partial aggregation
  * (map-side combine) means a pathological hot bucket — 10^9 rows of one
  * band hash at 10^12-image scale — contributes at most `cap` values PER
  * MAP TASK to the shuffle, with at most `cap+1` longs of heap state per
  * group at every point. No salting, no sort, no unbounded
  * `collect_set`.
  *
  * State layout: slot 0 = live size, slots 1..size = binary MAX-heap of
  * the kept (smallest) values, so eviction replaces the root. Inputs are
  * expected distinct per group (band explode emits one row per (id,
  * band)); duplicates are tolerated and collapsed in `finish`.
  */
final class BoundedMinIds(cap: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(cap > 0)

  override def zero: Array[Long] = new Array[Long](1) // size 0, grows lazily

  @inline private def siftUp(h: Array[Long], i0: Int): Unit = {
    var i = i0
    while (i > 1 && h(i) > h(i >> 1)) {
      val t = h(i); h(i) = h(i >> 1); h(i >> 1) = t
      i = i >> 1
    }
  }

  private def siftDown(h: Array[Long], size: Int): Unit = {
    var i = 1
    var done = false
    while (!done) {
      val l = i << 1; val r = l + 1
      var m = i
      if (l <= size && h(l) > h(m)) m = l
      if (r <= size && h(r) > h(m)) m = r
      if (m == i) done = true
      else { val t = h(i); h(i) = h(m); h(m) = t; i = m }
    }
  }

  private def insert(b: Array[Long], v: Long): Array[Long] = {
    val size = b(0).toInt
    if (size < cap) {
      val h = if (b.length < size + 2) {
        val g = new Array[Long](math.min(cap + 1, math.max(4, b.length * 2)))
        System.arraycopy(b, 0, g, 0, size + 1)
        g
      } else b
      h(size + 1) = v
      h(0) = size + 1
      siftUp(h, size + 1)
      h
    } else if (v < b(1)) { // full: evict current max iff v is smaller
      b(1) = v
      siftDown(b, size)
      b
    } else b
  }

  override def reduce(b: Array[Long], v: Long): Array[Long] = insert(b, v)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var b = b1
    val n = b2(0).toInt
    var i = 1
    while (i <= n) { b = insert(b, b2(i)); i += 1 }
    b
  }

  override def finish(b: Array[Long]): Array[Long] = {
    val n = b(0).toInt
    val out = java.util.Arrays.copyOfRange(b, 1, n + 1)
    java.util.Arrays.sort(out)
    // collapse tolerated duplicates
    var w = 0; var i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Bounded buffer of (id, payload) rows: the `cap` smallest ids with
  * their payloads. Same max-heap discipline as [[BoundedMinIds]]; the
  * payload rides alongside in a parallel array.
  */
final case class IdPayloadBuf(size: Int, ids: Array[Long], payloads: Array[String])

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
    IdPayloadBuf(0, Array.emptyLongArray, Array.empty[String])

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
        b = IdPayloadBuf(b.size,
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

  override def reduce(b: IdPayloadBuf, v: (Long, String)): IdPayloadBuf =
    insert(b, v._1, v._2)

  override def merge(b1: IdPayloadBuf, b2: IdPayloadBuf): IdPayloadBuf = {
    var b = b1
    var i = 0
    while (i < b2.size) { b = insert(b, b2.ids(i), b2.payloads(i)); i += 1 }
    b
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
    IdPayloadBuf(w, java.util.Arrays.copyOf(ids, w), java.util.Arrays.copyOf(ps, w))
  }

  override def bufferEncoder: Encoder[IdPayloadBuf] = Encoders.product[IdPayloadBuf]
  override def outputEncoder: Encoder[IdPayloadBuf] = Encoders.product[IdPayloadBuf]
}

object GraftAggregates {
  /** `bounded_min_ids(idCol)`: array of the `cap` smallest distinct ids. */
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
