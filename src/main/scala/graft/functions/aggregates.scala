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

object GraftAggregates {
  /** `bounded_min_ids(idCol)`: array of the `cap` smallest distinct ids. */
  def boundedMinIds(cap: Int): Column => Column = {
    val f = udaf(new BoundedMinIds(cap), Encoders.scalaLong)
    (c: Column) => f(c)
  }
}
