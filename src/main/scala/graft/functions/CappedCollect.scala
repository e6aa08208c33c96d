package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator: collect_list with a HARD buffer cap — at most
  * `cap` elements are ever held per group; one element beyond the cap
  * is kept as an overflow marker and further input is discarded.
  *
  * Why this exists: `collect_list(...)` followed by a size filter
  * materializes the ENTIRE group in one aggregation buffer before the
  * filter sees it — a group with millions of members (a viral
  * boilerplate shingle's posting list) is a multi-million-element
  * array in executor memory, exactly the hot-group case the caller's
  * size filter intends to throw away. With the cap inside the
  * aggregator, an over-cap group costs cap+1 elements of memory and
  * one branch per extra row, and comes out with length cap+1 — the
  * caller's `size(..) <= cap` filter drops it exactly as before, so
  * results are identical whenever the caller discards over-cap groups.
  *
  * Input elements are assumed unique per group (the caller dedups
  * upstream — e.g. per-document-distinct shingles); the output is
  * sorted ascending. Buffer ops are O(1) amortized per row (append,
  * no per-row sort); the one sort happens in finish over ≤ cap+1
  * elements.
  */
case class CappedCollectLong(cap: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], x: Long): Array[Long] =
    if (buf.length > cap) buf // overflowed: keep the marker, drop input
    else {
      val out = java.util.Arrays.copyOf(buf, buf.length + 1)
      out(buf.length) = x
      out
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val n = math.min(a.length + b.length, cap + 1)
    val out = new Array[Long](n)
    System.arraycopy(a, 0, out, 0, math.min(a.length, n))
    if (a.length < n) System.arraycopy(b, 0, out, a.length, n - a.length)
    out
  }

  override def finish(buf: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(buf)
    buf
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CappedCollect {
  /** Column function: up to `cap` elements of `c` per group (cap+1 on
    * overflow, as the droppable marker), sorted ascending. */
  def cappedCollectLong(c: Column, cap: Int): Column =
    udaf(CappedCollectLong(cap)).apply(c)
}
