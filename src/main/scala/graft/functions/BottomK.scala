package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator: the k smallest DISTINCT Long values per group,
  * returned sorted ascending — the order-statistic aggregate Spark lacks
  * (min/max only go to k=1; the window row_number() formulation sorts
  * every row in the partition first). Distinctness in the k-bounded
  * buffer lets callers feed raw (duplicated) streams — no
  * array_distinct materialization upstream.
  *
  * This is the custom-`Aggregator[IN, BUF, OUT]` capability from
  * SURVEY.md §7.3, used by the winnowing-fingerprint query: one
  * ObjectHashAggregate pass with a k-bounded buffer per group instead of
  * a full per-partition window sort — the shape that matters when a
  * group has millions of shingles.
  */
case class BottomKLong(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], x: Long): Array[Long] =
    if (java.util.Arrays.binarySearch(buf, x) >= 0) buf // already present
    else if (buf.length < k) {
      val out = java.util.Arrays.copyOf(buf, buf.length + 1)
      out(buf.length) = x
      java.util.Arrays.sort(out)
      out
    } else if (x < buf(k - 1)) {
      val out = buf.clone()
      out(k - 1) = x
      java.util.Arrays.sort(out)
      out
    } else buf

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val all = (a ++ b).distinct
    java.util.Arrays.sort(all)
    all.take(k)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BottomK {
  /** Column function: k smallest values of `c` per group, sorted. */
  def bottomK(c: Column, k: Int): Column = udaf(BottomKLong(k)).apply(c)
}
