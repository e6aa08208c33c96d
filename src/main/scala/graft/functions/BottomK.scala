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

/** [[BottomKLong]] for strings: the k lexicographically-smallest DISTINCT
  * values per group, sorted ascending. Exists for fingerprints expressed
  * as fixed-width hex (md5) — lexicographic order IS numeric order there,
  * and staying in hex keeps the value reproducible by any engine
  * (DuckDB's md5 returns the identical hex text, where xxhash64 is
  * Spark-private). Same k-bounded ObjectHashAggregate buffer. */
case class BottomKString(k: Int)
    extends Aggregator[String, Array[String], Array[String]] {
  override def zero: Array[String] = Array.empty

  override def reduce(buf: Array[String], x: String): Array[String] =
    if (x == null || java.util.Arrays.binarySearch(
        buf.asInstanceOf[Array[AnyRef]], x) >= 0) buf
    else if (buf.length < k) {
      val out = java.util.Arrays.copyOf(buf, buf.length + 1)
      out(buf.length) = x
      java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]])
      out
    } else if (x < buf(k - 1)) {
      val out = buf.clone()
      out(k - 1) = x
      java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]])
      out
    } else buf

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    val all = (a ++ b).distinct
    java.util.Arrays.sort(all.asInstanceOf[Array[AnyRef]])
    all.take(k)
  }

  override def finish(buf: Array[String]): Array[String] = buf

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}

/** A (score, id) candidate for [[TopKScored]]. */
case class ScoredId(score: Double, id: Long)

/** The k BEST (score desc, id asc — row_number tie-break) candidates per
  * group, returned best-first. The top-k-per-key aggregate that replaces
  * the Window+row_number formulation: a window sorts EVERY candidate row
  * inside each key's partition (and shuffles them all to get there),
  * where this k-bounded buffer aggregates partially map-side, so only
  * k rows per (key × partition) ever reach the shuffle — the difference
  * between shuffling |corpus|·|queries| rows and |queries|·k at ANN
  * scale. */
case class TopKScored(k: Int)
    extends Aggregator[ScoredId, Array[ScoredId], Array[ScoredId]] {
  // java.lang.Double.compare, not `>`: primitive comparison is not a
  // strict weak ordering when a score is NaN (NaN compares unordered
  // against everything), and sortWith/TimSort throws "Comparison method
  // violates its general contract" on such inputs. Double.compare is the
  // same total order Spark's own sorts use (NaN greatest, -0.0 < 0.0).
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Array[ScoredId] = Array.empty

  override def reduce(buf: Array[ScoredId], x: ScoredId): Array[ScoredId] =
    if (buf.length < k) {
      val out = java.util.Arrays.copyOf(buf, buf.length + 1)
      out(buf.length) = x
      out.sortWith(better)
    } else if (better(x, buf(k - 1))) {
      val out = buf.clone()
      out(k - 1) = x
      out.sortWith(better)
    } else buf

  override def merge(a: Array[ScoredId], b: Array[ScoredId]): Array[ScoredId] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Array[ScoredId]): Array[ScoredId] = buf

  override def bufferEncoder: Encoder[Array[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredId]]()
  override def outputEncoder: Encoder[Array[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredId]]()
}

object BottomK {
  /** Column function: k smallest values of `c` per group, sorted. */
  def bottomK(c: Column, k: Int): Column = udaf(BottomKLong(k)).apply(c)

  /** k lexicographically-smallest distinct strings per group, sorted. */
  def bottomKString(c: Column, k: Int): Column =
    udaf(BottomKString(k)).apply(c)

  /** k best (score desc, id asc) pairs per group, best-first, as
    * `array<struct<score,id>>`. */
  def topKScored(score: Column, id: Column, k: Int): Column =
    udaf(TopKScored(k)).apply(score, id)
}
