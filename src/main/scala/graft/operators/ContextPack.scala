package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style concat-then-chunk CONTEXT PACKING: the corpus's documents
  * are concatenated in one deterministic order (ascending `idCol`) into
  * a single token stream, and the stream is cut into fixed
  * `window`-token training contexts. This is the other half of the
  * shard story next to [[BudgetSelect]]/cp4: shard packing bounds
  * FILES, context packing places every document's tokens into the
  * training examples a loader will actually emit — which contexts a
  * document occupies, and how many boundaries it straddles, is what a
  * data-mix auditor needs (attribution, contamination windows, loss
  * masking at document joins).
  *
  * The semantics are a running token sum over ONE global order — the
  * same single-window trap BudgetSelect documents: a naive
  * `sum(w).over(Window.orderBy(id))` plans an Exchange SinglePartition
  * (one task holds the corpus). The same distributed two-phase prefix
  * sum is used instead: coarse monotone buckets over the id RANGE,
  * per-bucket running sums in parallel, and a ≤`buckets`-row totals
  * aggregate folded into literal offsets. All arithmetic is exact
  * integer (token counts are integral, enforced loudly), so placements
  * are independent of partitioning and engine — DuckDB replays them
  * bit-for-bit.
  *
  * Contract: `idCol` unique and orderable, `tokenCol` an integral type
  * with POSITIVE values (a zero-token document occupies no window; drop
  * such rows upstream — the placement formulas below assume the row
  * contributes at least one token).
  */
object ContextPack {

  /** Per-document placement map: the input plus
    * `cum_tokens` (running total INCLUDING the row), `first_window`,
    * `last_window`, `n_windows` (0-based window ids of `window` tokens
    * each). */
  def placements(docs: DataFrame, idCol: String, tokenCol: String,
                 window: Long, buckets: Int = 64): DataFrame = {
    require(window > 0, s"window=$window must be positive")
    require(buckets > 0, s"buckets=$buckets must be positive")
    docs.schema.find(_.name == tokenCol).map(_.dataType).foreach {
      case org.apache.spark.sql.types.ByteType
           | org.apache.spark.sql.types.ShortType
           | org.apache.spark.sql.types.IntegerType
           | org.apache.spark.sql.types.LongType => ()
      case t => throw new IllegalArgumentException(
        s"ContextPack.placements: token column '$tokenCol' must be an " +
          s"integral type (exact prefix sums), got ${t.sql}")
    }
    // the bucket bounds below cast idCol to double — valid ONLY for
    // types whose natural order survives that cast. A string id that
    // casts numerically ('10' < '9' as numbers, not as strings) would
    // make bucket order disagree with the window's global order and
    // silently break the prefix-sum property; ids casting to null would
    // all collapse into bucket 0. Refuse loudly instead.
    docs.schema.find(_.name == idCol).map(_.dataType).foreach {
      case _: org.apache.spark.sql.types.NumericType
           | org.apache.spark.sql.types.TimestampType
           | org.apache.spark.sql.types.TimestampNTZType => ()
      case t => throw new IllegalArgumentException(
        s"ContextPack.placements: id column '$idCol' must be numeric or " +
          s"timestamp (bucket bounds are computed on the double cast, " +
          s"whose order must match the column's own; dates don't cast " +
          s"to double at all), got ${t.sql}")
    }
    // monotone ASC id -> ASC bucket id over the observed range (the
    // BudgetSelect shape with the order flipped): bucket order is a
    // prefix of the global order, computed from a 2-row agg
    val Array(lo, hi) = docs
      .agg(min(col(idCol)).cast("double"), max(col(idCol)).cast("double"))
      .head().toSeq.map(v => Option(v).map(_.asInstanceOf[Double]).getOrElse(0.0))
      .toArray
    val span = math.max(hi - lo, 1e-12)
    val bucket = greatest(lit(0), least(lit(buckets - 1),
      floor((col(idCol).cast("double") - lit(lo)) / lit(span) * buckets)))
      .cast("int")
    val b = docs.withColumn("__bucket", bucket)
    val w = Window.partitionBy("__bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = b.withColumn("__cum_in",
      sum(col(tokenCol).cast("long")).over(w))
    val totals = b.groupBy("__bucket")
      .agg(sum(col(tokenCol).cast("long")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (bk, t)) => (bk, acc + t)
    }.sliding(2).collect { case Array((_, acc), (bk, _)) => bk -> acc }.toMap
    val offsetCol = totals.map(_._1).foldRight(lit(0L): Column) {
      case (bk, els) =>
        when(col("__bucket") === bk, lit(offsets(bk))).otherwise(els)
    }
    val cum = offsetCol + col("__cum_in")
    withCum
      .withColumn("cum_tokens", cum)
      .withColumn("first_window",
        expr(s"(cum_tokens - $tokenCol) div ${window}L"))
      .withColumn("last_window", expr(s"(cum_tokens - 1) div ${window}L"))
      .withColumn("n_windows",
        col("last_window") - col("first_window") + lit(1L))
      .drop("__bucket", "__cum_in")
  }
}
