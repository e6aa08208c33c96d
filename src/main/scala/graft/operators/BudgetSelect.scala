package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy budgeted selection — "admit the best documents until the
  * token budget is spent", the curation step that turns a scored corpus
  * into a training set of a target size (quality-ranked token budgets
  * are how LLM corpora are actually cut: rank by quality, keep the top
  * B tokens).
  *
  * The semantics are a running sum over ONE global order
  * (`score desc, id asc`) — but a naive
  * `sum(w).over(Window.orderBy(...))` collapses the whole corpus into a
  * single window partition (Spark plans an Exchange SinglePartition: one
  * task holds 100 TB). This implements the distributed two-phase
  * prefix-sum instead:
  *
  *   1. coarse bucket = a monotone function of the score (same score →
  *      same bucket, better score → lower bucket id), so bucket order is
  *      a PREFIX of the global order;
  *   2. per-bucket running sums — `Window.partitionBy(bucket)`, parallel
  *      across buckets, each task holding one bucket;
  *   3. bucket OFFSETS — a bucket-count-sized aggregate (≤ `buckets`
  *      rows) collected to the driver and broadcast back as a literal
  *      CASE map: offset(b) = Σ totals of all better buckets.
  *
  * `global_cum(row) = offset(bucket) + cum_within(row)` — exactly the
  * single-window running sum, with the only serial step a ≤`buckets`-row
  * cumulative on the driver. A document is admitted iff the budget was
  * not exhausted before it: `global_cum - w < budget` (the first
  * over-budget document still admits — standard greedy fill; pass the
  * budget you mean).
  *
  * Scale note: bucket count bounds driver state (default 64) and skew —
  * a degenerate score distribution (all docs one score) degrades to one
  * busy bucket, which is the true serial residue of a total-order spec;
  * a finer `scoreToBucket` restores parallelism whenever scores vary.
  */
object BudgetSelect {
  /** `docs` must carry `idCol` (unique), `scoreCol` (higher = better),
    * `weightCol` (cost per row, e.g. token count — INTEGRAL type
    * required, enforced loudly below: the prefix sums are exact-integer
    * arithmetic, and a double weight would both lose exactness and
    * surface as a ClassCastException deep in the totals read; round or
    * scale fractional costs to integers first, the sm9 micro-nat move).
    * Returns the input plus `cum_<weightCol>` (the global running sum
    * INCLUDING the row) and `admitted`.
    *
    * PRECONDITION: `docs` must be deterministic across re-evaluation
    * (any parquet/table read or checkpointed frame is; a rand()-derived
    * score is not) — the range probe, the bucket totals, and the window
    * job each evaluate it, and exactness requires all three to see the
    * same rows, the same requirement every multi-action Spark
    * computation carries. The bucket expression is clamped into
    * [0, buckets-1] so float-edge scores can never fall outside the
    * offset map. */
  def greedy(docs: DataFrame, idCol: String, scoreCol: String,
             weightCol: String, budget: Column,
             buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    docs.schema.find(_.name == weightCol).map(_.dataType).foreach {
      case org.apache.spark.sql.types.ByteType
           | org.apache.spark.sql.types.ShortType
           | org.apache.spark.sql.types.IntegerType
           | org.apache.spark.sql.types.LongType => ()
      case t => throw new IllegalArgumentException(
        s"BudgetSelect.greedy: weight column '$weightCol' must be an " +
          s"integral type (exact prefix sums), got ${t.sql} — round or " +
          "scale fractional costs to integers first")
    }
    // monotone DESC score -> ASC bucket id over the observed range;
    // computed from a 2-row agg (min/max), not a per-row collect
    val Array(lo, hi) = docs
      .agg(min(col(scoreCol)).cast("double"), max(col(scoreCol)).cast("double"))
      .head().toSeq.map(v => Option(v).map(_.asInstanceOf[Double]).getOrElse(0.0))
      .toArray
    val span = math.max(hi - lo, 1e-12)
    val bucket = greatest(lit(0), least(lit(buckets - 1),
      floor((lit(hi) - col(scoreCol).cast("double")) / lit(span) * buckets)))
      .cast("int")
    val b = docs.withColumn("__bucket", bucket)
    // phase 2: per-bucket running sums (parallel across buckets)
    val w = Window.partitionBy("__bucket")
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = b.withColumn("__cum_in", sum(col(weightCol)).over(w))
    // phase 3: ≤`buckets` totals -> driver cumsum -> literal offsets
    val totals = b.groupBy("__bucket")
      .agg(sum(col(weightCol)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (bk, t)) => (bk, acc + t)
    }.sliding(2).collect { case Array((_, acc), (bk, _)) => bk -> acc }.toMap
    val offsetCol = totals.map(_._1).foldRight(lit(0L): Column) {
      case (bk, els) => when(col("__bucket") === bk, lit(offsets(bk))).otherwise(els)
    }
    withCum
      .withColumn(s"cum_$weightCol", offsetCol + col("__cum_in"))
      .withColumn("admitted",
        col(s"cum_$weightCol") - col(weightCol) < budget)
      .drop("__bucket", "__cum_in")
  }
}
