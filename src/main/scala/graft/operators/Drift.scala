package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-drift monitors over fixed-width histograms: Population
  * Stability Index and a binned two-sample Kolmogorov–Smirnov statistic.
  * The shape both share: ONE conditional-aggregation scan reduces the
  * corpus to ≤ `bins` rows, and every subsequent window runs over that
  * bounded frame — no data-dependent quantile edges (whose last-ulp
  * interpolation differences across engines/runs would flip bin
  * membership), no global sort over raw rows (what exact KS needs).
  * Fixed bins are also what a production monitor pins so day-over-day
  * values stay comparable.
  *
  * Used by `qc2_drift_psi` / `qc3_ks_drift` (DuckDB-oracled end-to-end)
  * and driven directly by DriftSpec on synthetic fixtures.
  */
object Drift {

  /** Histogram of `valueCol` into `bins` fixed-width buckets split by
    * boolean `isRefCol`: one row per non-empty bin with reference and
    * current counts. The only full-width pass. */
  def histogram(df: DataFrame, valueCol: String, isRefCol: String,
      width: Double, bins: Int): DataFrame =
    // NULL metric values are excluded, not binned: Spark's least() skips
    // nulls, so least(floor(NULL/w), bins-1) would silently land every
    // NULL in the TOP bin and fabricate drift there. Null-rate monitoring
    // is its own check (qc1's battery), not a histogram artifact.
    df.filter(col(valueCol).isNotNull)
      .groupBy(least(floor(col(valueCol) / width), lit(bins - 1.0))
        .cast("int").as("bin"))
      .agg(sum(when(col(isRefCol), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col(isRefCol), 1L).otherwise(0L)).as("n_cur"))

  /** PSI rows: (bin, n_ref, n_cur, psi_term, psi_total), ordered by bin.
    * Each term is (p−q)·ln(p/q) with p/q floored at 1e-6 (Laplace) so an
    * empty side yields a large finite term, not ln(0). Terms are
    * individually non-negative — (p−q) and ln(p/q) always share sign —
    * so psi_total ≥ 0 with equality iff the binned distributions match. */
  def psi(df: DataFrame, valueCol: String, isRefCol: String,
      width: Double, bins: Int): DataFrame = {
    val wAll = Window.partitionBy()
    // greatest(total, 1) denominators: with an entirely-empty side the
    // ratio would be 0/0 = NaN, and greatest() treats NaN as the largest
    // double so the 1e-6 floor would never engage — every term NaN and a
    // NaN > threshold comparison silently false. 0/1 = 0 floors to 1e-6
    // and yields the documented large finite term instead.
    histogram(df, valueCol, isRefCol, width, bins)
      .withColumn("p", greatest(col("n_ref").cast("double") /
        greatest(sum(col("n_ref")).over(wAll), lit(1L)), lit(1e-6)))
      .withColumn("q", greatest(col("n_cur").cast("double") /
        greatest(sum(col("n_cur")).over(wAll), lit(1L)), lit(1e-6)))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("term"), 6).as("psi_term"),
        round(sum(col("term")).over(wAll), 4).as("psi_total"))
      .orderBy("bin")
  }

  /** One row (n_ref, n_cur, ks_d): the binned-ECDF KS statistic
    * D = max |F_ref − F_cur| at bin edges. D_binned ≤ D_exact, equal
    * when an edge straddles the supremum; cumulative fractions are exact
    * integer ratios, so any engine derives identical doubles. */
  def ksBinned(df: DataFrame, valueCol: String, isRefCol: String,
      width: Double, bins: Int): DataFrame = {
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    histogram(df, valueCol, isRefCol, width, bins)
      .withColumn("cr", sum(col("n_ref")).over(wCum))
      .withColumn("cc", sum(col("n_cur")).over(wCum))
      .withColumn("tr", sum(col("n_ref")).over(wAll))
      .withColumn("tc", sum(col("n_cur")).over(wAll))
      // greatest(total, 1): an empty side's ECDF reads 0 everywhere
      // (D = sup of the other side's ECDF) instead of 0/0 = NaN
      .agg(max(col("tr")).as("n_ref"), max(col("tc")).as("n_cur"),
        round(max(abs(
          col("cr").cast("double") / greatest(col("tr"), lit(1L)) -
            col("cc").cast("double") / greatest(col("tc"), lit(1L)))), 6)
          .as("ks_d"))
  }
}
