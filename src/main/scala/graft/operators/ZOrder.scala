package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** True multi-dimensional clustering for OPTIMIZE (the reference's
  * `OPTIMIZE ... ZORDER BY` analogue, silver Delta maintenance): rows are
  * laid out along a Z-order (Morton) curve over the cluster columns, so
  * EVERY clustered column gets tight per-file min/max ranges and scans
  * filtered on any of them prune files. A linear composite sort gives
  * its leading column perfect clustering and the trailing columns none —
  * `Scd2.optimize` keeps that layout for its lead-column use case;
  * this is the layout for multi-column point/range lookups.
  *
  * Spark-first shape, no custom expression needed: the bit interleave is
  * a fold of built-in `shiftright/bitwiseAND/shiftleft/bitwiseOR`
  * columns (whole-stage codegen'd), the per-column normalization uses
  * one global min/max aggregate (a 1-row driver stat, the
  * SilverEtl/p8 pattern — never a per-row collect), and the layout step
  * is `repartitionByRange` on the z-value + an intra-partition sort.
  * At 100 TB: one pass for stats, one range shuffle, no skew (the
  * z-value is near-uniform when the inputs vary), and file count is
  * explicit.
  */
object ZOrder {

  /** Morton z-value over `buckets` (each an int column in
    * [0, 2^bitsPer)): bit i of bucket c lands at position i*n + c. */
  def interleave(buckets: Seq[Column], bitsPer: Int): Column = {
    require(buckets.nonEmpty, "interleave needs at least one column")
    require(bitsPer * buckets.size <= 63,
      s"z-value overflow: $bitsPer bits x ${buckets.size} cols > 63")
    val n = buckets.size
    val terms = for {
      i <- 0 until bitsPer
      (b, c) <- buckets.zipWithIndex
    } yield shiftleft(
      shiftright(b, i).bitwiseAND(lit(1)).cast("long"), i * n + c)
    terms.reduce(_ bitwiseOR _)
  }

  /** Bucketize + interleave: normalizes each (numeric) column to
    * [0, 2^bitsPer) against its GLOBAL min/max — one 1-row aggregate —
    * and returns `df` with the `_z` column appended. Null inputs yield a
    * null `_z` (those rows cluster together at the range boundary). */
  def withZValue(df: DataFrame, zCols: Seq[Column],
                 zName: String = "_z"): DataFrame = {
    val bitsPer = math.min(16, 63 / zCols.size)
    val width = (1L << bitsPer) - 1
    val stats = df.agg(
      zCols.flatMap(c => Seq(min(c.cast("double")), max(c.cast("double")))).head,
      zCols.flatMap(c => Seq(min(c.cast("double")), max(c.cast("double")))).tail: _*)
      .head()
    val buckets = zCols.zipWithIndex.map { case (c, idx) =>
      // an EMPTY frame (or an all-null column) has null min/max — a
      // maintenance OPTIMIZE on an empty snapshot must degrade to a
      // constant bucket (null _z sorts together), not NPE mid-commit
      val mn =
        if (stats.isNullAt(2 * idx)) 0.0 else stats.getDouble(2 * idx)
      val mx =
        if (stats.isNullAt(2 * idx + 1)) mn else stats.getDouble(2 * idx + 1)
      val span = math.max(mx - mn, Double.MinPositiveValue)
      least(greatest(
        floor((c.cast("double") - lit(mn)) / lit(span) * lit(width.toDouble)),
        lit(0L)), lit(width)).cast("int")
    }
    require(!df.columns.contains(zName),
      s"ZOrder.withZValue: the frame already has a column named " +
        s"'$zName' — clustering would overwrite and then DROP it; pass " +
        "a different zName")
    df.withColumn(zName, interleave(buckets, bitsPer))
  }

  /** Z-order the table's row layout: range-partition on the z-value into
    * `numFiles` output partitions, sort within each, drop the helper
    * column (a projection — intra-partition order survives). The helper
    * name is made collision-proof against the frame's own columns (a
    * layout-only operation must never eat a user column named `_z`). */
  def cluster(df: DataFrame, zCols: Seq[Column], numFiles: Int): DataFrame = {
    val zName = Iterator.from(0).map(i => if (i == 0) "_z" else s"_z$i")
      .find(n => !df.columns.contains(n)).get
    withZValue(df, zCols, zName)
      .repartitionByRange(numFiles, col(zName))
      .sortWithinPartitions(zName)
      .drop(zName)
  }
}
