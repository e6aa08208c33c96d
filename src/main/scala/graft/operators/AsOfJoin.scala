package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, attach the payload of the
  * latest right row with the same key and `rightTime <= leftTime`.
  *
  * The reference pipeline has no as-of join (SURVEY.md §2.3 — equi-joins
  * only); this is a capability extension for event/dimension alignment
  * (e.g. "most recent order state at event time").
  *
  * Implementation is the scalable union+window pattern rather than an
  * inequality join: a `left.join(right, key && rightTime <= leftTime)`
  * expands to |left keys| × |right versions per key| intermediate rows
  * before picking the max — quadratic per key, and Catalyst can only
  * plan it as a (broadcast) nested-loop join. Instead we union both
  * sides, single-shuffle by key, sort within partition by (time, side),
  * and carry the last non-null right payload forward with
  * `last(_, ignoreNulls).over(rowsBetween(unboundedPreceding, current))`.
  * One shuffle, linear work, no row explosion — this survives a 100 TB
  * left side as long as a single key's history fits a partition (salt
  * the key upstream if a key is hot).
  *
  * Ties: right rows sort before left rows at equal timestamps, so the
  * join is inclusive (`rightTime <= leftTime`). Callers must pre-dedupe
  * the right side to one row per (key, time) — among exact duplicates
  * the surviving payload would otherwise be nondeterministic. Null keys
  * on either side are grouped together by the window (unlike an equality
  * join, which would never match them); filter them out first if that
  * matters.
  */
object AsOfJoin {
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val collisions = payloadCols.toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"payload columns ${collisions.mkString(", ")} also exist on the left " +
        "side — the output would have ambiguous duplicate names; rename " +
        "one side first")
    // a null rightTime can never satisfy `rightTime <= leftTime` in the
    // inequality-join semantics being emulated — but ascending
    // nulls-FIRST ordering would sort such a row before every real one
    // and attach its payload to early left rows; drop them up front
    val r = right.filter(col(rightTime).isNotNull).select(
      col(rightKey).as("__k"),
      col(rightTime).as("__t"),
      struct(payloadCols.map(col): _*).as("__p"),
      lit(0).as("__side"))
    val l = left.select(
      col(leftKey).as("__k"),
      col(leftTime).as("__t"),
      lit(null).cast(r.schema("__p").dataType).as("__p"),
      lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__row"))
    val unioned = r
      .withColumn("__row", lit(null).cast(l.schema("__row").dataType))
      .unionByName(l)
    val w = Window
      .partitionBy("__k")
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) ++
        payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
