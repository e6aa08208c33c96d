package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Event-time windowed aggregations over the events table — the batch
  * equivalents of the StreamingOps windows (same `window()` operator
  * Catalyst uses under a watermark), registered so the capability is
  * oracle-checked. */
object WindowedAggQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // tumbling 1h windows: count + exact decimal sum per (window, type)
    "st1_tumbling_window" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy("win_start", "event_type")),

    // sliding 2h windows every 1h: each event lands in two windows
    "st2_sliding_window" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"))
        .orderBy("win_start", "event_type"))
  )

  val oracle: Map[String, String] = Map(
    "st1_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "st2_sliding_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) - o.i * INTERVAL '1 hour' AS win_start,
        |  event_type, COUNT(*) AS n
        |FROM events CROSS JOIN UNNEST([0, 1]) AS o(i)
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin
  )
}
