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
        .orderBy("win_start", "event_type")),

    // st1 ACTUALLY STREAMED: the same tumbling aggregation through a
    // two-epoch MemoryStream into a complete-mode memory sink — window
    // state must carry across micro-batches to reproduce the batch
    // result, and the SAME oracle gates both forms. (The fixture
    // collect is bounded by the gate's events table; production streams
    // never pass through the driver.)
    "st1b_stream_tumbling" -> ((s, d) => {
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = events(s, d)
        .select(col("ts"), col("event_type"), col("value"))
        .as[(java.sql.Timestamp, String, Double)].collect().toSeq
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, String, Double)]
      val sink = s"st1b_sink_${StreamSinkSeq.incrementAndGet()}"
      val q = mem.toDF().toDF("ts", "event_type", "value")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try {
        val (h1, h2) = rows.splitAt(rows.length / 2)
        mem.addData(h1: _*)
        q.processAllAvailable() // epoch 0: partial windows
        mem.addData(h2: _*)
        q.processAllAvailable() // epoch 1: state completes the windows
      } finally q.stop()
      s.table(sink).orderBy("win_start", "event_type")
    })
  )

  /** Unique memory-sink names: the same query re-runs within one JVM
    * (bench medians, verify), and an active-name collision would fail
    * the second start. */
  private val StreamSinkSeq = new java.util.concurrent.atomic.AtomicLong(0)

  val oracle: Map[String, String] = Map(
    "st1b_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
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
