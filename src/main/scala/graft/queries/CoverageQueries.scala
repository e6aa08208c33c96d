package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.transform.Transforms

/** Remaining SURVEY.md §2 inventory rows as registered queries: A8
  * summary() stats, F2 phone normalization, F7 Vietnamese price-string
  * parsing (both over deterministically synthesized strings — the
  * testdata has no phone/price-string columns), and the documented
  * scalable alternate to exact distinct (approx_count_distinct, §7.5). */
object CoverageQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A8: summary() descriptive stats (string-typed output; rows-only —
    // engine-specific float formatting isn't oracle-comparable).
    "a8_summary_stats" -> ((s, d) =>
      orders(s, d).select("o_totalprice")
        .summary("count", "mean", "stddev", "min", "max")),

    // F2: phone normalization over synthesized noisy strings.
    "f2_phone_norm" -> ((s, d) => {
      val raw = events(s, d)
        .select(col("event_id"),
          concat(lit("(0"), col("user_id").cast("string"), lit(") "),
            col("event_id").cast("string")).as("phone"))
      Transforms.standardizePhoneNumbers(raw, "phone")
        .orderBy("event_id")
    }),

    // F7: Vietnamese price-string parser over synthesized unit strings.
    "f7_price_parse" -> ((s, d) => {
      val withStr = orders(s, d)
        .select(col("o_orderkey"),
          concat((col("o_orderkey") % 999).cast("string"),
            when(col("o_orderkey") % 3 === 0, lit(" tỷ"))
              .when(col("o_orderkey") % 3 === 1, lit(" triệu"))
              .otherwise(lit(" nghìn"))).as("p"))
      Transforms.parsePriceStrings(withStr, "p")
        .select("o_orderkey", "p", "price_unit")
        .orderBy("o_orderkey")
    }),

    // §7.5 scalable alternate: sketch-based distinct (rows-only — HLL
    // implementations differ across engines by design).
    "a11_approx_distinct" -> ((s, d) =>
      lineitem(s, d).agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders")))
  )

  val oracle: Map[String, String] = Map(
    "f2_phone_norm" ->
      """WITH digits AS (
        |  SELECT event_id,
        |    REGEXP_REPLACE('(0' || CAST(user_id AS VARCHAR) || ') ' || CAST(event_id AS VARCHAR),
        |      '[^0-9]', '', 'g') AS dg
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN regexp_matches(dg, '^0[0-9]{9,10}$') THEN dg ELSE '' END AS phone
        |FROM digits ORDER BY event_id""".stripMargin,
    "f7_price_parse" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderkey % 999 AS VARCHAR) AS DOUBLE) *
        |    CASE WHEN o_orderkey % 3 = 0 THEN 1000000000.0
        |         WHEN o_orderkey % 3 = 1 THEN 1000000.0
        |         ELSE 1000.0 END AS p,
        |  'VND' AS price_unit
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
