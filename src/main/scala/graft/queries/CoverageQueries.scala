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
    // A8: summary() descriptive stats. summary() emits strings; cast back
    // to double and round so the DuckDB oracle can hash-compare. mean and
    // stddev are summation-order-sensitive (different partial-sum trees
    // can flip the 2nd decimal near a .005 boundary), so they get a
    // coarser 1-decimal round; count/min/max are exact and keep 2.
    "a8_summary_stats" -> ((s, d) =>
      orders(s, d).select("o_totalprice")
        .summary("count", "mean", "stddev", "min", "max")
        .select(col("summary"),
          when(col("summary").isin("mean", "stddev"),
            round(col("o_totalprice").cast("double"), 1))
            .otherwise(round(col("o_totalprice").cast("double"), 2))
            .as("o_totalprice"))
        .orderBy("summary")),

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

    // §7.5 scalable alternate: sketch-based distinct. The sketch estimate
    // itself is engine-private (HLL implementations differ by design), so
    // the QUERY gates it: it also computes the exact counts and emits
    // booleans asserting the estimate landed within 5× the requested 1%
    // rsd — which DuckDB CAN oracle (exact counts + literal TRUE). A
    // drifting sketch flips a boolean and hash-mismatches. (The exact
    // side exists for the gate only; production use is the sketch alone.)
    "a11_approx_distinct" -> ((s, d) =>
      lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
        .select(col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("parts_within_5pct"),
          (abs(col("ao") - col("exact_orders")) <=
            col("exact_orders") * 0.05).as("orders_within_5pct"))),

    // A14: MERGEABLE distinct sketches — per-group Datasketches HLL built
    // once, then unioned for the global estimate without re-scanning the
    // data. The 100 TB shape: persist per-partition sketches and merge
    // across days/partitions incrementally. Oracled via the a11 pattern:
    // the sketch binary/estimate is engine-specific, so the row carries
    // the EXACT distinct count (cross-engine-gated) plus a boolean
    // asserting the HLL estimate — including the merged one, which is
    // what proves union-mergeability — lands within 5% of it (default
    // lgConfigK=12 → σ ≈ 1.6%; 5% ≈ 3σ). A sketch or merge regression
    // flips the boolean and hash-mismatches. The global exact is one
    // 1-row driver pull re-injected as a literal (the tx14 stats shape —
    // no crossJoin, no whitelist entry).
    "a14_hll_sketch_merge" -> ((s, d) => {
      val sk = orders(s, d).groupBy("o_orderpriority")
        .agg(expr("hll_sketch_agg(o_custkey)").as("sk"),
          countDistinct(col("o_custkey")).as("n_exact"))
      val per = sk.select(col("o_orderpriority").as("scope"), col("n_exact"),
        expr("hll_sketch_estimate(sk)").as("est"))
      val globalExact = orders(s, d)
        .agg(countDistinct(col("o_custkey"))).head().getLong(0)
      val merged = sk
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        .select(lit("ALL_MERGED").as("scope"),
          lit(globalExact).as("n_exact"), col("est"))
      per.unionByName(merged)
        .select(col("scope"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("est_within_5pct"))
        .orderBy("scope")
    }),

    // F3: email normalization (lower+trim, anchored-regex validate else "")
    // over synthesized valid/invalid/null branches.
    "f3_email_norm" -> ((s, d) => {
      val raw = customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0,
          concat(lit("User_"), col("c_custkey").cast("string"),
            lit("@Example.COM ")))
          .when(col("c_custkey") % 3 === 1, lit("bad email@x"))
          .otherwise(lit(null).cast("string")).as("email"))
      Transforms.standardizeEmails(raw, "email").orderBy("c_custkey")
    }),

    // J6 (capability): full outer join keeps unmatched rows of BOTH sides.
    "j6_full_outer" -> ((s, d) => {
      val bigCnt = orders(s, d).filter(col("o_totalprice") > 450000)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
      customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_mktsegment")
        .join(bigCnt, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_mktsegment"), col("n_big"))
        .orderBy("custkey")
    }),

    // D9 (capability): calendar arithmetic — month truncation, clamped
    // month addition, day diffs, end-of-month.
    "d9_date_arith" -> ((s, d) =>
      orders(s, d).select(col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        add_months(to_date(col("o_orderdate")), 3).as("plus3m"),
        datediff(lit("1998-12-31").cast("date"), to_date(col("o_orderdate")))
          .as("days_to_end"),
        last_day(to_date(col("o_orderdate"))).as("eom"))
        .orderBy("o_orderkey")),

    // W7 (capability): forward-fill — last non-null carried forward per
    // user in event-time order; the gap-fill primitive feature pipelines
    // lean on (nulls synthesized on every 5th event).
    "w7_fill_forward" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Long.MinValue, 0)
      events(s, d)
        .withColumn("v", when(col("event_id") % 5 === 0,
          lit(null).cast("double")).otherwise(col("value")))
        .select(col("event_id"),
          last(col("v"), ignoreNulls = true).over(w).as("filled"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "a14_hll_sketch_merge" ->
      """SELECT scope, n_exact, TRUE AS est_within_5pct FROM (
        |  SELECT o_orderpriority AS scope,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
        |  FROM orders GROUP BY 1
        |  UNION ALL
        |  SELECT 'ALL_MERGED', CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
        |  FROM orders)
        |ORDER BY scope""".stripMargin,
    "a11_approx_distinct" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  TRUE AS parts_within_5pct, TRUE AS orders_within_5pct
        |FROM lineitem""".stripMargin,
    "a8_summary_stats" ->
      """WITH s AS (
        |  SELECT 'count' AS summary, CAST(COUNT(o_totalprice) AS DOUBLE) AS v FROM orders
        |  UNION ALL SELECT 'mean', ROUND(AVG(o_totalprice), 1) FROM orders
        |  UNION ALL SELECT 'stddev', ROUND(stddev_samp(o_totalprice), 1) FROM orders
        |  UNION ALL SELECT 'min', ROUND(MIN(o_totalprice), 2) FROM orders
        |  UNION ALL SELECT 'max', ROUND(MAX(o_totalprice), 2) FROM orders)
        |SELECT summary, v AS o_totalprice FROM s ORDER BY summary""".stripMargin,
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
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f3_email_norm" ->
      """WITH raw AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0
        |           THEN 'User_' || CAST(c_custkey AS VARCHAR) || '@Example.COM '
        |         WHEN c_custkey % 3 = 1 THEN 'bad email@x'
        |    END AS email
        |  FROM customer),
        |lowered AS (
        |  SELECT c_custkey,
        |    CASE WHEN email IS NOT NULL THEN lower(trim(email)) ELSE '' END AS email
        |  FROM raw)
        |SELECT c_custkey,
        |  CASE WHEN regexp_matches(email,
        |         '^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$')
        |       THEN email ELSE '' END AS email
        |FROM lowered ORDER BY c_custkey""".stripMargin,
    "j6_full_outer" ->
      """WITH big AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big
        |  FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey)
        |SELECT COALESCE(c.c_custkey, big.o_custkey) AS custkey,
        |  c.c_mktsegment, big.n_big
        |FROM (SELECT c_custkey, c_mktsegment FROM customer
        |      WHERE c_mktsegment = 'BUILDING') c
        |FULL JOIN big ON c.c_custkey = big.o_custkey
        |ORDER BY custkey""".stripMargin,
    "d9_date_arith" ->
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
        |    AS INTEGER) AS days_to_end,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "w7_fill_forward" ->
      """SELECT event_id,
        |  last_value(CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END
        |    IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin
  )
}
