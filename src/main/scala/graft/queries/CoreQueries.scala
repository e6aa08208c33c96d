package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Core relational operators (SURVEY.md §2.1–2.7) re-expressed over the
  * graft testdata, each paired with a DuckDB oracle (SparkEntry.oracleSql).
  *
  * Oracle-determinism rules used throughout:
  *  - every query ends in an ORDER BY over a unique key (driver compare is
  *    order-sensitive-safe either way);
  *  - SUMs over doubles go through a per-row cast to DECIMAL so the
  *    reduction is exact and associative (parallel reduction order then
  *    cannot change the result) and are cast back to DOUBLE at the end;
  *  - AVG/STDDEV/MEDIAN outputs are ROUND()ed (tiny fp-order noise «
  *    rounding granularity);
  *  - aliases match the oracle SQL exactly (driver hashes by column name).
  *
  * Reference shapes (public giabaovo/real-estate-data-pipeline, see
  * SURVEY.md for file:line): equality/compound/range filters
  * (silver_etl_script.py:167,533-568), 4σ outlier filter (:666-691),
  * groupBy aggs incl. median (data_enhancement.py:47-67), conditional
  * counts (data_quality_checks.py:28-43), row_number dedup
  * (silver_etl_script.py:646-652), broadcast dim joins
  * (gold_ml_etl.py:168-192, data_enhancement.py:70-80), anti join
  * (data_quality_checks.py:157-162), unionByName
  * (silver_etl_script.py:504-508).
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact, order-insensitive sum of a double column: per-row cast to
    * DECIMAL (exact, associative) summed, then back to DOUBLE. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // ---------------------------------------------------------------- scans
  val queries: Map[String, Q] = Map(
    // S1/P5: projected, filtered scan — predicate + column pruning reach parquet.
    "s1_scan_prune" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // P1: equality filter split (spider_name == s analog).
    "p1_filter_eq" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // P2: compound validity predicate (isNotNull ∧ length>0 ∧ range).
    "p2_compound_pred" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderstatus").isNotNull &&
          length(trim(col("o_orderpriority"))) > 0 &&
          col("o_totalprice") > 150000)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // P3: between-range predicate with ≠0 guard (lat/lon validation analog).
    "p3_between_range" -> ((s, d) =>
      events(s, d)
        .filter(col("value").between(50, 450) && col("value") =!= 0)
        .select("event_id", "value")
        .orderBy("event_id")),

    // P4: null-coalescing OR predicate ("has any price").
    "p4_any_signal" -> ((s, d) =>
      lineitem(s, d)
        .filter((col("l_discount").isNotNull && col("l_discount") > 0) ||
          (col("l_tax").isNotNull && col("l_tax") > 0))
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    // P8: 4σ outlier filter — single global agg broadcast back (no
    // driver-side collect, unlike the reference's per-column collect loop).
    "p8_outlier_4sigma" -> ((s, d) => {
      val o = orders(s, d)
      val stats = o.agg(
        avg(col("o_totalprice")).as("mu"),
        stddev_samp(col("o_totalprice")).as("sd"))
      o.crossJoin(broadcast(stats))
        .filter(abs((col("o_totalprice") - col("mu")) / col("sd")) < 4)
        .select("o_orderkey")
        .orderBy("o_orderkey")
    }),

    // ------------------------------------------------------------- aggs
    // Flagship: TPC-H Q1-shaped grouped aggregate (A1+A2+M3 shapes).
    "q1_agg" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 6))).cast("double").as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    // A1: group-by count distribution.
    "a1_count_by_group" -> ((s, d) =>
      orders(s, d).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")),

    // A2/A3: per-group median/avg/stddev/count (district price stats analog).
    "a2_group_median" -> ((s, d) =>
      orders(s, d).groupBy("o_orderpriority")
        .agg(
          round(median(col("o_totalprice")), 4).as("med_price"),
          round(avg(col("o_totalprice")), 4).as("avg_price"),
          round(stddev_samp(col("o_totalprice")), 4).as("sd_price"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")),

    // A4/A5: global scalar stats.
    "a4_global_stats" -> ((s, d) =>
      lineitem(s, d).agg(
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("cnt"))),

    // A6: exact distinct counts (uniqueness check).
    "a6_distinct_count" -> ((s, d) =>
      lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))),

    // A7: conditional aggregation in ONE pass (vs reference's
    // filter().count() pairs — single-scan at 100 TB).
    "a7_conditional_agg" -> ((s, d) =>
      lineitem(s, d).groupBy("l_returnflag")
        .agg(
          sum(when(col("l_quantity") >= 30, 1).otherwise(0)).as("heavy_cnt"),
          sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("disc_cnt"),
          count(lit(1)).as("total_cnt"))
        .orderBy("l_returnflag")),

    // A9: dropna completeness count (nulls synthesized via when()).
    "a9_dropna_complete" -> ((s, d) =>
      events(s, d)
        .withColumn("et",
          when(col("event_type") === "click", lit(null)).otherwise(col("event_type")))
        .na.drop(Seq("et", "value"))
        .agg(count(lit(1)).as("cnt"))),

    // A10: row-wise completeness score (horizontal fold of when()s).
    "a10_row_score" -> ((s, d) => {
      val inds = Seq(
        when(col("o_orderstatus").isNotNull && col("o_orderstatus") =!= "", 1).otherwise(0),
        when(col("o_orderpriority").isNotNull && col("o_orderpriority") =!= "", 1).otherwise(0),
        when(col("o_totalprice").isNotNull && col("o_totalprice") > 0, 1).otherwise(0))
      orders(s, d)
        .select(col("o_orderkey"),
          (inds.reduce(_ + _).cast("double") / lit(3.0)).as("completeness"))
        .orderBy("o_orderkey")
    }),

    // ---------------------------------------------------------- windows
    // W1: row_number dedup keep-latest (THE reference window op).
    "w1_dedup_latest" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_shipdate").desc, col("l_linenumber").desc)
      lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey")
    }),

    // W-ext: rank within group, top-10 per group.
    "w2_rank_topn" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 10)
        .select("o_orderpriority", "o_orderkey", "rnk")
        .orderBy("o_orderpriority", "rnk")
    }),

    // W-ext: lag delta per key.
    "w3_lag_delta" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      events(s, d)
        .select(col("user_id"), col("event_id"),
          round(col("value") - lag("value", 1).over(w), 6).as("delta"))
        .orderBy("user_id", "event_id")
    }),

    // W-ext: sliding-frame sum (exact via decimal — window-sum algorithms
    // differ between engines, decimal makes them agree bit-for-bit).
    "w4_rolling_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(-2, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          sum(col("value").cast(DecimalType(18, 6))).over(w)
            .cast("double").as("roll_sum"))
        .orderBy("user_id", "event_id")
    }),

    // ------------------------------------------------------ sort / topk
    // O1: order-by on agg result + limit → TakeOrderedAndProject.
    "o1_topk" -> ((s, d) =>
      orders(s, d).groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("o_orderpriority"))
        .limit(3)),

    // ------------------------------------------------------------ joins
    // J1: broadcast dim chain (city/code lookup analog) + grouped agg.
    "j1_broadcast_dim" -> ((s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy("r_name", "n_name")),

    // J2: two-key stats back-join (district stats onto facts analog).
    "j2_stats_backjoin" -> ((s, d) => {
      val li = lineitem(s, d)
      val st = li.groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
        .agg(avg(col("l_extendedprice")).as("avg_p"))
      li.join(broadcast(st),
          col("l_returnflag") === col("rf") && col("l_linestatus") === col("ls"))
        .filter(col("l_extendedprice") > col("avg_p"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_above"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // J4: left-anti join (referential-integrity orphans — orders with no lines).
    "j4_anti_join" -> ((s, d) =>
      orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select("o_orderkey")
        .orderBy("o_orderkey")),

    // J-ext: left-semi join (EXISTS).
    "j5_semi_join" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")),

    // --------------------------------------------------------- set ops
    // U1: unionByName with missing columns.
    "u1_union_by_name" -> ((s, d) => {
      val o = orders(s, d)
      val big = o.filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("amount"))
      val small = o.filter(col("o_totalprice") < 50000)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"))
      big.unionByName(small, allowMissingColumns = true).orderBy("k")
    }),

    // U-ext: intersect (distinct semantics).
    "u2_intersect" -> ((s, d) =>
      customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    // U-ext: except (distinct semantics) — orderkeys with no lineitems.
    "u3_except" -> ((s, d) =>
      orders(s, d).select(col("o_orderkey").as("k"))
        .except(lineitem(s, d).select(col("l_orderkey").as("k")))
        .orderBy("k")),

    // O2: global total-order sort, no limit — the plan must range-sample
    // the sort key and repartition by range (Exchange rangepartitioning)
    // so every partition holds a contiguous key span and partition files
    // concatenate into one sorted table; a single-partition sort would
    // serialize the whole table through one task at scale.
    "o2_global_sort" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")))
  )

  val oracle: Map[String, String] = Map(
    "s1_scan_prune" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-06-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p1_filter_eq" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p2_compound_pred" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderstatus IS NOT NULL
        |  AND LENGTH(TRIM(o_orderpriority)) > 0 AND o_totalprice > 150000
        |ORDER BY o_orderkey""".stripMargin,
    "p3_between_range" ->
      """SELECT event_id, value FROM events
        |WHERE value BETWEEN 50 AND 450 AND value <> 0
        |ORDER BY event_id""".stripMargin,
    "p4_any_signal" ->
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |WHERE (l_discount IS NOT NULL AND l_discount > 0)
        |   OR (l_tax IS NOT NULL AND l_tax > 0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "p8_outlier_4sigma" ->
      """WITH st AS (SELECT AVG(o_totalprice) AS mu, STDDEV_SAMP(o_totalprice) AS sd FROM orders)
        |SELECT o_orderkey FROM orders, st
        |WHERE ABS((o_totalprice - mu) / sd) < 4
        |ORDER BY o_orderkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a1_count_by_group" ->
      "SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "a2_group_median" ->
      """SELECT o_orderpriority,
        |  ROUND(MEDIAN(o_totalprice), 4) AS med_price,
        |  ROUND(AVG(o_totalprice), 4) AS avg_price,
        |  ROUND(STDDEV_SAMP(o_totalprice), 4) AS sd_price,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a4_global_stats" ->
      """SELECT ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |  ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  COUNT(*) AS cnt
        |FROM lineitem""".stripMargin,
    "a6_distinct_count" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        |FROM lineitem""".stripMargin,
    "a7_conditional_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS heavy_cnt,
        |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS disc_cnt,
        |  COUNT(*) AS total_cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a9_dropna_complete" ->
      """SELECT COUNT(*) AS cnt FROM events
        |WHERE NULLIF(event_type, 'click') IS NOT NULL AND value IS NOT NULL""".stripMargin,
    "a10_row_score" ->
      """SELECT o_orderkey,
        |  CAST((CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus <> '' THEN 1 ELSE 0 END
        |      + CASE WHEN o_orderpriority IS NOT NULL AND o_orderpriority <> '' THEN 1 ELSE 0 END
        |      + CASE WHEN o_totalprice IS NOT NULL AND o_totalprice > 0 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / 3.0 AS completeness
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "w1_dedup_latest" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_shipdate DESC, l_linenumber DESC) = 1
        |ORDER BY l_orderkey""".stripMargin,
    "w2_rank_topn" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(RANK() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        |FROM orders QUALIFY rnk <= 10
        |ORDER BY o_orderpriority, rnk""".stripMargin,
    "w3_lag_delta" ->
      """SELECT user_id, event_id,
        |  ROUND(value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id), 6) AS delta
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "w4_rolling_sum" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "o1_topk" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
        |GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority LIMIT 3""".stripMargin,
    "j1_broadcast_dim" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "j2_stats_backjoin" ->
      """WITH st AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    AVG(l_extendedprice) AS avg_p FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, COUNT(*) AS n_above
        |FROM lineitem JOIN st ON l_returnflag = rf AND l_linestatus = ls
        |WHERE l_extendedprice > avg_p
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "j4_anti_join" ->
      """SELECT o_orderkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "j5_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "u1_union_by_name" ->
      """SELECT o_orderkey AS k, o_totalprice AS amount, NULL AS status
        |FROM orders WHERE o_totalprice > 400000
        |UNION ALL
        |SELECT o_orderkey, NULL, o_orderstatus
        |FROM orders WHERE o_totalprice < 50000
        |ORDER BY k""".stripMargin,
    "u2_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,
    "u3_except" ->
      """SELECT o_orderkey AS k FROM orders
        |EXCEPT SELECT l_orderkey FROM lineitem ORDER BY k""".stripMargin,
    "o2_global_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin
  )
}
