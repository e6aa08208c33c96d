package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Window-frame and distribution-function coverage beyond W1
  * (SURVEY.md §2.5 calls for rank/lag/frame variants as capability
  * extensions), plus the quality-check battery as ONE conditional
  * aggregation (the single-scan shape QualityChecks uses, oracle-checked
  * here end-to-end). */
object ExtraWindowQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // RANGE frame: sum of quantities of all lines in the same order whose
    // extendedprice is within ±1000 of the current row's.
    "w5_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey").orderBy("l_extendedprice")
        .rangeBetween(-1000, 1000)
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("near_qty"))
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
    }),

    // ntile + percent_rank + cume_dist over a deterministic ordering.
    "w6_distribution" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // W1's keep-latest dedup through the skew-safe two-phase salted
    // operator — same oracle as w1_dedup_latest, proving the salted
    // plan is row-identical to the single-window plan. The shape a
    // 100 TB run uses when one listing id holds a disproportionate
    // share of rows (see operators/SaltedDedup.scala + SkewSpec).
    "w8_salted_dedup" -> ((s, d) =>
      graft.operators.SaltedDedup.topOne(
        lineitem(s, d),
        keys = Seq("l_orderkey"),
        order = Seq(col("l_shipdate").desc, col("l_linenumber").desc),
        saltOn = Seq(col("l_shipdate"), col("l_linenumber")))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey")),

    // W9: gaps-and-islands sessionization with plain window functions —
    // the batch form that generalizes past fixed-gap session_window
    // (sw1) to ARBITRARY session-open rules: a session opens when the
    // user was idle > 8h; session id = running count of opens. Both
    // windows share one (user_id → ts, event_id) sort, so the whole
    // query is one shuffle on user_id. Session value sums through
    // DECIMAL so the result is addition-order-independent across
    // engines.
    "w9_session_islands" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("new_sess",
          when(lag(col("ts"), 1).over(w).isNull ||
            col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long") > 28800,
            1L).otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_id")
        .agg(min(col("ts")).as("session_start"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double")
            .as("sess_value"))
        .orderBy("user_id", "sess_id")
    }),

    // W10: top-k WITHOUT a window sort — the 3 most recent distinct
    // event times per user through the k-bounded BottomK aggregator
    // (negated: bottom-k of -ts = top-k of ts). w2's window formulation
    // sorts every row of every partition before discarding all but k;
    // this is one ObjectHashAggregate pass with a k-slot buffer,
    // combining map-side — the shape that matters when one user has
    // millions of events. Oracle recomputes via the window form: same
    // rows, independently derived.
    "w10_topk_agg" -> ((s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(transform(
          graft.functions.BottomK.bottomK(col("ts").cast("long") * -1, 3),
          x => x * -1).as("recent"))
        .select(col("user_id"), posexplode(col("recent")).as(Seq("pos", "ts_epoch")))
        .select(col("user_id"), (col("pos") + 1).cast("int").as("rnk"),
          col("ts_epoch"))
        .orderBy("user_id", "rnk")),

    // the DataQualityChecker battery as one single-pass aggregate:
    // null %, distinct count, out-of-range count, complete-row count.
    "qc1_quality_battery" -> ((s, d) =>
      lineitem(s, d).agg(
        count(lit(1)).as("total_rows"),
        sum(when(col("l_returnflag").isNull, 1).otherwise(0)).as("null_rf"),
        countDistinct(col("l_orderkey")).as("distinct_orders"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1).otherwise(0))
          .as("qty_out_of_range"),
        sum(when(col("l_returnflag").isNotNull && col("l_linestatus").isNotNull &&
          col("l_shipdate").isNotNull, 1).otherwise(0)).as("complete_rows"))),

    // QC2: dataset drift monitor — Population Stability Index between a
    // reference window (orders before 1998-04-01) and the current window,
    // over FIXED-width price bins. Fixed bins, not data-dependent decile
    // edges: quantile edges interpolate to full-precision doubles whose
    // last-ulp differences across engines would flip bin membership,
    // while floor(price/width) is one IEEE division both engines compute
    // identically — and fixed bins are also what a production monitor
    // pins, so day-over-day PSIs are comparable. One scan (conditional
    // agg), then all window math runs over the ≤10-row bin aggregate.
    // p/q floored at 1e-6 (Laplace) so an empty side yields a large
    // finite term, not ln(0).
    "qc2_drift_psi" -> ((s, d) =>
      graft.operators.Drift.psi(
        orders(s, d).select(col("o_totalprice").as("price"),
          (to_date(col("o_orderdate")) < lit("1998-04-01").cast("date"))
            .as("is_ref")),
        "price", "is_ref", width = 50000.0, bins = 10)),

    // QC3: two-sample Kolmogorov–Smirnov drift statistic on a BINNED
    // ECDF (1000 fixed-width bins): D = max |F_ref − F_cur| evaluated at
    // bin edges. The exact-KS formulation needs a total order over every
    // raw row (a single-partition window at corpus scale); the binned
    // ECDF needs one conditional aggregation and then windows over a
    // ≤1000-row frame — the 100 TB shape — and is itself a well-defined
    // statistic (D_binned ≤ D_exact, equal when edges straddle the
    // supremum). Cumulative/total fractions are exact integer ratios, so
    // both engines derive identical doubles.
    "qc3_ks_drift" -> ((s, d) =>
      graft.operators.Drift.ksBinned(
        orders(s, d).select(col("o_totalprice").as("price"),
          (to_date(col("o_orderdate")) < lit("1998-04-01").cast("date"))
            .as("is_ref")),
        "price", "is_ref", width = 500.0, bins = 1000)),

    // QC4: EMBEDDING drift — the vector-feature sibling of qc2/qc3's
    // scalar monitors: per label, the cosine between the reference
    // slice's centroid and the current slice's (an upstream
    // encoder/feature change moves centroids long before scalar stats
    // notice). Centroids are the v3/v8 DECIMAL-exact per-dimension
    // means; the cross-centroid dot/norm sums decimal-cast per TERM so
    // 64-term addition is associative and both engines reach identical
    // doubles. Two aggregations over (label, slice, dim) — never a
    // vector × vector join.
    "qc4_embedding_drift" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("label"), (col("vec_id") % 2 === 0).as("is_ref"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("pos", "v")))
      val cent = e.groupBy("label", "is_ref", "pos")
        .agg((sum(col("v").cast(DecimalType(30, 12))).cast("double") /
          count(lit(1))).as("m"))
      val a = cent.filter(col("is_ref"))
        .select(col("label"), col("pos"), col("m").as("ma"))
      val b = cent.filter(!col("is_ref"))
        .select(col("label"), col("pos"), col("m").as("mb"))
      val cos = a.join(b, Seq("label", "pos"))
        .groupBy("label")
        .agg(
          sum((col("ma") * col("mb")).cast(DecimalType(38, 18)))
            .cast("double").as("dot"),
          sum((col("ma") * col("ma")).cast(DecimalType(38, 18)))
            .cast("double").as("na"),
          sum((col("mb") * col("mb")).cast(DecimalType(38, 18)))
            .cast("double").as("nb"))
        .select(col("label"),
          round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6)
            .as("centroid_cos"))
      val n = embeddings(s, d).groupBy("label").agg(
        sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_cur"))
      cos.join(n, Seq("label")).orderBy("label")
    })
  )

  val oracle: Map[String, String] = Map(
    "w5_range_frame" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_extendedprice
        |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS DOUBLE) AS near_qty
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    "w6_distribution" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |  ROUND(CUME_DIST() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    // deliberately identical to w1_dedup_latest's oracle: the salted
    // two-phase plan must be row-identical to the single-window dedup.
    "w8_salted_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_shipdate DESC, l_linenumber DESC) = 1
        |ORDER BY l_orderkey""".stripMargin,
    "qc1_quality_battery" ->
      """SELECT COUNT(*) AS total_rows,
        |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_rf,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS distinct_orders,
        |  CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS qty_out_of_range,
        |  CAST(SUM(CASE WHEN l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |    AND l_shipdate IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS complete_rows
        |FROM lineitem""".stripMargin,
    "w10_topk_agg" ->
      """WITH t AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 1000000000 AS ts_epoch
        |  FROM events),
        |r AS (
        |  SELECT user_id, ts_epoch,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts_epoch DESC) AS rnk
        |  FROM t)
        |SELECT user_id, CAST(rnk AS INTEGER) AS rnk, ts_epoch
        |FROM r WHERE rnk <= 3
        |ORDER BY user_id, rnk""".stripMargin,
    "w9_session_islands" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) > 28800
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM e)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |  MIN(ts) AS session_start, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sess_value
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,
    "qc2_drift_psi" ->
      """WITH b AS (
        |  SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9.0) AS INTEGER) AS bin,
        |    CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-04-01'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1998-04-01'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT bin, n_ref, n_cur,
        |    GREATEST(CAST(n_ref AS DOUBLE) / CAST(SUM(n_ref) OVER () AS DOUBLE), 1e-6) AS p,
        |    GREATEST(CAST(n_cur AS DOUBLE) / CAST(SUM(n_cur) OVER () AS DOUBLE), 1e-6) AS q
        |  FROM b)
        |SELECT bin, n_ref, n_cur,
        |  ROUND((p - q) * LN(p / q), 6) AS psi_term,
        |  ROUND(SUM((p - q) * LN(p / q)) OVER (), 4) AS psi_total
        |FROM t ORDER BY bin""".stripMargin,
    "qc3_ks_drift" ->
      """WITH b AS (
        |  SELECT CAST(LEAST(FLOOR(o_totalprice / 500.0), 999.0) AS INTEGER) AS bin,
        |    CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-04-01'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1998-04-01'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT bin,
        |    SUM(n_ref) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
        |    SUM(n_cur) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
        |    SUM(n_ref) OVER () AS tr, SUM(n_cur) OVER () AS tc
        |  FROM b)
        |SELECT CAST(MAX(tr) AS BIGINT) AS n_ref, CAST(MAX(tc) AS BIGINT) AS n_cur,
        |  ROUND(MAX(ABS(CAST(cr AS DOUBLE) / CAST(tr AS DOUBLE) -
        |    CAST(cc AS DOUBLE) / CAST(tc AS DOUBLE))), 6) AS ks_d
        |FROM c""".stripMargin,
    // qc4: per-dimension decimal-exact centroids on each slice, then the
    // decimal-term dot/norm sums — per-engine pos bases differ (0- vs
    // 1-based) but pos is only ever a within-engine join key
    "qc4_embedding_drift" ->
      """WITH e AS (
        |  SELECT label, vec_id % 2 = 0 AS is_ref, i AS pos,
        |    CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, UNNEST(generate_series(1, 64)) t(i)),
        |cent AS (
        |  SELECT label, is_ref, pos,
        |    CAST(SUM(CAST(v AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM e GROUP BY 1, 2, 3),
        |j AS (
        |  SELECT a.label,
        |    CAST(SUM(CAST(a.m * b.m AS DECIMAL(38,18))) AS DOUBLE) AS dot,
        |    CAST(SUM(CAST(a.m * a.m AS DECIMAL(38,18))) AS DOUBLE) AS na,
        |    CAST(SUM(CAST(b.m * b.m AS DECIMAL(38,18))) AS DOUBLE) AS nb
        |  FROM cent a JOIN cent b
        |    ON a.label = b.label AND a.pos = b.pos AND a.is_ref AND NOT b.is_ref
        |  GROUP BY 1),
        |n AS (
        |  SELECT label,
        |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ref,
        |    CAST(SUM(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_cur
        |  FROM embeddings GROUP BY 1)
        |SELECT j.label, ROUND(dot / (sqrt(na) * sqrt(nb)), 6) AS centroid_cos,
        |  n.n_ref, n.n_cur
        |FROM j JOIN n ON j.label = n.label
        |ORDER BY j.label""".stripMargin
  )
}
