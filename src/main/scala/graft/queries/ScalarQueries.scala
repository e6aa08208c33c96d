package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scalar-function operators (SURVEY.md §2.8 strings, §2.9 dates,
  * §2.10 math/conditional) re-expressed over the graft testdata.
  *
  * Reference shapes (file:line into the public reference): regex cleanup
  * chains (transformation_utils.py:79-173), numeric-from-string
  * (:200-217), CASE-ladder standardization (:220-254), split/getItem
  * (:753-780), sha2 surrogate keys (silver_etl_script.py:761-765),
  * date_format/to_date partition cols (:743-746, 892-908),
  * year/quarter/month features (gold_ml_etl.py:314-321), freshness age
  * (data_quality_checks.py:117-128), min/max midpoints + ranges
  * (silver_etl_script.py:770-828), log features (gold_ml_etl.py:208-221),
  * hash encoding (:195-200), fillna defaults (silver_etl_script.py:661-664),
  * price banding (transformation_utils.py:433-456).
  */
object ScalarQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // F1/F4: whitespace-collapse + trim + lower normalization.
    "f1_clean_text" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("cleaned"))
        .withColumn("clean_len", length(col("cleaned")))
        .orderBy("doc_id")),

    // F5: numeric extraction from messy strings (strip non-[0-9.]).
    "f5_extract_numeric" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          regexp_replace(col("props"), "[^0-9.]", "").cast("double").as("num_val"))
        .orderBy("event_id")),

    // F6: when()-ladder categorical standardization (city-name analog).
    "f6_case_ladder" -> ((s, d) =>
      customer(s, d)
        .select(col("c_custkey"),
          when(trim(col("c_mktsegment")) === "BUILDING", "BLD")
            .when(trim(col("c_mktsegment")) === "AUTOMOBILE", "AUTO")
            .when(trim(col("c_mktsegment")) === "MACHINERY", "MACH")
            .when(trim(col("c_mktsegment")) === "HOUSEHOLD", "HOME")
            .when(trim(col("c_mktsegment")) === "FURNITURE", "FURN")
            .otherwise(col("c_mktsegment")).as("seg"))
        .orderBy("c_custkey")),

    // F9: split + first/last element (lat,lng-string parsing analog).
    "f9_split_first_last" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          element_at(split(col("text"), " "), 1).as("first_tok"),
          element_at(split(col("text"), " "), -1).as("last_tok"))
        .orderBy("doc_id")),

    // F10: sha2 surrogate key over concat_ws (universal_id).
    "f10_sha2_key" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          sha2(concat_ws("_", col("source"), col("doc_id").cast("string")), 256)
            .as("uid"))
        .orderBy("doc_id")),

    // F11: upper/length/startswith predicates.
    "f11_str_predicates" -> ((s, d) =>
      part(s, d)
        .filter(length(col("p_name")) > 10 || col("p_type").startsWith("SMALL"))
        .select(col("p_partkey"), upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey")),

    // D4: date_format-derived partition columns + count.
    "d4_partition_cols" -> ((s, d) =>
      events(s, d)
        .groupBy(date_format(col("ts"), "yyyy").as("yr"),
          date_format(col("ts"), "MM").as("mo"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("yr", "mo")),

    // D5: timestamps → yyyy-MM-dd strings (the reference's stringly-dates).
    "d5_date_to_string" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).cast("string").as("order_date_str"))
        .orderBy("o_orderkey")),

    // D6: year/quarter/month market features.
    "d6_year_quarter_month" -> ((s, d) =>
      orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("yr", "qtr", "mo")),

    // D8: freshness age in hours vs a fixed reference instant
    // (current_timestamp made deterministic-injectable).
    "d8_age_hours" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          floor((lit(833587200L) - unix_timestamp(col("ts"))) / lit(3600.0))
            .as("age_h"))
        .orderBy("event_id")),

    // M3/M4: midpoint of min/max + range (avg_selling_price analog).
    "m3_minmax_mid" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(((min(col("l_extendedprice")) + max(col("l_extendedprice"))) / 2)
            .as("mid_price"),
          (max(col("l_extendedprice")) - min(col("l_extendedprice")))
            .as("price_range"))
        .orderBy("l_orderkey")),

    // M5/M6: log features + guarded ratio.
    "m5_log_features" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_totalprice") > 0)
        .select(col("o_orderkey"),
          round(log(col("o_totalprice")), 6).as("log_price"),
          // no round: per-row IEEE division is bit-identical across engines,
          // while rounding a decimal-halfway quotient is not (HALF_UP vs
          // HALF_EVEN).
          (col("o_totalprice") / (col("o_orderkey") % 100 + 1)).as("ratio"))
        .orderBy("o_orderkey")),

    // M7: Murmur3 hash-mod categorical encoding — Spark-native hash().
    // DuckDB has no murmur3, so the per-row codes are inexpressible in
    // the oracle; the gate instead emits the encoding's ENGINE-
    // INDEPENDENT invariants, which DuckDB pins for real: the row count
    // (from the table), codes in [0, N) for both columns, and that each
    // encoding is a FUNCTION of its input value (distinct (value, code)
    // pairs == distinct values — a non-deterministic or misapplied hash
    // breaks this). The exact per-row oracle lives in the md5 twin m7b
    // below, which replays the identical abs(hash)%N shape with a hash
    // both engines compute.
    "m7_hash_mod" -> ((s, d) =>
      part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          (abs(hash(col("p_brand"))) % 500).as("brand_code"),
          (abs(hash(col("p_type"))) % 1000).as("type_code"))
        .agg(
          count(lit(1)).as("n_rows"),
          (min(col("brand_code")) >= 0 && max(col("brand_code")) < 500)
            .as("brand_in_range"),
          (min(col("type_code")) >= 0 && max(col("type_code")) < 1000)
            .as("type_in_range"),
          (countDistinct(struct(col("p_brand"), col("brand_code"))) ===
            countDistinct(col("p_brand"))).as("brand_functional"),
          (countDistinct(struct(col("p_type"), col("type_code"))) ===
            countDistinct(col("p_type"))).as("type_functional"))),

    // M7 with an ENGINE-REPRODUCIBLE hash: the same abs(hash)%N encoding
    // over an md5-derived value both engines compute identically (the
    // murmur3 form above stays rows-only because DuckDB has no murmur3).
    // The last two hex chars of md5 carry value%64 exactly.
    "m7b_hash_mod_md5" -> ((s, d) =>
      part(s, d)
        .select(col("p_partkey"),
          (conv(substring(md5(col("p_brand")), 31, 2), 16, 10).cast("long") % 64)
            .as("brand_code"),
          (conv(substring(md5(col("p_type")), 31, 2), 16, 10).cast("long") % 64)
            .as("type_code"))
        .orderBy("p_partkey")),

    // M9: indicator-sum score (amenity_count analog).
    "m9_indicator_sum" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (when(col("l_discount") > 0, 1).otherwise(0) +
            when(col("l_tax") > 0, 1).otherwise(0) +
            when(col("l_quantity") >= 30, 1).otherwise(0)).as("n_flags"))
        .orderBy("l_orderkey", "l_linenumber")),

    // M10: na.fill defaults (UNKNOWN/zero) over synthesized nulls.
    "m10_fillna" -> ((s, d) =>
      lineitem(s, d)
        .withColumn("rf_filled",
          when(col("l_returnflag") === "N", lit(null)).otherwise(col("l_returnflag")))
        .withColumn("disc_filled",
          when(col("l_discount") < 0.01, lit(null)).otherwise(col("l_discount")))
        .na.fill(Map("rf_filled" -> "X", "disc_filled" -> 0.0))
        .select("l_orderkey", "l_linenumber", "rf_filled", "disc_filled")
        .orderBy("l_orderkey", "l_linenumber")),

    // M11: multi-way CASE banding (price categories).
    "m11_case_banding" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") < 50000, "0-50K")
            .when(col("o_totalprice") < 150000, "50-150K")
            .when(col("o_totalprice") < 300000, "150-300K")
            .when(col("o_totalprice") >= 300000, "300K+")
            .otherwise("Unknown").as("band"))
        .orderBy("o_orderkey"))
  )

  val oracle: Map[String, String] = Map(
    // the murmur3 invariants DuckDB CAN check (see the m7 registry
    // comment): real row count, pinned range/functional verdicts
    "m7_hash_mod" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  TRUE AS brand_in_range, TRUE AS type_in_range,
        |  TRUE AS brand_functional, TRUE AS type_functional
        |FROM part""".stripMargin,
    // hex-pair parse via strpos: DuckDB lacks conv(base16), but
    // value%64 only needs md5's last two hex chars
    "m7b_hash_mod_md5" ->
      """SELECT p_partkey,
        |  ((strpos('0123456789abcdef', substring(md5(p_brand), 31, 1)) - 1) * 16
        |   + strpos('0123456789abcdef', substring(md5(p_brand), 32, 1)) - 1) % 64
        |    AS brand_code,
        |  ((strpos('0123456789abcdef', substring(md5(p_type), 31, 1)) - 1) * 16
        |   + strpos('0123456789abcdef', substring(md5(p_type), 32, 1)) - 1) % 64
        |    AS type_code
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f1_clean_text" ->
      """SELECT doc_id,
        |  LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) AS cleaned,
        |  CAST(LENGTH(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')))) AS INTEGER) AS clean_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f5_extract_numeric" ->
      """SELECT event_id,
        |  CAST(REGEXP_REPLACE(props, '[^0-9.]', '', 'g') AS DOUBLE) AS num_val
        |FROM events ORDER BY event_id""".stripMargin,
    "f6_case_ladder" ->
      """SELECT c_custkey,
        |  CASE WHEN TRIM(c_mktsegment) = 'BUILDING' THEN 'BLD'
        |       WHEN TRIM(c_mktsegment) = 'AUTOMOBILE' THEN 'AUTO'
        |       WHEN TRIM(c_mktsegment) = 'MACHINERY' THEN 'MACH'
        |       WHEN TRIM(c_mktsegment) = 'HOUSEHOLD' THEN 'HOME'
        |       WHEN TRIM(c_mktsegment) = 'FURNITURE' THEN 'FURN'
        |       ELSE c_mktsegment END AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f9_split_first_last" ->
      """SELECT doc_id,
        |  (string_split(text, ' '))[1] AS first_tok,
        |  (string_split(text, ' '))[-1] AS last_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f10_sha2_key" ->
      """SELECT doc_id, sha256(source || '_' || CAST(doc_id AS VARCHAR)) AS uid
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f11_str_predicates" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u,
        |  CAST(LENGTH(p_name) AS INTEGER) AS name_len
        |FROM part
        |WHERE LENGTH(p_name) > 10 OR starts_with(p_type, 'SMALL')
        |ORDER BY p_partkey""".stripMargin,
    "d4_partition_cols" ->
      """SELECT strftime(ts, '%Y') AS yr, strftime(ts, '%m') AS mo, COUNT(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "d5_date_to_string" ->
      """SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "d6_year_quarter_month" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, qtr, mo""".stripMargin,
    "d8_age_hours" ->
      """SELECT event_id,
        |  CAST(FLOOR((EPOCH(TIMESTAMP '1996-06-01 00:00:00') - FLOOR(EPOCH(ts))) / 3600.0) AS BIGINT) AS age_h
        |FROM events ORDER BY event_id""".stripMargin,
    "m3_minmax_mid" ->
      """SELECT l_orderkey,
        |  (MIN(l_extendedprice) + MAX(l_extendedprice)) / 2 AS mid_price,
        |  MAX(l_extendedprice) - MIN(l_extendedprice) AS price_range
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "m5_log_features" ->
      """SELECT o_orderkey,
        |  ROUND(LN(o_totalprice), 6) AS log_price,
        |  o_totalprice / (o_orderkey % 100 + 1) AS ratio
        |FROM orders WHERE o_totalprice > 0 ORDER BY o_orderkey""".stripMargin,
    "m9_indicator_sum" ->
      """SELECT l_orderkey, l_linenumber,
        |  (CASE WHEN l_discount > 0 THEN 1 ELSE 0 END
        |   + CASE WHEN l_tax > 0 THEN 1 ELSE 0 END
        |   + CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS n_flags
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "m10_fillna" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(NULLIF(l_returnflag, 'N'), 'X') AS rf_filled,
        |  CASE WHEN l_discount < 0.01 THEN 0.0 ELSE l_discount END AS disc_filled
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "m11_case_banding" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000 THEN '0-50K'
        |       WHEN o_totalprice < 150000 THEN '50-150K'
        |       WHEN o_totalprice < 300000 THEN '150-300K'
        |       WHEN o_totalprice >= 300000 THEN '300K+'
        |       ELSE 'Unknown' END AS band
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
