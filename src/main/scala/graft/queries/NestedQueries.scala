package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.Tables._

/** Array / struct / JSON operators (SURVEY.md §2.11-2.12). The testdata has
  * no nested columns, so each query first *constructs* nested values from
  * flat columns (per-row arrays or sorted collect_list) and then applies the
  * reference's transform/flatten/element_at/from_json shapes.
  *
  * Reference shapes: transform struct-array → scalar-array
  * (silver_etl_script.py:304-310), array_distinct∘flatten∘transform
  * (:280-298), element_at first/last (transformation_utils.py:604-630),
  * from_json-with-probe (silver_etl_script.py:459-475), explode implied
  * capability (silver_etl_script.py:19 imports).
  */
object NestedQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // N1: transform HOF over a per-row array. Output serialized via
    // concat_ws to a string column: the driver's pandas hash step can't
    // handle raw array columns (round-1 gate ERR). Decimal cast makes the
    // per-element rendering engine-independent ("0.0800" both sides).
    "n1_transform_hof" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          concat_ws(",",
            transform(array(col("l_quantity"), col("l_discount"), col("l_tax")),
              x => round(x * 2, 4).cast("decimal(18,4)").cast("string")))
            .as("doubled"))
        .orderBy("l_orderkey", "l_linenumber")),

    // N2: array_distinct ∘ flatten ∘ nested arrays (projectTypes analog).
    // Sorted on both sides: list_distinct/array_distinct ordering is
    // engine-specific.
    "n2_flatten_distinct" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          concat_ws(",", array_sort(array_distinct(flatten(array(
            array(col("l_returnflag")), array(col("l_linestatus")),
            array(col("l_returnflag"))))))).as("tags"))
        .orderBy("l_orderkey", "l_linenumber")),

    // N4: build a typed struct-array per group (apartment_prices analog);
    // sort_array gives deterministic order (sorts on leading struct field).
    "n4_struct_array" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(concat_ws(",",
          transform(
            sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))),
            x => concat(x.getField("l_linenumber").cast("string"), lit(":"),
              x.getField("l_quantity").cast("decimal(18,2)").cast("string"))))
          .as("lines"))
        .orderBy("l_orderkey")),

    // N5/N6: element_at first / last (negative index) over an ordered array.
    "n5_element_first_last" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(
          element_at(sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))), 1)
            .getField("l_quantity").as("first_qty"),
          element_at(sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))), -1)
            .getField("l_quantity").as("last_qty"))
        .orderBy("l_orderkey")),

    // N8-ish + get_json_object: dotted JSON path extraction.
    "n7_json_extract" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy("event_id")),

    // N-ext: MapType — parse JSON object to map<string,int>, explode to
    // (key, value) rows (the reference uses no MapType; capability class).
    "n14_map_type" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.MapType(StringType,
              org.apache.spark.sql.types.IntegerType)).as("m"))
        .select(col("event_id"), explode(col("m")).as(Seq("key", "value")))
        .orderBy("event_id", "key")),

    // N11: from_json with startswith("[") probe, else wrap in array().
    "n11_json_probe" -> ((s, d) => {
      val maybe = when(col("event_type") === "click",
        concat(lit("[\""), col("event_type"), lit("\",\""),
          col("user_id").cast("string"), lit("\"]")))
        .otherwise(col("event_type"))
      events(s, d)
        .withColumn("maybe_arr", maybe)
        .select(col("event_id"),
          concat_ws("|",
            when(col("maybe_arr").startsWith("["),
              from_json(col("maybe_arr"), ArrayType(StringType)))
              .otherwise(array(col("maybe_arr")))).as("parsed"))
        .orderBy("event_id")
    }),

    // N13/X3: explode (generator) over a constructed per-row array.
    "n13_explode" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(array(col("l_quantity"), col("l_extendedprice"))).as("val"))
        .orderBy("l_orderkey", "l_linenumber", "val")),

    // N15: Spark 4 VARIANT — semi-structured ingestion without a declared
    // schema and without string re-parsing per access: parse_json once
    // into the binary variant encoding, then typed path extraction
    // (variant_get) straight in codegen. The modern replacement for the
    // get_json_object-per-field pattern (n7) when the payload shape
    // drifts; oracle recomputes via DuckDB's JSON extraction.
    "n15_variant_get" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "int").as("k"),
          try_variant_get(col("v"), "$.missing", "int").as("k_missing"))
        .withColumn("k_band", (col("k") % 10).cast("int"))
        .orderBy("event_id"))
  )

  val oracle: Map[String, String] = Map(
    "n1_transform_hof" ->
      """SELECT l_orderkey, l_linenumber,
        |  array_to_string(list_transform([l_quantity, l_discount, l_tax],
        |    x -> CAST(CAST(ROUND(x * 2, 4) AS DECIMAL(18,4)) AS VARCHAR)), ',') AS doubled
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "n2_flatten_distinct" ->
      """SELECT l_orderkey, l_linenumber,
        |  array_to_string(list_sort(list_distinct(
        |    flatten([[l_returnflag], [l_linestatus], [l_returnflag]]))), ',') AS tags
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "n4_struct_array" ->
      """SELECT l_orderkey,
        |  array_to_string(list(
        |    CAST(l_linenumber AS VARCHAR) || ':' || CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR)
        |    ORDER BY l_linenumber, l_quantity), ',') AS lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "n5_element_first_last" ->
      """SELECT l_orderkey,
        |  (list(l_quantity ORDER BY l_linenumber, l_quantity))[1] AS first_qty,
        |  (list(l_quantity ORDER BY l_linenumber, l_quantity))[-1] AS last_qty
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "n7_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "n14_map_type" ->
      """WITH keys AS (
        |  SELECT event_id, props, unnest(json_keys(props)) AS key FROM events)
        |SELECT event_id, key,
        |  CAST(json_extract_string(props, '$.' || key) AS INTEGER) AS value
        |FROM keys ORDER BY event_id, key""".stripMargin,
    "n11_json_probe" ->
      """WITH m AS (SELECT event_id,
        |  CASE WHEN event_type = 'click'
        |       THEN '["' || event_type || '","' || CAST(user_id AS VARCHAR) || '"]'
        |       ELSE event_type END AS maybe_arr FROM events)
        |SELECT event_id,
        |  array_to_string(
        |    CASE WHEN starts_with(maybe_arr, '[') THEN CAST(CAST(maybe_arr AS JSON) AS VARCHAR[])
        |         ELSE [maybe_arr] END, '|') AS parsed
        |FROM m ORDER BY event_id""".stripMargin,
    "n13_explode" ->
      """SELECT l_orderkey, l_linenumber, t.val
        |FROM lineitem CROSS JOIN UNNEST([l_quantity, l_extendedprice]) AS t(val)
        |ORDER BY l_orderkey, l_linenumber, val""".stripMargin,
    "n15_variant_get" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |  CAST(json_extract(props, '$.missing') AS INTEGER) AS k_missing,
        |  CAST(CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS INTEGER) AS k_band
        |FROM events ORDER BY event_id""".stripMargin
  )
}
