package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.transform.Transforms
import graft.gold.{Enhancement, GoldEtl}

/** Driver-visible correctness queries for §2 operators that were
  * previously covered only by golden specs: each query synthesizes the
  * operator's input shape deterministically from the testdata tables and
  * then runs the PRODUCTION function (Transforms / GoldEtl / Enhancement),
  * so the DuckDB oracle checks the same code paths the pipelines use.
  *
  * Reference behaviors: F4 whitespace normalize
  * (transformation_utils.py:176-197), F8 amenity flags (:571-602), D2
  * multi-format dates (:380-409), N3 album flatten (:655-676), N8
  * translation[0].name (:702-751), D3 dual-format handover date
  * (silver_etl_script.py:363-389), M12 quality tiers
  * (gold_ml_etl.py:328-373), J2/J3 price imputation with district→city→
  * national fallback (data_enhancement.py:18-157), X1 centroid geocoding
  * (data_enhancement.py:164-337).
  */
object RefOpQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // F4: trim + collapse internal whitespace via Transforms.normalizeText.
    "f4_normalize_text" -> ((s, d) => {
      val raw = customer(s, d).select(col("c_custkey"),
        concat(lit("  "), col("c_name"), lit("   "), col("c_mktsegment"),
          lit("\t"), col("c_acctbal").cast("string"), lit("  ")).as("txt"))
      Transforms.normalizeText(raw, Seq("txt")).orderBy("c_custkey")
    }),

    // F8: amenity keyword flags over synthesized Vietnamese descriptions.
    "f8_amenity_flags" -> ((s, d) => {
      val raw = orders(s, d).select(col("o_orderkey"),
        concat(lit("Căn hộ cao cấp "),
          when(col("o_orderkey") % 2 === 0, lit("có hồ bơi và phòng gym "))
            .otherwise(lit("")),
          when(col("o_orderkey") % 3 === 0, lit("bãi đỗ xe rộng, sân vườn "))
            .otherwise(lit("")),
          when(col("o_orderkey") % 5 === 0, lit("an ninh 24/7, khu vui chơi trẻ em "))
            .otherwise(lit("")),
          col("o_orderpriority")).as("description"))
      Transforms.extractProjectFeatures(raw, "description")
        .select("o_orderkey", "has_swimming_pool", "has_gym", "has_parking",
          "has_garden", "has_security", "has_playground")
        .orderBy("o_orderkey")
    }),

    // D2: multi-format date standardizer — render o_orderdate in one of the
    // four reference formats per row, then coalesce-parse it back.
    "d2_multiformat_date" -> ((s, d) => {
      val raw = orders(s, d).select(col("o_orderkey"),
        when(col("o_orderkey") % 4 === 0,
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"))
          .when(col("o_orderkey") % 4 === 1,
            date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
          .when(col("o_orderkey") % 4 === 2,
            date_format(col("o_orderdate"), "dd/MM/yyyy"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("dt"))
      Transforms.standardizeDates(raw, Seq("dt")).orderBy("o_orderkey")
    }),

    // D3: dual-format date — even keys carry epoch-millis strings, odd keys
    // carry "yyyy-MM-dd"; both parse to a midnight UTC timestamp.
    "d3_dual_format_date" -> ((s, d) => {
      val raw = orders(s, d).select(col("o_orderkey"),
        when(col("o_orderkey") % 2 === 0,
          (lit(1500000000000L) + col("o_orderkey") * 86400000L).cast("string"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("raw_dt"))
      raw.select(col("o_orderkey"),
        Transforms.parseDualFormatDate(col("raw_dt")).as("handover_ts"))
        .orderBy("o_orderkey")
    }),

    // M12: quality-tier CASE + training-ready flag over synthesized
    // completeness/geo/price columns hitting all three tiers.
    "m12_quality_tier" -> ((s, d) => {
      val raw = orders(s, d).select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("o_totalprice")).as("target_price_per_sqm"),
        when(col("o_orderkey") % 3 === 0, lit(null).cast("double"))
          .otherwise(lit(21.0)).as("latitude"),
        when(col("o_orderkey") % 3 === 0, lit(null).cast("double"))
          .otherwise(lit(105.8)).as("longitude"),
        when(col("o_orderkey") % 5 === 0, lit(0.0))
          .otherwise((col("o_orderkey") % 100 + 10).cast("double")).as("total_area"),
        ((col("o_orderkey") % 11) / 10.0).as("data_completeness_score"))
      GoldEtl.assignQualityTiers(raw)
        .select("o_orderkey", "quality_tier", "is_training_ready")
        .orderBy("o_orderkey")
    }),

    // J2+J3+national fallback: the full imputation chain — district median
    // (2-key join) → city median (1-key fallback join) → national constant,
    // with the ±10% synthesized min/max band on imputed rows.
    "j3_city_fallback_impute" -> ((s, d) => {
      val raw = customer(s, d).select(col("c_custkey"),
        when(col("c_nationkey") % 5 === 4, lit(null).cast("string"))
          .otherwise(concat(lit("City"), (col("c_nationkey") % 5).cast("string")))
          .as("city"),
        when(col("c_custkey") % 4 === 0, lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("district"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("double"))
          .otherwise(((col("c_custkey") % 50) + 1).cast("double") * 1000000.0)
          .as("avg_unit_price"),
        ((col("c_custkey") % 80) + 20).cast("double").as("total_area"))
        .withColumn("avg_selling_price",
          when(col("avg_unit_price").isNotNull,
            col("avg_unit_price") * col("total_area"))
            .otherwise(lit(null).cast("double")))
        .withColumn("min_selling_price", lit(null).cast("double"))
        .withColumn("max_selling_price", lit(null).cast("double"))
      Enhancement.imputeMissingPrices(raw)
        .select(col("c_custkey"), col("city"), col("district"),
          col("price_imputed"),
          col("avg_unit_price").as("unit_price_out"),
          col("avg_selling_price").as("selling_price_out"),
          col("min_selling_price").as("min_out"),
          col("max_selling_price").as("max_out"))
        .orderBy("c_custkey")
    }),

    // N3: flatten album images (struct-array → flat string array).
    "n3_flatten_albums" -> ((s, d) => {
      val raw = orders(s, d).select(col("o_orderkey"),
        when(col("o_orderkey") % 10 === 0,
          lit(null).cast("array<struct<images:array<string>>>"))
          .otherwise(array(
            struct(array(col("o_orderpriority"), col("o_orderstatus")).as("images")),
            struct(array(col("o_custkey").cast("string")).as("images")))).as("albums"))
      Transforms.extractAlbumImages(raw)
        .select(col("o_orderkey"),
          when(col("images").isNotNull, concat_ws(",", col("images")))
            .otherwise(lit(null).cast("string")).as("images"))
        .orderBy("o_orderkey")
    }),

    // N8: city ← city.translation[0].name on a struct-typed column.
    "n8_translation_name" -> ((s, d) => {
      val raw = customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 6 === 0,
          lit(null).cast("struct<translation:array<struct<name:string>>>"))
          .otherwise(struct(array(
            struct(col("c_name").as("name")),
            struct(col("c_mktsegment").as("name"))).as("translation"))).as("city"))
      Transforms.extractNestedTranslation(raw, Seq("city"))
        .orderBy("c_custkey")
    }),

    // M13: declared cast table through the production loop — numeric
    // strings cast to their declared types, garbage and null to null
    // (ANSI off, the reference's null-on-bad-cast contract).
    "m13_cast_table" -> ((s, d) => {
      val raw = orders(s, d).select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit("not-a-number"))
          .when(col("o_orderkey") % 11 === 0, lit(null).cast("string"))
          .otherwise(concat((col("o_orderkey") % 997).cast("string"), lit(".25")))
          .as("min_selling_price"),
        (col("o_orderkey") % 50).cast("string").as("number_of_floors"),
        when(col("o_orderkey") % 5 === 0, lit("12.75")).otherwise(lit("3.5"))
          .as("total_area"))
      graft.schema.Mappings.applyTypeConversions(raw)
        .select("o_orderkey", "min_selling_price", "number_of_floors",
          "total_area")
        .orderBy("o_orderkey")
    }),

    // N9: dotted struct paths (investorRelated.investor.name,
    // utilities.basicUtilities) through the meey source specials.
    "n9_dotted_paths" -> ((s, d) => {
      val raw = customer(s, d).select(col("c_custkey"),
        struct(struct(col("c_name").as("name")).as("investor"))
          .as("investorRelated"),
        struct(array(col("c_mktsegment"), lit("parking"))
          .as("basicUtilities")).as("utilities"))
      graft.silver.SilverEtl.applySourceSpecials(raw, "meeyproject_api")
        .select(col("c_custkey"), col("investor_name"),
          concat_ws("|", col("utilities_internal")).as("utilities_internal"))
        .orderBy("c_custkey")
    }),

    // N10: size()>0 guards — empty and null struct-arrays both surface as
    // null through the meey images special, populated ones flatten to urls.
    "n10_size_guards" -> ((s, d) => {
      val raw = orders(s, d).select(col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0,
          expr("CAST(array() AS array<struct<url:string>>)"))
          .when(col("o_orderkey") % 7 === 0,
            lit(null).cast("array<struct<url:string>>"))
          .otherwise(array(
            struct(concat(lit("u"), col("o_orderkey").cast("string")).as("url")),
            struct(col("o_orderstatus").as("url")))).as("images"))
      graft.silver.SilverEtl.applySourceSpecials(raw, "meeyproject_api")
        .select(col("o_orderkey"),
          when(col("images").isNotNull, concat_ws(",", col("images")))
            .otherwise(lit(null).cast("string")).as("images"))
        .orderBy("o_orderkey")
    }),

    // D7: audit columns from the injectable clock through the production
    // enrich — deterministic surrogate key + processed/valid_from dates.
    "d7_audit_clock" -> ((s, d) => {
      val raw = customer(s, d).select(
        lit("sp").as("spider_name"),
        col("c_custkey").cast("string").as("record_key"),
        col("c_name").as("project_name"))
      graft.silver.SilverEtl.enrich(raw,
        to_timestamp(lit("2025-01-15 12:00:00")))
        .select(col("record_key"), col("universal_id"),
          col("silver_processed_at"), col("silver_version"),
          col("is_current"), col("valid_from"), col("valid_to"))
        .orderBy(col("record_key").cast("int"))
    }),

    // P7: rename/drop/prune through the full production mapSource — source
    // field names rename per the chotot mapping, numeric strings cast per
    // the declared table, absent fields default (project_type UNKNOWN) or
    // pad as typed nulls, and everything off-schema is pruned.
    "p7_rename_prune" -> ((s, d) => {
      val raw = customer(s, d).select(
        col("c_custkey").cast("string").as("project_oid"),
        col("c_name").as("project_name"),
        col("c_mktsegment").as("address"),
        (col("c_custkey") % 500).cast("string").as("area_total"))
      graft.silver.SilverEtl.mapSource(raw, "chotot_api")
        .select("source_id", "project_name", "address", "total_area",
          "project_type")
        .orderBy(col("source_id").cast("int"))
    }),

    // N12: schema-introspecting array<string> coercion — a struct-array
    // column projects its `name` field; a plain string wraps (or JSON-
    // parses when "["-prefixed) through the production coerce.
    "n12_coerce_introspect" -> ((s, d) => {
      val raw = customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 4 === 0,
          lit(null).cast("array<struct<name:string,weight:int>>"))
          .otherwise(array(
            struct(col("c_mktsegment").as("name"), lit(1).as("weight")),
            struct(col("c_name").as("name"), lit(2).as("weight"))))
          .as("facilities"),
        when(col("c_custkey") % 3 === 0,
          concat(lit("[\"x\",\""), col("c_mktsegment"), lit("\"]")))
          .otherwise(col("c_mktsegment")).as("quality_indexes"))
      val coerced = Transforms.coerceToStringArray(
        Transforms.coerceToStringArray(raw, "facilities"), "quality_indexes")
      coerced.select(col("c_custkey"),
        when(col("facilities").isNotNull, concat_ws(",", col("facilities")))
          .otherwise(lit(null).cast("string")).as("facilities"),
        concat_ws(",", col("quality_indexes")).as("quality_indexes"))
        .orderBy("c_custkey")
    }),

    // M8: hectare → m² conversion through the onehousing source specials
    // (nulls pass through untouched).
    "m8_ha_conversion" -> ((s, d) => {
      val raw = orders(s, d).select(col("o_orderkey"),
        when(col("o_orderkey") % 9 === 0, lit(null).cast("double"))
          .otherwise((col("o_orderkey") % 30).cast("double") / 10.0)
          .as("total_area"))
      graft.silver.SilverEtl.applySourceSpecials(raw, "onehousing_api")
        .select("o_orderkey", "total_area")
        .orderBy("o_orderkey")
    }),

    // N7: Meeyproject GeoJSON location.coordinates [lon, lat] → two
    // double columns through the PRODUCTION extractor
    // (transformation_utils.py:782-809): null struct and short arrays
    // (<2 coords) both yield null lon/lat; integral coordinate values
    // keep the cross-engine double compare exact.
    "n7b_geojson_coords" -> ((s, d) => {
      val ck = col("c_custkey")
      val raw = customer(s, d).select(ck,
        when(ck % 7 === 0, lit(null).cast("struct<coordinates:array<double>>"))
          .when(ck % 5 === 0,
            struct(array((lit(100) + ck % 40).cast("double")).as("coordinates")))
          .otherwise(struct(array(
            (lit(100) + ck % 40).cast("double"),
            (lit(10) + ck % 80).cast("double")).as("coordinates")))
          .as("location"))
      Transforms.extractMeeyprojectLocation(raw)
        .select(col("c_custkey"), col("longitude"), col("latitude"))
        .orderBy("c_custkey")
    }),

    // X1: district-centroid geocoding — prefix-strip + lowercase normalize,
    // broadcast join against the centroid dim, impute only missing/zero.
    "x1_centroid_geocode" -> ((s, d) => {
      val m = col("c_custkey") % 5
      val raw = customer(s, d).select(col("c_custkey"),
        when(m === 0, lit("Hanoi")).when(m === 1, lit("TP. Hanoi"))
          .when(m === 2, lit("Ho Chi Minh")).when(m === 3, lit("Da Nang"))
          .otherwise(lit("Nowhere")).as("city"),
        when(m === 0, lit("Ba Dinh")).when(m === 1, lit("Q. Hoan Kiem"))
          .when(m === 2, lit("District 1")).when(m === 3, lit("Hai Chau"))
          .otherwise(lit("Xville")).as("district"),
        when(m === 3, lit(16.0)).when(m === 1, lit(0.0))
          .otherwise(lit(null).cast("double")).as("latitude"),
        when(m === 3, lit(108.2)).when(m === 1, lit(0.0))
          .otherwise(lit(null).cast("double")).as("longitude"))
      Enhancement.geocodeMissingCoordinates(s, raw)
        .select("c_custkey", "city", "district", "coordinates_imputed",
          "latitude", "longitude")
        .orderBy("c_custkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "n7b_geojson_coords" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 7 <> 0 AND c_custkey % 5 <> 0
        |       THEN CAST(100 + c_custkey % 40 AS DOUBLE) END AS longitude,
        |  CASE WHEN c_custkey % 7 <> 0 AND c_custkey % 5 <> 0
        |       THEN CAST(10 + c_custkey % 80 AS DOUBLE) END AS latitude
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "m13_cast_table" ->
      """SELECT o_orderkey,
        |  TRY_CAST(CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-number'
        |                WHEN o_orderkey % 11 = 0 THEN NULL
        |                ELSE CAST(o_orderkey % 997 AS VARCHAR) || '.25' END
        |    AS DOUBLE) AS min_selling_price,
        |  TRY_CAST(CAST(o_orderkey % 50 AS VARCHAR) AS INTEGER) AS number_of_floors,
        |  TRY_CAST(CASE WHEN o_orderkey % 5 = 0 THEN '12.75' ELSE '3.5' END
        |    AS DOUBLE) AS total_area
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "m8_ha_conversion" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 9 = 0 THEN NULL
        |       ELSE CAST(o_orderkey % 30 AS DOUBLE) / 10.0 * 10000 END AS total_area
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "p7_rename_prune" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS source_id,
        |  c_name AS project_name,
        |  c_mktsegment AS address,
        |  TRY_CAST(CAST(c_custkey % 500 AS VARCHAR) AS DOUBLE) AS total_area,
        |  'UNKNOWN' AS project_type
        |FROM customer ORDER BY CAST(source_id AS INTEGER)""".stripMargin,
    "n12_coerce_introspect" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 4 = 0 THEN NULL
        |       ELSE c_mktsegment || ',' || c_name END AS facilities,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'x,' || c_mktsegment
        |       ELSE c_mktsegment END AS quality_indexes
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "n9_dotted_paths" ->
      """SELECT c_custkey, c_name AS investor_name,
        |  c_mktsegment || '|parking' AS utilities_internal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "n10_size_guards" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 OR o_orderkey % 7 = 0 THEN NULL
        |       ELSE 'u' || CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus
        |  END AS images
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "d7_audit_clock" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS record_key,
        |  sha256('sp_' || CAST(c_custkey AS VARCHAR)) AS universal_id,
        |  '2025-01-15' AS silver_processed_at,
        |  '2.0' AS silver_version,
        |  TRUE AS is_current,
        |  '2025-01-15' AS valid_from,
        |  CAST(NULL AS VARCHAR) AS valid_to
        |FROM customer ORDER BY CAST(record_key AS INTEGER)""".stripMargin,
    "f4_normalize_text" ->
      """SELECT c_custkey,
        |  regexp_replace(trim('  ' || c_name || '   ' || c_mktsegment || '	' || CAST(c_acctbal AS VARCHAR) || '  '),
        |    '\s+', ' ', 'g') AS txt
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f8_amenity_flags" ->
      """WITH raw AS (
        |  SELECT o_orderkey,
        |    'Căn hộ cao cấp ' ||
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'có hồ bơi và phòng gym ' ELSE '' END ||
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'bãi đỗ xe rộng, sân vườn ' ELSE '' END ||
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'an ninh 24/7, khu vui chơi trẻ em ' ELSE '' END ||
        |    o_orderpriority AS description
        |  FROM orders)
        |SELECT o_orderkey,
        |  regexp_matches(description, '(bể bơi|hồ bơi|swimming pool)') AS has_swimming_pool,
        |  regexp_matches(description, '(phòng gym|gym|fitness)') AS has_gym,
        |  regexp_matches(description, '(bãi đỗ xe|chỗ đậu xe|parking)') AS has_parking,
        |  regexp_matches(description, '(vườn|sân vườn|garden)') AS has_garden,
        |  regexp_matches(description, '(bảo vệ|an ninh|security)') AS has_security,
        |  regexp_matches(description, '(khu vui chơi|sân chơi|playground)') AS has_playground
        |FROM raw ORDER BY o_orderkey""".stripMargin,
    "d2_multiformat_date" ->
      """SELECT o_orderkey, o_orderdate AS dt
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "d3_dual_format_date" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 0
        |    THEN CAST(CAST(make_timestamp((1500000000000 + o_orderkey * 86400000) * 1000) AS DATE) AS TIMESTAMP)
        |    ELSE o_orderdate END AS handover_ts
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "m12_quality_tier" ->
      """WITH raw AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS tps,
        |    CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE 21.0 END AS lat,
        |    CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE 105.8 END AS lon,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 0.0
        |         ELSE CAST(o_orderkey % 100 + 10 AS DOUBLE) END AS area,
        |    (o_orderkey % 11) / 10.0 AS score
        |  FROM orders),
        |tiered AS (
        |  SELECT o_orderkey,
        |    CASE WHEN tps IS NOT NULL AND tps > 0 AND lat IS NOT NULL
        |           AND lon IS NOT NULL AND area > 0 AND score >= 0.6 THEN 'high'
        |         WHEN tps IS NOT NULL AND tps > 0 AND score >= 0.4 THEN 'medium'
        |         ELSE 'low' END AS quality_tier
        |  FROM raw)
        |SELECT o_orderkey, quality_tier,
        |  (quality_tier = 'high') AS is_training_ready
        |FROM tiered ORDER BY o_orderkey""".stripMargin,
    "j3_city_fallback_impute" ->
      """WITH raw AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_nationkey % 5 = 4 THEN NULL
        |         ELSE 'City' || CAST(c_nationkey % 5 AS VARCHAR) END AS city,
        |    CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_mktsegment END AS district,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL
        |         ELSE CAST((c_custkey % 50) + 1 AS DOUBLE) * 1000000.0 END AS aup,
        |    CAST((c_custkey % 80) + 20 AS DOUBLE) AS area
        |  FROM customer),
        |raw2 AS (SELECT *, CASE WHEN aup IS NOT NULL THEN aup * area END AS asp FROM raw),
        |priced AS (SELECT * FROM raw2 WHERE aup IS NOT NULL AND aup > 0 AND city IS NOT NULL),
        |dstats AS (SELECT city, district, median(aup) AS dmed
        |           FROM priced WHERE district IS NOT NULL GROUP BY city, district),
        |cstats AS (SELECT city, median(aup) AS cmed FROM priced GROUP BY city)
        |SELECT r.c_custkey, r.city, r.district,
        |  (r.asp IS NULL OR r.asp = 0) AS price_imputed,
        |  CASE WHEN (r.asp IS NULL OR r.asp = 0)
        |    THEN COALESCE(d.dmed, c.cmed, 80000000.0) ELSE r.aup END AS unit_price_out,
        |  CASE WHEN (r.asp IS NULL OR r.asp = 0)
        |    THEN CASE WHEN r.area IS NOT NULL AND r.area > 0
        |      THEN COALESCE(d.dmed, c.cmed, 80000000.0) * r.area END
        |    ELSE r.asp END AS selling_price_out,
        |  CASE WHEN (r.asp IS NULL OR r.asp = 0)
        |    THEN (CASE WHEN r.area IS NOT NULL AND r.area > 0
        |      THEN COALESCE(d.dmed, c.cmed, 80000000.0) * r.area END) * 0.9
        |    END AS min_out,
        |  CASE WHEN (r.asp IS NULL OR r.asp = 0)
        |    THEN (CASE WHEN r.area IS NOT NULL AND r.area > 0
        |      THEN COALESCE(d.dmed, c.cmed, 80000000.0) * r.area END) * 1.1
        |    END AS max_out
        |FROM raw2 r
        |LEFT JOIN dstats d ON r.city = d.city AND r.district = d.district
        |LEFT JOIN cstats c ON r.city = c.city
        |ORDER BY r.c_custkey""".stripMargin,
    "n3_flatten_albums" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN NULL
        |       ELSE array_to_string([o_orderpriority, o_orderstatus, CAST(o_custkey AS VARCHAR)], ',')
        |  END AS images
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "n8_translation_name" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 6 = 0 THEN NULL ELSE c_name END AS city
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "x1_centroid_geocode" ->
      """WITH raw AS (
        |  SELECT c_custkey, c_custkey % 5 AS m FROM customer)
        |SELECT c_custkey,
        |  CASE m WHEN 0 THEN 'Hanoi' WHEN 1 THEN 'TP. Hanoi'
        |         WHEN 2 THEN 'Ho Chi Minh' WHEN 3 THEN 'Da Nang'
        |         ELSE 'Nowhere' END AS city,
        |  CASE m WHEN 0 THEN 'Ba Dinh' WHEN 1 THEN 'Q. Hoan Kiem'
        |         WHEN 2 THEN 'District 1' WHEN 3 THEN 'Hai Chau'
        |         ELSE 'Xville' END AS district,
        |  (m != 3) AS coordinates_imputed,
        |  CASE m WHEN 0 THEN 21.0333 WHEN 1 THEN 21.0285
        |         WHEN 2 THEN 10.7769 WHEN 3 THEN 16.0 END AS latitude,
        |  CASE m WHEN 0 THEN 105.8189 WHEN 1 THEN 105.8542
        |         WHEN 2 THEN 106.7009 WHEN 3 THEN 108.2 END AS longitude
        |FROM raw ORDER BY c_custkey""".stripMargin
  )
}
