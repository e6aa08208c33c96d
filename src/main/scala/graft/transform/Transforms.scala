package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.Mappings

/** Pure DataFrame/Column combinators covering the reference's transform
  * catalog (transformation_utils.py — cited per function). Everything is
  * built-in-function based (whole-stage codegen'd); no UDFs.
  */
object Transforms {

  /** F2: phone → digits-only, must match Vietnamese ^0\d{9,10}$ else ""
    * (transformation_utils.py:23-49). */
  def standardizePhoneNumbers(df: DataFrame, phoneCol: String): DataFrame = {
    val digits = when(col(phoneCol).isNotNull,
      regexp_replace(col(phoneCol), "[^\\d]", "")).otherwise(lit(""))
    df.withColumn(phoneCol, digits)
      .withColumn(phoneCol,
        when(col(phoneCol).rlike("^0\\d{9,10}$"), col(phoneCol)).otherwise(lit("")))
  }

  /** F3: email → lower/trim, validated else "" (transformation_utils.py:52-76). */
  def standardizeEmails(df: DataFrame, emailCol: String): DataFrame = {
    val lowered = when(col(emailCol).isNotNull, lower(trim(col(emailCol))))
      .otherwise(lit(""))
    df.withColumn(emailCol, lowered)
      .withColumn(emailCol,
        when(col(emailCol).rlike("^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"),
          col(emailCol)).otherwise(lit("")))
  }

  /** F1: strip HTML tags, decode entity table in order, collapse whitespace
    * (transformation_utils.py:79-173). The entity pass is a single fold of
    * regexp_replace — same output, one projection. */
  def cleanHtmlTags(df: DataFrame, textCols: Seq[String]): DataFrame =
    textCols.filter(df.columns.contains).foldLeft(df) { (acc, c) =>
      val noTags = regexp_replace(
        regexp_replace(col(c), "<br\\s*/?>", " "), "<[^>]+>", " ")
      val decoded = Mappings.HtmlEntities.foldLeft(noTags) {
        case (e, (pat, rep)) => regexp_replace(e, pat, rep)
      }
      acc.withColumn(c,
        when(col(c).isNotNull, trim(regexp_replace(decoded, "\\s+", " ")))
          .otherwise(col(c)))
    }

  /** F4: trim + collapse internal whitespace (transformation_utils.py:176-197). */
  def normalizeText(df: DataFrame, textCols: Seq[String]): DataFrame =
    textCols.filter(df.columns.contains).foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isNotNull, regexp_replace(trim(col(c)), "\\s+", " "))
          .otherwise(col(c)))
    }

  /** F5: strip non-[\d.] and cast (transformation_utils.py:200-217). */
  def extractNumeric(df: DataFrame, src: String, target: String): DataFrame =
    df.withColumn(target,
      regexp_replace(col(src), "[^\\d.]", "").cast(DoubleType))

  /** F6: city-name standardization when()-ladder
    * (transformation_utils.py:220-254). The reference folds otherwise()
    * chains; a lookup-join is the at-scale alternative (see GoldEtl). */
  def standardizeCityNames(df: DataFrame, cityCol: String): DataFrame = {
    val expr0 = Mappings.CityMappings.foldLeft(col(cityCol)) {
      case (acc, (vn, en)) => when(trim(col(cityCol)) === vn, lit(en)).otherwise(acc)
    }
    df.withColumn(cityCol, expr0)
  }

  /** F7: Vietnamese price-string parser with unit multipliers
    * (transformation_utils.py:257-288). */
  def parsePriceStrings(df: DataFrame, priceCol: String,
                        unitCol: String = "price_unit"): DataFrame = {
    val num = regexp_replace(col(priceCol), "[^\\d.]", "").cast(DoubleType)
    df.withColumn(priceCol,
        when(col(priceCol).rlike("tỷ|ty|billion"), num * 1e9)
          .when(col(priceCol).rlike("triệu|tr|million"), num * 1e6)
          .when(col(priceCol).rlike("nghìn|ngàn|k"), num * 1e3)
          .otherwise(num))
      .withColumn(unitCol, lit("VND"))
  }

  /** M6: price / area with null+zero guard (transformation_utils.py:290-315). */
  def calculatePricePerSqm(df: DataFrame, priceCol: String = "price",
                           areaCol: String = "total_area",
                           target: String = "price_per_sqm"): DataFrame =
    df.withColumn(target,
      when(col(priceCol).isNotNull && col(areaCol).isNotNull && col(areaCol) > 0,
        col(priceCol) / col(areaCol)).otherwise(lit(null)))

  /** D2: multi-format date standardizer — coalesce of to_timestamp attempts
    * (transformation_utils.py:380-409). */
  def standardizeDates(df: DataFrame, dateCols: Seq[String]): DataFrame =
    dateCols.filter(df.columns.contains).foldLeft(df) { (acc, c) =>
      acc.withColumn(c, coalesce(
        to_timestamp(col(c), "yyyy-MM-dd'T'HH:mm:ss"),
        to_timestamp(col(c), "yyyy-MM-dd HH:mm:ss"),
        to_timestamp(col(c), "dd/MM/yyyy"),
        to_timestamp(col(c), "yyyy-MM-dd"),
        to_timestamp(col(c))))
    }

  /** D3: dual-format date — a string column holding either epoch millis
    * (casts to long, > 1e12) or "yyyy-MM-dd" (silver_etl_script.py:363-389). */
  def parseDualFormatDate(c: Column): Column =
    when(c.isNotNull,
      when(c.cast("long").isNotNull && c.cast("long") > 1000000000000L,
        to_date(from_unixtime(c.cast("long") / 1000)).cast("timestamp"))
        .otherwise(to_timestamp(c, "yyyy-MM-dd")))
      .otherwise(lit(null).cast("timestamp"))

  /** F10: sha2 surrogate key over concat_ws
    * (transformation_utils.py:411-431). */
  def addHashId(df: DataFrame, cols: Seq[String],
                target: String = "hash_id"): DataFrame =
    df.withColumn(target, sha2(concat_ws("_", cols.map(col): _*), 256))

  /** M11: price banding (transformation_utils.py:433-456). */
  def categorizePriceRange(df: DataFrame, priceCol: String = "avg_selling_price",
                           target: String = "price_category"): DataFrame =
    df.withColumn(target,
      when(col(priceCol) < 1e9, "Under 1B")
        .when(col(priceCol) < 3e9, "1B-3B")
        .when(col(priceCol) < 5e9, "3B-5B")
        .when(col(priceCol) < 1e10, "5B-10B")
        .when(col(priceCol) >= 1e10, "Over 10B")
        .otherwise("Unknown"))

  /** M3: (min+max)/2 with one-sided fallbacks, for selling/unit/rent price
    * (transformation_utils.py:459-514; silver_etl_script.py:770-804). */
  private def avgOf(minC: String, maxC: String): Column =
    when(col(minC).isNotNull && col(maxC).isNotNull, (col(minC) + col(maxC)) / 2)
      .when(col(minC).isNotNull, col(minC))
      .when(col(maxC).isNotNull, col(maxC))
      .otherwise(lit(null))

  def calculateAveragePrices(df: DataFrame): DataFrame =
    df.withColumn("avg_selling_price", avgOf("min_selling_price", "max_selling_price"))
      .withColumn("avg_unit_price", avgOf("min_unit_price", "max_unit_price"))
      .withColumn("avg_rent_price", avgOf("min_rent_price", "max_rent_price"))

  /** M4: max−min ranges (transformation_utils.py:517-545). */
  def calculatePriceRanges(df: DataFrame): DataFrame =
    df.withColumn("price_range",
        when(col("min_selling_price").isNotNull && col("max_selling_price").isNotNull,
          col("max_selling_price") - col("min_selling_price")).otherwise(lit(null)))
      .withColumn("area_range",
        when(col("min_area").isNotNull && col("max_area").isNotNull,
          col("max_area") - col("min_area")).otherwise(lit(null)))

  /** F8: amenity keyword flags from description
    * (transformation_utils.py:571-602). */
  def extractProjectFeatures(df: DataFrame,
                             descCol: String = "description"): DataFrame =
    Mappings.AmenityPatterns.foldLeft(df) { case (acc, (name, pat)) =>
      acc.withColumn(name,
        when(col(descCol).rlike(pat), lit(true)).otherwise(lit(false)))
    }

  /** N5: min/max bedroom = first/last of insight_by_bedroom
    * (transformation_utils.py:604-630). */
  def extractBedroomRanges(df: DataFrame): DataFrame =
    if (!df.columns.contains("insight_by_bedroom")) df
    else df
      .withColumn("min_bedroom",
        when(col("insight_by_bedroom").isNotNull && size(col("insight_by_bedroom")) > 0,
          element_at(col("insight_by_bedroom"), 1).getField("number_of_bedroom")
            .cast(IntegerType)).otherwise(lit(null)))
      .withColumn("max_bedroom",
        when(col("insight_by_bedroom").isNotNull && size(col("insight_by_bedroom")) > 0,
          element_at(col("insight_by_bedroom"), -1).getField("number_of_bedroom")
            .cast(IntegerType)).otherwise(lit(null)))

  /** N1: quality_indexes struct-array → name array
    * (transformation_utils.py:633-653). */
  def extractQualityIndexNames(df: DataFrame): DataFrame =
    if (!df.columns.contains("quality_indexes")) df
    else df.withColumn("quality_indexes",
      when(col("quality_indexes").isNotNull,
        expr("transform(quality_indexes, x -> x.name)")).otherwise(lit(null)))

  /** N3: flatten album images (transformation_utils.py:655-676). */
  def extractAlbumImages(df: DataFrame): DataFrame =
    if (!df.columns.contains("albums")) df
    else df.withColumn("images",
      when(col("albums").isNotNull && size(col("albums")) > 0,
        expr("flatten(transform(albums, x -> x.images))")).otherwise(lit(null)))

  /** N6: first element of int arrays (transformation_utils.py:678-700). */
  def extractFirstFromArray(df: DataFrame,
                            fieldMappings: Seq[(String, String)]): DataFrame =
    fieldMappings.foldLeft(df) { case (acc, (target, src)) =>
      if (!acc.columns.contains(src)) acc
      else acc.withColumn(target,
        when(col(src).isNotNull && size(col(src)) > 0,
          element_at(col(src), 1).cast(IntegerType)).otherwise(lit(null)))
    }

  /** N8: ward/district/city ← x.translation[0].name
    * (transformation_utils.py:702-751). Only applied when the base column
    * is a complex type, like the reference. */
  def extractNestedTranslation(df: DataFrame, fields: Seq[String]): DataFrame =
    fields.foldLeft(df) { (acc, f) =>
      acc.schema.find(_.name == f).map(_.dataType) match {
        case Some(_: StructType) =>
          acc.withColumn(f,
            when(col(f).isNotNull,
              col(s"$f.translation").getItem(0).getField("name"))
              .otherwise(lit(null)))
        case _ => acc
      }
    }

  /** F9: Chotot "lat,lng" geo string → two doubles
    * (transformation_utils.py:753-780). */
  def splitGeoCoordinates(df: DataFrame, geoCol: String = "geo"): DataFrame =
    if (!df.columns.contains(geoCol)) df
    else df
      .withColumn("latitude",
        when(col(geoCol).isNotNull && col(geoCol).contains(","),
          split(col(geoCol), ",").getItem(0).cast(DoubleType)).otherwise(lit(null)))
      .withColumn("longitude",
        when(col(geoCol).isNotNull && col(geoCol).contains(","),
          split(col(geoCol), ",").getItem(1).cast(DoubleType)).otherwise(lit(null)))

  /** N7: Meeyproject GeoJSON [lon, lat] → columns
    * (transformation_utils.py:782-809). */
  def extractMeeyprojectLocation(df: DataFrame): DataFrame =
    if (!df.columns.contains("location")) df
    else df
      .withColumn("longitude",
        when(col("location.coordinates").isNotNull &&
          size(col("location.coordinates")) >= 2,
          element_at(col("location.coordinates"), 1).cast(DoubleType))
          .otherwise(lit(null)))
      .withColumn("latitude",
        when(col("location.coordinates").isNotNull &&
          size(col("location.coordinates")) >= 2,
          element_at(col("location.coordinates"), 2).cast(DoubleType))
          .otherwise(lit(null)))

  /** N12: coerce a column to array<string>, introspecting the live schema:
    * struct-arrays project name > value > key > first string field;
    * plain strings parse as JSON array when "["-prefixed else wrap
    * (silver_etl_script.py:407-475). */
  def coerceToStringArray(df: DataFrame, field: String): DataFrame = {
    val target = ArrayType(StringType)
    df.schema.find(_.name == field).map(_.dataType) match {
      case Some(ArrayType(st: StructType, _)) =>
        val names = st.fields.map(_.name)
        val pick = Seq("name", "value", "key").find(names.contains)
          .orElse(st.fields.find(_.dataType == StringType).map(_.name))
        pick match {
          case Some(f) => df.withColumn(field,
            when(col(field).isNotNull, expr(s"transform($field, x -> x.$f)"))
              .otherwise(lit(null).cast(target)))
          case None => df.withColumn(field, lit(null).cast(target))
        }
      case Some(_: ArrayType) =>
        df.withColumn(field, col(field).cast(target))
      case Some(StringType) =>
        df.withColumn(field,
          when(col(field).isNotNull && col(field) =!= "",
            when(col(field).startsWith("["), from_json(col(field), target))
              .otherwise(array(col(field))))
            .otherwise(lit(null).cast(target)))
      case Some(_) => df.withColumn(field, lit(null).cast(target))
      case None => df
    }
  }

  /** PII redaction for training-data curation: URLs, emails, and
    * Vietnamese-style phone numbers → placeholder tokens. URL first (an
    * email-looking userinfo inside a URL must redact as part of the URL),
    * then email, then phone. Patterns are RE2-compatible (no lookaround /
    * backrefs) so external engines reproduce them exactly; codegen'd
    * regexp_replace, one pass per pattern. */
  def redactPii(df: DataFrame, textCols: Seq[String]): DataFrame =
    textCols.filter(df.columns.contains).foldLeft(df) { (acc, c) =>
      val noUrl = regexp_replace(col(c), "https?://[^\\s]+", "<URL>")
      val noEmail = regexp_replace(noUrl,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
      val noPhone = regexp_replace(noEmail,
        "(\\+84|0)[0-9]{9,10}", "<PHONE>")
      acc.withColumn(c,
        when(col(c).isNotNull, noPhone).otherwise(col(c)))
    }
}
