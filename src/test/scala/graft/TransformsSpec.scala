package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.transform.Transforms

/** Unit tests for the transform catalog pieces not already exercised by the
  * pipeline golden runs (phones, emails, price strings, multi-format dates,
  * price banding, string-array coercion probe). */
class TransformsSpec extends SparkSuite {
  import org.apache.spark.sql.Row

  private def onePhone(in: String): String = {
    import spark.implicits._
    Transforms.standardizePhoneNumbers(
      Seq(in).toDF("phone"), "phone").head.getString(0)
  }

  test("phone normalizer: valid VN numbers keep digits, others blank") {
    assert(onePhone("090-123-4567") === "0901234567")
    assert(onePhone("(090) 123 45 678") === "09012345678")
    assert(onePhone("12345") === "")          // not ^0\d{9,10}$
    assert(onePhone("+84901234567") === "")   // digits 84901234567, no leading 0
  }

  test("phone normalizer output invariant: empty or ^0\\d{9,10}$") {
    import spark.implicits._
    val inputs = Seq("0901234567", "abc", "0-9-0-1-2-3-4-5-6-7", "",
      "012345678901234", "09x12y34z56", "(0)123456789")
    Transforms.standardizePhoneNumbers(inputs.toDF("phone"), "phone")
      .collect().map(_.getString(0))
      .foreach(p => assert(p.isEmpty || p.matches("^0\\d{9,10}$")))
  }

  test("email normalizer lowercases, trims, validates") {
    import spark.implicits._
    val out = Transforms.standardizeEmails(
      Seq("  Foo.Bar@Example.COM ", "not-an-email", "a@b.co")
        .toDF("email"), "email").collect().map(_.getString(0))
    assert(out(0) === "foo.bar@example.com")
    assert(out(1) === "")
    assert(out(2) === "a@b.co")
  }

  test("Vietnamese price strings parse with unit multipliers") {
    import spark.implicits._
    val out = Transforms.parsePriceStrings(
      Seq("5.5 tỷ", "500 triệu", "250 nghìn", "123456").toDF("p"), "p")
      .collect().map(_.getDouble(0))
    assert(out(0) === 5.5e9)
    assert(out(1) === 500e6)
    assert(out(2) === 250e3)
    assert(out(3) === 123456.0)
  }

  test("multi-format date standardizer accepts all five formats") {
    import spark.implicits._
    val inputs = Seq("2024-03-15T10:30:00", "2024-03-15 10:30:00",
      "15/03/2024", "2024-03-15")
    val out = Transforms.standardizeDates(inputs.toDF("d"), Seq("d"))
      .select(to_date(col("d")).cast("string")).collect().map(_.getString(0))
    assert(out.forall(_ === "2024-03-15"))
  }

  test("price banding edges") {
    import spark.implicits._
    val out = Transforms.categorizePriceRange(
      Seq(5e8, 1e9, 2.9e9, 4e9, 9.9e9, 1e10).toDF("avg_selling_price"))
      .collect().map(_.getString(1))
    assert(out === Array("Under 1B", "1B-3B", "1B-3B", "3B-5B", "5B-10B", "Over 10B"))
  }

  test("avg prices obey min<=avg<=max and one-sided fallbacks") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0e9), Some(2.0e9)), (Some(1.5e9), None),
      (None, Some(2.5e9)), (None, None))
      .toDF("min_selling_price", "max_selling_price")
      .withColumn("min_unit_price", lit(null).cast("double"))
      .withColumn("max_unit_price", lit(null).cast("double"))
      .withColumn("min_rent_price", lit(null).cast("double"))
      .withColumn("max_rent_price", lit(null).cast("double"))
    val out = Transforms.calculateAveragePrices(df)
      .select("avg_selling_price").collect()
    assert(out(0).getDouble(0) === 1.5e9)
    assert(out(1).getDouble(0) === 1.5e9)
    assert(out(2).getDouble(0) === 2.5e9)
    assert(out(3).isNullAt(0))
  }

  test("coerceToStringArray: JSON-probe branch on plain strings") {
    import spark.implicits._
    val df = Seq("""["a","b"]""", "solo", "").toDF("facilities")
    val out = Transforms.coerceToStringArray(df, "facilities").collect()
    assert(out(0).getSeq[String](0) === Seq("a", "b"))
    assert(out(1).getSeq[String](0) === Seq("solo"))
    assert(out(2).isNullAt(0))
  }

  test("coerceToStringArray: struct-array picks name > value > key") {
    val schema = new org.apache.spark.sql.types.StructType()
      .add("facilities", ArrayType(new org.apache.spark.sql.types.StructType()
        .add("value", StringType).add("name", StringType)))
    val rows = java.util.Arrays.asList(
      Row(Seq(Row("v1", "n1"), Row("v2", "n2"))))
    val df = spark.createDataFrame(rows, schema)
    val out = Transforms.coerceToStringArray(df, "facilities").head
    assert(out.getSeq[String](0) === Seq("n1", "n2"))
  }

  test("html cleaner handles tags and entity chain byte-for-byte") {
    import spark.implicits._
    val out = Transforms.cleanHtmlTags(
      Seq("<p>C&aacute;t   l&agrave;nh</p><br/>&amp;&nbsp;ok&lt;3")
        .toDF("description"), Seq("description")).head.getString(0)
    assert(out === "Cát lành & ok<3")
  }

  test("numeric extraction strips everything but digits and dots") {
    import spark.implicits._
    val out = Transforms.extractNumeric(
      Seq("khoảng 120.5 m²").toDF("s"), "s", "n").select("n").head.getDouble(0)
    assert(out === 120.5)
  }
}
