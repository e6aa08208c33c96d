package graft

import org.apache.spark.sql.functions._
import graft.functions.SimHash

/** The typed SimHash aggregator agrees bit-for-bit with the original
  * 64-lambda HOF formulation, and basic metric properties hold. */
class SimHashSpec extends SparkSuite {

  test("aggregator matches the HOF bit-vote formulation on real documents") {
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val viaAgg = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(norm, " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy("doc_id").agg(SimHash.simhash(col("h")).as("sh"))
      .select(col("doc_id"), reverse(lpad(bin(col("sh")), 64, "0")).as("bits"))
    val viaHof = Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr("transform(split(lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' '), t -> xxhash64(t))")
          .as("th"))
      .select(col("doc_id"), expr(
        """concat_ws('', transform(sequence(0, 63), i ->
          |  IF(aggregate(th, 0, (acc, h) -> acc + IF((shiftright(h, CAST(i AS INT)) & 1) = 1, 1, -1)) >= 0, 1, 0)))""".stripMargin)
        .as("bits"))
    val a = viaAgg.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = viaHof.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("identical token streams hash identically; hamming to self is 0") {
    import spark.implicits._
    val toks = Seq((1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L))
      .toDF("id", "h")
    val out = toks.groupBy("id").agg(SimHash.simhash(col("h")).as("sh"))
      .collect().map(_.getLong(1))
    assert(out(0) === out(1))
  }
}
