package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.BottomK

/** Typed bottom-k Aggregator: agreement with the window formulation and
  * basic shape invariants. */
class BottomKSpec extends SparkSuite {

  test("bottom-4 equals the window row_number formulation on real data") {
    val grams = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, greatest(length(text) - 7, 1)), i -> xxhash64(substring(text, i, 8)))")))
        .as("h"))
    val viaAgg = grams.groupBy("doc_id")
      .agg(BottomK.bottomK(col("h"), 4).as("fp"))
    val w = Window.partitionBy("doc_id").orderBy("h")
    val viaWindow = grams.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).groupBy("doc_id")
      .agg(sort_array(collect_list(col("h"))).as("fp"))
    val a = viaAgg.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1)))
    val b = viaWindow.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1)))
    assert(a.toSeq === b.toSeq)
  }

  test("tx6 chunked generator equals the round-3 whole-text position-explode") {
    // the O(len·1024)-bytes chunked generator must produce byte-identical
    // fingerprints to the O(len²)-bytes shape it replaced — on the real
    // corpus, on documents spanning many chunks (incl. a length that
    // leaves a sub-gram tail after the last full chunk), and on docs
    // shorter than one gram
    import spark.implicits._
    val edgeDocs = (0 until 8).map { i =>
      (100000L + i, (s"paragraph $i lorem ipsum dolor sit amet " * 200)
        .take(1024 * (i + 1) + i))  // lengths straddling chunk boundaries
    } :+ ((100100L, "tiny")) :+ ((100101L, "x" * 1031)) :+ ((100102L, "y" * 1032))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(edgeDocs.toDF("doc_id", "text"))

    def fingerprint(grams: org.apache.spark.sql.DataFrame) =
      grams.groupBy("doc_id")
        .agg(concat_ws(",",
          transform(BottomK.bottomK(col("h"), 4), x => x.cast("string")))
          .as("fingerprint"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))

    val viaChunks = fingerprint(docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(length(text) - 7, 1), 1024), s -> substring(text, s, 1031))"))
        .as("chunk"))
      .select(col("doc_id"), col("chunk"),
        explode(sequence(lit(1), greatest(length(col("chunk")) - 7, lit(1))))
          .as("i"))
      .select(col("doc_id"), expr("xxhash64(substring(chunk, i, 8))").as("h")))
    val viaPositions = fingerprint(docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1))))
          .as("i"))
      .select(col("doc_id"), expr("xxhash64(substring(text, i, 8))").as("h")))
    assert(viaChunks.toSeq === viaPositions.toSeq)
  }

  test("groups smaller than k return all values sorted") {
    import spark.implicits._
    val out = Seq(("a", 5L), ("a", 1L), ("b", 9L))
      .toDF("g", "v").groupBy("g")
      .agg(BottomK.bottomK(col("v"), 4).as("fp"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Long](1) === Seq(1L, 5L))
    assert(out(1).getSeq[Long](1) === Seq(9L))
  }

  test("duplicates collapse: bottom-k is over distinct values") {
    import spark.implicits._
    val out = Seq.fill(5)(("a", 7L)).++(Seq(("a", 3L), ("a", 3L), ("a", 11L)))
      .toDF("g", "v").groupBy("g")
      .agg(BottomK.bottomK(col("v"), 3).as("fp"))
      .collect()
    assert(out(0).getSeq[Long](1) === Seq(3L, 7L, 11L))
  }
}
