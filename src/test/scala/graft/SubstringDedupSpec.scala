package graft

import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup

/** The df-cap is dd9's scale valve: a boilerplate span shared by f docs
  * would emit f²/2 pairs from the postings self-join. These fixtures pin
  * that capped shingles are excluded (and that real shared spans still
  * surface), since the sf-dir gate can't exercise the cap — no synthetic
  * shingle there is hot enough. */
class SubstringDedupSpec extends SparkSuite {
  import spark.implicits._

  private val boiler = "all rights reserved by the site"
  private def uniq(i: Int) = s"u$i v$i w$i x$i y$i z$i"

  test("boilerplate shingle above the df cap produces no pairs") {
    // 30 docs all sharing one 6-word span, each otherwise unique
    val docs = (1 to 30)
      .map(i => (i.toLong, s"${uniq(i)} $boiler"))
      .toDF("doc_id", "text")
    val out = SubstringDedup.pairs(docs, k = 5, dfCap = 10)
    assert(out.count() === 0)
    // raise the cap above 30 and the same corpus pairs up completely
    val uncapped = SubstringDedup.pairs(docs, k = 5, dfCap = 100)
    assert(uncapped.count() === 30L * 29 / 2)
  }

  test("a rare shared span surfaces even when boilerplate is capped") {
    val quote = "he said the exact same words twice"
    val docs = ((1 to 30).map(i => (i.toLong, s"${uniq(i)} $boiler")) ++
      Seq((101L, s"alpha beta $quote"), (102L, s"$quote gamma delta")))
      .toDF("doc_id", "text")
    val out = SubstringDedup.pairs(docs, k = 5, dfCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((101L, 102L)))
  }

  test("capped-buffer path (integral ids) equals the count+semi-join fallback (string ids)") {
    // mixed corpus: boilerplate over the cap, one rare pair, identical docs
    val quote = "he said the exact same words twice"
    val docs = ((1 to 30).map(i => (i.toLong, s"${uniq(i)} $boiler")) ++
      Seq((101L, s"alpha beta $quote"), (102L, s"$quote gamma delta"),
        (201L, "a b c d e f"), (202L, "a b c d e f")))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long)] =
      df.collect().map(r =>
        (r.get(0).toString, r.get(1).toString, r.getLong(2))).toSet
    val viaCapped = SubstringDedup.pairs(docs, k = 5, dfCap = 10)
    val viaFallback = SubstringDedup.pairs(
      docs.withColumn("doc_id", col("doc_id").cast("string")),
      k = 5, dfCap = 10)
    assert(canon(viaCapped) === canon(viaFallback))
    assert(canon(viaCapped).nonEmpty)
  }

  test("null doc_id rows are dropped, never deserialized as doc 0") {
    // without the guard, the typed Long aggregator turned a null id into
    // 0L and fabricated pairs for a phantom doc 0 (only on the integral
    // path — the string path's collect_list skipped nulls silently)
    val docs = Seq(
      (java.lang.Long.valueOf(0L), "x y z w v u"),
      (null.asInstanceOf[java.lang.Long], "x y z w v u"),
      (java.lang.Long.valueOf(1L), "x y z w v u")
    ).toDF("doc_id", "text")
    val got = SubstringDedup.pairs(docs, k = 5, dfCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L)),
      s"null id must vanish; got $got")
  }

  test("n_shared counts distinct shared shingles, short docs fall back to whole text") {
    val docs = Seq(
      (1L, "a b c d e f"),   // shingles: "a b c d e", "b c d e f"
      (2L, "a b c d e f"),   // identical → shares both
      (3L, "tiny doc")       // < k words → whole-text shingle
    ).toDF("doc_id", "text")
    val rows = SubstringDedup.pairs(docs, k = 5, dfCap = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows === Map((1L, 2L) -> 2L))
  }
}
