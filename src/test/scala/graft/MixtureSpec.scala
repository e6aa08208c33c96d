package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixture

/** Deterministic mixture sampling: largest-remainder quotas always sum
  * to the budget, draws respect quotas and exclude unlisted strata,
  * short strata contribute what they have, and the draw is invariant
  * to input partitioning. */
class MixtureSpec extends SparkSuite {

  test("allocate: quotas sum to the budget; largest remainders win, " +
    "ties to the smaller stratum") {
    val a = Mixture.allocate(Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), 3)
    // exact shares 1.5/0.75/0.75 -> floors 1/0/0, two leftover seats go
    // to the .75 remainders (not the .5)
    assert(a === Map("a" -> 1, "b" -> 1, "c" -> 1))
    val b = Mixture.allocate(Map("x" -> 1.0, "y" -> 1.0, "z" -> 1.0), 200)
    assert(b.values.sum === 200)
    assert(b("x") - b("z") <= 1)
    // un-normalized weights normalize
    val c = Mixture.allocate(Map("p" -> 2.0, "q" -> 6.0), 100)
    assert(c === Map("p" -> 25, "q" -> 75))
  }

  test("sample: quotas respected, unlisted strata excluded, short " +
    "strata capped at what exists") {
    val s = spark
    import s.implicits._
    val df = ((1 to 50).map(i => (i.toLong, "big")) ++
      (51 to 53).map(i => (i.toLong, "tiny")) ++
      (54 to 60).map(i => (i.toLong, "unlisted")))
      .toDF("doc_id", "src")
    val out = Mixture.sample(df, "src", "doc_id",
      Map("big" -> 10, "tiny" -> 10)).cache()
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc === Map("big" -> 10L, "tiny" -> 3L))
    out.unpersist()
  }

  test("draw is invariant to input partitioning and stable under " +
    "inserts into OTHER strata") {
    val s = spark
    import s.implicits._
    val base = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
    def draw(rows: Seq[(Long, String)], parts: Int) =
      Mixture.sample(rows.toDF("doc_id", "src").repartition(parts),
          "src", "doc_id", Map("a" -> 7, "b" -> 7))
        .select("src", "doc_id", "rn").orderBy("src", "rn")
        .collect().toSeq
    assert(draw(base, 1) === draw(base, 13))
    // growing stratum b must not change stratum a's draw
    val grown = base ++ (101 to 120).map(i => (i.toLong, "b"))
    val aBefore = draw(base, 4).filter(_.getString(0) == "a")
    val aAfter = draw(grown, 4).filter(_.getString(0) == "a")
    assert(aBefore === aAfter)
  }

  test("sm7 gate shape: per-lang counts equal the documented quotas " +
    "(or the stratum size when smaller)") {
    val rows = SparkEntry.queries("sm7_mixture_sample")(spark, sf).collect()
    val quotas = Map("en" -> 80, "zh" -> 40, "es" -> 40, "de" -> 20, "fr" -> 20)
    val byLang = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    byLang.foreach { case (lang, n) =>
      assert(n <= quotas(lang), s"$lang over quota: $n")
    }
    assert(rows.forall(r => quotas.contains(r.getString(0))))
  }
}
