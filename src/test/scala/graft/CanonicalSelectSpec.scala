package graft

import org.apache.spark.sql.functions._
import graft.operators.CanonicalSelect

/** Canonical selection: pair-source-agnostic cluster + quality-argmax
  * semantics, the df cap's conservative direction, and the banded
  * corpus-scale pair source finding planted near-dups. */
class CanonicalSelectSpec extends SparkSuite {

  private def idsOf(n: Int) = {
    import spark.implicits._
    (0 until n).map(_.toLong).toDF("id")
  }

  test("run: transitive clusters, quality argmax, ties to lowest id") {
    import spark.implicits._
    // pairs chain 0-1-2 (cluster of 3), 3-4; 5 is a singleton
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("src", "dst")
    val q = Seq((0L, 0.5), (1L, 0.9), (2L, 0.9), (3L, 0.7), (4L, 0.7),
      (5L, 0.1)).toDF("id", "q_score")
    val out = CanonicalSelect.run(idsOf(6), pairs, q)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(3))).toMap
    assert(out.size === 6)
    // 0,1,2 share a cluster; kept = id 1 (q 0.9, tie with 2 → lower id)
    assert(out(0)._1 === out(1)._1 && out(1)._1 === out(2)._1)
    assert(out(1)._2 && !out(0)._2 && !out(2)._2)
    // 3,4 tie at 0.7 → 3 kept; singleton 5 kept
    assert(out(3)._1 === out(4)._1 && out(3)._2 && !out(4)._2)
    assert(out(5)._2)
  }

  test("run: ids missing a q_score row survive, ranked below scored ones") {
    import spark.implicits._
    // 0-1 clustered, only 1 scored → 1 kept, 0 present with null score;
    // 2-3 clustered, NEITHER scored → lowest id kept; 4 unscored singleton
    val pairs = Seq((0L, 1L), (2L, 3L)).toDF("src", "dst")
    val q = Seq((1L, 0.2)).toDF("id", "q_score")
    val out = CanonicalSelect.run(idsOf(5), pairs, q)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getBoolean(3))).toMap
    assert(out.size === 5, "every input id exactly once")
    assert(out(1) === (Some(0.2), true) && out(0) === (None, false))
    assert(out(2) === (None, true) && out(3) === (None, false))
    assert(out(4) === (None, true))
  }

  test("gramJaccardPairs: exact pairs; df cap only SHRINKS the pair set") {
    import spark.implicits._
    val docs = Seq(
      (0L, "abcdefgh"), (1L, "abcdefgx"), // 7-gram overlap, J = 5/7
      (2L, "zzzzyyyy"), (3L, "qqqqrrrr")
    ).toDF("doc_id", "text")
    val full = CanonicalSelect.gramJaccardPairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === Set((0L, 1L)))
    // cap df ≤ 1 drops every shared gram from the join: pairs can only
    // disappear (conservative), never appear
    val capped = CanonicalSelect.gramJaccardPairs(docs, "doc_id", "text",
        0.6, maxDfPerGram = Some(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(full))
  }

  test("minhashPairs finds planted near-exact duplicates") {
    import spark.implicits._
    val base = (0 until 40).map(i =>
      (i.toLong, s"alpha bravo charlie delta echo$i foxtrot golf hotel " +
        s"india juliet kilo lima mike november oscar papa"))
    val copies = (0 until 40 by 4).map(i =>
      (100L + i, base(i)._2 + " extra"))
    val docs = (base ++ copies).toDF("doc_id", "text")
    val got = CanonicalSelect.minhashPairs(docs, minAgreement = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 40 by 4).map(i => (i.toLong, 100L + i)).toSet
    assert(want.subsetOf(got),
      s"missing planted pairs: ${want.diff(got)}")
  }
}
