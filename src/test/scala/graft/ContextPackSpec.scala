package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ContextPack

/** Concat-then-chunk context packing: bit-parity with the naive
  * single-window spelling, partitioning invariance (exact integer
  * prefix sums), the no-single-partition-exchange plan pin that is the
  * operator's reason to exist, and the stream-contiguity invariants of
  * a correct placement map. */
class ContextPackSpec extends SparkSuite {

  private def fixture = {
    import spark.implicits._
    // token counts spanning the interesting shapes: sub-window docs,
    // exact-boundary docs, multi-window docs (>> window)
    (0L until 3000L).map(i =>
      (i, 1L + (i * 37 % 97) + (if (i % 151 == 0) 1300L else 0L)))
      .toDF("doc_id", "n_tokens")
  }

  test("placements equal the naive single-window spelling, any partitioning") {
    val W = 256L
    val naive = fixture
      .withColumn("cum", sum(col("n_tokens"))
        .over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"),
        expr(s"(cum - n_tokens) div ${W}L").as("first_window"),
        expr(s"(cum - 1) div ${W}L").as("last_window"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    for (parts <- Seq(1, 7)) {
      val got = ContextPack.placements(
          fixture.repartition(parts), "doc_id", "n_tokens", W)
        .select("doc_id", "first_window", "last_window")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got.toSeq == naive.toSeq, s"parts=$parts")
    }
  }

  test("plan pin: no Exchange SinglePartition — the two-phase sum is " +
      "the point") {
    val plan = ContextPack.placements(fixture, "doc_id", "n_tokens", 256L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("placement map is stream-contiguous and covers exactly " +
      "ceil(total/W) windows") {
    val W = 512L
    val rows = ContextPack.placements(fixture, "doc_id", "n_tokens", W)
      .select("doc_id", "n_tokens", "cum_tokens", "first_window",
        "last_window", "n_windows")
      .collect().sortBy(_.getLong(0))
    val total = rows.map(_.getLong(1)).sum
    assert(rows.last.getLong(4) == (total - 1) / W,
      "last doc's last window is the stream's last window")
    // consecutive docs abut: next first_window is the previous doc's
    // last window (shared context) or the one after (clean boundary)
    rows.sliding(2).foreach { case Array(a, b) =>
      val (al, bf) = (a.getLong(4), b.getLong(3))
      assert(bf == al || bf == al + 1,
        s"gap between ${a.getLong(0)} and ${b.getLong(0)}: $al -> $bf")
    }
    // n_windows accounting: a doc of n tokens starting at offset o
    // occupies exactly (o+n-1)/W - o/W + 1 windows; a 1300+-token doc
    // must straddle >= 3 windows of 512
    assert(rows.filter(_.getLong(1) > 1300).forall(_.getLong(5) >= 3))
    assert(rows.forall(r => r.getLong(5) ==
      r.getLong(4) - r.getLong(3) + 1))
  }

  test("fractional token column is rejected loudly") {
    import spark.implicits._
    val bad = Seq((1L, 2.5)).toDF("doc_id", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      ContextPack.placements(bad, "doc_id", "n_tokens", 10L)
    }
    assert(e.getMessage.contains("integral"))
  }
}
