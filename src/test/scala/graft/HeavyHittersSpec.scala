package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Misra–Gries heavy hitters: the order-independent contract
  * (est ≤ exact, est ≥ exact − N/(k+1), presence above the threshold)
  * holds on a Zipf-ish corpus whose vocabulary far exceeds k — so
  * compaction actually runs — and is invariant to repartitioning. The
  * plan pin asserts the only shuffle carries per-partition summary rows,
  * never raw tokens. */
class HeavyHittersSpec extends SparkSuite {
  import org.apache.spark.sql.DataFrame

  /** ~9k tokens, vocabulary 5030 ≫ k: head token t appears `1000/t`
    * times (1000, 500, 333, …, 33), tail tokens once each — a
    * deterministic Zipf shape. */
  private lazy val zipf: DataFrame = {
    import spark.implicits._
    val rows = (1 to 30).flatMap { t =>
      Seq.fill(30000 / (t * 30))(s"tok_$t") // head: 1000, 500, 333 ...
    } ++ (1 to 5000).map(t => s"tail_$t")
    // interleave head and tail deterministically so compactions see a
    // realistic mixed stream, not all-head-then-all-tail
    val mixed = rows.sortBy(x => scala.util.hashing.MurmurHash3.stringHash(x))
    mixed.toDF("token")
  }

  private def exactCounts(df: DataFrame): Map[String, Long] =
    df.groupBy("token").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("MG bounds hold for every token, vocab >> k, under repartitioning") {
    val exact = exactCounts(zipf)
    val n = exact.values.sum
    val k = 32
    val bound = n.toDouble / (k + 1)
    for (parts <- Seq(1, 3, 8)) {
      val est = HeavyHitters.approxCounts(zipf.repartition(parts), "token", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (tok, ex) =>
        val e = est.getOrElse(tok, 0L)
        assert(e <= ex, s"$tok overestimated: $e > $ex (parts=$parts)")
        assert(e.toDouble >= ex - bound,
          s"$tok under bound: $e < $ex - $bound (parts=$parts)")
      }
      // presence guarantee: trueCount > N/(k+1) => in the merged summary
      exact.filter(_._2 > bound).keys.foreach { tok =>
        assert(est.contains(tok), s"$tok (count ${exact(tok)}) missing")
      }
    }
  }

  test("batch-accumulated summaries merged by summation keep the MG bound (st7's shape)") {
    import spark.implicits._
    val k = 32
    val exact = exactCounts(zipf)
    val n = exact.values.sum
    val bound = n.toDouble / (k + 1)
    // three "micro-batches": summarize each, merge by plain summation
    val all = zipf.collect().map(_.getString(0))
    val batches = all.grouped((all.length + 2) / 3).toSeq
    val merged = batches
      .map(b => HeavyHitters.approxCounts(
        b.toSeq.toDF("token").repartition(3), "token", k))
      .reduce(_.unionByName(_))
      .groupBy("token").agg(org.apache.spark.sql.functions.sum("est").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (tok, ex) =>
      val e = merged.getOrElse(tok, 0L)
      assert(e <= ex, s"$tok overestimated across batches: $e > $ex")
      assert(e.toDouble >= ex - bound, s"$tok under summed bound: $e < $ex - $bound")
    }
    exact.filter(_._2 > bound).keys.foreach { tok =>
      assert(merged.contains(tok), s"$tok missing from the batch-merged summary")
    }
  }

  test("per-partition summaries are k-bounded and compaction preserves weight order") {
    val toks = (1 to 4000).map(t => s"t${t % 700}") // vocab 700 >> k=16
    val out = HeavyHitters.mgSummarize(toks.iterator, 16).toSeq
    assert(out.size <= 16, s"summary overflowed k: ${out.size}")
    assert(out.forall(_._2 > 0))
  }

  test("approxTopK ranks the unambiguous head correctly") {
    // With k=128 the bound is N/(k+1) ≈ 9k/129 ≈ 70; tok_1 (1000) leads
    // tok_2 (500) leads tok_3 (333) by margins above it, so ranks 1 and 2
    // are guaranteed, not just likely.
    val top = HeavyHitters.approxTopK(zipf, "token", 128, 2)
      .collect().map(_.getString(0))
    assert(top.toSeq === Seq("tok_1", "tok_2"))
  }

  test("plan: the only exchange carries summary rows, not raw tokens") {
    val plan = HeavyHitters.approxCounts(zipf, "token", 32)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 summary exchange, plan:\n$plan")
    // the exchange must sit ABOVE the MapPartitions (summaries), i.e. the
    // partial aggregate consumes mapPartitions output
    assert(plan.contains("MapPartitions"))
    assert(plan.indexOf("Exchange") < plan.indexOf("MapPartitions"),
      s"exchange should be downstream (printed above) of MapPartitions:\n$plan")
  }

  test("a19 gate booleans are all true at test sf") {
    val df = graft.SparkEntry.queries("a19_heavy_hitters")(spark, sf)
    val rows = df.collect()
    assert(rows.length === 10)
    assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3)))
  }
}
