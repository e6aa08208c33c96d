package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.queries.AnalyticQueries

/** Semantics of the analytic capability extensions: as-of join against a
  * literal fixture and against the naive inequality-join formulation,
  * rollup/cube/grouping-sets shape invariants, salted-agg equivalence,
  * session-window cohesion. */
class AnalyticQueriesSpec extends SparkSuite {

  private def gid(r: org.apache.spark.sql.Row): Int =
    r.getAs[Number]("gid").intValue

  test("as-of join picks latest right row at-or-before, inclusive, null when none") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 10L, "r@10"), (1L, 15L, "r@15"), (2L, 9L, "r@9"))
      .toDF("k", "t", "payload")
    val out = AsOfJoin.backward(left, right, "k", "k", "t", "t", Seq("payload"))
      .orderBy("ev").collect().map(r => (r.getString(2), r.getString(3)))
    // e1: t=10 matches r@10 (inclusive); e2: t=20 → latest is r@15;
    // e3: t=5 precedes every right row for k=2 → null.
    assert(out.toSeq === Seq(("e1", "r@10"), ("e2", "r@15"), ("e3", null)))
  }

  test("as-of join agrees with the naive inequality-join formulation on real data") {
    val rightDeduped = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_orderkey").as("o_orderkey"))
    val left = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val unionWindow = AsOfJoin.backward(left, rightDeduped,
        "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_orderdate"))
      .select("event_id", "o_orderkey")
    val naive = left.join(rightDeduped,
        left("user_id") === rightDeduped("o_custkey") &&
          rightDeduped("o_orderdate") <= left("ts"), "left")
      .groupBy("event_id")
      .agg(max_by(col("o_orderkey"),
        struct(col("o_orderdate"), col("o_orderkey"))).as("o_orderkey"))
    val a = unionWindow.orderBy("event_id").collect().map(r => (r.getLong(0), r.get(1)))
    val b = naive.orderBy("event_id").collect().map(r => (r.getLong(0), r.get(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("rollup emits detail + per-flag subtotals + grand total") {
    val out = AnalyticQueries.queries("g1_rollup")(spark, sf).collect()
    // rollup levels: 0 = detail, 1 = per-returnflag subtotal, 3 = grand total
    assert(out.map(gid(_)).toSet === Set(0, 1, 3))
    assert(out.count(gid(_) == 3) === 1)
    val grand = out.filter(gid(_) == 3).head.getAs[Long]("cnt")
    assert(out.filter(gid(_) == 0).map(_.getAs[Long]("cnt")).sum === grand)
    assert(out.filter(gid(_) == 1).map(_.getAs[Long]("cnt")).sum === grand)
  }

  test("cube covers all four grouping-id levels and counts reconcile") {
    val out = AnalyticQueries.queries("g2_cube")(spark, sf).collect()
    val gids = out.map(gid(_)).toSet
    assert(gids === Set(0, 1, 2, 3))
    val total = out.filter(gid(_) == 3).head.getAs[Long]("cnt")
    assert(out.filter(gid(_) == 0).map(_.getAs[Long]("cnt")).sum === total)
    assert(out.filter(gid(_) == 1).map(_.getAs[Long]("cnt")).sum === total)
    assert(out.filter(gid(_) == 2).map(_.getAs[Long]("cnt")).sum === total)
  }

  test("salted two-phase agg equals direct groupBy") {
    val salted = AnalyticQueries.queries("a12_salted_agg")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val direct = Tables.events(spark, sf).groupBy("event_type")
      .agg(count(lit(1)).as("cnt")).orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq === direct.toSeq)
  }

  test("session windows: consecutive events within gap share a session") {
    val out = AnalyticQueries.queries("sw1_session_window")(spark, sf)
    // every event lands in exactly one session
    val nEvents = out.agg(sum(col("n_events"))).head.getLong(0)
    assert(nEvents === Tables.events(spark, sf).count())
    // sessions of one user never overlap: starts strictly increase and
    // each later session starts after the previous one's span
    val perUser = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("session_start")).as("d"))
      .filter(col("n") =!= col("d")).count()
    assert(perUser === 0)
  }

  test("range join bands cover every lineitem row exactly once") {
    val out = AnalyticQueries.queries("rj1_range_join")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum === Tables.lineitem(spark, sf).count())
  }

  test("winsorize clamps ~10% of each group and keeps the sum in-range") {
    val groups = Tables.orders(spark, sf).groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    AnalyticQueries.queries("a16_winsorize")(spark, sf).collect().foreach { r =>
      val (pri, p05, p95) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val n = groups(pri)
      val clamped = r.getLong(3)
      assert(p05 < p95)
      // both 5% tails clamp: between 5% and 15% of the group in total
      assert(clamped >= n / 20 && clamped <= n * 3 / 20 + 1,
        s"$pri clamped $clamped of $n")
      // the winsorized sum is bounded by n·p05 .. n·p95
      val sum = r.getDouble(4)
      assert(sum >= n * p05 - 1e-6 && sum <= n * p95 + 1e-6)
    }
  }

  test("session islands partition events exactly, ids dense from 1") {
    val out = graft.SparkEntry.queries("w9_session_islands")(spark, sf)
    assert(out.agg(sum(col("n_events"))).head.getLong(0) ===
      Tables.events(spark, sf).count())
    // per user, session ids are 1..k with no gaps
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max(col("sess_id")).as("mx"),
        min(col("sess_id")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(bad === 0)
  }
}
