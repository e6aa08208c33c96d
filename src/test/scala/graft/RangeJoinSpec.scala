package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.RangeJoin

/** The custom whole-operator band join: logical node + rewrite rule +
  * strategy + physical exec (graft.plans.RangeJoin). Parity is checked
  * against a driver-side Scala oracle computed straight from the fixture
  * formulas (immune to the session's own rewrite rule), across bound
  * inclusivity combinations, overlapping bands, nulls, and both join
  * orientations; plan shape is checked for RangeJoinExec-and-no-BNL.
  */
class RangeJoinSpec extends SparkSuite {

  // deterministic fixture: 2k probe values (some null), 40 OVERLAPPING
  // bands (width 300 at stride 100 → up to 3 matches per value) plus a
  // null-bounded band row that must never match
  private val probeRows: Seq[(Long, Option[Double])] =
    (0L until 2000L).map(id =>
      (id, if (id % 97 == 0) None else Some((id * 7 % 4001).toDouble)))
  private val bandRows: Seq[(Long, Option[Double], Option[Double])] =
    (0L until 40L).map(b =>
      (b, Some(b * 100.0), Some(b * 100.0 + 300.0))) :+
      ((-1L, None: Option[Double], None: Option[Double]))

  private def probe: DataFrame = {
    import spark.implicits._
    probeRows.toDF("id", "v")
  }
  private def bands: DataFrame = {
    import spark.implicits._
    bandRows.toDF("band", "lo", "hi")
  }

  /** Driver-side oracle: (id, v, band) matches under the given bounds. */
  private def oracle(loInc: Boolean, hiInc: Boolean): Seq[(Long, Double, Long)] =
    for {
      (id, Some(v)) <- probeRows
      (b, Some(lo), Some(hi)) <- bandRows
      if (if (loInc) v >= lo else v > lo) && (if (hiInc) v <= hi else v < hi)
    } yield (id, v, b)

  private def collected(df: DataFrame): Seq[(Long, Double, Long)] =
    df.select("id", "v", "band").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq.sorted

  for ((loInc, hiInc) <- Seq((true, false), (true, true), (false, false), (false, true)))
    test(s"band join matches the oracle (loInclusive=$loInc, hiInclusive=$hiInc)") {
      val got = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi", loInc, hiInc)
      val want = oracle(loInc, hiInc).sorted
      assert(collected(got) === want)
      assert(want.size > 2000, "overlapping bands must multi-match") // not a dedup
    }

  test("physical plan is RangeJoinExec behind a BroadcastExchange, no nested loop") {
    val df = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi")
    df.collect() // run through AQE so the final plan is the real one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"no RangeJoinExec in:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
      s"band side must arrive via broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNL still present:\n$plan")
  }

  test("the join runs INSIDE WholeStageCodegen (probe-side span not broken)") {
    val df = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // a codegen'd operator renders as "*(n) RangeJoin"; a broken span
    // would show it bare with the scan's span ending underneath
    assert(plan.linesIterator.exists(l => l.contains("RangeJoin") && l.contains("*(")),
      s"RangeJoinExec not inside a WholeStageCodegen span:\n$plan")
  }

  test("interpreted fallback path (codegen off) matches the oracle") {
    val old = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val got = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi")
      assert(collected(got) === oracle(loInc = true, hiInc = false).sorted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", old)
  }

  test("rewrite rule turns a plain declarative band join into RangeJoinExec") {
    // the shared test session carries spark.sql.extensions=graft.GraftExtensions
    val df = probe.join(broadcast(bands),
      col("v") >= col("lo") && col("v") < col("hi"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"rule did not fire:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNL survived:\n$plan")
    assert(collected(df) === oracle(loInc = true, hiInc = false).sorted)
  }

  test("rewrite fires through SQL text too (no DataFrame API involved)") {
    probe.createOrReplaceTempView("rj_probe")
    bands.createOrReplaceTempView("rj_bands")
    val df = spark.sql(
      """SELECT /*+ BROADCAST(b) */ id, v, band
        |FROM rj_probe p JOIN rj_bands b
        |  ON p.v >= b.lo AND p.v < b.hi""".stripMargin)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"rule did not fire on SQL text:\n$plan")
    assert(collected(df) === oracle(loInc = true, hiInc = false).sorted)
  }

  test("rewrite handles the swapped orientation (bands on the join's left)") {
    val df = broadcast(bands).join(probe,
      col("v") >= col("lo") && col("v") < col("hi"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"swapped rule did not fire:\n$plan")
    assert(df.columns.toSeq === (bands.columns ++ probe.columns).toSeq,
      "output column order must match the original join")
    assert(collected(df) === oracle(loInc = true, hiInc = false).sorted)
  }

  // ------------------------------------------------ left outer / semi

  /** Outer oracle: every probe row appears; unmatched (or null-valued)
    * rows carry a null band. */
  private def outerOracle(loInc: Boolean, hiInc: Boolean)
      : Seq[(Long, Option[Double], Option[Long])] = {
    val matched = oracle(loInc, hiInc).groupBy(_._1)
    probeRows.flatMap { case (id, vOpt) =>
      matched.get(id) match {
        case Some(hits) if vOpt.isDefined =>
          hits.map { case (_, v, b) => (id, Some(v), Some(b)) }
        case _ => Seq((id, vOpt, None))
      }
    }
  }

  private def collectedOuter(df: DataFrame): Seq[(Long, Option[Double], Option[Long])] =
    df.select("id", "v", "band").collect().map(r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq.sorted

  for ((loInc, hiInc) <- Seq((true, false), (false, true)))
    test(s"LEFT band join matches the outer oracle (loInclusive=$loInc, hiInclusive=$hiInc)") {
      val got = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi", loInc, hiInc,
        joinType = "left_outer")
      assert(collectedOuter(got) === outerOracle(loInc, hiInc).sorted)
    }

  test("LEFT band join keeps every probe row exactly once when unmatched") {
    val got = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi",
      joinType = "left_outer")
    // null-valued probes survive with null bands (an inner join drops them)
    assert(got.filter(col("v").isNull).count() ===
      probeRows.count(_._2.isEmpty))
    assert(got.select("id").distinct().count() === probeRows.size)
  }

  test("LEFT SEMI band join emits each covered probe row once") {
    val got = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi",
      joinType = "left_semi")
    assert(got.columns.toSeq === probe.columns.toSeq, "semi keeps probe columns only")
    val want = oracle(loInc = true, hiInc = false).map(_._1).distinct.sorted
    assert(got.select("id").collect().map(_.getLong(0)).toSeq.sorted === want)
  }

  test("rewrite plans a declarative LEFT band join as RangeJoinExec (not BNL)") {
    val df = probe.join(broadcast(bands),
      col("v") >= col("lo") && col("v") < col("hi"), "left")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"left-outer rule did not fire:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNL survived:\n$plan")
    assert(collectedOuter(df) === outerOracle(loInc = true, hiInc = false).sorted)
  }

  test("rewrite plans a declarative LEFT SEMI band join as RangeJoinExec") {
    val df = probe.join(broadcast(bands),
      col("v") >= col("lo") && col("v") < col("hi"), "left_semi")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"left-semi rule did not fire:\n$plan")
    val want = oracle(loInc = true, hiInc = false).map(_._1).distinct.sorted
    assert(df.select("id").collect().map(_.getLong(0)).toSeq.sorted === want)
  }

  test("LEFT band join: interpreted fallback matches codegen") {
    val old = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val outer = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi",
        joinType = "left_outer")
      assert(collectedOuter(outer) === outerOracle(loInc = true, hiInc = false).sorted)
      val semi = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi",
        joinType = "left_semi")
      assert(semi.select("id").collect().map(_.getLong(0)).toSeq.sorted ===
        oracle(loInc = true, hiInc = false).map(_._1).distinct.sorted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", old)
  }

  test("a LEFT join with bands on the LEFT is not rewritten (preserved side is the bands)") {
    val df = broadcast(bands).join(probe,
      col("v") >= col("lo") && col("v") < col("hi"), "left")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("RangeJoin"),
      s"bands-preserving left join must stay with Catalyst:\n$plan")
  }

  test("equi+band joins are left to Catalyst (rj2 shape must stay an equi join)") {
    val left = spark.range(100).toDF("k")
      .withColumn("v", (col("k") * 3 % 50).cast("double"))
    val right = spark.range(100).toDF("k2")
      .withColumn("lo", (col("k2") % 10).cast("double"))
      .withColumn("hi", (col("k2") % 10 + 20).cast("double"))
    val df = left.join(right,
      col("k") === col("k2") && col("v") >= col("lo") && col("v") < col("hi"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("RangeJoin"),
      s"equi+band join must keep its hash key, not become a band scan:\n$plan")
  }

  test("nulls: null probe values and null band bounds never match") {
    val got = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi")
    assert(got.filter(col("v").isNull).count() === 0)
    assert(got.filter(col("band") === -1).count() === 0)
  }

  test("empty band side yields an empty inner join") {
    val got = RangeJoin.bandJoin(probe, bands.filter(col("band") < -100),
      "v", "lo", "hi")
    assert(got.count() === 0)
  }

  /** Run `body` with the broadcast threshold floored so the band side
    * can never fit (8×1 bytes) — forces the SHUFFLED form. */
  private def overThreshold[T](body: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      body
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("oversized band side plans the SHUFFLED range join — " +
      "no BroadcastNestedLoopJoin, no forced broadcast") {
    overThreshold {
      val got = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi")
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("RangeJoinPartitioned"),
        s"expected the partitioned range join:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("BroadcastExchange"), plan)
      assert(collected(got) === oracle(loInc = true, hiInc = false).sorted,
        "the partitioned plan must still produce the oracle result")
    }
  }

  for ((loInc, hiInc) <- Seq((true, false), (false, true)))
    test("partitioned form matches the oracle " +
        s"(loInclusive=$loInc, hiInclusive=$hiInc)") {
      overThreshold {
        val got = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi",
          loInc, hiInc)
        assert(collected(got) === oracle(loInc, hiInc).sorted)
      }
    }

  test("partitioned LEFT band join keeps unmatched and null-valued " +
      "probe rows padded, exactly once") {
    overThreshold {
      val got = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi",
        joinType = "left_outer")
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("RangeJoinPartitioned"), plan)
      val byId = got.collect().groupBy(_.getLong(0))
      assert(byId.size === probeRows.size, "every probe row survives")
      val want = oracle(loInc = true, hiInc = false)
        .groupBy(_._1).view.mapValues(_.size).toMap
      probeRows.foreach { case (id, _) =>
        assert(byId(id).length === want.getOrElse(id, 1),
          s"id=$id row count")
      }
      // a null-valued probe row pads its band columns
      val nullRow = byId(0L).head // id 0: v is None (0 % 97 == 0)
      assert(nullRow.isNullAt(nullRow.fieldIndex("band")))
    }
  }

  test("partitioned LEFT SEMI band join emits each covered probe row once") {
    overThreshold {
      val got = RangeJoin.bandJoin(probe, bands, "v", "lo", "hi",
        joinType = "left_semi")
      assert(got.columns.toSeq === Seq("id", "v"))
      val want = oracle(loInc = true, hiInc = false).map(_._1).distinct.sorted
      assert(got.collect().map(_.getLong(0)).sorted.toSeq === want)
    }
  }

  test("partitioned form with an empty band side: inner empty, outer padded") {
    overThreshold {
      val none = bands.filter(col("band") < -100)
      assert(RangeJoin.bandJoin(probe, none, "v", "lo", "hi").count() === 0)
      assert(RangeJoin.bandJoin(probe, none, "v", "lo", "hi",
        joinType = "left_outer").count() === probeRows.size)
    }
  }

  test("self-derived band side (shared expr ids) is re-aliased, not crossed") {
    import spark.implicits._
    val base = (0L until 100L).map(id => (id, id.toDouble)).toDF("id", "v")
    val derivedBands = base.groupBy((col("id") % 10).as("g"))
      .agg(min("v").as("lo"), max("v").as("hi"))
    val got = RangeJoin.bandJoin(base, derivedBands, "v", "lo", "hi",
      loInclusive = true, hiInclusive = true)
    // bands are per-residue [g, 90+g]: v matches every g with g ≤ v ≤ 90+g
    val want = (for {
      v <- 0 until 100
      g <- 0 until 10
      if g <= v && v <= 90 + g
    } yield 1).size
    assert(got.count() === want)
  }
}
