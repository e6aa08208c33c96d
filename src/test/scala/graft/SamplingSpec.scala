package graft

import org.apache.spark.sql.functions._

/** Sampling primitives: the registered sm2 hash-threshold sample is
  * oracle-checked by the driver; here we cover the properties the oracle
  * can't see — sampleBy's determinism for a fixed seed, and the
  * hash-threshold sample's stability under repartitioning (the property
  * that makes it the 100 TB choice: membership is a pure function of the
  * key, so cluster topology can't change the sample).
  */
class SamplingSpec extends SparkSuite {

  test("sampleBy is deterministic for a fixed seed") {
    val e = Tables.embeddings(spark, sf)
    val fractions: Map[Any, Double] =
      (0 until 10).map(l => (l: Any) -> (if (l % 2 == 0) 0.5 else 0.1)).toMap
    val a = e.stat.sampleBy("label", fractions, 42L).select("vec_id")
      .collect().map(_.getLong(0)).sorted
    val b = e.stat.sampleBy("label", fractions, 42L).select("vec_id")
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("hash-threshold stratified sample is invariant under repartitioning") {
    val q = queries.SamplingQueries.queries("sm2_stratified_sample")
    val base = q(spark, sf).collect().map(_.getLong(0)).sorted
    val reparted = Tables.embeddings(spark, sf).repartition(7)
    val again = reparted
      .filter(substring(md5(col("vec_id").cast("string").cast("binary")), 1, 8) <
        when(col("label") % 2 === 0, lit("80000000")).otherwise(lit("1999999a")))
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(base.sameElements(again))
    // stratum rates land near the configured 50% / 10%
    val e = Tables.embeddings(spark, sf)
    val byLabel = q(spark, sf)
      .groupBy((col("label") % 2).cast("long").as("par")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val totals = e.groupBy((col("label") % 2).cast("long").as("par")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evenRate = byLabel(0L).toDouble / totals(0L)
    val oddRate = byLabel.getOrElse(1L, 0L).toDouble / totals(1L)
    assert(evenRate > 0.35 && evenRate < 0.65, s"even rate $evenRate")
    assert(oddRate < 0.25, s"odd rate $oddRate")
  }

  test("k-fold assignment: every doc in exactly one of 5 roughly-even folds") {
    val out = queries.SamplingQueries.queries("sm5_kfold")(spark, sf)
    val total = Tables.documents(spark, sf).count()
    assert(out.count() === total)
    val byFold = out.groupBy("fold").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byFold.keySet.subsetOf((0 until 5).toSet))
    assert(byFold.size === 5, s"folds seen: ${byFold.keySet}")
    // md5 mod 5 is uniform: no fold holds more than twice its fair share
    byFold.values.foreach(n => assert(n <= 2 * total / 5 + 1, byFold))
    // pure function of the key: repartitioning cannot move a document
    val again = Tables.documents(spark, sf).repartition(7)
      .select(col("doc_id"),
        pmod(expr("conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10)")
          .cast("long"), lit(5L)).cast("int").as("fold"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.collect().foreach(r =>
      assert(again(r.getLong(0)) === r.getInt(1)))
  }

  // --- cm2: fuzzy train/eval decontamination (operators.Decontam) ---

  /** Planted fixture: eval 100 is a near-dup of train 1 (one word of ~40
    * changed → J ≈ 0.93 on word-3-shingles), eval 101 shares nothing,
    * eval 102 is an EXACT copy of train 2. Train 1/2/3 mutual overlap is
    * nil. */
  private def plantedDecontam = {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i"))
      .mkString(" ")
    val other = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val train3 = (1 to 40).map(i => s"yyy$i").mkString(" ")
    Seq(
      (1L, base, "train"), (2L, other, "train"), (3L, train3, "train"),
      (100L, nearDup, "eval"), (101L, (1 to 40).map(i => s"qqq$i").mkString(" "), "eval"),
      (102L, other, "eval")
    ).toDF("doc_id", "text", "split")
  }

  test("cm2 decontam: planted near-dup and exact-dup flagged, unrelated not") {
    val out = operators.Decontam.fuzzyFlags(plantedDecontam)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(4), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(out.keySet === Set(100L, 101L, 102L))
    val (n100, c100, t100) = out(100L)
    assert(c100 && t100 === 1L, s"near-dup eval 100: $out")
    assert(n100 === 1L)
    val (_, c101, _) = out(101L)
    assert(!c101, s"unrelated eval 101 flagged: $out")
    val (_, c102, t102) = out(102L)
    assert(c102 && t102 === 2L, s"exact-copy eval 102: $out")
  }

  test("cm2 decontam: asymmetric probe — no cartesian, invariant under repartitioning") {
    val df = operators.Decontam.fuzzyFlags(plantedDecontam)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(8).mkString("\n"))
    val a = df.collect().map(_.toSeq).sortBy(_.head.toString)
    val b = operators.Decontam.fuzzyFlags(plantedDecontam.repartition(7))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("cm2 decontam: train-train near-dups never pair (only eval rows emitted)") {
    import spark.implicits._
    // two train docs that are near-dups of each other, one clean eval doc:
    // nothing may be flagged, and no train id may appear in the output
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i"))
      .mkString(" ")
    val docs = Seq(
      (1L, base, "train"), (2L, nearDup, "train"),
      (100L, (1 to 40).map(i => s"qqq$i").mkString(" "), "eval")
    ).toDF("doc_id", "text", "split")
    val rows = operators.Decontam.fuzzyFlags(docs).collect()
    assert(rows.map(_.getLong(0)).toSet === Set(100L))
    assert(!rows.head.getBoolean(4))
  }
}
