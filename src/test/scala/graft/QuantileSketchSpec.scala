package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch

/** Deterministic mergeable quantile sketch: the rank bound
  * |true_rank(v̂) − q·N| ≤ ε·N holds on adversarial distributions and is
  * invariant to repartitioning; the summary's top rank equals N exactly;
  * raw rows never shuffle (the only exchanges sit above the
  * mapPartitions summaries). */
class QuantileSketchSpec extends SparkSuite {
  import org.apache.spark.sql.DataFrame

  private val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)

  private def checkBound(df: DataFrame, eps: Double, parts: Int): Unit = {
    val data = df.repartition(parts)
    val n = data.count()
    val est = QuantileSketch.quantiles(data, "v", eps, qs).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = data.select(col("v").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    qs.foreach { q =>
      val v = est(q)
      // rank-interval criterion (duplicate-safe): a value spanning ranks
      // [lo+1, hi] is an ε-approximate q-quantile iff lo ≤ qN+εN and
      // hi ≥ qN−εN
      val lo = sorted.count(_ < v)
      val hi = sorted.count(_ <= v)
      assert(lo <= q * n + eps * n && hi >= q * n - eps * n,
        s"q=$q parts=$parts: rank span [$lo,$hi] vs target ${q * n} " +
          s"(tol ${eps * n}, v=$v)")
    }
  }

  test("rank bound holds: uniform, skewed, duplicate-heavy, any partitioning") {
    import spark.implicits._
    val uniform = (1 to 20000).map(_.toDouble).toDF("v")
    val skewed = (1 to 20000).map(i => math.pow(i.toDouble, 3)).toDF("v")
    // 90% of mass on one duplicated value: quantile answers must still
    // land within the rank tolerance even when one value spans many qs
    val dupes = ((1 to 18000).map(_ => 42.0) ++
      (1 to 2000).map(_.toDouble)).toDF("v")
    for (df <- Seq(uniform, skewed, dupes); parts <- Seq(1, 7, 32))
      checkBound(df, eps = 0.01, parts = parts)
  }

  test("batch-accumulated tagged frames merge to the same rank guarantee (st6's shape)") {
    import spark.implicits._
    val eps = 0.01
    val all = ((1 to 12000).map(_.toDouble) ++
      (1 to 3000).map(_ => 77.0)).toDF("v")
    val n = all.count()
    // split into 3 "micro-batches", tag each with its own pid namespace
    val parts = Seq(
      all.filter(col("v") <= 4000),
      all.filter(col("v") > 4000 && col("v") <= 9000),
      all.filter(col("v") > 9000))
    val tagged = parts.zipWithIndex.map { case (b, i) =>
      QuantileSketch.taggedSamples(b.repartition(3), "v", eps)
        .withColumn("pid", col("pid") + lit((i + 1) * 100000))
        .localCheckpoint(true)
    }.reduce(_.unionByName(_)).localCheckpoint(true)
    val est = QuantileSketch
      .quantilesFromMerged(QuantileSketch.mergeTagged(tagged), qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = all.select(col("v").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    qs.foreach { q =>
      val v = est(q)
      val lo = sorted.count(_ < v)
      val hi = sorted.count(_ <= v)
      assert(lo <= q * n + eps * n && hi >= q * n - eps * n,
        s"q=$q: rank span [$lo,$hi] vs ${q * n} (tol ${eps * n}, v=$v)")
    }
  }

  test("summary top rank is exactly N; est_rank never overestimates") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i * 37 % 5000).toDouble).toDF("v")
      .repartition(8)
    val s = QuantileSketch.summary(df, "v", 0.02).collect()
    assert(s.map(_.getLong(1)).max === 5000L)
    val sorted = df.select(col("v")).collect().map(_.getDouble(0)).sorted
    s.foreach { r =>
      val (v, estRank) = (r.getDouble(0), r.getLong(1))
      val trueRank = sorted.count(_ <= v)
      assert(estRank <= trueRank,
        s"est_rank must lower-bound true rank: $estRank > $trueRank at $v")
    }
  }

  test("plan: raw rows reach only the mapPartitions; the global merge " +
    "never plans Exchange SinglePartition") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    // the raw-width segment (pre-checkpoint seam): the mapPartitions
    // summarizer, with NO exchange of raw rows at or below it
    val rawPlan = QuantileSketch.taggedSamples(df, "v", 0.01)
      .queryExecution.executedPlan.toString
    assert(rawPlan.contains("MapPartitions"))
    assert(!rawPlan.contains("Exchange"),
      s"raw rows must never shuffle before summarization:\n$rawPlan")
    // the merge over the checkpointed bounded summary: two-phase bucket
    // windows — a bare Window.orderBy would print Exchange
    // SinglePartition here and push every summary row through one task
    val mergePlan = QuantileSketch.summary(df, "v", 0.01)
      .queryExecution.executedPlan.toString
    assert(!mergePlan.contains("Exchange SinglePartition"),
      s"the global merge must not serialize into one task:\n$mergePlan")
  }

  test("a20 gate booleans all true at test sf") {
    val rows = SparkEntry.queries("a20_quantile_sketch")(spark, sf).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getBoolean(2)))
  }

  test("grouped sketch: per-key rank bound, any partitioning; keys " +
    "never mix; single-key agrees with the global sketch") {
    import spark.implicits._
    val eps = 0.01
    // three keys with very different distributions and sizes
    val rows = (1 to 12000).map(i => ("u", i.toDouble)) ++
      (1 to 6000).map(i => ("s", math.pow(i.toDouble, 3))) ++
      (1 to 3000).map(i => ("d", if (i <= 2700) 42.0 else i.toDouble))
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("k", "v").repartition(parts)
      val est = QuantileSketch.groupedQuantiles(df, "k", "v", eps, qs)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
        .toMap
      val byKey = rows.groupBy(_._1).map { case (k, kv) =>
        k -> kv.map(_._2).sorted
      }
      byKey.foreach { case (k, sorted) =>
        val n = sorted.length
        qs.foreach { q =>
          val v = est((k, q))
          val lo = sorted.count(_ < v)
          val hi = sorted.count(_ <= v)
          assert(lo <= q * n + eps * n && hi >= q * n - eps * n,
            s"key=$k q=$q parts=$parts: [$lo,$hi] vs ${q * n} ± ${eps * n}")
        }
      }
    }
    // one key only, one partition: grouped must return exactly the
    // global answers (at >1 partition the two PLANS place the column
    // projection differently relative to the round-robin exchange, so
    // partition contents — and thus which samples are emitted — can
    // legitimately differ; both still honor the rank bound above)
    val single = (1 to 8000).map(i => ("only", (i * 131 % 8000).toDouble))
      .toDF("k", "v").repartition(1)
    val g = QuantileSketch.groupedQuantiles(single, "k", "v", eps, qs)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val glob = QuantileSketch.quantiles(single, "v", eps, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(g === glob)
  }

  test("grouped summary windows are partitioned by key — no " +
    "single-partition exchange") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (s"k${i % 4}", i.toDouble)).toDF("k", "v")
    val plan = QuantileSketch.groupedSummary(df, "k", "v", 0.01)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"per-key merge must not serialize into one task:\n$plan")
  }

  test("a21 gate booleans all true at test sf") {
    val rows = SparkEntry.queries("a21_group_quantile_sketch")(spark, sf)
      .collect()
    assert(rows.length === 9, s"3 statuses × 3 quantiles, got ${rows.length}")
    assert(rows.forall(_.getBoolean(3)))
  }
}
