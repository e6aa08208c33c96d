package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable ε-approximate quantile summary — the quantile member of the
  * sketch family next to HLL distinct (a14) and Misra–Gries frequency
  * (a19). DETERMINISTIC, unlike KLL/t-digest: no sampling, so the rank
  * bound below holds on every run and merge order, which is what lets
  * the `a20_quantile_sketch` oracle gate it with always-true booleans.
  *
  * Construction (one `mapPartitions` pass, no shuffle of raw rows):
  * each partition sorts its n_p values and emits every `step`-th one
  * (step = max(1, ⌊ε·n_p/2⌋)) together with its exact local rank — a
  * rank-spaced sample of ≤ 2/ε + 1 triples per partition. For any value
  * v, the partition's true rank of v lies within `step` above the
  * largest emitted rank with value ≤ v, so the per-partition
  * lower-bound estimator errs by < ε·n_p/2.
  *
  * Merge is pure summation in the rank domain: the merged rank estimate
  * of v is Σ_p (largest emitted rank ≤ v), computed for every emitted
  * value with one window over the summary frame (≤ partitions·(2/ε+1)
  * rows — thousands, not the corpus). Summed one-sided errors give
  *
  *     est_rank(v) ≤ true_rank(v) < est_rank(v) + ε·N/2
  *
  * independent of partitioning and merge order. Answering quantile q by
  * the emitted value whose est_rank is closest to q·N adds at most half
  * the largest adjacent-candidate rank gap (< ε·N/2), so the returned
  * value v̂ satisfies the rank-INTERVAL guarantee
  *
  *     #{x < v̂} ≤ q·N + ε·N   and   #{x ≤ v̂} ≥ q·N − ε·N
  *
  * (interval, not point rank: with heavy duplicates one value
  * legitimately spans many quantiles). That is what the oracle gate
  * asserts, with 2ε slack for arithmetic headroom.
  *
  * At 100 TB: the summary frame is partitions × (2/ε+1) rows (200k
  * partitions at ε=0.01 → ~40M summary rows). The global merge is the
  * two-phase distributed prefix sum (value-range buckets + per-bucket
  * parallel windows + ≤64 driver-cumulated offsets — the BudgetSelect
  * pattern), NEVER a single-partition window, so those 40M rows sort in
  * 64-way parallel tasks; the raw table scans exactly once (the summary
  * is checkpointed before the merge's three bounded jobs). The
  * per-partition sort buffers one partition's doubles in memory
  * (8B·rows); a streaming GK summary would avoid that at the cost of
  * determinism bookkeeping.
  */
object QuantileSketch {

  /** Per-partition rank-spaced samples: (value, localRank) with ranks
    * 1-based in the partition's sorted order; always includes the last
    * (maximum) element so every value has an emitted rank ≤ it. */
  private[graft] def summarizePartition(
      rows: Iterator[Double], eps: Double): Iterator[(Double, Long)] = {
    val buf = rows.toArray
    if (buf.isEmpty) Iterator.empty
    else {
      java.util.Arrays.sort(buf)
      val n = buf.length
      val step = math.max(1L, (eps * n / 2).toLong)
      val out = Vector.newBuilder[(Double, Long)]
      var r = step
      while (r <= n) { out += ((buf(r.toInt - 1), r)); r += step }
      if ((n % step) != 0) out += ((buf(n - 1), n.toLong))
      out.result().iterator
    }
  }

  /** Bucket count for the two-phase global merge — bounds driver state
    * (≤64 totals collected) exactly like BudgetSelect's default. */
  private val MergeBuckets = 64

  /** The raw-width segment of [[summary]]: per-partition samples tagged
    * with their partition id — NO exchange at or below the
    * mapPartitions (spec-pinned seam). */
  private[graft] def taggedSamples(df: DataFrame, valueCol: String,
      eps: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("double")).as[Double]
      .mapPartitions(it => summarizePartition(it, eps))
      .toDF("value", "local_rank")
      .withColumn("pid", spark_partition_id())
  }

  /** Summary frame (value, est_rank): one row per emitted sample, where
    * est_rank is the MERGED lower-bound rank estimate of that value
    * across all partitions. The only full-width pass is the
    * mapPartitions; every merge step runs over the bounded summary. */
  def summary(df: DataFrame, valueCol: String, eps: Double): DataFrame =
    summaryWithTotal(df, valueCol, eps)._1

  /** [[summary]] plus the exact total row count N (= Σ of the driver-
    * cumulated bucket totals, free as a by-product of the merge) — so
    * [[quantiles]] never re-derives N with a global window. */
  private[graft] def summaryWithTotal(df: DataFrame, valueCol: String,
      eps: Double): (DataFrame, Long) = {
    // the summary is bounded (≤ partitions·(2/ε+1) rows): checkpoint it
    // so the RAW table scan runs exactly ONCE — the bucket-range probe,
    // the bucket totals, and the merge window below are each jobs over
    // this frame, and un-checkpointed every one would re-run the
    // mapPartitions pass over the full table
    mergeTagged(taggedSamples(df, valueCol, eps).localCheckpoint(true))
  }

  /** The merge phase alone, over an already-materialized tagged-sample
    * frame `(value, local_rank, pid)` — exposed so a STREAMING caller
    * can accumulate per-micro-batch tagged frames (each batch's pids
    * offset into their own namespace) and merge once at read time: the
    * rank-error bound is Σ per-summary ε·N_summary = ε·N regardless of
    * how many batches contributed, so batching costs nothing but more
    * summary rows (st6's gate runs a20's oracle unchanged). Caller
    * owns checkpointing. */
  private[graft] def mergeTagged(tagged: DataFrame): (DataFrame, Long) = {
    // Each partition's contribution to est_rank(v) changes only at its
    // own emitted values, by the local-rank delta; summing deltas over
    // everything ≤ v (value, then rank as tie-break for duplicate
    // values) yields Σ_p largest-emitted-rank ≤ v. spark_partition_id
    // distinguishes same-valued samples from different partitions.
    val wPart = Window.partitionBy("pid").orderBy("value", "local_rank")
    val withDelta = tagged.withColumn("delta",
      col("local_rank") - coalesce(lag(col("local_rank"), 1).over(wPart),
        lit(0L)))
    // The global cumulative over (value, local_rank, pid) order is the
    // two-phase prefix sum (the BudgetSelect pattern): value-range
    // buckets (monotone, so bucket order is a PREFIX of the global
    // order and equal values never split across buckets), per-bucket
    // windows running parallel, and ≤MergeBuckets totals cumulated on
    // the driver and broadcast back as a literal CASE. The previous
    // spelling (`Window.orderBy` with no partition) planned Exchange
    // SinglePartition — at 200k partitions / ε=0.01 that is ~40M
    // summary rows sorted through ONE task.
    val Array(vlo, vhi) = withDelta
      .agg(min(col("value")), max(col("value")))
      .head().toSeq.map(v => Option(v).map(_.asInstanceOf[Double]).getOrElse(0.0))
      .toArray
    val span = math.max(vhi - vlo, 1e-12)
    val bucket = greatest(lit(0), least(lit(MergeBuckets - 1),
      floor((col("value") - lit(vlo)) / lit(span) * MergeBuckets)))
      .cast("int")
    val b = withDelta.withColumn("__bucket", bucket)
    val wCum = Window.partitionBy("__bucket")
      .orderBy("value", "local_rank", "pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = b.groupBy("__bucket").agg(sum(col("delta")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (bk, t)) => (bk, acc + t)
    }.sliding(2).collect { case Array((_, acc), (bk, _)) => bk -> acc }.toMap
    val offsetCol = totals.map(_._1).foldRight(lit(0L): Column) {
      case (bk, els) =>
        when(col("__bucket") === bk, lit(offsets(bk))).otherwise(els)
    }
    val est = b
      .withColumn("est_rank", offsetCol + sum(col("delta")).over(wCum))
      .select(col("value"), col("est_rank"))
    (est, totals.map(_._2).sum)
  }

  /** For each requested quantile q: the emitted value whose est_rank is
    * closest to q·N (ties to the smaller value). Output (q, value,
    * est_rank), one row per q, ordered by q. */
  def quantiles(df: DataFrame, valueCol: String, eps: Double,
      qs: Seq[Double]): DataFrame =
    quantilesFromMerged(summaryWithTotal(df, valueCol, eps), qs)

  /** Quantile picks over an already-merged (summary, N) pair — the
    * [[mergeTagged]] twin for streaming accumulation. */
  private[graft] def quantilesFromMerged(sn: (DataFrame, Long),
      qs: Seq[Double]): DataFrame = {
    val (s, n) = sn
    // explode the requested quantiles onto the bounded summary frame —
    // no join (a literal-array explode keeps the plan NestedLoop-free);
    // N rides in as a literal from the merge's own bucket totals, not a
    // max-over-everything window (which would plan SinglePartition)
    s.withColumn("q", explode(array(qs.map(lit(_)): _*)))
      .groupBy("q")
      .agg(min_by(struct(col("value"), col("est_rank")),
        struct(abs(col("est_rank") - col("q") * lit(n)), col("value")))
        .as("best"))
      .select(col("q"), col("best.value").as("value"),
        col("best.est_rank").as("est_rank"))
      .orderBy("q")
  }

  // ----------------------------------------------------------- grouped

  /** Per-partition, per-KEY rank-spaced samples — [[summarizePartition]]
    * applied to each key's values within the partition. Buffers one
    * partition's rows grouped by key (the same memory bound as the
    * global sort buffer, reorganized). */
  private[graft] def summarizePartitionByKey(
      rows: Iterator[(String, Double)], eps: Double)
      : Iterator[(String, Double, Long)] = {
    val m = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    rows.foreach { case (k, v) =>
      m.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer.empty) += v
    }
    m.iterator.flatMap { case (k, buf) =>
      summarizePartition(buf.iterator, eps).map { case (v, r) => (k, v, r) }
    }
  }

  /** Grouped summary frame (key, value, est_rank): [[summary]] with
    * every window PARTITIONED BY the key — the per-key cumulative runs
    * parallel across keys over a frame of ≤ partitions·(2/ε+1) rows PER
    * KEY, so "GROUP BY quantile" at 100 TB needs no per-group sort of
    * raw rows and no single-task window. The rank guarantee of
    * [[summary]] holds independently per key (each key's samples and
    * deltas never mix with another's). */
  def groupedSummary(df: DataFrame, keyCol: String, valueCol: String,
                     eps: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val samples = df
      .select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
      .mapPartitions(it => summarizePartitionByKey(it, eps))
    val tagged = samples.toDF("key", "value", "local_rank")
      .withColumn("pid", spark_partition_id())
    val wPart = Window.partitionBy("pid", "key").orderBy("value", "local_rank")
    val wCum = Window.partitionBy("key")
      .orderBy("value", "local_rank", "pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("delta",
        col("local_rank") - coalesce(lag(col("local_rank"), 1).over(wPart),
          lit(0L)))
      .withColumn("est_rank", sum(col("delta")).over(wCum))
      .select(col("key").as(keyCol), col("value"), col("est_rank"))
  }

  /** Per-key ε-approximate quantiles: (key, q, value, est_rank), one row
    * per key × q — the GROUP BY form of [[quantiles]], same rank-interval
    * guarantee per key. */
  def groupedQuantiles(df: DataFrame, keyCol: String, valueCol: String,
                       eps: Double, qs: Seq[Double]): DataFrame = {
    val s = groupedSummary(df, keyCol, valueCol, eps)
    val n = col("total")
    val withTotal = s.withColumn("total",
      max(col("est_rank")).over(Window.partitionBy(keyCol)))
    withTotal
      .withColumn("q", explode(array(qs.map(lit(_)): _*)))
      .groupBy(col(keyCol), col("q"))
      .agg(min_by(struct(col("value"), col("est_rank")),
        struct(abs(col("est_rank") - col("q") * n), col("value")))
        .as("best"))
      .select(col(keyCol), col("q"), col("best.value").as("value"),
        col("best.est_rank").as("est_rank"))
      .orderBy(keyCol, "q")
  }
}
