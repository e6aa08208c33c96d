package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.GeoNeighborJoin

/** Density-skew soak for the bucketed spatial neighbor join (the r12
  * verdict's gj1 gap): real geo data piles into a few urban cells, and
  * a cell holding k points makes its join task do ~k² of the work —
  * work that is REAL (most of those pairs are within R, so the output
  * is quadratic too) and must therefore be BALANCED, not avoided. The
  * operator salts hot cells by the self-join triangle decomposition;
  * this spec plants 80% of a corpus in ONE cell and pins
  *
  *   1. output identity with the O(n²) brute force (salting must never
  *      change pair membership), and
  *   2. per-task emission balance: the hot cell's pair rows spread over
  *      its ceil(count/hotCap) sub-bucket tasks instead of one task
  *      writing ~all of them (measured via per-task output records on a
  *      parquet write of the join result, with AQE's small-partition
  *      coalescing off — the DedupSkewSpec convention, since the
  *      coalescer merging tiny test-scale partitions is
  *      indistinguishable from genuine pile-up).
  */
class GeoSkewSpec extends SparkSuite {

  private val R = 5000L
  private val N = 3000
  private val Hot = (N * 0.8).toInt // 2400 points in cell (0,0)

  /** 80% of points land in the single R-sized cell at the origin; the
    * rest scatter over a far-apart grid (inter-point spacing ≥ 37000 ≫
    * R, so scattered points pair with nothing). */
  private lazy val pts: DataFrame = spark.range(N).select(
    col("id"),
    when(col("id") < Hot, pmod(xxhash64(col("id")), lit(R)))
      .otherwise(lit(200000L) + (col("id") % 50) * 37000L).as("lat_u"),
    when(col("id") < Hot, pmod(xxhash64(col("id") + 7), lit(R)))
      .otherwise(lit(900000L) + (col("id") % 61) * 41000L).as("lon_u"))
    .localCheckpoint(true)

  private def signature(df: DataFrame): Seq[Any] =
    df.agg(count(lit(1)), coalesce(sum("dist2"), lit(0L)),
        coalesce(sum("id_a"), lit(0L)), coalesce(sum("id_b"), lit(0L)))
      .head().toSeq

  private def perTaskOutput[T](body: => T): Seq[Long] = {
    // the property under test is the SHUFFLE-join form — the only form
    // that exists at scale (an urban cell's homes don't broadcast). At
    // spec scale Spark would broadcast the 3k-point home side, and a
    // broadcast join's emission follows the probe side's INPUT
    // partitioning, where salt keys can't govern anything — so force
    // the shuffle join, give the ~10 salt buckets enough reducers not
    // to hash-collide, and turn off AQE coalescing (DedupSkewSpec's
    // convention).
    val confKeys = Seq(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "64")
    val old = confKeys.map { case (k, _) => k -> spark.conf.getOption(k) }
    confKeys.foreach { case (k, v) => spark.conf.set(k, v) }
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.outputMetrics.recordsWritten > 0)
          acc.add(m.outputMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var waited = 0
      var last = -1
      while (waited < 5000 && acc.size != last) {
        last = acc.size; Thread.sleep(200); waited += 200
      }
      acc.toArray(Array.empty[java.lang.Long]).map(_.longValue()).toSeq
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("salted result is pair-identical to the O(n²) brute force under " +
    "an 80%-one-cell distribution") {
    val fast = GeoNeighborJoin.pairs(pts, R, hotCap = 250)
    val a = pts.select(col("id").as("id_a"), col("lat_u").as("lat_a"),
      col("lon_u").as("lon_a"))
    val b = pts.select(col("id").as("id_b"), col("lat_u").as("lat_b"),
      col("lon_u").as("lon_b"))
    val brute = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b")) +
          (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b")))
      .filter(col("dist2") <= lit(R * R))
      .select("id_a", "id_b", "dist2")
    val sFast = signature(fast)
    val sBrute = signature(brute)
    assert(sFast === sBrute, s"salted=$sFast brute=$sBrute")
    // non-vacuous: the hot cell mints a genuinely quadratic output
    assert(sFast.head.asInstanceOf[Long] > 1000000L,
      s"planted density too low to stress anything: $sFast")
  }

  test("hot-cell pair emission spreads over the sub-bucket tasks — no " +
    "single task writes the cell's quadratic output") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_geoskew").toString + "/pairs"
    val written = perTaskOutput {
      GeoNeighborJoin.pairs(pts, R, hotCap = 250)
        .write.mode("overwrite").parquet(out)
    }
    assert(written.nonEmpty)
    val total = written.sum
    val max = written.max
    info(s"geo skew tasks: n=${written.length} max=$max total=$total")
    // ceil(2400/250) = 10 sub-buckets: the hot cell's ~2.4M pairs land
    // ~240k per task; one task holding everything (the unsalted plan)
    // would write `total`. 4x slop over the ideal share.
    assert(max < total / 2,
      s"one task wrote $max of $total pair rows — hot cell not split")
    assert(max < (total / 10) * 4,
      s"hot-cell emission unbalanced: max=$max vs ideal=${total / 10}")
  }
}
