package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.SaltedDedup

/** Skew handling, demonstrated rather than hoped for:
  *
  *   1. the salted two-phase dedup (operators/SaltedDedup.scala) is
  *      row-identical to the single-window plan on a fixture where one
  *      key holds ~10x the rows of the whole rest of the table — the
  *      semantic half of the skew story (w8_salted_dedup gates the same
  *      equality against DuckDB at the driver);
  *   2. AQE's skew-join rule actually fires on that fixture: with the
  *      thresholds scaled down to test size, the hot key's sort-merge
  *      partition is split (`skew=true` in the final adaptive plan) —
  *      the runtime half, proving the fixture and the join shape are the
  *      ones AQE can rescue at 100 TB (tx10's term join is the
  *      production instance of this shape).
  */
class SkewSpec extends SparkSuite {

  /** ~55k rows: one hot key (50k rows) + 500 cold keys (10 rows each). */
  private def skewedFixture: DataFrame =
    spark.range(50000)
      .select(lit(1L).as("k"), col("id").as("seq"), (col("id") % 997).as("v"))
      .unionAll(spark.range(5000)
        .select((col("id") % 500 + 2).as("k"), col("id").as("seq"),
          (col("id") % 997).as("v")))

  test("salted topOne == single-window dedup on a skewed fixture") {
    val df = skewedFixture
    val w = Window.partitionBy("k").orderBy(col("seq").desc)
    val plain = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("k").collect().toSeq
    val salted = SaltedDedup.topOne(df, Seq("k"),
        order = Seq(col("seq").desc), saltOn = Seq(col("seq")))
      .orderBy("k").collect().toSeq
    assert(salted === plain)
    // the hot key's winner is the max seq, as a sanity anchor
    assert(plain.head.getLong(1) === 49999L)
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scale the production defaults (256MB/64MB) down to the fixture
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force a sort-merge join: broadcast would mask the skew entirely
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = spark.range(600).select(col("id").as("k"), (col("id") * 7).as("w"))
      val joined = skewedFixture.join(dim, "k")
      // collect() (not count()) so THIS DataFrame's adaptive plan is the
      // one that executes — count() builds a separate QueryExecution and
      // would leave joined's plan un-finalized.
      assert(joined.collect().length === 55000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partition; final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
