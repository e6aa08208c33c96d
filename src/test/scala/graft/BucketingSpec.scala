package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Co-located join via bucketed storage: both sides bucketed by the join
  * key → SortMergeJoin with zero shuffle exchanges in the physical plan,
  * and results identical to the plain (shuffling) join. */
class BucketingSpec extends SparkSuite {

  test("bucketed fact-to-fact join plans with no Exchange and matches plain join") {
    val base = Files.createTempDirectory("graft_bucketing").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, s"$base/li", "b_lineitem", Seq("l_orderkey"), 4)
    Bucketing.writeBucketed(ord, s"$base/ord", "b_orders", Seq("l_orderkey"), 4)
    try {
      // force the merge join path so a broadcast doesn't mask co-location
      val joined = spark.table("b_lineitem").hint("merge")
        .join(spark.table("b_orders"), Seq("l_orderkey"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"))
      assert(!physical.contains("ShuffleExchange") &&
        !physical.contains("Exchange hashpartitioning"),
        s"expected shuffle-free co-located join, got:\n$physical")

      val viaBuckets = joined
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .orderBy("l_orderkey").collect()
      val plain = li.join(ord, Seq("l_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .orderBy("l_orderkey").collect()
      assert(viaBuckets.toSeq === plain.toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
