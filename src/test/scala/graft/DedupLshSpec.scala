package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupExtQueries

/** dd6/dd7 run LSH-bucketed candidate generation; these specs pin the
  * property the driver oracle also checks — recall 1 vs an exhaustive
  * all-pairs scan — and that the physical plan really is an equi-join
  * (no BroadcastNestedLoopJoin / CartesianProduct over the corpus).
  */
class DedupLshSpec extends SparkSuite {

  test("bucketed dd6 equals the all-pairs formulation") {
    functions.CosineSimilarity.register(spark)
    val corpus = DedupExtQueries.plantedCorpus(spark, sf)
    val a = corpus.select(col("vec_id").as("keep_id"), col("emb").as("ea"))
    val b = corpus.select(col("vec_id").as("dup_id"), col("emb").as("eb"))
    val allPairs = a.join(b, col("keep_id") < col("dup_id"))
      .withColumn("cs", expr("graft_cosine(ea, eb)"))
      .filter(col("cs") >= 0.95)
      .select("keep_id", "dup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = DedupExtQueries.queries("dd6_embedding_neardup")(spark, sf)
      .select("keep_id", "dup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(allPairs.nonEmpty, "planted corpus must yield near-dup pairs")
    assert(bucketed == allPairs,
      s"missed=${(allPairs -- bucketed).take(5)} extra=${(bucketed -- allPairs).take(5)}")
  }

  test("candidate generation contains no nested-loop join over the corpus") {
    val plan = DedupExtQueries.queries("dd6_embedding_neardup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("dd7 clusters collapse each planted duplicate into its original") {
    val out = DedupExtQueries.queries("dd7_neardup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val planted = out.keys.filter(_ >= DedupExtQueries.CopyIdOffset)
    assert(planted.nonEmpty)
    planted.foreach { cid =>
      assert(out(cid) == cid - DedupExtQueries.CopyIdOffset,
        s"copy $cid clustered to ${out(cid)}")
    }
  }
}
