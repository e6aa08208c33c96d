package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents
import graft.queries.SamplingQueries

/** Connected-components clustering semantics plus the sampling/split
  * primitives. */
class ConnectedComponentsSpec extends SparkSuite {

  test("chains collapse transitively; isolated vertices stay singletons") {
    import spark.implicits._
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {5,6}; {7} isolated
    val vertices = (1L to 7L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (6L, 5L)).toDF("src", "dst")
    val out = ConnectedComponents.run(vertices, edges)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("cluster ids are closed under the input pair set on real data") {
    val out = graft.queries.DedupExtQueries.queries("dd7_neardup_clusters")(spark, sf)
    // every corpus vector (real + planted copy) appears exactly once
    val nReal = Tables.embeddings(spark, sf).count()
    val nCopies = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 5 === 0).count()
    assert(out.count() === nReal + nCopies)
    assert(out.select("vec_id").distinct().count() === out.count())
    // each cluster's canonical member is its min vec_id and is flagged
    val bad = out.groupBy("cluster")
      .agg(min("vec_id").as("mn"),
        sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canon"))
      .filter(col("mn") =!= col("cluster") || col("n_canon") =!= 1)
      .count()
    assert(bad === 0)
  }

  test("hash split is deterministic and roughly 80/20") {
    val out = SamplingQueries.queries("sm1_hash_split")(spark, sf)
    val frac = out.filter(col("split") === "train").count().toDouble / out.count()
    assert(frac > 0.6 && frac < 0.95)
    val again = SamplingQueries.queries("sm1_hash_split")(spark, sf)
    assert(out.exceptAll(again).count() === 0)
  }

  test("stratified sample is a deterministic subset honoring strata") {
    val once = SamplingQueries.queries("sm2_stratified_sample")(spark, sf)
    val twice = SamplingQueries.queries("sm2_stratified_sample")(spark, sf)
    assert(once.exceptAll(twice).count() === 0) // same seed → same rows
    val pop = Tables.embeddings(spark, sf).select("vec_id", "label")
    assert(once.exceptAll(pop).count() === 0) // sample ⊆ population
    assert(once.count() > 0 && once.count() < pop.count())
  }

  test("HLL sketch merge: union of group sketches equals the single global sketch") {
    val sk = Tables.orders(spark, sf).groupBy("o_orderpriority")
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
    val merged = sk.agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head.getLong(0)
    val direct = Tables.orders(spark, sf)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))"))
      .head.getLong(0)
    assert(merged === direct) // mergeability: same sketch state either way
    val exact = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05)
  }
}
