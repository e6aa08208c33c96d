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
}
