package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AnnLsh

/** Recall evidence for the adaptive-radius LSH at the DENSE end of its
  * schedule (round-9 ADVICE, medium): the oracle-suite recall gate runs
  * at small sf where the radius is 2, and the replicated-corpus scale
  * tool is non-discriminative (queries' true neighbors are their own
  * copies). Here the corpus is NON-replicated: deterministic background
  * vectors plus, per query, 5 planted perturbed neighbors at ~0.95
  * cosine (noise scale 0.33 → cos ≈ 1/sqrt(1+0.33²)) — fresh vectors,
  * not copies. The gate: at the radius-1 and radius-0 density
  * thresholds, at least 90% of planted 0.95-cos neighbors must surface
  * in the top-5 (analytic expectation ≈ 0.97–0.99 at 8 bands × 8
  * planes; everything — planes and data — is deterministic, so this is
  * a fixed number, not a flaky sample). */
class AnnLshStepdownSpec extends SparkSuite {

  private val PlantedBase = 1000000L
  private val NQueries = 10

  private def vecs(ids: DataFrame, body: String): DataFrame =
    ids.withColumn("emb",
      expr(s"transform(sequence(0, 63), j -> cast($body as double))"))

  // Each query base gets its OWN j-frequency (13 + q): two sinusoids of
  // different frequency are near-orthogonal over 64 samples, so queries
  // are mutually near-orthogonal and orthogonal to the frequency-11
  // background — the planted set IS each query's true top-5 by a wide
  // margin (~0.95 vs ≤~0.05), making planted-membership an exact recall
  // metric. (A shared frequency with per-query phase shift fails this:
  // phase-shifted copies of one sinusoid sit at cos ≈ 0.98 of each
  // other and would legitimately outrank the planted neighbors.)
  private def queryVecs: DataFrame = vecs(
    spark.range(NQueries).select(col("id").as("vec_id")),
    "sin(vec_id * 997 + j * (13 + vec_id))")

  /** corpus = background + 5 planted ~0.95-cos neighbors per query
    * (ids PlantedBase + q*5 + i); the query bases themselves stay OUT of
    * the corpus so the truth set is exactly the planted vectors. */
  private def corpusWithPlanted(nBackground: Int): DataFrame = {
    val background = vecs(
      spark.range(NQueries, NQueries + nBackground)
        .select(col("id").as("vec_id")),
      "sin(vec_id * 37 + j * 11)")
    val planted = vecs(
      spark.range(PlantedBase, PlantedBase + NQueries * 5)
        .select(col("id").as("vec_id")),
      s"sin(((vec_id - $PlantedBase) div 5) * 997 " +
        s"+ j * (13 + ((vec_id - $PlantedBase) div 5))) " +
        s"+ 0.33 * sin(vec_id * 53 + j * 17)")
    background.unionByName(planted)
  }

  private def plantedRecall(nBackground: Int, radius: Int): Double = {
    val hits = AnnLsh.topK(spark, corpusWithPlanted(nBackground),
        queryVecs, radius)
      .filter(col("nid") >= PlantedBase &&
        expr(s"(nid - $PlantedBase) div 5") === col("qid"))
      .count()
    hits.toDouble / (NQueries * 5)
  }

  test("radius schedule and Hamming-ball sizes match the documented classes") {
    assert(AnnLsh.radiusFor(24000L) === 2 && AnnLsh.radiusFor(24001L) === 1)
    assert(AnnLsh.radiusFor(120000L) === 1 && AnnLsh.radiusFor(120001L) === 0)
    assert(AnnLsh.masksFor(0).size === 1)
    assert(AnnLsh.masksFor(1).size === 9)
    assert(AnnLsh.masksFor(2).size === 37)
  }

  test("radius 1 (30k dense corpus): planted-neighbor recall >= 0.9") {
    assert(AnnLsh.radiusFor(30000L + NQueries * 6) === 1)
    val r = plantedRecall(30000, radius = 1)
    assert(r >= 0.9, s"radius-1 recall on planted 0.95-cos neighbors: $r")
  }

  test("radius 0 (130k densest corpus): planted-neighbor recall >= 0.9") {
    assert(AnnLsh.radiusFor(130000L + NQueries * 6) === 0)
    val r = plantedRecall(130000, radius = 0)
    assert(r >= 0.9, s"radius-0 recall on planted 0.95-cos neighbors: $r")
  }
}
