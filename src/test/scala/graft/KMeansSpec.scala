package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

/** Deterministic cosine k-means: recovers planted cluster structure,
  * is bit-stable under any input partitioning (the decimal-exact
  * recenter contract), drops emptied clusters, and the v8 gate query
  * has the right shape. */
class KMeansSpec extends SparkSuite {

  // 32 tight clusters (center + 2% jitter), ids 0..31 hit each cluster
  // once so the k lowest-id seeds start one-per-cluster
  private def clustered(n: Long) =
    spark.range(0, n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), j ->
               CAST(xxhash64(vec_id % 32, j) % 1000 AS DOUBLE) / 1000.0
               + CAST(xxhash64(vec_id, j) % 100 AS DOUBLE) / 5000.0)""")
        .as("emb"))

  test("fit recovers planted clusters; a Lloyd round tightens them") {
    val c = clustered(2000)
    val m0 = KMeans.fit(c, "vec_id", "emb", k = 32, rounds = 0)
    val m1 = KMeans.fit(c, "vec_id", "emb", k = 32, rounds = 1)
    // seed i IS a member of ground-truth cluster i, so labels align
    // with vec_id % 32 directly
    val agree1 = m1.assigned
      .filter(col("cluster") === col("vec_id") % 32).count()
    assert(agree1 >= 2000 * 99 / 100, s"recovered only $agree1/2000")
    // recentering moves centroids from an arbitrary member to the
    // cluster mean: mean cosine-to-centroid must not get worse
    def meanCos(m: KMeans.Model) =
      m.assigned.agg(avg("cent_cos")).head().getDouble(0)
    assert(meanCos(m1) >= meanCos(m0) - 1e-12,
      s"Lloyd round degraded mean cent_cos: ${meanCos(m0)} -> ${meanCos(m1)}")
    assert(m1.centroids.map(_._1) == m1.centroids.map(_._1).sorted)
  }

  test("fit is bit-identical under any input partitioning") {
    val c = clustered(600)
    def run(parts: Int) =
      KMeans.fit(c.repartition(parts), "vec_id", "emb", k = 8, rounds = 2)
        .assigned.select("vec_id", "cluster", "cent_cos")
        .orderBy("vec_id").collect().toSeq
    // a plain double avg() recenter would diverge in the last bits
    // between 1 and 13 partitions; the decimal-sum recenter cannot
    assert(run(1) === run(13))
  }

  test("recenter drops emptied clusters and excludes unassignable " +
    "(null-cluster) rows instead of NPE-ing") {
    val s = spark
    import s.implicits._
    val assigned = Seq(
      (1L, Some(0L), 0.9, Seq(1.0, 2.0)),
      (2L, Some(0L), 0.8, Seq(3.0, 4.0)),
      (3L, Some(2L), 0.7, Seq(5.0, 6.0)),
      (4L, None, 0.0, Seq(0.0, 0.0)) // zero-norm row: null cluster
    ).toDF("vec_id", "cluster", "cent_cos", "emb")
    val cents = KMeans.recenter(assigned, "emb")
    assert(cents.map(_._1) == Seq(0L, 2L))
    assert(cents.head._2 == Seq(2.0, 3.0)) // exact decimal means
    assert(cents(1)._2 == Seq(5.0, 6.0))
  }

  test("v8 gate shape: one row per vector, labels in 0..7") {
    val rows = SparkEntry.queries("v8_kmeans")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    val distinctClusters = rows.map(_.getLong(1)).distinct.length
    assert(distinctClusters > 1, "degenerate single-cluster fit")
  }
}
