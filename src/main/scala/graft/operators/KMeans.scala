package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic cosine k-means — the clustering primitive the
  * LLM-data-pipeline extensions share (SemDeDup cells, IVF coarse
  * codebooks, cluster-balanced sampling), exposed as a first-class
  * operator with oracle-exact semantics (`v8_kmeans` replicates a full
  * fit round-for-round in DuckDB).
  *
  * Determinism contract (what makes a distributed k-means
  * oracle-checkable at all):
  *
  *   - **Seeding**: the embeddings of the `k` LOWEST ids, labeled
  *     `0..k-1` in id order — no RNG, replicable by any engine.
  *   - **Assignment**: the fused [[graft.functions.NearestCentroid]]
  *     argmax (max cosine, ties to the lowest cluster label) — a pure
  *     projection per round, zero joins/shuffles/row expansion
  *     (the SemDedup/IvfIndex kernel).
  *   - **Recentering**: the per-dimension mean is computed as
  *     `CAST(SUM(CAST(v AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*)`.
  *     Decimal addition is associative, so the sum is EXACT under any
  *     partitioning and any aggregation order — a plain double `avg`
  *     would make the centroids (and therefore downstream assignments)
  *     depend on Spark's partial-aggregation order and never match an
  *     oracle bit-for-bit. One shuffle per round, on (cluster, pos) —
  *     k × dim groups.
  *   - **Empty clusters** drop out (no members → no recentered row),
  *     exactly as in the SQL replication, where the recenter CTE simply
  *     has no row for the label.
  *
  * Scale shape per round: assignment is N × K × dim FMAs at matrix
  * rate in one projection; recentering shuffles N × dim (cluster, pos,
  * v) triples, partial-aggregated map-side to ≤ k × dim × partitions
  * rows. Nothing corpus×K ever materializes. The centroid set collects
  * to the driver between rounds — bounded by k × dim, the same
  * contract every codebook consumer in this engine already assumes.
  */
object KMeans {

  /** Trained state: `centroids(label)` sorted by label, plus the final
    * assignment frame `(idCol, cluster, cent_cos, embCol)`. */
  final case class Model(centroids: Seq[(Long, Seq[Double])],
                         assigned: DataFrame)

  /** Seed centroids: embeddings of the `k` lowest ids, labeled 0..k-1
    * in id order. */
  def seed(corpus: DataFrame, idCol: String, embCol: String,
           k: Int): Seq[(Long, Seq[Double])] =
    corpus.orderBy(col(idCol)).limit(k)
      .select(col(embCol).cast("array<double>")).collect()
      .zipWithIndex
      .map { case (r, i) => i.toLong -> r.getSeq[Double](0).toSeq }.toSeq

  /** One assignment pass: `(idCol, cluster, cent_cos, embCol)` via the
    * fused argmax. */
  def assignTo(corpus: DataFrame, idCol: String, embCol: String,
               cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val best = graft.functions.NearestCentroid.assignColumn(
      corpus.sparkSession, col(embCol), cents)
    corpus.withColumn("graft_best", best)
      .select(col(idCol), col("graft_best.cid").as("cluster"),
        col("graft_best.cos").as("cent_cos"), col(embCol))
  }

  /** Decimal-exact per-cluster mean (see class doc); clusters that
    * lost every member drop out. Unassignable rows (null or zero-norm
    * embeddings carry a null cluster, SQL-style) are excluded rather
    * than NPE-ing the collect. */
  def recenter(assigned: DataFrame, embCol: String): Seq[(Long, Seq[Double])] =
    assigned
      .filter(col("cluster").isNotNull)
      .select(col("cluster"), posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg((sum(col("v").cast("decimal(30,12)")).cast("double") /
        count(lit(1))).as("m"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (cl, rows) =>
        cl -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      .toSeq.sortBy(_._1)

  /** Fit with `rounds` recenter+reassign rounds after the seeded
    * assignment (rounds = 0 is pure nearest-seed bucketing). */
  def fit(corpus: DataFrame, idCol: String, embCol: String, k: Int,
          rounds: Int): Model = {
    require(k > 0 && rounds >= 0, s"kmeans: bad k=$k rounds=$rounds")
    var cents = seed(corpus, idCol, embCol, k)
    var assigned = assignTo(corpus, idCol, embCol, cents)
    var r = 0
    while (r < rounds) {
      cents = recenter(assigned, embCol)
      assigned = assignTo(corpus, idCol, embCol, cents)
      r += 1
    }
    Model(cents, assigned)
  }
}
