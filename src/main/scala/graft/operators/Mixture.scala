package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling — the data-mixing draw an LLM
  * training pipeline runs last: given target proportions per stratum
  * (source, language, domain …) and a document budget, take each
  * stratum's allocation `round(budget × weight)` as the FIRST rows in
  * content-hash order.
  *
  * Determinism is the whole design: membership is a pure function of
  * (stratum, key), so re-runs, re-partitionings, and other engines
  * draw the SAME mixture (the DuckDB oracle replicates it verbatim),
  * and growing one stratum of the corpus never reshuffles another's
  * draw (the md5 order is stable under inserts elsewhere). Strata
  * absent from `weights` are excluded; a stratum with fewer rows than
  * its allocation contributes everything it has — callers detect an
  * under-filled mixture by comparing counts, not by a silent re-draw
  * from other strata (re-balancing is a POLICY, not something a
  * sampler should improvise).
  *
  * Plan shape: one row_number window partitioned by the stratum (a
  * single hash-partition exchange on ≤ |strata| keys) over the
  * md5-keyed order, then a literal CASE quota filter — no joins, no
  * driver-side counting pass.
  */
object Mixture {

  /** `allocations`: stratum value → row quota (precomputed from
    * weights × budget by [[allocate]] or by hand — literal in the
    * plan, replicable in SQL). */
  def sample(df: DataFrame, stratumCol: String, keyCol: String,
             allocations: Map[String, Int]): DataFrame = {
    require(allocations.nonEmpty, "mixture: empty allocation map")
    val quota: Column = allocations.toSeq.sortBy(_._1)
      .foldLeft(lit(0)) { case (acc, (s, q)) =>
        when(col(stratumCol) === s, q).otherwise(acc)
      }
    // pre-filter to the listed strata: unlisted rows would otherwise be
    // ranked only to die on the quota-0 filter (the oracle's WHERE ...
    // IN does the same). The rank itself comes from Interleave.hashRank
    // — the identical (md5(key), key) per-stratum order, computed
    // two-phase instead of a bare Window.partitionBy(stratum), whose
    // one-task-per-stratum sort is exactly the pathology hashRank's
    // header documents (5 languages at 100 TB = 5 tasks). rn casts back
    // to int post-filter: quotas are Ints, so every surviving rank fits.
    Interleave
      .hashRank(df.filter(col(stratumCol).isin(allocations.keySet.toSeq: _*)),
        stratumCol, keyCol)
      .filter(col("rn") <= quota)
      .withColumn("rn", col("rn").cast("int"))
  }

  /** Temperature-scaled allocation (the multilingual mixing rule of
    * Gopher/PaLM/UNIMAX: sample stratum s proportional to n_s^α so head
    * strata stop dominating while tail strata stay represented) at
    * α = 1/2, computed in EXACT integer arithmetic: weight_s =
    * floor(sqrt(n_s)) (IEEE sqrt is correctly rounded, so this is
    * engine-portable bit-for-bit — unlike pow(n, α) for general α,
    * which no engine guarantees), then largest-remainder apportionment
    * with integer quotients (w·budget div T) and integer remainders
    * (w·budget mod T) — no double sums anywhere, so Spark, the JVM
    * re-run, and the DuckDB oracle derive the SAME quotas from the
    * same counts. The floor(sqrt) weight differs from the real-valued
    * n^0.5 by < 1 part in 2·sqrt(n) — immaterial for mixing, decisive
    * for reproducibility. */
  def temperatureAllocate(counts: Map[String, Long],
                          budget: Int): Map[String, Int] = {
    require(counts.nonEmpty && budget >= 0 &&
      counts.values.forall(_ >= 0), "mixture: bad temperature input")
    val w = counts.map { case (s, n) => (s, math.sqrt(n.toDouble).toLong) }
    val t = w.values.sum
    require(t > 0, "mixture: all strata empty")
    val floors = w.map { case (s, x) => (s, (x * budget / t).toInt) }
    var left = budget - floors.values.sum
    val byRemainder = w.toSeq
      .map { case (s, x) => (s, x * budget % t) }
      .sortBy { case (s, r) => (-r, s) }
    val bumped = scala.collection.mutable.Map(floors.toSeq: _*)
    for ((s, _) <- byRemainder if left > 0) { bumped(s) += 1; left -= 1 }
    bumped.toMap
  }

  /** Largest-remainder apportionment of `budget` across `weights`
    * (deterministic; ties to the lexicographically smaller stratum):
    * exact floor quotas plus one extra for the largest remainders, so
    * the quotas always sum to `budget` — plain rounding can over- or
    * under-shoot by |strata|/2. */
  def allocate(weights: Map[String, Double], budget: Int): Map[String, Int] = {
    require(weights.nonEmpty && budget >= 0, "mixture: bad allocation input")
    require(weights.values.forall(w => w >= 0 && !w.isNaN),
      "mixture: weights must be non-negative")
    val total = weights.values.sum
    require(total > 0, "mixture: weights sum to zero")
    val exact = weights.toSeq.sortBy(_._1)
      .map { case (s, wt) => (s, wt / total * budget) }
    val floors = exact.map { case (s, e) => (s, e.toInt) }
    var left = budget - floors.map(_._2).sum
    val byRemainder = exact.map { case (s, e) => (s, e - e.toInt) }
      .sortBy { case (s, r) => (-r, s) }
    val bumped = scala.collection.mutable.Map(floors: _*)
    for ((s, _) <- byRemainder if left > 0) { bumped(s) += 1; left -= 1 }
    bumped.toMap
  }
}
