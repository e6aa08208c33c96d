package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Approximate heavy hitters (frequent items) via mergeable Misra–Gries
  * summaries — the frequency-sketch family member the engine was missing
  * next to HLL distinct (a14) and approx percentiles (a13). Completes the
  * SURVEY.md §7.5 sketch posture: token/entity frequency over a 100 TB
  * corpus without a full-vocabulary shuffle.
  *
  * Shape (the part that matters at scale):
  *
  *  1. `mapPartitions` runs one bounded Misra–Gries summary of at most
  *     `k` counters per partition — O(1) amortized per row, O(k) memory,
  *     NO shuffle of raw tokens.
  *  2. The only shuffle carries ≤ `numPartitions × k` summary rows
  *     (thousands), which a single hash aggregate sums per token.
  *
  * Merging by plain summation is sound for MG summaries (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): each per-partition estimate
  * underestimates its partition-local true count by at most
  * `N_partition / (k+1)`, absent tokens contribute 0, and the errors add,
  * so for every token
  *
  *     trueCount − N/(k+1)  ≤  est  ≤  trueCount
  *
  * with N the TOTAL row count — independent of partitioning, partition
  * order, and row order. Those two inequalities are exactly what the
  * `a19_heavy_hitters` oracle gate asserts per top-10 token, and any item
  * with trueCount > N/(k+1) is guaranteed present in the merged summary.
  *
  * Contrast with the exact `groupBy(token).count()`: that shuffles one
  * row per DISTINCT token (web-scale corpora: billions) and keeps the
  * whole tail; this keeps k counters per partition and still answers the
  * only question heavy-hitter consumers ask (which items exceed a
  * frequency threshold, and roughly how often do they occur).
  *
  * Spark has no built-in for this: `count_min_sketch` exists as an SQL
  * aggregate but there is no function to READ estimates from the binary
  * sketch inside a query, and `stat.freqItems` collects to the driver.
  */
object HeavyHitters {

  /** One Misra–Gries pass over a partition's tokens: at most `k` counters
    * survive. Buffer grows to `2k` between compactions so the decrement
    * step amortizes to O(1) per row: a compaction costs O(2k) and at
    * least `k` insertions separate two compactions.
    *
    * Compaction subtracts the (k+1)-th largest count `c*` from every
    * counter and drops the non-positive ones (≤ k survive, since
    * survivors need count > c*). Ranks 1..k+1 each lose the full `c*`,
    * so every compaction destroys ≥ (k+1)·c* of total weight — hence
    * Σ c* ≤ N_partition/(k+1), which bounds any single token's
    * underestimate (it loses at most c* per compaction it survives, and
    * loses its whole remaining count when dropped — both within Σ c*).
    */
  private[graft] def mgSummarize(
      rows: Iterator[String], k: Int): Iterator[(String, Long)] = {
    require(k >= 1, s"heavy-hitter k must be >= 1, got $k")
    val m = new java.util.HashMap[String, Long](4 * k)

    def compact(): Unit = {
      val counts = new Array[Long](m.size)
      var i = 0
      val it0 = m.values().iterator()
      while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cStar = counts(counts.length - 1 - k) // (k+1)-th largest
      val it1 = m.entrySet().iterator()
      while (it1.hasNext) {
        val e = it1.next()
        val nv = e.getValue - cStar
        if (nv <= 0) it1.remove() else e.setValue(nv)
      }
    }

    while (rows.hasNext) {
      val x = rows.next()
      if (x != null) {
        val c = m.getOrDefault(x, 0L)
        m.put(x, c + 1)
        if (c == 0 && m.size > 2 * k) compact()
      }
    }
    // Final compaction down to ≤ k: the lazy 2k buffer is an internal
    // amortization detail; the emitted summary honors the k-counter
    // contract. The error argument is unchanged — this compaction too
    // removes ≥ (k+1)·c* of weight, so Σ c* ≤ N/(k+1) still holds.
    if (m.size > k) compact()
    val out = Vector.newBuilder[(String, Long)]
    val it2 = m.entrySet().iterator()
    while (it2.hasNext) { val e = it2.next(); out += ((e.getKey, e.getValue)) }
    out.result().iterator
  }

  /** Merged approximate counts `(token, est)` for every token surviving
    * any per-partition summary. For all tokens,
    * `trueCount − N/(k+1) ≤ est ≤ trueCount`; every token with
    * `trueCount > N/(k+1)` is present. The shuffle carries at most
    * `numPartitions × k` rows regardless of corpus size or vocabulary. */
  def approxCounts(df: DataFrame, tokenCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tokens: Dataset[String] = df.select(col(tokenCol).cast("string")).as[String]
    tokens
      .mapPartitions(it => mgSummarize(it, k))
      .toDF("token", "est")
      .groupBy("token")
      .agg(sum(col("est")).as("est"))
  }

  /** The m apparently-most-frequent tokens by merged estimate
    * (est desc, token asc — deterministic given the estimates). Because
    * estimates underestimate by at most N/(k+1), any token whose true
    * count beats the m-th token's true count by more than N/(k+1) is
    * guaranteed to rank above it here. */
  def approxTopK(df: DataFrame, tokenCol: String, k: Int, m: Int): DataFrame =
    approxCounts(df, tokenCol, k)
      .orderBy(col("est").desc, col("token"))
      .limit(m)
}
