package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted interleave — the training-epoch ORDER for a
  * multi-source corpus: each source's documents are shuffled by content
  * hash (reproducible across runs, engines, partitionings — the same
  * property the hash-split uses), then the sources are woven together
  * by integer weighted round-robin so a source with weight w contributes
  * w of every Σw consecutive documents. This is the data-mixing step
  * AFTER quota sampling ([[Mixture]] decides how much of each source;
  * this decides the sequence the trainer consumes).
  *
  * Position arithmetic is exact integers: with `tickets(src)` tickets
  * per round and `L = lcm(tickets)`, a source's k-th document sits at
  * `pos = k · L / tickets(src)` — smaller stride = more often. Sorting
  * by `(pos, src, key)` yields the canonical interleave; the sort is a
  * range-exchange (cluster-parallel), never a single task.
  *
  * The per-source hash rank is computed with the same two-phase trick
  * as [[BudgetSelect]] — rank = per-(source, hash-prefix-bucket)
  * row_number + broadcast bucket offsets — because a bare
  * `Window.partitionBy(src)` puts one source's ENTIRE corpus slice in
  * one task (5 sources at 100 TB = 5 tasks). The offsets frame is
  * ≤ |sources| × 256 rows: driver-bounded for the handfuls-to-hundreds
  * of sources a training mixture actually has. */
object Interleave {
  /** Adds `rn` — the 1-based rank of each row within its `srcCol` group
    * under the deterministic order (md5(key), key) — without a
    * per-source single-task window. `keyCol` must be unique per group. */
  def hashRank(df: DataFrame, srcCol: String, keyCol: String): DataFrame = {
    val h = md5(col(keyCol).cast("string").cast("binary"))
    // the 2-hex-char prefix is a PREFIX of the md5 string order, so
    // (bucket asc, h asc) == (h asc): per-bucket ranks + bucket offsets
    // compose to the exact per-source rank
    val withB = df.withColumn("__h", h)
      .withColumn("__bucket", substring(col("__h"), 1, 2))
    val w = Window.partitionBy(col(srcCol), col("__bucket"))
      .orderBy(col("__h"), col(keyCol))
    // the offsets window runs over the COUNTS frame — ≤ |sources|×256
    // rows, not the corpus
    val counts = withB.groupBy(col(srcCol), col("__bucket"))
      .agg(count(lit(1)).as("__c"))
    val offsets = counts
      .withColumn("__off",
        coalesce(sum(col("__c")).over(
          Window.partitionBy(col(srcCol)).orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(srcCol), col("__bucket"), col("__off"))
    // single packed-long join key (the BandPack discipline — the probe
    // side is the corpus): the (source, bucket) composite is STRING
    // typed, so the pack is xxhash64 with a RESIDUAL equality filter —
    // every true match collides (hash is a function of the values), and
    // a 2⁻⁶⁴ alias inside the tiny offsets frame only adds a row the
    // residual predicate removes, so the join is exact, not
    // approximately exact
    val offR = offsets.select(
      xxhash64(col(srcCol), col("__bucket")).as("__pk"),
      col(srcCol).as("__src_r"), col("__bucket").as("__bk_r"),
      col("__off"))
    withB
      .withColumn("__rn_in", row_number().over(w))
      .withColumn("__pk", xxhash64(col(srcCol), col("__bucket")))
      .join(broadcast(offR), Seq("__pk"))
      .filter(col(srcCol) === col("__src_r") &&
        col("__bucket") === col("__bk_r"))
      // rn stays LONG: a source can exceed 2^31 rows at the design
      // scale, where an int cast would overflow (ANSI) or wrap silently
      .withColumn("rn", col("__off") + col("__rn_in"))
      .drop("__h", "__bucket", "__rn_in", "__off", "__pk", "__src_r", "__bk_r")
  }

  /** [[hashRank]] plus the weighted-round-robin `pos` sort key:
    * `pos = rn · (lcm(tickets) / tickets(src))`. Rows whose source has
    * no ticket entry are dropped (they are not in the mixture). */
  def weightedOrder(df: DataFrame, srcCol: String, keyCol: String,
                    tickets: Map[String, Int]): DataFrame = {
    require(tickets.nonEmpty && tickets.values.forall(_ > 0),
      s"tickets must be positive: $tickets")
    // lcm in LONG with an overflow trap: ~10 pairwise-coprime ticket
    // values already exceed Int.MaxValue, and a wrapped lcm corrupts
    // every stride (and the whole epoch order) with no error
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val l = tickets.values.map(_.toLong).reduce { (a, b) =>
      try Math.multiplyExact(a / gcd(a, b), b)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"Interleave.weightedOrder: lcm of tickets ${tickets.values} " +
            "overflows Long — reduce the ticket values to a coarser " +
            "common grid (the stride only needs their RATIOS)")
      }
    }
    val stride: Column = tickets.foldLeft(lit(null).cast("long"): Column) {
      case (els, (s, t)) => when(col(srcCol) === s, lit(l / t)).otherwise(els)
    }
    hashRank(df.filter(col(srcCol).isin(tickets.keys.toSeq: _*)),
        srcCol, keyCol)
      .withColumn("pos", col("rn") * stride)
  }
}
