package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable count-min sketch — point-frequency estimates with a
  * never-underestimate guarantee, completing the engine's sketch family:
  * HLL distinct (a14), Misra–Gries heavy hitters (a19, which answers
  * "which items are frequent" but keeps only k survivors), and the
  * ε-quantile sketch (a20/a21). Count-min answers the complementary
  * question MG cannot: "how often does THIS item occur", for ANY probed
  * item, from d·w counters regardless of vocabulary size (Cormode &
  * Muthukrishnan, J. Algorithms 2005).
  *
  * Shape at scale:
  *
  *  1. One narrow projection hashes each token into its `depth` (row,
  *     bucket) cells via an inline `transform` HOF — the exploded rows
  *     are (tinyint, long) pairs, never token strings.
  *  2. `groupBy(row, bucket).count()` aggregates them. Spark's hash
  *     aggregate combines map-side, so the single shuffle carries at most
  *     `numPartitions × depth × width` partial rows (thousands) — the
  *     corpus-sized token stream never crosses the wire. Contrast
  *     `groupBy(token)`: one shuffled row per DISTINCT token (billions at
  *     web scale, with the full string as the key).
  *  3. The sketch itself is ≤ `depth × width` rows, broadcastable to any
  *     probe join; estimates read `min(cnt)` over a token's d cells.
  *
  * Merging is plain per-cell summation (union + re-aggregate): counts are
  * linear in the input multiset, so `sketch(A ⊎ B) = sketch(A) + sketch(B)`
  * EXACTLY — not just within a bound — which `CountMinSpec` pins.
  *
  * Guarantees (both order- and partitioning-independent):
  *   est(t) ≥ trueCount(t)                    — always (collisions only add)
  *   est(t) ≤ trueCount(t) + 2N/w  w.p. ≥ 1 − (1/2)^d  — per the paper
  * The first inequality is the oracle gate's always-true boolean; the
  * second is probabilistic and therefore spec-measured, not oracled.
  *
  * Hashing is the engine-portable md5 idiom (dd5/sm9), ONE digest per
  * token: md5's 32 hex chars split into four disjoint 8-char (32-bit)
  * fields, row j's bucket = field j mod `width` (the standard
  * one-hash-many-fields split — fields of one md5 are independent for
  * CM purposes, and hashing once instead of `depth` times is the hot-
  * loop cost at corpus scale). Deterministic and DuckDB-replicable, so
  * the a22 oracle recomputes the ENTIRE sketch and the exact estimates
  * cell-for-cell — a far stronger gate than bound booleans alone.
  * Spark's built-in `count_min_sketch` SQL aggregate emits an opaque
  * binary with no in-query probe function, and `stat.countMinSketch`
  * collects to the driver; this keeps both halves distributed and
  * cross-engine-checkable. Depth ≤ 4 (md5 has 4 disjoint 32-bit fields).
  */
object CountMin {

  /** 32-bit bucket of hash row `j` (0-based column expr) sliced from the
    * single per-token digest column `h` (32 hex chars). */
  private def bucketExpr(j: String, h: String, width: Int): String =
    s"cast(conv(substring($h, 1 + 8 * ($j), 8), 16, 10) as bigint) % $width"

  /** Build the d×w sketch over `df(column)` (cast to string; nulls
    * dropped). Returns `(row INT, bucket BIGINT, cnt BIGINT)` — only
    * cells with at least one hit are materialized (absent cell = 0). */
  def sketch(df: DataFrame, column: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 4 && width >= 2, s"bad geometry d=$depth w=$width")
    df.select(col(column).cast("string").as("__t"))
      .filter(col("__t").isNotNull)
      .select(md5(col("__t").cast("binary")).as("__h")) // ONE digest per token
      // one array of d (row, bucket) structs per token, exploded before
      // the aggregate: token strings die at the digest projection
      .select(explode(expr(
        s"""transform(sequence(0, ${depth - 1}), j -> named_struct(
           |  'row', cast(j as int),
           |  'bucket', ${bucketExpr("j", "__h", width)}))""".stripMargin))
        .as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches of identical geometry: per-cell summation. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates for `probes(column)`: min over the d cells.
    * The sketch side is ≤ d·w rows and broadcast; probing never rescans
    * the corpus. Missing cells mean zero hits → estimate 0. */
  def estimate(probes: DataFrame, column: String, sk: DataFrame,
               depth: Int, width: Int): DataFrame = {
    val cells = probes
      .select(col(column).as("__p"),
        md5(col(column).cast("string").cast("binary")).as("__h"))
      .select(col("__p"), explode(expr(
        s"""transform(sequence(0, ${depth - 1}), j -> named_struct(
           |  'row', cast(j as int),
           |  'bucket', ${bucketExpr("j", "__h", width)}))""".stripMargin))
        .as("cell"))
      .select(col("__p"), col("cell.row").as("row"), col("cell.bucket").as("bucket"))
    cells.join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy(col("__p").as(column))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
