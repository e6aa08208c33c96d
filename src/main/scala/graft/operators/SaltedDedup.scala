package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe keep-top-one-per-key (the W1 "latest wins" dedup shape,
  * e.g. silver_etl_script.py:701-705's drop-duplicates-keep-newest).
  *
  * The plain single-window formulation shuffles every row of a key into
  * ONE task; a key holding 1% of a 100 TB table pins a terabyte on a
  * single executor. This runs the classic two-phase refinement instead:
  *
  *   1. salt each row by a hash of its ORDER columns into `salts`
  *      sub-groups, pick a winner per (key, salt) — the heavy shuffle is
  *      now spread over `salts` tasks per hot key;
  *   2. re-window the at-most-`salts` survivors per key without the salt
  *      to pick the global winner — input is already tiny.
  *
  * Because max is associative, the winner of winners IS the global
  * winner, so the result is row-identical to the single-window plan for
  * any total `order` (ties must be broken by `order` itself, as W1's
  * (shipdate DESC, linenumber DESC) does). SkewSpec asserts equality on
  * a deliberately skewed fixture, and the w8 gate query proves it
  * against the same DuckDB oracle as the unsalted w1.
  */
object SaltedDedup {

  /** Keep exactly one row per `keys` group: the first under `order`.
    * Row-identical to `row_number() over (partition by keys order by
    * order) = 1` provided `order` is a total order within each key.
    *
    * @param saltOn the plain (undirected) columns underlying `order` —
    *   salting hashes these, so rows that compare equal under `order`
    *   land in the same salt and phase 1 always sees ties together. */
  def topOne(df: DataFrame, keys: Seq[String], order: Seq[Column],
             saltOn: Seq[Column], salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = df.withColumn("_salt", pmod(xxhash64(saltOn: _*), lit(salts)))
    val wLocal = Window.partitionBy((keys :+ "_salt").map(col): _*).orderBy(order: _*)
    val local = salted
      .withColumn("_rn", row_number().over(wLocal))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val wGlobal = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    local
      .withColumn("_rn", row_number().over(wGlobal))
      .filter(col("_rn") === 1)
      .drop("_rn", "_salt")
  }
}
