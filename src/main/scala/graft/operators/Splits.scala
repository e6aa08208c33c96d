package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reproducible content-hash splitting — membership is a pure function of
  * the key, so re-runs, engine changes, and corpus growth never move a
  * record across splits (no train/eval leakage as the corpus evolves).
  * Single definition shared by `sm1_hash_split` and `CorpusPipeline` so
  * "same split membership" stays true by construction. */
object Splits {
  /** 'train' when the first two md5 hex chars of `key` sort below
    * `trainHexThreshold` ("cc" = 204/256 buckets ≈ 79.7% train). */
  def hashSplit(key: Column, trainHexThreshold: String = "cc"): Column =
    when(substring(md5(key.cast("string").cast("binary")), 1, 2)
      < trainHexThreshold, lit("train")).otherwise(lit("eval"))
}
