package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) storage for repeated large-×-large joins.
  *
  * The reference only ever joins broadcast-able dims (SURVEY.md §2.3), so
  * it never pays a shuffle on the fact side. At 100 TB a fact-to-fact
  * equi-join (lineitem ⋈ orders) shuffles BOTH sides every run; bucketing
  * both tables by the join key at write time moves that shuffle to
  * write-once: Catalyst sees matching `HashPartitioning(key, n)` output
  * partitionings on the scans and plans a SortMergeJoin with NO Exchange.
  *
  * Rules for the co-location to kick in (asserted in BucketingSpec):
  *  - both sides bucketed by the join key with the SAME bucket count;
  *  - `spark.sql.sources.bucketing.enabled=true` (default);
  *  - the join key set must cover the bucket columns.
  *
  * Bucket count sizing at scale: target ≤ ~128 MB of the larger table per
  * bucket per partition-slice; buckets also cap scan parallelism, so
  * don't under-bucket (1000-executor cluster wants ≥ thousands).
  */
object Bucketing {

  /** Write `df` as a bucketed external table at `path`, sorted within
    * buckets by the bucket key (enables the merge join to skip its sort
    * when bucket files are single-split). */
  def writeBucketed(df: DataFrame, path: String, table: String,
                    bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their shared bucket key — plans as a
    * shuffle-free SortMergeJoin when both were written with
    * [[writeBucketed]] and equal bucket counts. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, on: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on)
}
