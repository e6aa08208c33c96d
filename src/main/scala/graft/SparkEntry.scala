package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query (SparkSession, sfDir) => DataFrame, with an equivalent
  * DuckDB oracle SQL where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ScalarQueries.queries ++ NestedQueries.queries ++
      TextQueries.queries ++ VectorQueries.queries ++
      WindowedAggQueries.queries ++ CoverageQueries.queries ++
      DedupExtQueries.queries ++ ExtraWindowQueries.queries ++
      AnalyticQueries.queries ++ SamplingQueries.queries ++
      RefOpQueries.queries ++ MultimodalQueries.queries ++
      WritePathQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ ScalarQueries.oracle ++ NestedQueries.oracle ++
      TextQueries.oracle ++ VectorQueries.oracle ++
      WindowedAggQueries.oracle ++ CoverageQueries.oracle ++
      DedupExtQueries.oracle ++ ExtraWindowQueries.oracle ++
      AnalyticQueries.oracle ++ SamplingQueries.oracle ++
      RefOpQueries.oracle ++ MultimodalQueries.oracle ++
      WritePathQueries.oracle
}
