package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual registered queries (median of 3 after one warmup) —
  * for iterating on a single query without paying the full Bench run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.MicroBench tx6_winnow_fingerprint v5_ann_ivf"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count() // session warmup
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"MICRO $name%-28s median=${times.tail.sorted.apply(1)}%.3f first=${times.head}%.3f")
    }
    spark.stop()
  }
}
