package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-query overlap of each ANN gate's top-5 against the exact
  * brute-force top-5 at a given sf dir — the measurement that sizes the
  * per-query recall floors the v4/v5/v7 oracle gates pin:
  *
  *   sbt "runMain graft.tools.AnnOverlap /root/testdata/sf0.01"
  */
object AnnOverlap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def topSets(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .select("qid", "nid").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }

    val exact = topSets("v2_ann_topk")
    Seq("v4_ann_lsh", "v5_ann_ivf", "v7_ann_ivfpq").foreach { name =>
      val ann = topSets(name)
      val overlaps = exact.keys.toSeq.sorted.map { q =>
        q -> ann.getOrElse(q, Set.empty).intersect(exact(q)).size }
      val same = overlaps.forall(_._2 == 5)
      println(s"ANNOVERLAP $name exact_equal=$same " +
        overlaps.map { case (q, o) => s"q$q=$o" }.mkString(" "))
    }
    spark.stop()
  }
}
