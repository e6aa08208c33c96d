package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-query overlap of each ANN shortlist's top-5 against the exact
  * brute-force top-5 at a given sf dir — the measurement that sizes the
  * per-query recall floors the v4/v5/v7 oracle gates pin. Optional
  * trailing ints sweep the IVF-family nprobe (the recall/scan knob):
  *
  *   sbt "runMain graft.tools.AnnOverlap /root/testdata/sf0.01 3 4 5 6"
  */
object AnnOverlap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nprobes = args.drop(1).map(_.toInt).toSeq match {
      case Seq() => Seq(graft.operators.IvfIndex.NProbe)
      case ps => ps
    }
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

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "nid").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }

    val exact = topSets(
      graft.SparkEntry.queries("v2_ann_topk")(spark, sfDir))
    def report(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val ann = topSets(df)
      val overlaps = exact.keys.toSeq.sorted.map { q =>
        q -> ann.getOrElse(q, Set.empty).intersect(exact(q)).size }
      println(s"ANNOVERLAP $name min=${overlaps.map(_._2).min} " +
        overlaps.map { case (q, o) => s"q$q=$o" }.mkString(" "))
    }
    report("v4_lsh", graft.queries.VectorQueries.annLshTopK(spark, sfDir))
    nprobes.foreach { np =>
      report(s"v5_ivf@np$np",
        graft.queries.VectorQueries.annIvfTopK(spark, sfDir, np))
      report(s"v7_ivfpq@np$np",
        graft.queries.VectorQueries.annIvfPqTopK(spark, sfDir, np))
    }
    spark.stop()
  }
}
