package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.{CorpusPipeline, IncrementalCurate}

/** One-off stage attribution for curateBatch's "gate+exact" segment
  * against an EXISTING curated store (a leftover CurateIncrScale world):
  * forces each intermediate eagerly so the O(history) term can be
  * pinned to a specific sub-step.
  *
  *   sbt "runMain graft.tools.CurateStageDebug /tmp/graft_cis_.../t <h>"
  */
object CurateStageDebug {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val h = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs(from: Long, until: Long): DataFrame =
      spark.range(from, until).select(col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(0, 29),
                 j -> concat('w', CAST((id DIV 3) * 5 + j AS STRING))))""")
          .as("text"),
        lit("en").as("lang"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("source", lit("synth"))

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGEDBG $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val b = docs(h, h + 2000).localCheckpoint(true)
    // warmup round so JIT isn't attributed to the first stage
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val fresh = time("antiJoinFresh(doc_id)") {
        graft.store.FileStats.antiJoinFresh(spark, root,
          "doc_id", b, "doc_id").localCheckpoint(true)
      }
      val gated = time("qualityGate") {
        CorpusPipeline.qualityGate(fresh, IncrementalCurate.Langs,
          IncrementalCurate.MinChars, IncrementalCurate.MaxChars,
          IncrementalCurate.MaxPunctRatio).localCheckpoint(true)
      }
      val mind = time("exactKeepMin+md5") {
        CorpusPipeline.exactDedupKeepMin(gated)
          .withColumn("content_hash", md5(col("text")))
          .localCheckpoint(true)
      }
      val keep = time("antiJoinFresh(hash)") {
        graft.store.FileStats.antiJoinFresh(spark, root,
          "content_hash", mind, "content_hash").localCheckpoint(true)
      }
      println(s"    rows: fresh=${fresh.count()} gated=${gated.count()} " +
        s"mind=${mind.count()} keep=${keep.count()}")
    }
    spark.stop()
  }
}
