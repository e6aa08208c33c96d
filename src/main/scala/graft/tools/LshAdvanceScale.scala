package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{LshBandIndex, MinHashLSH}

/** Scaling measurement for the LSH band index's append-only advance:
  * the claim behind a daily 100 TB ingest is that advancing the index
  * by a FIXED batch costs the same whether the indexed history holds
  * 10k or 500k documents — signatures are computed for the batch only,
  * the delta generation's write is batch-sized, and the only
  * history-touching step is the id-overlap semi-join against the
  * index's narrow `__id` column (no text, no signatures). The probe
  * that follows ([[MinHashLSH.incrementalPairs]]) reads band columns of
  * the chain, so its cost tracks the candidate collisions, not the
  * corpus row count.
  *
  * Output: one line per history size H — full-build seconds at H,
  * advance seconds for the fixed batch, probe seconds for a second
  * fixed batch against the advanced chain. `advance` flat in H is the
  * batch-sized-maintenance claim; `build` growing ~linearly in H is the
  * baseline it replaces.
  *
  *   sbt "runMain graft.tools.LshAdvanceScale 10000 100000 500000"
  */
object LshAdvanceScale {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(10000L, 100000L, 500000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // match the Verify/Bench session configuration (fingerprints are
      // xor-based and ANSI-safe since round 10; ansi=false kept for
      // environment parity with the bench of record)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // synthetic docs with overlapping vocabulary so band collisions are
    // realistic (shared shingles across id neighborhoods)
    def docs(from: Long, until: Long): DataFrame =
      spark.range(from, until).select(col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(0, 29),
                 j -> concat('w', CAST((id DIV 3) * 5 + j AS STRING))))""")
          .as("text"))

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val batch = 2000L
    // untimed warmup: JIT + codegen for the signature/band expressions,
    // so the first measured size isn't charged session startup
    locally {
      val k0 = s"lsh_adv_warm_${System.nanoTime()}"
      LshBandIndex.ensure(spark, docs(0, 2000), k0)
      LshBandIndex.advanceWithBatch(spark, k0, docs(2000, 3000))
    }
    sizes.foreach { h =>
      val key = s"lsh_adv_scale_${h}_${System.nanoTime()}"
      val hist = docs(0, h).localCheckpoint(true)
      val b1 = docs(h, h + batch).localCheckpoint(true)
      val b2 = docs(h + batch, h + 2 * batch).localCheckpoint(true)
      val tBuild = time(LshBandIndex.ensure(spark, hist, key))
      val tAdv = time(LshBandIndex.advanceWithBatch(spark, key, b1))
      val gen = LshBandIndex.currentGenPath(spark, key).get
      val tProbe = time {
        MinHashLSH.incrementalPairs(MinHashLSH.bandRows(b2),
          LshBandIndex.narrowBandsOf(spark, gen),
          LshBandIndex.sigsOf(spark, gen)).count()
      }
      println(f"LSHADV h=$h%-7d build=$tBuild%.2f advance=$tAdv%.2f " +
        f"probe=$tProbe%.2f (batch=$batch)")
    }
    spark.stop()
  }
}
