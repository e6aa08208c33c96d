package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CosineLshIndex

/** Scaling measurement for the INCREMENTAL embedding near-dup path
  * (dd16 / [[graft.operators.CosineLshIndex]]) — the LshAdvanceScale
  * shape for vectors: build a history index at several sizes, advance
  * it with a fixed batch, then probe a second fixed batch. The claims
  * under test: `advance` is O(batch) (flat in history), and `probe` is
  * flat in history up to the narrow-key scan (24 B/band-row; vectors
  * are fetched for candidate ids only, so the dim-64 payload never
  * rides the join).
  *
  *   sbt "runMain graft.tools.EmbIndexScale 10000 100000 500000"
  */
object EmbIndexScale {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(10000L, 100000L, 500000L)
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

    // deterministic 64-dim corpus of hash-UNIQUE vectors (pairwise
    // cosine ~0 — near-dup LSH presumes near-dups are RARE; a clustered
    // corpus turns 1/k of the table into mutual candidates, which is
    // true-pair growth, not probe cost). Seeded per (id, dim) so a
    // planted batch vector can point at any history seed.
    def embExpr(seed: String): String =
      s"transform(sequence(0, 63), i -> " +
        s"sin(CAST(pmod(xxhash64($seed, i), 100000L) AS DOUBLE) * 0.001D))"
    def vecs(from: Long, until: Long): DataFrame =
      spark.range(from, until).select(col("id").as("vec_id"),
        expr(embExpr("id")).as("emb"))
    // batch with PLANTED near-dups: every 5th id is a per-dim-jittered
    // copy of a pseudo-random history vector (cosine ≈ 0.9999 — NOT a
    // uniform scale, which leaves cosine at exactly 1.0 and every sign
    // bit unchanged, trivializing recall at any geometry); the rest
    // are fresh unique vectors
    def batchWithPlants(from: Long, until: Long, h: Long): DataFrame =
      spark.range(from, until).select(col("id").as("vec_id"),
        expr(s"CASE WHEN id % 5 = 0 THEN transform(" +
          embExpr(s"pmod(id * 7919, ${h}L)") +
          ", (x, j) -> x * (1.0D + 0.0008D * CAST((id + j) % 5 - 2 AS DOUBLE))) " +
          s"ELSE ${embExpr("id")} END").as("emb"))

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val batch = 2000L
    locally { // untimed JIT/codegen warmup
      val k0 = s"emb_warm_${System.nanoTime()}"
      CosineLshIndex.ensure(spark, vecs(0, 2000), k0)
      CosineLshIndex.advanceWithBatch(spark, k0, vecs(2000, 3000))
    }
    sizes.foreach { h =>
      val key = s"emb_scale_${h}_${System.nanoTime()}"
      val hist = vecs(0, h).localCheckpoint(true)
      val b1 = vecs(h, h + batch).localCheckpoint(true)
      val b2 = batchWithPlants(h + batch, h + 2 * batch, h)
        .localCheckpoint(true)
      val tBuild = time(CosineLshIndex.ensure(spark, hist, key))
      val tAdv = time(CosineLshIndex.advanceWithBatch(spark, key, b1))
      val gen = CosineLshIndex.currentGenPath(spark, key).get
      var nPairs = 0L; var nDup = 0L
      val tProbe = time {
        val p = CosineLshIndex.incrementalPairs(b2, "vec_id", "emb",
          CosineLshIndex.narrowKeysOf(spark, gen),
          CosineLshIndex.vecsOf(spark, gen)).localCheckpoint(true)
        nPairs = p.count()
        nDup = p.filter(col("cs") >= 0.95).count()
      }
      println(f"EMBIDX h=$h%-7d build=$tBuild%.2f advance=$tAdv%.2f " +
        f"probe=$tProbe%.2f candidates=$nPairs neardups=$nDup " +
        f"(batch=$batch planted=${batch / 5})")
    }
    // GEOMETRY sweep at the largest size: the candidate set's
    // linear-in-corpus term is chance band collisions (~bands·2^-bits
    // per pair) — widening bands cuts it 2× per bit while the planted
    // ~0.9999-cosine pairs keep colliding (their per-plane disagreement
    // is ~1e-2, so even 32-bit bands agree with p≈0.72 and 8 bands
    // all-miss with p≈3e-5). This is the dd16 dial: precision from
    // band WIDTH, recall from band COUNT, correctness from neither
    // (exact cosine settles candidates).
    val hG = sizes.max
    val histG = vecs(0, hG).localCheckpoint(true)
    val bG = batchWithPlants(hG, hG + batch, hG).localCheckpoint(true)
    Seq((8, 16), (8, 24), (8, 32)).foreach { case (bands, rpb) =>
      val key = s"emb_geo_${bands}_${rpb}_${System.nanoTime()}"
      CosineLshIndex.ensure(spark, histG, key,
        bands = bands, rowsPerBand = rpb)
      val gen = CosineLshIndex.currentGenPath(spark, key,
        bands = bands, rowsPerBand = rpb).get
      var nPairs = 0L; var nDup = 0L
      val tProbe = time {
        val p = CosineLshIndex.incrementalPairs(bG, "vec_id", "emb",
          CosineLshIndex.narrowKeysOf(spark, gen, bands, rpb),
          CosineLshIndex.vecsOf(spark, gen, bands, rpb),
          bands = bands, rowsPerBand = rpb).localCheckpoint(true)
        nPairs = p.count()
        nDup = p.filter(col("cs") >= 0.95).count()
      }
      println(f"EMBGEO bands=$bands rowsPerBand=$rpb h=$hG " +
        f"probe=$tProbe%.2f candidates=$nPairs neardups=$nDup " +
        f"(planted=${batch / 5})")
    }
    spark.stop()
  }
}
