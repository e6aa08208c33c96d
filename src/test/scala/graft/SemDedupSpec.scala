package graft

import org.apache.spark.sql.functions._
import graft.operators.SemDedup

/** SemDeDup cluster-bucketed semantic dedup: assignment is a
  * zero-shuffle projection; the prune keeps exactly one member of each
  * within-cell dup group (the lowest-cent_cos one, per the paper's
  * diversity rule); results are invariant to input partitioning; and
  * planted near-identical copies are overwhelmingly pruned, with the
  * only permitted misses being pairs that straddle a cell boundary —
  * the algorithm's documented recall edge, not an implementation bug. */
class SemDedupSpec extends SparkSuite {

  private val CopyOffset = 1L << 40

  private def planted = {
    val (s, d) = (spark, sf)
    graft.queries.DedupExtQueries.plantedCorpus(s, d)
  }

  private def centroids16 = planted.filter(col("vec_id") < 16)
    .select(col("vec_id"), col("emb")).collect()
    .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq

  test("assignment plan is a pure projection: zero exchanges, no join") {
    val plan = SemDedup.assign(planted, "vec_id", "emb", centroids16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assign must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"assign must not join:\n$plan")
  }

  test("every centroid cell is non-degenerate and ids round-trip") {
    val asg = SemDedup.assign(planted, "vec_id", "emb", centroids16)
    // each centroid assigns to itself at cosine exactly 1.0
    val self = asg.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("cluster"), col("cent_cos")).collect()
    self.foreach { r =>
      assert(r.getLong(0) === r.getLong(1),
        s"centroid ${r.getLong(0)} assigned to ${r.getLong(1)}")
      // self-cosine: 1.0 up to float summation rounding
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    }
    assert(asg.count() === planted.count())
  }

  test("exactly one member of each within-cell dup group is kept; " +
    "keeper has the lowest cent_cos") {
    val out = SemDedup.semdedup(planted, "vec_id", "emb", centroids16, 0.95)
      .cache()
    val orig = out.filter(col("vec_id") < CopyOffset)
      .select(col("vec_id").as("o_id"), col("cluster").as("o_cl"),
        col("cent_cos").as("o_cc"), col("is_kept").as("o_kept"))
    val copy = out.filter(col("vec_id") >= CopyOffset)
      .select((col("vec_id") - CopyOffset).as("o_id"),
        col("cluster").as("c_cl"), col("cent_cos").as("c_cc"),
        col("is_kept").as("c_kept"))
    val pairs = orig.join(copy, "o_id").collect()
    assert(pairs.nonEmpty)
    val sameCell = pairs.filter(r => r.getLong(1) == r.getLong(4))
    // recall edge: only a cell-boundary straddle may leave both kept —
    // rare by construction (copies perturb by <=0.3%/dim)
    assert(sameCell.length >= pairs.length * 9 / 10,
      s"too many planted pairs straddle cells: ${pairs.length - sameCell.length}/${pairs.length}")
    sameCell.foreach { r =>
      val (oCc, oKept, cCc, cKept) =
        (r.getDouble(2), r.getBoolean(3), r.getDouble(5), r.getBoolean(6))
      assert(oKept ^ cKept,
        s"same-cell planted pair must keep exactly one: o_id=${r.getLong(0)}")
      val keptCc = if (oKept) oCc else cCc
      val dropCc = if (oKept) cCc else oCc
      assert(keptCc <= dropCc,
        s"keeper must have the lowest cent_cos: kept=$keptCc dropped=$dropCc")
    }
    out.unpersist()
  }

  test("assignBroadcast matches assign bit-for-bit (argmax and ties)") {
    import org.apache.spark.sql.functions.{col => c}
    val cents = centroids16
    val viaLiteral = SemDedup.assign(planted, "vec_id", "emb", cents)
      .orderBy("vec_id").collect().toSeq
    val centDf = {
      val s = spark
      import s.implicits._
      cents.toDF("cid", "cvec")
    }
    val viaBroadcast = SemDedup
      .assignBroadcast(planted, "vec_id", "emb", centDf)
      .orderBy("vec_id").collect().toSeq
    assert(viaLiteral.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      === viaBroadcast.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
  }

  test("two-level probe at nprobe >= G matches the exact scan bit-for-bit") {
    // 16 centroids → G = ceil(√16) = 4 groups; nprobe=4 probes every
    // group THROUGH the probe machinery (not the nprobe=0 shortcut),
    // which is provably exact — this is the machinery's parity gate
    val exact = SemDedup.assign(planted, "vec_id", "emb", centroids16)
      .orderBy("vec_id").collect().toSeq
    val centDf = {
      val s = spark
      import s.implicits._
      centroids16.toDF("cid", "cvec")
    }
    val probed = SemDedup
      .assignBroadcast(planted, "vec_id", "emb", centDf, nprobe = 4)
      .orderBy("vec_id").collect().toSeq
    assert(exact.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      === probed.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
  }

  test("two-level probe at small nprobe: centroids self-assign, and " +
    "near-dup pairs co-assign as reliably as under the exact scan") {
    val s = spark
    import s.implicits._
    val cents64 = planted.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    val centDf = cents64.toDF("cid", "cvec")
    val probed = SemDedup
      .assignBroadcast(planted, "vec_id", "emb", centDf, nprobe = 2)
      .cache()
    // a query equal to a centroid scores its own group's seed exactly as
    // the build did → its group is probed first → cos 1.0 self-match
    probed.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("cluster")).collect().foreach { r =>
        assert(r.getLong(0) === r.getLong(1),
          s"centroid ${r.getLong(0)} must self-assign under the probe")
      }
    // the property SemDeDup needs from an APPROXIMATE assignment is not
    // agreement with the exact argmax (on an isotropic corpus like this
    // one, hierarchical pruning legitimately diverges — no structure to
    // prune by) but that near-identical embeddings land in the SAME
    // cell: they score near-identical probe lists, so planted pairs
    // must co-assign at the suite's usual 9/10 bound
    val orig = probed.filter(col("vec_id") < CopyOffset)
      .select(col("vec_id").as("o_id"), col("cluster").as("o_cl"))
    val copy = probed.filter(col("vec_id") >= CopyOffset)
      .select((col("vec_id") - CopyOffset).as("o_id"),
        col("cluster").as("c_cl"))
    val pairs = orig.join(copy, "o_id").cache()
    val n = pairs.count()
    val same = pairs.filter(col("o_cl") === col("c_cl")).count()
    assert(n > 0 && same >= n * 9 / 10,
      s"planted pairs must co-assign under the probe: $same/$n")
    pairs.unpersist()
    probed.unpersist()
  }

  test("two-level probe recovers the exact cells on a clustered corpus") {
    val s = spark
    import s.implicits._
    // 2000 points in 32 tight clusters (center + 2% jitter) — the
    // geometry real embedding corpora have and the regime the probe is
    // FOR; ids 0..31 hit each cluster once and double as the centroids
    val clustered = spark.range(0, 2000).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), j ->
               CAST(xxhash64(vec_id % 32, j) % 1000 AS DOUBLE) / 1000.0
               + CAST(xxhash64(vec_id, j) % 100 AS DOUBLE) / 5000.0)""")
        .as("emb"))
    val cents = clustered.filter(col("vec_id") < 32)
      .select(col("vec_id").as("cid"), col("emb").as("cvec"))
    val exact = SemDedup
      .assignBroadcast(clustered, "vec_id", "emb", cents)
      .select(col("vec_id"), col("cluster").as("e_cl"))
    val probed = SemDedup
      .assignBroadcast(clustered, "vec_id", "emb", cents, nprobe = 2)
      .select(col("vec_id"), col("cluster").as("p_cl"))
    val both = exact.join(probed, "vec_id").cache()
    val n = both.count()
    val agree = both.filter(col("e_cl") === col("p_cl")).count()
    assert(n === 2000 && agree >= n * 95 / 100,
      s"probe must recover clustered cells: $agree/$n")
    both.unpersist()
  }

  test("result is invariant to input partitioning") {
    def run(parts: Int) =
      SemDedup.semdedup(planted.repartition(parts), "vec_id", "emb",
          centroids16, 0.95)
        .select("vec_id", "cluster", "cent_cos", "is_kept")
        .orderBy("vec_id").collect().toSeq
    assert(run(1) === run(13))
  }

  test("IvfIndex codebook doubles as the semantic cells: planted copies " +
    "prune under the trained centroids too") {
    val out = SemDedup.withIvfCentroids(spark, sf, planted,
      "vec_id", "emb", 0.95).cache()
    assert(out.count() === planted.count())
    val orig = out.filter(col("vec_id") < CopyOffset)
      .select(col("vec_id").as("o_id"), col("cluster").as("o_cl"),
        col("is_kept").as("o_kept"))
    val copy = out.filter(col("vec_id") >= CopyOffset)
      .select((col("vec_id") - CopyOffset).as("o_id"),
        col("cluster").as("c_cl"), col("is_kept").as("c_kept"))
    val pairs = orig.join(copy, "o_id").collect()
    val sameCell = pairs.filter(r => r.getLong(1) == r.getLong(3))
    assert(sameCell.length >= pairs.length * 9 / 10,
      s"trained cells split too many planted pairs: ${pairs.length - sameCell.length}/${pairs.length}")
    sameCell.foreach(r => assert(r.getBoolean(2) ^ r.getBoolean(4),
      s"same-cell planted pair must keep exactly one: o_id=${r.getLong(0)}"))
    out.unpersist()
  }

  test("dd11 gate shape: one row per corpus member, kept+dropped partition it") {
    val rows = SparkEntry.queries("dd11_semdedup")(spark, sf).collect()
    assert(rows.length === planted.count())
    val kept = rows.count(_.getBoolean(3))
    assert(kept > 0 && kept < rows.length)
  }
}
