package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.IvfIndex
import graft.store.SnapshotStore

/** IvfIndex lifecycle: training-plan shape (the Lloyd argmax must be a
  * hash aggregate, not a window sort-shuffle — round-9 verdict item 2),
  * snapshot-keyed staleness (metadata-only revalidation for
  * store-published corpora, fingerprint fallback for bare paths —
  * item 3), generation-versioned publish (ADVICE: no torn-read window,
  * previous generation retained one build cycle), the PQ
  * remainder-folding slice rule, and the empty-corpus guard. */
class IvfIndexSpec extends SparkSuite {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Deterministic corpus (vec_id, emb) with emb already array<double>. */
  private def mkCorpus(n: Int, dim: Int, shift: Double = 0.0): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(j => math.sin(i * 31 + j * 7) + shift))
    }.toDF("vec_id", "emb")
  }

  test("assignCells is a pure projection — zero shuffles per Lloyd iteration") {
    graft.functions.CosineSimilarity.register(spark)
    import spark.implicits._
    // localCheckpoint pins the input as an RDD scan — a LocalRelation
    // would let ConvertToLocalRelation pre-evaluate the whole
    // projection on the driver and hide the plan under test
    val e0 = mkCorpus(100, 16).localCheckpoint(true)
    val cb = Seq(
      (0, Seq.fill(16)(1.0)),
      (1, (0 until 16).map(j => math.cos(j * 3).toDouble)),
      (2, (0 until 16).map(j => math.sin(j * 5 + 1).toDouble))
    ).toDF("cell", "cvec")
    val assigned = IvfIndex.assignCells(e0, cb)
    val plan = assigned.queryExecution.executedPlan.toString
    // the fused NearestCentroid argmax replaced (1) the row_number
    // window (shuffled and sorted corpus×K scored rows) and (2) the
    // crossJoin+min_by (corpus×K physical rows into a SortAggregate —
    // struct extremum buffers aren't hash-aggregable): assignment now
    // adds NOTHING to the plan but a projection
    assert(!plan.contains("Window"),
      s"Lloyd argmax regressed to a window sort-shuffle:\n$plan")
    assert(!plan.contains("Exchange"),
      s"Lloyd assignment must not shuffle:\n$plan")
    assert(!plan.contains("Join"),
      s"Lloyd assignment must not join:\n$plan")
    assert(plan.contains("graft_nearest_centroid"),
      s"expected the fused argmax expression:\n$plan")
    // semantics: matches the brute-force nearest cell (score desc, cell asc)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / math.max(na * nb, 1e-12)
    }
    val cbLocal = cb.collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    val expected = e0.collect().map { r =>
      val id = r.getLong(0); val v = r.getSeq[Double](1)
      id -> cbLocal.map { case (c, cv) => (c, cos(v, cv)) }
        .minBy { case (c, s) => (-s, c) }._1
    }.toMap
    val got = assigned.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
  }

  test("ensureForSnapshot: metadata-only revalidation, retrain on republish") {
    val root = tmpDir("graft_ivf_store")
    val c1 = mkCorpus(64, 16)
    SnapshotStore.commit(spark, root)(dir => c1.write.parquet(dir))
    val g1 = IvfIndex.ensureForSnapshot(spark, root, embCol = "emb")
    val scansAfterBuild = IvfIndex.fingerprintScans.get()

    // revalidation from disk (memo cleared) must not scan the corpus:
    // pointer read + meta row only
    IvfIndex.resetValidationMemo()
    val g1b = IvfIndex.ensureForSnapshot(spark, root, embCol = "emb")
    assert(g1b == g1, "revalidation must resolve the same generation")
    assert(IvfIndex.fingerprintScans.get() == scansAfterBuild,
      "snapshot-keyed revalidation ran a fingerprint scan — must be metadata-only")

    // a new published snapshot changes the key -> retrain to a NEW
    // generation; the previous one is retained for one build cycle
    val c2 = mkCorpus(80, 16, shift = 0.5)
    SnapshotStore.commit(spark, root)(dir => c2.write.parquet(dir))
    val g2 = IvfIndex.ensureForSnapshot(spark, root, embCol = "emb")
    assert(g2 != g1, "republished corpus must retrain")
    assert(IvfIndex.fingerprintScans.get() == scansAfterBuild,
      "store-mode build must not fingerprint (snapshot name is the key)")
    val fs = new Path(g2).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(g1)),
      "previous generation must survive one build cycle for in-flight readers")
    assert(spark.read.parquet(s"$g2/meta").head().getAs[Long]("n") == 80L)
    // the resolved generation is immutable + complete: readers see the
    // new corpus through it
    assert(IvfIndex.cells(spark, g2).count() == 80L)
  }

  test("bare-path ensure keeps the fingerprint fallback") {
    val g1 = IvfIndex.ensure(spark, sf)
    IvfIndex.resetValidationMemo()
    val scans0 = IvfIndex.fingerprintScans.get()
    val g1b = IvfIndex.ensure(spark, sf)
    assert(g1b == g1)
    assert(IvfIndex.fingerprintScans.get() == scans0 + 1,
      "bare-path revalidation must content-fingerprint the corpus")
  }

  test("advanceForSnapshot chains a delta generation on append-only " +
    "growth: no retrain, batch-sized work, chain reads whole corpus") {
    val root = tmpDir("graft_ivf_adv")
    val c1 = mkCorpus(64, 16)
    SnapshotStore.commit(spark, root)(dir => c1.write.parquet(dir))
    val g1 = IvfIndex.ensureForSnapshot(spark, root, embCol = "emb")
    val cb1 = IvfIndex.codebook(spark, g1).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq

    // append 32 rows (ids 64..95; existing rows byte-identical)
    val c2 = mkCorpus(96, 16)
    SnapshotStore.commit(spark, root)(dir => c2.write.parquet(dir))
    val g2 = IvfIndex.advanceForSnapshot(spark, root, embCol = "emb")
    assert(g2 !== g1)
    // delta generation: chained to g1, codebooks untouched (no retrain)
    assert(spark.read.parquet(s"$g2/meta").head().getAs[String]("parent")
      === new org.apache.hadoop.fs.Path(g1).getName)
    val cb2 = IvfIndex.codebook(spark, g2).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(cb2 === cb1, "append must not retrain the codebook")
    // the chain serves the WHOLE corpus, old rows from the old files
    val cells = IvfIndex.cells(spark, g2).cache()
    assert(cells.count() === 96)
    assert(cells.filter(col("vec_id") >= 64).count() === 32)
    assert(cells.filter(col("code").isNull || col("rnorm").isNull)
      .count() === 0)
    cells.unpersist()
    // pruned probe still prunes across the chain
    val probed = IvfIndex.cellsPruned(spark, g2, Seq(0, 1))
    assert(probed.select("cell").distinct().collect()
      .map(_.getInt(0)).toSet.subsetOf(Set(0, 1)))
    // revalidation of the current snapshot is a no-op
    assert(IvfIndex.advanceForSnapshot(spark, root, embCol = "emb") === g2)
  }

  test("advanceWithBatch: caller-asserted delta chains without the " +
    "content diff; a wrong batch falls back and still lands correct") {
    val root = tmpDir("graft_ivf_advb")
    SnapshotStore.commit(spark, root)(dir =>
      mkCorpus(64, 16).write.parquet(dir))
    val g1 = IvfIndex.ensureForSnapshot(spark, root, embCol = "emb")
    SnapshotStore.commit(spark, root)(dir =>
      mkCorpus(96, 16).write.parquet(dir))
    val batch = mkCorpus(96, 16).filter(col("vec_id") >= 64)
    val g2 = IvfIndex.advanceWithBatch(spark, root, batch, embCol = "emb")
    assert(spark.read.parquet(s"$g2/meta").head().getAs[String]("parent")
      === new org.apache.hadoop.fs.Path(g1).getName)
    assert(IvfIndex.cells(spark, g2).count() === 96)

    // grow again but hand over only HALF the delta: the count identity
    // fails, so the call must fall back (content diff) and still serve
    // the full corpus
    SnapshotStore.commit(spark, root)(dir =>
      mkCorpus(128, 16).write.parquet(dir))
    val half = mkCorpus(128, 16).filter(col("vec_id") >= 112)
    val g3 = IvfIndex.advanceWithBatch(spark, root, half, embCol = "emb")
    assert(IvfIndex.cells(spark, g3).count() === 128,
      "fallback must still index every row")
  }

  test("identical-content republish re-keys the index with a META-ONLY " +
    "generation — no retrain, no corpus rewrite") {
    val root = tmpDir("graft_ivf_rekey")
    val c1 = mkCorpus(64, 16)
    SnapshotStore.commit(spark, root)(dir => c1.write.parquet(dir))
    val g1 = IvfIndex.ensureForSnapshot(spark, root, embCol = "emb")
    SnapshotStore.commit(spark, root)(dir => c1.write.parquet(dir))
    val g2 = IvfIndex.advanceForSnapshot(spark, root, embCol = "emb")
    assert(g2 !== g1)
    assert(spark.read.parquet(s"$g2/meta").head().getAs[String]("parent")
      === new org.apache.hadoop.fs.Path(g1).getName)
    // meta-only: the re-key generation carries no cells of its own
    val fs = new org.apache.hadoop.fs.Path(g2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(g2, "cells")))
    assert(IvfIndex.cells(spark, g2).count() === 64)
  }

  test("re-handing an already-indexed batch trips the id-overlap guard " +
    "and falls back to the content diff — no duplicate ids served") {
    val root = tmpDir("graft_ivf_dupb")
    SnapshotStore.commit(spark, root)(dir =>
      mkCorpus(64, 16).write.parquet(dir))
    IvfIndex.ensureForSnapshot(spark, root, embCol = "emb")
    SnapshotStore.commit(spark, root)(dir =>
      mkCorpus(96, 16).write.parquet(dir))
    // wrong batch, right SIZE (32 rows): already-indexed ids 0..31 —
    // the count identity passes, the overlap probe must catch it
    val wrong = mkCorpus(96, 16).filter(col("vec_id") < 32)
    val g2 = IvfIndex.advanceWithBatch(spark, root, wrong, embCol = "emb")
    val cells = IvfIndex.cells(spark, g2).cache()
    assert(cells.count() === 96, "fallback must index the true delta")
    assert(cells.select("vec_id").distinct().count() === 96,
      "no vec_id may be served twice")
    cells.unpersist()
  }

  test("the compaction valve retrains once the chain hits maxChain") {
    val root = tmpDir("graft_ivf_cap_chain")
    val old = IvfIndex.maxChain
    IvfIndex.maxChain = 2
    try {
      SnapshotStore.commit(spark, root)(dir =>
        mkCorpus(64, 16).write.parquet(dir))
      IvfIndex.ensureForSnapshot(spark, root, embCol = "emb")
      SnapshotStore.commit(spark, root)(dir =>
        mkCorpus(80, 16).write.parquet(dir))
      val g2 = IvfIndex.advanceForSnapshot(spark, root, embCol = "emb")
      assert(spark.read.parquet(s"$g2/meta").head()
        .getAs[String]("parent") !== null, "second gen should chain")
      SnapshotStore.commit(spark, root)(dir =>
        mkCorpus(96, 16).write.parquet(dir))
      val g3 = IvfIndex.advanceForSnapshot(spark, root, embCol = "emb")
      assert(spark.read.parquet(s"$g3/meta").head()
        .getAs[String]("parent") === null,
        "chain at the cap must collapse via retrain")
      assert(IvfIndex.cells(spark, g3).count() === 96)
    } finally IvfIndex.maxChain = old
  }

  test("a zero-norm embedding cannot crash the build: trained around, " +
    "carried in the cells under a null cell") {
    val root = tmpDir("graft_ivf_zero")
    val s = spark
    import s.implicits._
    val zero = Seq((999L, Seq.fill(16)(0.0))).toDF("vec_id", "emb")
    val e0 = mkCorpus(64, 16).unionByName(zero)
    val gen = IvfIndex.build(spark, e0, root, snap = None)
    val cells = IvfIndex.cells(spark, gen).cache()
    assert(cells.count() === 65)
    assert(cells.filter(col("vec_id") === 999L).head().isNullAt(
      cells.columns.indexOf("cell")))
    assert(cells.filter(col("vec_id") =!= 999L && col("cell").isNull)
      .count() === 0)
    cells.unpersist()
  }

  test("advanceForSnapshot retrains when the corpus churned (updates)") {
    val root = tmpDir("graft_ivf_churn")
    SnapshotStore.commit(spark, root)(dir =>
      mkCorpus(64, 16).write.parquet(dir))
    val g1 = IvfIndex.ensureForSnapshot(spark, root, embCol = "emb")
    // same ids, shifted vectors: update_pre/postimages in the feed
    SnapshotStore.commit(spark, root)(dir =>
      mkCorpus(64, 16, shift = 0.5).write.parquet(dir))
    val g2 = IvfIndex.advanceForSnapshot(spark, root, embCol = "emb")
    assert(g2 !== g1)
    assert(spark.read.parquet(s"$g2/meta").head().getAs[String]("parent")
      === null, "churn must retrain from scratch, not chain")
    assert(IvfIndex.cells(spark, g2).count() === 64)
  }

  test("above the train cap, codebooks fit on a sample but the full " +
    "corpus is coded and partitioned") {
    val root = tmpDir("graft_ivf_cap")
    val c = mkCorpus(400, 16)
    val old = IvfIndex.trainCap
    IvfIndex.trainCap = 100
    try {
      val gen = IvfIndex.build(spark, c, root, snap = None)
      val cells = IvfIndex.cells(spark, gen).cache()
      // every corpus vector — sampled into training or not — lands in
      // exactly one cell with a full PQ code and a positive rnorm
      assert(cells.count() === 400)
      assert(cells.select("vec_id").distinct().count() === 400)
      val bad = cells.filter(col("code").isNull ||
        size(col("code")) =!= IvfIndex.PqSub ||
        col("rnorm").isNull || col("rnorm") <= 0).count()
      assert(bad === 0, s"$bad rows with degenerate codes")
      // the codebook really was fit on the ~stride-sampled subset:
      // K cells, each non-empty at this geometry
      assert(IvfIndex.codebook(spark, gen).count() <= IvfIndex.K)
      cells.unpersist()
    } finally IvfIndex.trainCap = old
  }

  test("PQ folds dim % PqSub into the last subspace") {
    val root = tmpDir("graft_ivf_dim12")
    // dim=12, PqSub=8 -> subLen=1, last subspace absorbs 5 dims
    val gen = IvfIndex.build(spark, mkCorpus(40, 12), root, snap = None)
    val bySub = IvfIndex.pqCodebook(spark, gen)
      .select(col("sub"), size(col("cvec")).as("len")).distinct()
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert((0 to 6).forall(bySub(_) == 1), s"leading subspaces: $bySub")
    assert(bySub(7) == 5, s"last subspace must absorb the remainder: $bySub")
    // every vector's reconstruction norm covers all 12 dims (> 0 and
    // bounded by the max vector norm of the corpus)
    val rnorms = IvfIndex.cells(spark, gen).select("rnorm")
      .collect().map(_.getDouble(0))
    assert(rnorms.nonEmpty && rnorms.forall(_ > 0.0))
  }

  test("empty corpus fails with a clear error, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "emb")
    val e = intercept[IllegalArgumentException] {
      IvfIndex.build(spark, empty, tmpDir("graft_ivf_empty"), snap = None)
    }
    assert(e.getMessage.contains("empty corpus"))
  }
}
