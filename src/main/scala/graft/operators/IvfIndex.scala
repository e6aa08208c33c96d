package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Persisted IVF (inverted-file) coarse-quantizer index over the
  * `embeddings` table — the train-ONCE half of IVF ANN, split out of the
  * query path (round-8 verdict: `v5_ann_ivf` retrained its k-means
  * codebook inline on every invocation — 5 crossJoin + argmax-window
  * passes over the full corpus before the query even probed; at 100 TB
  * that is index *training* in the query path).
  *
  * Layout under `indexPath(sfDir)`:
  *   - `codebook/` — k rows `(cell int, cvec array<double>)`,
  *   - `cells/`    — the corpus re-stored as `(vec_id, emb)` PARTITIONED
  *     BY its nearest cell: a probe of `nprobe` cells reads only
  *     `nprobe/k` of the index directories (static partition pruning at
  *     the scan — the on-disk analogue of FAISS's inverted lists),
  *   - `meta/`     — one row `(n long)`: the corpus row count the index
  *     was built from. `ensure` compares it against the live corpus
  *     (a parquet metadata-only count) and retrains on mismatch, so a
  *     regenerated testdata dir cannot serve a stale index.
  *
  * Training (unchanged semantics from the inline version, so the recall
  * gate in QueriesSpec still holds): k=8 codebook, deterministic spread
  * seeding (every (n/k)-th vector by vec_id), 4 Lloyd iterations, each
  * one crossJoin(broadcast codebook) + per-vector argmax + per-(cell,pos)
  * mean — linear in corpus size, localCheckpoint'd so the iterated plan
  * cannot grow. Publication is write-to-sibling + rename (the
  * DirectorySwapCommit pattern), so a reader never sees a half-built
  * index. The index lives under java.io.tmpdir (keyed by corpus path) —
  * on a cluster it would be a managed table beside the corpus.
  */
object IvfIndex {
  val K = 8
  val LloydIters = 4
  /** Product-quantization layout: the vector is split into `PqSub`
    * contiguous subspaces, each quantized against its own `PqCids`-entry
    * codebook — a vector becomes `PqSub` small ints (here 8 × 4 bits vs
    * 64 × 8-byte doubles: 64× smaller), and an inner product against it
    * becomes `PqSub` table lookups (ADC — asymmetric distance
    * computation). The compressed-domain column is what a 100 TB ANN
    * scan should read; the raw vectors stay in the index only for
    * exact-rerank paths. */
  val PqSub = 8
  val PqCids = 16
  val PqIters = 3
  /** Bumped when the on-disk layout changes; `ensure` retrains an index
    * whose recorded version differs (format 2 added the PQ codebook and
    * the cells' `code`/`rnorm` columns; format 3 added the content
    * fingerprint to meta). */
  val FormatVersion = 3

  /** Root for all persisted indexes; overridable for tests. */
  def indexRoot: String = sys.env.getOrElse(
    "GRAFT_IVF_INDEX_DIR",
    new java.io.File(sys.props("java.io.tmpdir"), "graft_ivf_index").toString)

  def indexPath(sfDir: String): String = {
    // readable + collision-free key: basename plus a hash of the full path
    val base = new Path(sfDir).getName
    val h = Integer.toHexString(sfDir.hashCode)
    s"$indexRoot/${base}_$h"
  }

  private def corpus(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  /** Content fingerprint of the corpus: order-insensitive sum of per-row
    * hashes over (vec_id, embedding). One narrow scan — cheap at the
    * scales this library benches at, and memoized per JVM; a cluster
    * deployment would key the index on the corpus table's snapshot/commit
    * id instead of hashing content (see store.SnapshotStore). Catches
    * what a row COUNT cannot: a regenerated corpus with the same
    * cardinality but different values (exactly what a deterministic data
    * generator produces). */
  private def fingerprint(e0: DataFrame): Long =
    e0.agg(sum(xxhash64(col("vec_id"), col("emb")))).head().getLong(0)

  /** Ensure a fresh index exists for `sfDir`; returns its path. Reuses an
    * existing index only when its recorded format version, corpus count,
    * and content fingerprint all match the live table. Serialized per-JVM
    * so concurrently running test suites don't race the build. Cross-JVM
    * a concurrent rebuild is NOT fully atomic for readers (see
    * [[build]]); the drivers that share an index (Verify, Bench, tests)
    * run their gate queries sequentially, which is the contract here. */
  def ensure(spark: SparkSession, sfDir: String): String = buildLock.synchronized {
    val path = indexPath(sfDir)
    // once validated in this JVM the answer cannot change under us (the
    // testdata contract is read-only), so memoize the probe
    if (validated.contains(path)) return path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(path, "meta"))) {
      val meta = spark.read.parquet(s"$path/meta")
      val row = meta.head()
      // column-presence guards, not just the version value: an index
      // written by an OLDER build lacks the newer meta columns entirely,
      // and that must read as "stale — rebuild", never as an error
      val fmtOk = meta.columns.contains("fmt") &&
        meta.columns.contains("fp") &&
        row.getAs[Int]("fmt") == FormatVersion
      val e0 = corpus(spark, sfDir)
      if (fmtOk && row.getAs[Long]("n") == e0.count() &&
          row.getAs[Long]("fp") == fingerprint(e0)) {
        validated += path; return path
      }
      fs.delete(p, true)
    }
    build(spark, sfDir, path)
    validated += path
    path
  }

  private val buildLock = new Object
  private val validated = scala.collection.mutable.Set.empty[String]

  /** Train the codebook and write codebook + cell-partitioned corpus +
    * meta, publishing via build-to-sibling + atomic rename. */
  def build(spark: SparkSession, sfDir: String, path: String): Unit = {
    graft.functions.CosineSimilarity.register(spark)
    val e0 = corpus(spark, sfDir)
    val n = e0.count()
    val step = math.max(n / K, 1L)
    def recenter(assigned: DataFrame): DataFrame = assigned
      .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy("cell", "pos").agg(avg(col("v")).as("m"))
      .groupBy("cell")
      .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)")
        .as("cvec"))
    val wArg = Window.partitionBy("vec_id").orderBy(col("ccs").desc, col("cell"))
    def assignCells(cb: DataFrame): DataFrame = e0
      .crossJoin(broadcast(cb))
      .withColumn("ccs", expr("graft_cosine(emb, cvec)"))
      .withColumn("arn", row_number().over(wArg))
      .filter(col("arn") === 1)
      .select("vec_id", "emb", "cell")
    // spread seeding without a corpus-wide window: the modulo filter
    // keeps ~k spread-out vectors, limit caps them at k, and the
    // cell-id window then runs over k rows only
    val seeds = e0.filter(col("vec_id") % step === 0)
      .orderBy("vec_id").limit(K)
    val wCell = Window.orderBy("vec_id")
    var codebook = seeds
      .withColumn("cell", row_number().over(wCell) - 1)
      .select(col("cell"), col("emb").as("cvec"))
      .localCheckpoint(true)
    for (_ <- 1 to LloydIters)
      codebook = recenter(assignCells(codebook)).localCheckpoint(true)

    // ---- product quantization: per-subspace k-means over the SAME
    // corpus scan shapes as the coarse training (equi-join on `sub`
    // instead of crossJoin — the subquantizer codebook is PqSub × PqCids
    // rows, broadcast). L2 in the subspace (the PQ objective is
    // reconstruction error, not angle); codes are the per-sub argmin
    // centroid ids, `rnorm` the reconstruction's norm so ADC inner
    // products can be rescaled to cosine at query time.
    val dim = e0.select(size(col("emb"))).head().getInt(0)
    val subLen = math.max(dim / PqSub, 1)
    val subs = e0.select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${PqSub - 1}), " +
          s"i -> slice(emb, i * $subLen + 1, $subLen))"))
        .as(Seq("sub", "svec")))
      .localCheckpoint(true)
    val l2 = expr("aggregate(zip_with(svec, cvec, (x, y) -> (x - y) * (x - y)), " +
      "0D, (acc, v) -> acc + v)")
    def assignPq(cb: DataFrame): DataFrame = subs
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d2", l2)
      .groupBy("vec_id", "sub")
      // svec is constant within the (vec_id, sub) group — carrying it
      // through first() saves recenterPq a corpus-sized shuffle join
      .agg(min_by(struct(col("cid"), col("cvec")),
        struct(col("d2"), col("cid"))).as("best"),
        first(col("svec")).as("svec"))
      .select(col("vec_id"), col("sub"),
        col("best.cid").as("cid"), col("best.cvec").as("cvec"), col("svec"))
    def recenterPq(ass: DataFrame): DataFrame = ass
      .select(col("sub"), col("cid"), posexplode(col("svec")).as(Seq("pos", "v")))
      .groupBy("sub", "cid", "pos").agg(avg(col("v")).as("m"))
      .groupBy("sub", "cid")
      .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)")
        .as("cvec"))
    val stepPq = math.max(n / PqCids, 1L)
    val wCid = Window.orderBy("vec_id")
    val seedIds = e0.filter(col("vec_id") % stepPq === 0)
      .orderBy("vec_id").limit(PqCids)
      .select(col("vec_id"), (row_number().over(wCid) - 1).as("cid"))
    var pqCb = subs.join(broadcast(seedIds), Seq("vec_id"))
      .select(col("sub"), col("cid"), col("svec").as("cvec"))
      .localCheckpoint(true)
    for (_ <- 1 to PqIters)
      pqCb = recenterPq(assignPq(pqCb)).localCheckpoint(true)
    val codes = assignPq(pqCb)
      .withColumn("cn2",
        expr("aggregate(cvec, 0D, (acc, v) -> acc + v * v)"))
      .groupBy("vec_id")
      .agg(
        expr("transform(sort_array(collect_list(struct(sub, cid))), x -> x.cid)")
          .as("code"),
        sqrt(sum(col("cn2"))).as("rnorm"))

    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(target.getParent, target.getName + "__tmp_build")
    fs.delete(tmp, true)
    codebook.repartition(1).write.parquet(s"$tmp/codebook")
    pqCb.repartition(1).write.parquet(s"$tmp/pq")
    // one directory per cell; a probe reads only its nprobe directories,
    // and a compressed-domain probe reads only (vec_id, code, rnorm) of
    // them (parquet column pruning — emb stays on disk for reranks)
    assignCells(codebook)
      .join(codes, Seq("vec_id"))
      .repartition(col("cell"))
      .write.partitionBy("cell").parquet(s"$tmp/cells")
    import spark.implicits._
    Seq((n, FormatVersion, fingerprint(e0))).toDF("n", "fmt", "fp")
      .repartition(1).write.parquet(s"$tmp/meta")
    // Publish = delete-then-rename: NOT atomic for a cross-JVM reader
    // (a scan in flight during a rebuild can lose the directory under
    // it). That is acceptable here because rebuilds only happen when the
    // corpus changed — at which point concurrent readers hold stale
    // plans anyway — and the sharing processes (Verify/Bench/tests) run
    // their queries sequentially. A losing concurrent builder (target
    // reappeared between our delete and rename — Hadoop rename into an
    // existing dir would NEST tmp inside it) discards its own build and
    // uses the winner's.
    fs.delete(target, true)
    fs.mkdirs(target.getParent)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, true)
      if (!fs.exists(new Path(target, "meta")))
        throw new java.io.IOException(
          s"IvfIndex.build: rename $tmp -> $target failed and no index present")
    }
  }

  /** The PQ subquantizer codebook: `(sub, cid, cvec)` —
    * [[PqSub]] × ≤[[PqCids]] rows (a centroid that loses all members
    * during Lloyd iteration drops out, like the coarse k-means). */
  def pqCodebook(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/pq")

  def codebook(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codebook")

  /** The cell-partitioned corpus as written, `cell` left at whatever
    * type the session's partition-type inference produced — the pruning
    * filter must be applied BEFORE any cast for Catalyst to prune
    * directories. */
  private def rawCells(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/cells")

  /** The full cell-partitioned corpus with `cell` normalized to int —
    * for whole-index consumers (compaction, re-training, audits). Probe
    * paths use [[cellsPruned]]. */
  def cells(spark: SparkSession, path: String): DataFrame =
    rawCells(spark, path).withColumn("cell", col("cell").cast("int"))

  /** The cell-partitioned corpus restricted to `probed` cells, with the
    * `isin` literals typed to MATCH the partition column (string when the
    * session's partition-type inference is off, int when on) so the
    * filter stays a direct `In` on the partition column and Catalyst
    * prunes the non-probed cell directories at the scan — reading
    * nprobe/k of the index, which is the entire point of IVF. */
  def cellsPruned(spark: SparkSession, path: String,
                  probed: Seq[Int]): DataFrame = {
    val raw = rawCells(spark, path)
    val lits: Seq[Any] =
      if (raw.schema("cell").dataType ==
          org.apache.spark.sql.types.StringType) probed.map(_.toString)
      else probed
    raw.filter(col("cell").isin(lits: _*))
      .withColumn("cell", col("cell").cast("int"))
  }
}
