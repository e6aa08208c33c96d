package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.GenLog

/** Persisted SIGN-RANDOM-PROJECTION key index — [[CosineLsh]]'s band
  * table as a managed artifact, so a daily embedding-ingest probes
  * yesterday's corpus for cosine near-duplicates without re-reading (or
  * re-projecting) history vectors: the embedding counterpart of
  * [[LshBandIndex]], and the index behind `dd16_incremental_embed_neardup`.
  *
  * SPLIT LAYOUT from day one (the [[LshBandIndex]] format-2 lesson —
  * don't ship the payload through the band join): each generation
  * persists
  *
  *  - `vecs/` — `(__id, emb)` ONE row per vector, the source of truth
  *    (plane weights are a pure function of (plane, dim), so keys are
  *    arithmetic over these bytes);
  *  - `keys/` — `(__id, band, key)` narrow rows, derived from the
  *    just-written `vecs` parquet via [[CosineLsh.bucketize]] — the
  *    SAME fused [[graft.functions.SignRpKeys]] expression the live
  *    query path runs, so index and query collide byte-for-byte.
  *
  * A probe ([[incrementalPairs]]) streams only the narrow key rows
  * through the (band, key) equi-join and fetches history VECTORS for
  * candidate ids only — the dim-64 embedding never rides the index
  * scan, exactly the signature-fetch discipline of the MinHash probe.
  * Exact cosine on the fetched candidates settles the decision, so LSH
  * fpp costs reads, never correctness.
  *
  * Lifecycle mirrors [[LshBandIndex]] (generation log, atomic pointer
  * flip, O(batch) delta advance, overlap REPLACEMENT on re-crawled ids,
  * LSM compaction at [[MaxChain]]): cite LshBandIndex for the protocol
  * arguments; this artifact reuses [[graft.store.GenLog]] wholesale.
  */
object CosineLshIndex {
  val FormatVersion = 1
  val MaxChain = 16

  /** GEOMETRY NOTE (EmbIndexScale sweep, BASELINE.md r14): the default
    * 8×16-bit bands match [[CosineLsh]]'s dd6 defaults — tuned for
    * recall down to threshold ~0.95. Their chance-collision rate
    * (~8·2⁻¹⁶ per pair) makes the CANDIDATE set linear in corpus size:
    * at 2M history a 2k batch drew 965k chance candidates vs 9.7k at
    * 24-bit and 533 at 32-bit bands, with every planted ~0.9999-cosine
    * pair recalled at ALL widths. At large corpora where the dedup
    * threshold is high (near-exact duplicates), pass wider bands —
    * precision comes from band WIDTH, recall from band COUNT, and
    * correctness from neither (exact cosine settles candidates). */
  /** Test seam (the [[IvfIndex.maxChain]] pattern). */
  private[graft] var maxChain: Int = MaxChain

  def indexRoot: String = sys.env.getOrElse(
    "GRAFT_COSLSH_INDEX_DIR",
    new java.io.File(sys.props("java.io.tmpdir"), "graft_coslsh_index").toString)

  def indexPath(key: String): String = {
    val base = key.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(40)
    s"$indexRoot/${base}_${Integer.toHexString(key.hashCode)}"
  }

  private val buildLock = new Object
  private val validated =
    scala.collection.mutable.Map.empty[String, (String, String)]
  private[graft] def resetValidationMemo(): Unit =
    buildLock.synchronized(validated.clear())

  /** Count of full-corpus fingerprint scans this JVM has run — the test
    * seam proving snapshot-keyed revalidation never scans the corpus
    * (the [[LshBandIndex.fingerprintScans]] pattern). */
  private[graft] val fingerprintScans =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Order-insensitive content fingerprint over (id, emb) — xxhash64
    * hashes array columns elementwise, and xor composes for disjoint
    * deltas exactly as [[LshBandIndex]]'s text fingerprint does. */
  private def fingerprint(e: DataFrame, idCol: String,
                          embCol: String): Long = {
    fingerprintScans.incrementAndGet()
    e.agg(coalesce(expr(s"bit_xor(xxhash64(`$idCol`, `$embCol`))"), lit(0L)))
      .head().getLong(0)
  }

  /** Ensure a fresh key index for the bare embedding frame `e` under
    * `key`; returns the live generation path. Same immutable-corpus
    * memo contract as [[LshBandIndex.ensure]]. */
  def ensure(spark: SparkSession, e: DataFrame, key: String,
             idCol: String = "vec_id", embCol: String = "emb",
             bands: Int = 8, rowsPerBand: Int = 16): String =
    buildLock.synchronized {
      val root = indexPath(key)
      val fs = new Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      validated.get(root) match {
        case Some((t, gen)) if t.startsWith("fp:") => return gen
        case _ => ()
      }
      val vecs = e.select(col(idCol).cast("long").as("__id"),
        col(embCol).cast("array<double>").as("emb"))
      lazy val n = vecs.count()
      lazy val fp = fingerprint(vecs, "__id", "emb")
      GenLog.currentGen(fs, root)
        .flatMap(g => GenLog.readMeta(spark, g, FormatVersion).map(g -> _)) match {
        case Some((gen, m)) if m.snap.isEmpty && m.n == n && m.fp == fp =>
          validated(root) = (s"fp:$n:$fp", gen.toString)
          gen.toString
        case _ =>
          require(n > 0,
            s"CosineLshIndex.ensure: refusing to index an empty corpus ($root)")
          val gen = publishFromVecs(spark, root, vecs, bands, rowsPerBand,
            GenLog.Meta(n, FormatVersion, fp, None, None))
          validated(root) = (s"fp:$n:$fp", gen)
          gen
      }
    }

  /** [[ensure]] for a corpus published through
    * [[graft.store.SnapshotStore]]: validity keyed on the current
    * snapshot NAME — revalidation is a pointer read plus the meta row,
    * no corpus scan (the [[LshBandIndex.ensureForSnapshot]] contract;
    * pinned via [[fingerprintScans]]). */
  def ensureForSnapshot(spark: SparkSession, storeRoot: String,
                        idCol: String = "vec_id", embCol: String = "emb",
                        bands: Int = 8, rowsPerBand: Int = 16): String =
    buildLock.synchronized {
      val snap = graft.store.SnapshotStore.currentName(spark, storeRoot)
        .getOrElse(throw new java.io.FileNotFoundException(
          s"no snapshot published under $storeRoot — commit the corpus first"))
      val root = indexPath(s"store:$storeRoot")
      validated.get(root) match {
        case Some((t, gen)) if t == s"snap:$snap" => return gen
        case _ => ()
      }
      val fs = new Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      GenLog.currentGen(fs, root)
        .flatMap(g => GenLog.readMeta(spark, g, FormatVersion).map(g -> _)) match {
        case Some((gen, m)) if m.snap.contains(snap) =>
          validated(root) = (s"snap:$snap", gen.toString)
          gen.toString
        case _ =>
          val vecs = graft.store.SnapshotStore.read(spark, storeRoot)
            .select(col(idCol).cast("long").as("__id"),
              col(embCol).cast("array<double>").as("emb"))
          val n = vecs.count()
          require(n > 0, s"CosineLshIndex.ensureForSnapshot: empty corpus " +
            s"under $storeRoot")
          val gen = publishFromVecs(spark, root, vecs, bands, rowsPerBand,
            GenLog.Meta(n, FormatVersion, 0L, Some(snap), None))
          validated(root) = (s"snap:$snap", gen)
          gen
      }
    }

  /** [[advanceWithBatch]] for a snapshot-keyed index, with the
    * [[LshBandIndex.advanceForSnapshotWithBatch]] trust-but-verify nets:
    * the caller asserts `batch` is exactly what grew the store, checked
    * by the row-count identity (count(current snapshot) = indexed n +
    * count(batch)) and the id-disjointness probe; a failed net falls
    * back to a full rebuild against the current snapshot rather than
    * recording a wrong chain under the new snapshot's key. */
  def advanceForSnapshotWithBatch(spark: SparkSession, storeRoot: String,
                                  batch: DataFrame,
                                  idCol: String = "vec_id",
                                  embCol: String = "emb",
                                  bands: Int = 8,
                                  rowsPerBand: Int = 16): String =
    buildLock.synchronized {
      val snap = graft.store.SnapshotStore.currentName(spark, storeRoot)
        .getOrElse(throw new java.io.FileNotFoundException(
          s"no snapshot published under $storeRoot — commit the corpus first"))
      val root = indexPath(s"store:$storeRoot")
      validated.get(root) match {
        case Some((t, gen)) if t == s"snap:$snap" => return gen
        case _ => ()
      }
      val fs = new Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val b = batch.select(col(idCol).cast("long").as("__id"),
        col(embCol).cast("array<double>").as("emb")).localCheckpoint(true)
      val viaBatch = GenLog.currentGen(fs, root)
        .flatMap(g => GenLog.readMeta(spark, g, FormatVersion).map(g -> _)) match {
        case Some((g, m)) if !m.snap.contains(snap) =>
          val countsOk =
            graft.store.SnapshotStore.read(spark, storeRoot).count() ==
              m.n + b.count()
          lazy val overlaps = vecsOf(spark, g.toString).select("__id")
            .join(b.select("__id"), Seq("__id"), "left_semi")
            .limit(1).count() > 0
          countsOk && !overlaps
        case _ => false
      }
      if (viaBatch)
        advanceWithBatch(spark, s"store:$storeRoot", b, "__id", "emb",
          bands, rowsPerBand, snap = Some(snap))
      else {
        val vecs = graft.store.SnapshotStore.read(spark, storeRoot)
          .select(col(idCol).cast("long").as("__id"),
            col(embCol).cast("array<double>").as("emb"))
        val n = vecs.count()
        require(n > 0, s"CosineLshIndex.advanceForSnapshotWithBatch: " +
          s"empty corpus under $storeRoot")
        val gen = publishFromVecs(spark, root, vecs, bands, rowsPerBand,
          GenLog.Meta(n, FormatVersion, 0L, Some(snap), None))
        validated(root) = (s"snap:$snap", gen)
        gen
      }
    }

  /** O(batch) delta advance; overlapped ids are REPLACED (batch wins) by
    * a rewrite over the chain's one-row-per-vector `vecs`, and a chain
    * at [[maxChain]] compacts — both without touching any upstream
    * corpus table ([[LshBandIndex.advanceWithBatch]]'s contract). An
    * overlap voids the xor fingerprint (fp=0 in meta → next cross-JVM
    * ensure rebuilds; safe, just uncached). `snap`, when given, re-keys
    * validity to the new snapshot name. */
  def advanceWithBatch(spark: SparkSession, key: String, batch: DataFrame,
                       idCol: String = "vec_id", embCol: String = "emb",
                       bands: Int = 8, rowsPerBand: Int = 16,
                       snap: Option[String] = None): String =
    buildLock.synchronized {
      val root = indexPath(key)
      val fs = new Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val (headGen, m) = GenLog.currentGen(fs, root)
        .flatMap(g => GenLog.readMeta(spark, g, FormatVersion).map(g -> _))
        .getOrElse(throw new java.io.FileNotFoundException(
          s"no live cosine-LSH index under $root — ensure() a base first"))
      val b = batch.select(col(idCol).cast("long").as("__id"),
        col(embCol).cast("array<double>").as("emb")).localCheckpoint(true)
      val headIds = vecsOf(spark, headGen.toString).select("__id")
      val bIds = b.select("__id")
      val overlapExists = headIds.join(bIds, Seq("__id"), "left_semi")
        .limit(1).count() > 0
      val nOverlap =
        if (!overlapExists) 0L
        else headIds.join(bIds, Seq("__id"), "left_semi").count()
      val nb = b.count()
      val nNew = m.n + nb - nOverlap
      val fpNew =
        if (snap.isDefined || nOverlap > 0) 0L
        else m.fp ^ fingerprint(b, "__id", "emb")
      val tok = snap.map(s => s"snap:$s").getOrElse(s"fp:$nNew:$fpNew")
      val compact =
        GenLog.chain(spark, headGen, FormatVersion).length >= maxChain
      val gen =
        if (nOverlap > 0 || compact) {
          val hist0 = vecsOf(spark, headGen.toString)
          val hist =
            if (nOverlap == 0) hist0
            else hist0.join(bIds, Seq("__id"), "left_anti")
          publishFromVecs(spark, root, hist.unionByName(b),
            bands, rowsPerBand,
            GenLog.Meta(nNew, FormatVersion, fpNew, snap, None))
        } else
          publishFromVecs(spark, root, b, bands, rowsPerBand,
            GenLog.Meta(nNew, FormatVersion, fpNew, snap,
              Some(headGen.getName)))
      validated(root) = (tok, gen)
      gen
    }

  /** The live generation path under `key`, if any. */
  def currentGenPath(spark: SparkSession, key: String): Option[String] = {
    val root = indexPath(key)
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    GenLog.currentGen(fs, root)
      .filter(g => GenLog.readMeta(spark, g, FormatVersion).isDefined)
      .map(_.toString)
  }

  private def chainDirOf(spark: SparkSession, genPath: String,
                         sub: String): DataFrame = {
    val hadoop = spark.sparkContext.hadoopConfiguration
    GenLog.chain(spark, new Path(genPath), FormatVersion)
      .map(g => new Path(g, sub))
      .filter(p => p.getFileSystem(hadoop).exists(p))
      .map(p => spark.read.parquet(p.toString))
      .reduce(_ unionByName _)
  }

  /** NARROW key rows `(__id, band, key)` of the chain — the only stream
    * a probe scans whole. */
  def narrowKeysOf(spark: SparkSession, genPath: String): DataFrame =
    chainDirOf(spark, genPath, "keys")

  /** Vector rows `(__id, emb)` of the chain, one per vector — the
    * candidate-only fetch surface. */
  def vecsOf(spark: SparkSession, genPath: String): DataFrame =
    chainDirOf(spark, genPath, "vecs")

  /** Cosine near-dup pairs TOUCHING the batch, probed against the
    * persisted index: `(src, dst, cs)` with src < dst and exact cosine
    * `cs` on every emitted pair — [[CosineLsh.candidatePairs]] over
    * history ∪ batch restricted to pairs with a batch member (band
    * collision is per-pair, the dd13 identity), then settled by exact
    * arithmetic. Phase 1 joins the batch's live keys against the
    * index's narrow rows; phase 2 fetches history VECTORS for candidate
    * ids only. The caller thresholds `cs`. */
  def incrementalPairs(batch: DataFrame, idCol: String, embCol: String,
                       historyKeys: DataFrame, historyVecs: DataFrame,
                       bands: Int = 8, rowsPerBand: Int = 16): DataFrame = {
    graft.functions.CosineSimilarity.register(batch.sparkSession)
    val b = batch.select(col(idCol).cast("long").as("__id"),
      col(embCol).cast("array<double>").as("emb"))
    // geometry MUST match the index's build geometry — a mismatched
    // batch key never collides with an index key and the probe silently
    // returns only batch×batch pairs
    val bKeys = CosineLsh.bucketize(b, "__id", "emb", dim = 0,
        bands = bands, rowsPerBand = rowsPerBand)
      .select(col("id").as("dst"), col("band"), col("key"))
    // phase 1: narrow candidate ids, deduped before any vector moves
    val histCand = historyKeys
      .select(col("__id").as("src"), col("band"), col("key"))
      .join(bKeys, Seq("band", "key"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    // phase 2: vectors for candidate endpoints only; exact cosine
    val bVecs = b.select(col("__id").as("dst"), col("emb").as("eb"))
    val histPairs = histCand
      .join(historyVecs.select(col("__id").as("src"),
        col("emb").as("ea")), Seq("src"))
      .join(bVecs, Seq("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"),
        expr("graft_cosine(ea, eb)").as("cs"))
    val bb = CosineLsh.candidatePairs(b, "__id", "emb", dim = 0,
      bands = bands, rowsPerBand = rowsPerBand)
    val batchPairs = bb
      .join(b.select(col("__id").as("src"), col("emb").as("ea")), Seq("src"))
      .join(b.select(col("__id").as("dst"), col("emb").as("eb")), Seq("dst"))
      .select(col("src"), col("dst"), expr("graft_cosine(ea, eb)").as("cs"))
    histPairs.unionByName(batchPairs).dropDuplicates("src", "dst")
  }

  /** Write `vecs` as a fresh generation's one-row-per-vector dir,
    * re-read the written parquet and derive the narrow `keys` from it —
    * the projection runs once over bytes on disk, so the two dirs can
    * never disagree ([[LshBandIndex]]'s publishFromSigs discipline). */
  private def publishFromVecs(spark: SparkSession, root: String,
                              vecs: DataFrame, bands: Int,
                              rowsPerBand: Int,
                              meta: GenLog.Meta): String = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prevGen = GenLog.currentGen(fs, root).map(_.getName)
    val genName = GenLog.newGenName()
    val gen = new Path(rootPath, genName)
    val vecsDir = new Path(gen, "vecs")
    vecs.write.parquet(vecsDir.toString)
    CosineLsh.bucketize(spark.read.parquet(vecsDir.toString),
        "__id", "emb", dim = 0, bands = bands, rowsPerBand = rowsPerBand)
      .select(col("id").as("__id"), col("band"), col("key"))
      .write.parquet(new Path(gen, "keys").toString)
    GenLog.writeMeta(spark, gen, meta)
    GenLog.publishGen(spark, root, genName)
    GenLog.pruneGens(spark, fs, rootPath, genName, prevGen, FormatVersion)
    gen.toString
  }
}
