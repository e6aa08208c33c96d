package graft.store

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Object-store-safe table commit: versioned immutable snapshot
  * directories plus an atomically-replaced single-file pointer.
  *
  * Layout:
  * {{{
  *   <root>/_snapshots/v000000001/   immutable parquet snapshot dirs
  *   <root>/_snapshots/v000000002/
  *   <root>/_CURRENT                 one small file naming the live dir
  * }}}
  *
  * Why this exists: the tmp-write + directory-rename swap used by
  * [[DirectorySwapCommit]] is atomic on HDFS and POSIX filesystems but
  * NOT on S3-style object stores, where "rename" is a non-atomic
  * copy-then-delete over every object — a reader racing the swap can see
  * a half-moved table, and a crash mid-swap leaves one permanently
  * (the reference inherited this guarantee from Delta's transaction log,
  * silver_etl_script.py:946-961; parquet-native tables must rebuild it).
  * Writing a brand-new immutable snapshot directory and then publishing
  * it by replacing ONE tiny pointer object is safe on both families:
  * single-object PUT is atomic per key on object stores, and the
  * implementation here publishes via create-temp + POSIX/HDFS
  * rename-with-overwrite. A writer crash before the pointer flip leaves
  * an orphaned, invisible snapshot dir — readers keep seeing the old
  * snapshot — and [[vacuum]] collects orphans later (the VACUUM analogue,
  * silver_etl_script.py:985-988).
  */
object SnapshotStore {

  val PointerFile = "_CURRENT"
  val SnapshotsDir = "_snapshots"

  private def fsOf(root: Path, spark: SparkSession): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Name of the live snapshot dir, if a pointer has ever been published. */
  def currentName(spark: SparkSession, root: String): Option[String] = {
    val ptr = new Path(root, PointerFile)
    val fs = fsOf(ptr, spark)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        if (s.isEmpty) None else Some(s)
      } finally in.close()
    }
  }

  /** Resolved path of the live snapshot dir. */
  def currentPath(spark: SparkSession, root: String): Option[Path] =
    currentName(spark, root).map(n => new Path(new Path(root, SnapshotsDir), n))

  /** Read the live snapshot. Resolves through the version's manifest when
    * it has one (an incremental publish carries untouched partitions
    * forward by reference — plain-reading its version dir would see only
    * the freshly-written partitions), else reads the version dir as plain
    * parquet. Throws if the table has never been committed. */
  def read(spark: SparkSession, root: String): DataFrame =
    currentName(spark, root) match {
      case Some(n) => readAt(spark, root, n)
      case None => throw new java.io.FileNotFoundException(
        s"no $PointerFile pointer under $root — table never committed")
    }

  /** All snapshot version names still on disk, ascending (oldest first).
    * The version dirs ARE the table's history — this plus [[readAt]] is
    * the time-travel surface (the one Delta affordance the reference
    * leaned on, silver_etl_script.py:979-988 context). */
  def versions(spark: SparkSession, root: String): Seq[String] = {
    val snaps = new Path(root, SnapshotsDir)
    val fs = fsOf(snaps, spark)
    if (!fs.exists(snaps)) Seq.empty
    else fs.listStatus(snaps).filter(_.isDirectory)
      .map(_.getPath.getName).sorted.toSeq
  }

  /** Version-pinned read: the table exactly as snapshot `name` published
    * it, regardless of how many commits have happened since. Works for
    * both full snapshots (plain parquet dir) and manifest snapshots
    * (partitions resolved through that version's OWN manifest — including
    * partitions it carried forward by reference from older versions).
    * Throws FileNotFoundException once [[vacuum]] has collected the
    * version; retention is the `keepLast` window plus anything a kept
    * manifest still references. */
  def readAt(spark: SparkSession, root: String, name: String): DataFrame =
    readManifest(spark, root, name) match {
      case Some(entries) => readEntries(spark, root, entries)
      case None =>
        val dir = new Path(new Path(root, SnapshotsDir), name)
        val fs = fsOf(dir, spark)
        if (!fs.exists(dir)) throw new java.io.FileNotFoundException(
          s"snapshot $name not found under $root — never published or vacuumed")
        spark.read.parquet(dir.toString)
    }

  /** Change data feed between two pinned versions — Delta CDF's sibling
    * to [[readAt]] time travel, recovered from plain snapshots: rows are
    * matched by full-row content hash (an equi anti-join on a 128-bit
    * key, never a row-by-row comparison), then classified by whether the
    * row's KEY survives on the other side:
    *
    *   - in vTo only, key new          → `insert`
    *   - in vTo only, key existed      → `update_postimage`
    *   - in vFrom only, key survives   → `update_preimage`
    *   - in vFrom only, key gone       → `delete`
    *
    * Unchanged rows hash-match and drop out of the feed, so the feed's
    * size scales with the churn between the versions, not the table —
    * the property that makes downstream incremental consumers (sync
    * jobs, aggregate maintenance) O(changes). Duplicate rows are
    * handled by COUNT, not set difference: each side aggregates its
    * per-content multiplicity first and only the count DELTA feeds the
    * feed — deleting one of N identical copies emits exactly one feed
    * row (classified by the usual key-survival rule), where a plain
    * anti-join would see the surviving copy's hash on both sides and
    * silently drop the change entirely. Columns are aligned by
    * name over the UNION of the two schemas — a column only one version
    * has reads as null on the other side, so schema adds/drops surface
    * as updates instead of being silently excluded (or throwing). The
    * row hash uses a field separator + null sentinel so ("a","bc")
    * never collides with ("ab","c") or null. */
  def changesBetween(spark: SparkSession, root: String,
                     vFrom: String, vTo: String,
                     keyCols: Seq[String]): DataFrame = {
    val from = readAt(spark, root, vFrom)
    val to = readAt(spark, root, vTo)
    val cols = (from.columns.toSet ++ to.columns.toSet).toSeq.sorted
    def align(df: DataFrame): DataFrame = df.select(cols.map(c =>
      (if (df.columns.contains(c)) col(c) else lit(null)).as(c)): _*)
    val rowHash = md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    // per-content multiplicity on each side; __rh hashes every column,
    // so grouping by (cols, __rh) is grouping by full row content
    def counted(df: DataFrame, cnt: String): DataFrame =
      align(df).withColumn("__rh", rowHash)
        .groupBy((cols :+ "__rh").map(col): _*)
        .agg(count(lit(1)).as(cnt))
    val fc = counted(from, "__nf")
    val tc = counted(to, "__nt")
    val fromKeys = fc.select(keyCols.map(col): _*).distinct()
    val toKeys = tc.select(keyCols.map(col): _*).distinct()
    // full-outer on the content hash; the data columns come from
    // whichever side has the row (when both do, content is identical by
    // construction of __rh, so either copy serves)
    val fr = fc.select((Seq(col("__rh"), col("__nf")) ++
      cols.map(c => col(c).as(s"__f_$c"))): _*)
    val delta = fr.join(tc, Seq("__rh"), "full_outer")
      .select((Seq(col("__rh"), col("__nf"), col("__nt")) ++
        cols.map(c => coalesce(col(c), col(s"__f_$c")).as(c))): _*)
      .withColumn("__d",
        coalesce(col("__nt"), lit(0L)) - coalesce(col("__nf"), lit(0L)))
    // replicate each changed content-row |delta| times so multi-copy
    // churn round-trips through the feed exactly
    def replicate(n: org.apache.spark.sql.Column): DataFrame =
      delta.filter(n > 0)
        .withColumn("__i", explode(sequence(lit(1L), n)))
        .drop("__i", "__d", "__nf", "__nt")
    val appeared = replicate(col("__d"))
    val vanished = replicate(-col("__d"))
    val inserts = appeared.join(fromKeys, keyCols, "left_anti")
      .withColumn("change_type", lit("insert"))
    val postimages = appeared.join(fromKeys, keyCols, "left_semi")
      .withColumn("change_type", lit("update_postimage"))
    val preimages = vanished.join(toKeys, keyCols, "left_semi")
      .withColumn("change_type", lit("update_preimage"))
    val deletes = vanished.join(toKeys, keyCols, "left_anti")
      .withColumn("change_type", lit("delete"))
    inserts.unionByName(postimages).unionByName(preimages)
      .unionByName(deletes).drop("__rh")
  }

  /** Write a new snapshot via `write(dir)` then publish it by atomically
    * replacing the pointer. The write happens entirely inside a fresh
    * version dir invisible to readers; only the final single-file pointer
    * replacement changes what they see. Returns the new snapshot name. */
  def commit(spark: SparkSession, root: String)(write: String => Unit): String = {
    val rootPath = new Path(root)
    val fs = fsOf(rootPath, spark)
    val seq = currentName(spark, root)
      .flatMap(n => "^v(\\d+)".r.findFirstMatchIn(n).map(_.group(1).toLong))
      .getOrElse(0L)
    val name = f"v${seq + 1}%09d"
    val dir = new Path(new Path(rootPath, SnapshotsDir), name)
    write(dir.toString)
    publishPointer(spark, root, name)
    name
  }

  /** Atomically point `_CURRENT` at `name`: write a temp pointer file,
    * then rename-with-overwrite onto the pointer path (atomic on
    * POSIX/HDFS; on S3 deployments substitute a direct single-object PUT,
    * which is atomic per key). */
  private[store] def publishPointer(spark: SparkSession, root: String,
                                    name: String): Unit = {
    val ptr = new Path(root, PointerFile)
    val fs = fsOf(ptr, spark)
    val tmp = new Path(root,
      s"$PointerFile.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(name.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(ptr.toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, ptr, Options.Rename.OVERWRITE)
  }

  /** Delete snapshot dirs that are not retained — superseded snapshots
    * plus orphans from writer crashes. Retained = the `keepLast` highest
    * sequence numbers, the current version, and (to fixpoint) every
    * version any retained manifest references — an incremental snapshot
    * carries unchanged partitions by reference to older version dirs, so
    * a kept version must keep its references alive or [[readAt]] on it
    * would dangle. Returns the number deleted. Safe to run concurrently
    * with readers of the current snapshot: nothing a retained version
    * can reach is ever deleted. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 2): Int = {
    val snaps = new Path(root, SnapshotsDir)
    val fs = fsOf(snaps, spark)
    if (!fs.exists(snaps)) return 0
    val current = currentName(spark, root)
    val all = fs.listStatus(snaps).filter(_.isDirectory).map(_.getPath.getName)
    var keep = all.sorted.takeRight(math.max(keepLast, 1)).toSet ++ current
    var frontier = keep
    while (frontier.nonEmpty) {
      val refs = frontier.flatMap(n =>
        readManifest(spark, root, n).map(_.values.toSet).getOrElse(Set.empty))
      frontier = refs -- keep
      keep ++= frontier
    }
    val victims = all.filterNot(keep.contains)
    victims.foreach { n =>
      fs.delete(new Path(snaps, n), true)
      fs.delete(manifestPath(root, n), false)
    }
    victims.length
  }

  // ------------------------------------------------- partition manifests
  // An incremental snapshot need not rewrite the whole table: its
  // manifest maps each hive partition path (e.g.
  // "quality_tier=high/year=2025/month=1") to the VERSION DIR holding
  // that partition's current data — freshly-written partitions point at
  // the new version, unchanged ones carry the older version forward by
  // reference. The manifest is written before the pointer flip, so it
  // becomes visible atomically with its snapshot.

  private[graft] def manifestPath(root: String, name: String): Path =
    new Path(new Path(root, SnapshotsDir), s"$name.manifest")

  /** entries for `name`, if that version has a manifest. */
  def readManifest(spark: SparkSession, root: String,
                   name: String): Option[Map[String, String]] = {
    val p = manifestPath(root, name)
    val fs = fsOf(p, spark)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty)
        .map { line =>
          val i = line.lastIndexOf('\t')
          line.substring(0, i) -> line.substring(i + 1)
        }.toMap)
      finally in.close()
    }
  }

  private[graft] def writeManifest(spark: SparkSession, root: String,
                                   name: String,
                                   entries: Map[String, String]): Unit = {
    val p = manifestPath(root, name)
    val fs = fsOf(p, spark)
    val out = fs.create(p, true)
    try out.write(entries.toSeq.sorted.map { case (rel, ver) => s"$rel\t$ver" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Current entries regardless of how the snapshot was produced: a
    * manifest if one exists, else every hive partition dir of the plain
    * snapshot (a full publish), keyed by relative partition path. */
  def currentEntries(spark: SparkSession, root: String,
                     depth: Int): Option[Map[String, String]] =
    currentName(spark, root).map { name =>
      readManifest(spark, root, name).getOrElse {
        val base = new Path(new Path(root, SnapshotsDir), name)
        val fs = fsOf(base, spark)
        val glob = new Path(base, Seq.fill(depth)("*=*").mkString("/"))
        val dirs = Option(fs.globStatus(glob)).getOrElse(Array.empty)
        dirs.map { st =>
          st.getPath.toUri.getPath.stripPrefix(base.toUri.getPath)
            .stripPrefix("/") -> name
        }.toMap
      }
    }

  /** Read a partition-manifest table: union of each referenced partition
    * dir with its partition-column values re-attached from the path
    * segments (stringly-typed, matching partition-type inference off). */
  def readPartitioned(spark: SparkSession, root: String,
                      partitionColumns: Seq[String]): org.apache.spark.sql.DataFrame = {
    val entries = currentEntries(spark, root, partitionColumns.length)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no $PointerFile pointer under $root — table never committed"))
    readEntries(spark, root, entries)
  }

  /** Union of manifest entries. ONE scan relation per referenced
    * VERSION dir (`basePath` re-attaches the partition values from the
    * dir names — stringly, matching partition-type inference off), not
    * one per partition: a manifest naming 100k partitions must not
    * become a 100k-way union plan (Catalyst analysis goes quadratic
    * long before that), and the union width here is bounded by the
    * retention window instead. `mergeSchema` keeps per-partition schema
    * drift readable, as the per-partition union form did. */
  private def readEntries(spark: SparkSession, root: String,
                          entries: Map[String, String]): DataFrame = {
    val byVersion = entries.toSeq.groupBy(_._2)
    val parts = byVersion.toSeq.sortBy(_._1).map { case (ver, es) =>
      val base = new Path(new Path(root, SnapshotsDir), ver)
      val dirs = es.map { case (rel, _) => new Path(base, rel).toString }.sorted
      spark.read
        .option("basePath", base.toString)
        .option("mergeSchema", "true")
        .parquet(dirs: _*)
    }
    parts.reduceLeft(_.unionByName(_, allowMissingColumns = true))
  }
}

/** Strategy for how a full-table rewrite becomes visible to readers. */
sealed trait TableCommit {
  /** Does the table exist (has it ever been published)? */
  def exists(spark: SparkSession, path: String): Boolean
  /** Read the current published snapshot. */
  def read(spark: SparkSession, path: String): DataFrame
  /** Publish `df` as the table's new full snapshot; returns rows written. */
  def publish(df: DataFrame, path: String, partitionColumns: Seq[String]): Long
}

object TableCommit {
  /** Write `df` as (optionally partitioned) parquet and return the row
    * count OBSERVED during the write job itself (`Dataset.observe` +
    * `Observation`) — the count costs one metric accumulator, where the
    * previous read-back (`spark.read.parquet(written).count()`) re-listed
    * and footer-scanned everything just written, doubling publish
    * metadata I/O on every merge/ETL commit. */
  private[store] def writeCounted(df: DataFrame, path: String,
                                  partitionColumns: Seq[String]): Long = {
    val obs = org.apache.spark.sql.Observation()
    val counted = df.observe(obs, org.apache.spark.sql.functions
      .count(org.apache.spark.sql.functions.lit(1)).as("rows"))
    val w = counted.write.mode(SaveMode.Overwrite)
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(path)
    obs.get("rows").asInstanceOf[Long]
  }
}

/** Write-to-temp-sibling + directory rename. Atomic on HDFS/POSIX — the
  * right default for the local/HDFS clusters this library targets — but
  * NOT on S3-style object stores; use [[PointerCommit]] there. */
object DirectorySwapCommit extends TableCommit {
  override def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  override def publish(df: DataFrame, path: String,
                       partitionColumns: Seq[String]): Long = {
    val spark = df.sparkSession
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(target))
      return TableCommit.writeCounted(df, path, partitionColumns)
    // sibling of the normalized target (raw string concat would nest the
    // tmp dir inside the target on a trailing-slash path)
    val tmp = new Path(target.getParent, target.getName + "__tmp_swap")
    val written = TableCommit.writeCounted(df, tmp.toString, partitionColumns)
    fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"publish: rename $tmp -> $target failed; table left at $tmp")
    written
  }
}

/** Versioned-snapshot + atomic pointer replacement via [[SnapshotStore]] —
  * the object-store-safe protocol. Readers go through the pointer, so a
  * writer crash at ANY step leaves them on the old snapshot. */
object PointerCommit extends TableCommit {
  override def exists(spark: SparkSession, path: String): Boolean =
    SnapshotStore.currentName(spark, path).isDefined

  override def read(spark: SparkSession, path: String): DataFrame =
    SnapshotStore.read(spark, path)

  override def publish(df: DataFrame, path: String,
                       partitionColumns: Seq[String]): Long = {
    val spark = df.sparkSession
    var written = 0L
    SnapshotStore.commit(spark, path) { dir =>
      written = TableCommit.writeCounted(df, dir, partitionColumns)
    }
    written
  }
}
