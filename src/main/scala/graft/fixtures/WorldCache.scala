package graft.fixtures

/** Content-addressed, cross-JVM FIXTURE-WORLD cache for the driver
  * gates (r12 verdict #4): a write gate that re-synthesizes its input
  * world per invocation — a 2-day SCD2 table, a 3-publish curated
  * store, a full gold ETL chain — spends seconds of fsync-heavy disk
  * churn measuring fixture construction, not the operator under test,
  * and pays it again in every JVM (Verify, Bench, each spec suite).
  *
  * A world is built ONCE per (tag, sf dir, code build) under a shared
  * on-disk root and reused READ-ONLY:
  *
  *  - the key includes a BUILD-WIDE stamp — the max .class mtime under
  *    the compiled-classes root (or the jar's mtime when packaged) —
  *    so recompiling ANY production class busts every world: world
  *    builds call through many collaborators (StreamingOps,
  *    IncrementalCurate, Scd2, GoldEtl, …) and zinc does not touch the
  *    owner's .class for a dependency's implementation-only edit, so a
  *    single-class stamp could serve a world stale against new code
  *    (the r13 ADVICE finding). The stamp is computed once per JVM (a
  *    few ms of directory walk) and shared by every tag;
  *  - publication is IN PLACE under a lock + OK-marker protocol (NOT
  *    build-then-rename: stats sidecars and manifests record absolute
  *    file URIs, so a world must never move after it is built): the
  *    winner of an atomic lock-file create builds into the final dir
  *    and drops an `_WORLD_OK` marker. The winner path is
  *    crash/failure-safe: any pre-existing unmarked target dir (a
  *    prior winner died mid-build) is deleted before building, and a
  *    build that throws deletes its partial dir before rethrowing —
  *    a dirty world is never built upon and never published. A lock
  *    older than [[LockStaleMs]] with no marker is a crashed winner's:
  *    it is reclaimed (deleted and re-raced) instead of stalling every
  *    later JVM into the full poll + private-copy fallback forever;
  *  - a concurrent loser polls for the marker, and on timeout builds a
  *    process-private unpublished copy so it can still run;
  *  - worlds are IMMUTABLE after publish by convention: a gate whose
  *    scenario mutates state (a forget, an optimize) runs the mutation
  *    inside `build` and caches the FINAL state (plus any scalar
  *    outcomes as files) — gates must not write into a cached dir;
  *  - STALE GENERATIONS ARE VACUUMED (r13 verdict #5): the build stamp
  *    is part of the dir name (`<tag>_v<stamp>_<hash>`), so a sweep can
  *    recognize worlds of superseded builds without knowing their keys.
  *    Once per JVM, on the first cache miss, dirs whose stamp differs
  *    from the current build's are deleted — each is 50-70 s of build
  *    output that nothing will ever read again (the key that reached it
  *    no longer exists). Lock-safe: a dir whose lock file is younger
  *    than [[LockStaleMs]] is skipped (an older-build JVM may be mid-
  *    build; it keeps its private fallback semantics if we raced it),
  *    and a dir whose OK marker was touched within [[VacuumGraceMs]]
  *    is spared — readers touch the marker on every lookup, so an
  *    older-build JVM still mid-RUN keeps its world.
  *
  * Override the root with GRAFT_WORLD_CACHE (e.g. a per-run scratch
  * dir); defaults under java.io.tmpdir like the index artifacts.
  */
object WorldCache {

  /** Test seam: point the cache at a throwaway root (specs exercise the
    * lock/crash/vacuum protocol without touching the shared cache). */
  private[graft] var cacheRootOverride: Option[java.io.File] = None

  private def cacheRoot: java.io.File =
    cacheRootOverride.getOrElse(
      new java.io.File(sys.env.getOrElse("GRAFT_WORLD_CACHE",
        new java.io.File(sys.props("java.io.tmpdir"),
          "graft_world_cache").toString)))

  /** A lock with no marker older than this is a crashed winner's —
    * reclaimable. Must comfortably exceed the longest single world
    * build (observed ~75 s driver-side). */
  private[graft] val LockStaleMs: Long = 10L * 60 * 1000

  /** The vacuum spares a superseded-build world whose OK marker was
    * touched within this window: an older-build JVM still mid-run
    * (its last [[dir]] lookup touches the marker) holds no lock while
    * READING its world, and yanking the dir under it fails that run
    * with FileNotFound mid-gate. Must exceed the longest whole-JVM
    * run that reads worlds (sbt test ≈ 15 min). Stale worlds linger
    * at most this long past their last use — a later JVM's vacuum
    * collects them. */
  private[graft] val VacuumGraceMs: Long = 30L * 60 * 1000

  /** BUILD-WIDE stamp: the max lastModified over every .class file
    * under the compiled-classes root this class loaded from, or — when
    * loaded from a JAR — a CONTENT hash of the jar bytes. Any recompile
    * of any production class changes it, so the world key can never
    * outlive the code that built the world, whichever class that code
    * lives in. The jar branch must NOT use the jar's mtime: sbt's
    * forked `runMain` copies the packaged jar into a fresh
    * `target/bg-jobs/...` path on EVERY invocation (mtime = run start),
    * which keyed every run to a new stamp — all fixture worlds rebuilt
    * per run (~2 min of untimed world_build each Bench/Verify), and the
    * cache never hit once. Hashing the bytes is copy-stable: identical
    * compile → identical stamp. Computed once per JVM (~ms for a few
    * thousand class files; ~ms to digest a single-digit-MB jar). */
  private[graft] lazy val buildStamp: Long = {
    val res = getClass.getName.replace('.', '/') + ".class"
    val url = getClass.getClassLoader.getResource(res)
    if (url == null) 0L
    else if (url.getProtocol == "file") {
      val self = new java.io.File(url.toURI)
      // classes root = the resource path stripped off the .class file
      val root = java.nio.file.Paths.get(self.toPath.toString
        .stripSuffix(res.replace('/', java.io.File.separatorChar)))
      val walk = java.nio.file.Files.walk(root)
      try walk.filter(p => p.toString.endsWith(".class"))
        .mapToLong(p => p.toFile.lastModified()).max().orElse(0L)
      finally walk.close()
    } else if (url.getProtocol == "jar") {
      val jar = url.getPath.takeWhile(_ != '!').stripPrefix("file:")
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(
          new java.io.File(java.net.URLDecoder.decode(jar, "UTF-8")).toURI))
      java.nio.ByteBuffer.wrap(
        java.security.MessageDigest.getInstance("MD5").digest(bytes))
        .getLong & Long.MaxValue // non-negative: the stamp prints as hex
    } else 0L
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Once-per-JVM vacuum of superseded-build worlds (and the pre-stamp
    * key format): anything in the cache root whose name doesn't carry
    * the current `_v<stamp>_` marker is unreachable by any current key
    * and is deleted — unless a YOUNG lock says another JVM (possibly an
    * older build) is actively building it. */
  private lazy val vacuumStale: Unit = vacuumNow()

  /** The sweep body (test seam — the lazy val above runs it once per
    * JVM on the first cache miss). */
  private[graft] def vacuumNow(): Unit = {
    val marker = s"_v${java.lang.Long.toHexString(buildStamp)}_"
    val now = System.currentTimeMillis()
    Option(cacheRoot.listFiles()).getOrElse(Array.empty).foreach { f =>
      val name = f.getName
      val isLock = name.endsWith(".lock")
      val base = if (isLock) name.stripSuffix(".lock") else name
      if (!base.contains(marker)) {
        val lock = new java.io.File(cacheRoot, s"$base.lock")
        val lockYoung = lock.exists() &&
          now - lock.lastModified() < LockStaleMs
        // an older-build JVM mid-RUN holds no lock but touches its
        // marker on every dir() lookup — spare recently-used worlds
        val ok = new java.io.File(f, OkMarker)
        val recentlyUsed = ok.exists() &&
          now - ok.lastModified() < VacuumGraceMs
        if (!lockYoung && !recentlyUsed) deleteRecursively(f)
      }
    }
  }

  private val memo =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Test seam: drop a memoized key (simulates a fresh JVM whose memo
    * is empty — the crash-recovery paths are cross-JVM by design). */
  private[graft] def evictMemo(key: String): Unit = { memo.remove(key); () }

  private val OkMarker = "_WORLD_OK"

  /** The world dir for (tag, sfDir, build): returns the published dir,
    * running `build` into it under the lock protocol only when absent.
    * `build` receives the dir to populate (it may create any
    * substructure); the returned dir must be treated read-only.
    * `owner` is retained for call-site documentation — versioning is
    * build-wide ([[buildStamp]]), not per-class. */
  def dir(tag: String, sfDir: String, owner: Class[_])
         (build: String => Unit): String = synchronized {
    val ver = buildStamp
    val key = tag + s"_v${java.lang.Long.toHexString(ver)}_" +
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(s"$sfDir|$ver|$tag")
          .toLong & 0xffffffffL)
    memo.getOrElseUpdate(key, {
      val target = new java.io.File(cacheRoot, key)
      val ok = new java.io.File(target, OkMarker)
      def touch(): Unit = { ok.setLastModified(System.currentTimeMillis()); () }
      if (ok.exists()) { touch(); target.toString }
      else {
        vacuumStale
        cacheRoot.mkdirs()
        val lock = new java.io.File(cacheRoot, s"$key.lock")
        def acquire(): Boolean = lock.createNewFile() || {
          // a crashed winner's stale lock (old, and still no marker) is
          // reclaimed so the key can ever be published again. Reclaim
          // must be ATOMIC — two JVMs seeing the same stale lock and
          // both doing delete+create would both "win" and build into
          // the same dir concurrently. renameTo arbitrates: exactly one
          // renamer succeeds (the loser's source is gone), and the
          // createNewFile after it races fairly with fresh acquirers.
          val stale = lock.exists() && !ok.exists() &&
            System.currentTimeMillis() - lock.lastModified() > LockStaleMs
          stale && {
            val tomb = new java.io.File(cacheRoot,
              s"$key.lock.reclaim-${java.util.UUID.randomUUID().toString.take(8)}")
            lock.renameTo(tomb) && { tomb.delete(); lock.createNewFile() }
          }
        }
        if (acquire()) {
          // we own the build; the dir never moves, so absolute paths
          // inside sidecars/manifests stay valid forever
          try {
            // between our marker check and the acquire, a prior winner
            // may have PUBLISHED — re-check before deleting a healthy
            // world out from under its readers
            if (ok.exists()) { touch(); target.toString }
            else {
              // a marker-less target is a dead winner's partial build:
              // never build on top of dirty state
              if (target.exists()) deleteRecursively(target)
              target.mkdirs()
              try {
                build(target.toString)
                if (!ok.createNewFile()) throw new java.io.IOException(
                  s"WorldCache: marker create failed for $target")
              } catch {
                case e: Throwable =>
                  // failed build: remove the partial dir so the next
                  // winner starts clean instead of publishing corruption
                  deleteRecursively(target)
                  throw e
              }
              target.toString
            }
          } finally { lock.delete(); () }
        } else {
          // another JVM is building: wait for its marker; a crashed
          // winner (stale lock, no marker) falls back to a private
          // unpublished copy so this process still runs correctly
          val deadline = System.nanoTime() + 10L * 60 * 1000 * 1000 * 1000
          while (!ok.exists() && System.nanoTime() < deadline)
            Thread.sleep(500)
          if (ok.exists()) { touch(); target.toString }
          else {
            val priv = java.nio.file.Files
              .createTempDirectory(s"graft_world_$key").toString
            build(priv)
            priv
          }
        }
      }
    })
  }

  /** Tiny scalar outcomes a mutating build wants to hand its gate
    * (rewrite counts, snapshot names): one string per line. */
  def writeNotes(worldDir: String, lines: Seq[String]): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(worldDir, "_notes.txt"),
      lines.mkString("\n").getBytes("UTF-8"))

  def readNotes(worldDir: String): Seq[String] =
    scala.io.Source.fromFile(
      new java.io.File(worldDir, "_notes.txt"), "UTF-8")
      .getLines().toList
}
