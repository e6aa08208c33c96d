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
  *  - the key includes a RECIPE stamp with two bytecode components
  *    ([[buildStamp]] + [[ownerStamp]]): a content hash of all ENGINE
  *    bytecode (everything world builds call through — StreamingOps,
  *    IncrementalCurate, Scd2, GoldEtl, … — zinc does not touch the
  *    owner's .class for a dependency's implementation-only edit, so
  *    all of it participates; the r13 ADVICE finding), plus a content
  *    hash of the declaring query file's own classes, so editing a
  *    query body in ANOTHER file reuses every cached world (the r15
  *    verdict #3: whole-jar keying rebuilt 130-255 s of fixtures per
  *    edit). Computed once per JVM;
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

  /** RECIPE stamp, not build stamp (r15 verdict #3: keying worlds on
    * whole-jar bytes rebuilt 130-255 s of fixtures on EVERY code
    * change, including edits to query bodies no world build ever
    * executes). The key now has two bytecode components:
    *
    *  - [[buildStamp]] — a CONTENT hash (path + bytes, sorted) of every
    *    .class file OUTSIDE `graft.queries` / `graft.tools` /
    *    `Bench`/`Verify`/`SparkEntry`. World builds call through the
    *    engine packages (Scd2, GoldEtl, StreamingOps, operators, …),
    *    and zinc does not recompile a caller for a dependency's
    *    implementation-only edit (the r13 ADVICE hazard), so ALL
    *    engine bytecode participates — an engine edit still busts
    *    every world;
    *  - [[ownerStamp]] — a content hash of the `owner` class's own
    *    .class files (the object class plus its `$`-suffixed synthetic
    *    siblings). Scala compiles a build lambda's body into methods
    *    of its enclosing object's class file, so editing a world's
    *    SCENARIO re-stamps exactly the worlds declared in that file,
    *    while edits to other query files reuse every cached world.
    *
    * INVARIANT the split relies on (audited at the 12 call sites this
    * round, and required of new ones): a build lambda calls only engine
    * packages plus code in its OWN file — a helper in another excluded
    * file is invisible to both components and MUST be declared via
    * [[dir]]'s `alsoOwners` (the audit found one such site, s27's
    * DedupExtQueries.plantedCorpus, now declared).
    *
    * Content hashing (not mtime) makes the stamp stable across
    * touch-compiles and across sbt's forked `runMain` re-copying the
    * packaged jar per invocation (the original mtime bug: every run a
    * fresh stamp, every world rebuilt, the cache never hit once).
    * Computed once per JVM (~ms to digest a few thousand class files
    * or jar entries). */
  private def hashClasses(pred: String => Boolean): Long = {
    val res = getClass.getName.replace('.', '/') + ".class"
    val url = getClass.getClassLoader.getResource(res)
    if (url == null) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    def feed(rel: String, bytes: Array[Byte]): Unit = {
      md.update(rel.getBytes("UTF-8")); md.update(bytes); ()
    }
    if (url.getProtocol == "file") {
      val self = new java.io.File(url.toURI)
      // classes root = the resource path stripped off the .class file
      val root = java.nio.file.Paths.get(self.toPath.toString
        .stripSuffix(res.replace('/', java.io.File.separatorChar)))
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p))
          .map(p => root.relativize(p).toString
            .replace(java.io.File.separatorChar, '/') -> p)
          .filter { case (rel, _) => rel.endsWith(".class") && pred(rel) }
          .toSeq.sortBy(_._1)
          .foreach { case (rel, p) =>
            feed(rel, java.nio.file.Files.readAllBytes(p)) }
      } finally walk.close()
    } else if (url.getProtocol == "jar") {
      val jar = url.getPath.takeWhile(_ != '!').stripPrefix("file:")
      val jf = new java.util.jar.JarFile(
        new java.io.File(java.net.URLDecoder.decode(jar, "UTF-8")))
      try {
        import scala.jdk.CollectionConverters._
        jf.entries().asScala
          .filter(e => !e.isDirectory && e.getName.endsWith(".class") &&
            pred(e.getName))
          .toSeq.sortBy(_.getName)
          .foreach { e =>
            val in = jf.getInputStream(e)
            try feed(e.getName, in.readAllBytes()) finally in.close()
          }
      } finally jf.close()
    } else return 0L
    java.nio.ByteBuffer.wrap(md.digest())
      .getLong & Long.MaxValue // non-negative: the stamp prints as hex
  }

  /** The world-build lambdas and everything they transitively call live
    * here; query/tool/CLI bytecode is excluded from the shared stamp
    * and covered per-file by [[ownerStamp]]. */
  private def inSharedRecipe(rel: String): Boolean =
    rel.startsWith("graft/") &&
      !rel.startsWith("graft/queries/") &&
      !rel.startsWith("graft/tools/") &&
      !rel.matches("graft/(Bench|Verify|SparkEntry)(\\$.*)?\\.class")

  private[graft] lazy val buildStamp: Long = hashClasses(inSharedRecipe)

  private val ownerStamps =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Content hash of the owner object's own class files (`X$.class`,
    * `X.class`, `X$*.class`) — the bytecode holding its build lambdas. */
  private[graft] def ownerStamp(owner: Class[_]): Long = {
    val base = owner.getName.stripSuffix("$").replace('.', '/')
    ownerStamps.getOrElseUpdate(base, hashClasses(rel =>
      rel == s"$base.class" || rel == s"$base$$.class" ||
        (rel.startsWith(s"$base$$") && rel.endsWith(".class"))))
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
    // shared-stamp component only: worlds of a superseded ENGINE build
    // are collected; a same-engine world whose owner (query-file) stamp
    // moved lingers until the engine stamp next changes — bounded by
    // in-generation query edits, each ~50-70 s of build output
    val marker = s"_v${java.lang.Long.toHexString(buildStamp)}-"
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
    * `owner` is load-bearing: the class whose file DECLARES the build
    * lambda — its bytecode hash re-keys this world when the scenario
    * is edited (see [[ownerStamp]]). A lambda that calls helper code in
    * ANOTHER excluded (queries/tools) file MUST declare that file via
    * `alsoOwners`, or an edit to the helper serves this world stale —
    * the r16 audit found exactly one such site (s27's
    * DedupExtQueries.plantedCorpus) and it declares it. */
  def dir(tag: String, sfDir: String, owner: Class[_],
          alsoOwners: Class[_]*)
         (build: String => Unit): String = synchronized {
    val ver = buildStamp
    val own = (owner +: alsoOwners).map(ownerStamp).reduce(_ ^ _)
    val key = tag + s"_v${java.lang.Long.toHexString(ver)}-" +
      java.lang.Long.toHexString(own) + "_" +
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(s"$sfDir|$ver|$own|$tag")
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
