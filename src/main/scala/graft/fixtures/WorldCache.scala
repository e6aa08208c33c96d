package graft.fixtures

/** Content-addressed, cross-JVM FIXTURE-WORLD cache for the driver
  * gates (r12 verdict #4): a write gate that re-synthesizes its input
  * world per invocation — a 2-day SCD2 table, a 3-publish curated
  * store, a full gold ETL chain — spends seconds of fsync-heavy disk
  * churn measuring fixture construction, not the operator under test,
  * and pays it again in every JVM (Verify, Bench, each spec suite).
  *
  * A world is built ONCE per (tag, sf dir, defining-class build) under
  * a shared on-disk root and reused READ-ONLY:
  *
  *  - the key includes the OWNER CLASS's .class mtime, so recompiling
  *    the file that defines the fixture logic busts the cache — a
  *    stale world can never outlive the code that built it (the same
  *    compiled classes are what Verify and Bench share within a driver
  *    run, which is exactly the reuse window we want);
  *  - publication is IN PLACE under a lock + OK-marker protocol (NOT
  *    build-then-rename: stats sidecars and manifests record absolute
  *    file URIs, so a world must never move after it is built): the
  *    winner of an atomic lock-file create builds into the final dir
  *    and drops an `_WORLD_OK` marker; a concurrent loser polls for
  *    the marker, and on timeout (crashed winner) builds a
  *    process-private unpublished copy so it can still run;
  *  - worlds are IMMUTABLE after publish by convention: a gate whose
  *    scenario mutates state (a forget, an optimize) runs the mutation
  *    inside `build` and caches the FINAL state (plus any scalar
  *    outcomes as files) — gates must not write into a cached dir.
  *
  * Override the root with GRAFT_WORLD_CACHE (e.g. a per-run scratch
  * dir); defaults under java.io.tmpdir like the index artifacts.
  */
object WorldCache {

  private def cacheRoot: java.io.File =
    new java.io.File(sys.env.getOrElse("GRAFT_WORLD_CACHE",
      new java.io.File(sys.props("java.io.tmpdir"),
        "graft_world_cache").toString))

  /** Build stamp of the class that defines the world — its .class
    * file's mtime (directory classpath) or its jar's (packaged). Any
    * recompile of the defining file changes it. */
  private def classVersion(owner: Class[_]): Long = {
    val res = owner.getName.replace('.', '/') + ".class"
    val url = owner.getClassLoader.getResource(res)
    if (url == null) 0L
    else if (url.getProtocol == "file")
      new java.io.File(url.toURI).lastModified()
    else if (url.getProtocol == "jar") {
      val jar = url.getPath.takeWhile(_ != '!').stripPrefix("file:")
      new java.io.File(java.net.URLDecoder.decode(jar, "UTF-8"))
        .lastModified()
    } else 0L
  }

  private val memo =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The world dir for (tag, sfDir, owner-build): returns the published
    * dir, running `build` into a fresh private dir and renaming it in
    * only when absent. `build` receives the dir to populate (it may
    * create any substructure); the returned dir must be treated
    * read-only. */
  private val OkMarker = "_WORLD_OK"

  def dir(tag: String, sfDir: String, owner: Class[_])
         (build: String => Unit): String = synchronized {
    val ver = classVersion(owner)
    val key = tag + "_" + java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"$sfDir|$ver|$tag")
        .toLong & 0xffffffffL)
    memo.getOrElseUpdate(key, {
      val target = new java.io.File(cacheRoot, key)
      val ok = new java.io.File(target, OkMarker)
      if (ok.exists()) target.toString
      else {
        cacheRoot.mkdirs()
        val lock = new java.io.File(cacheRoot, s"$key.lock")
        if (lock.createNewFile()) {
          // we own the build; the dir never moves, so absolute paths
          // inside sidecars/manifests stay valid forever
          try {
            target.mkdirs()
            build(target.toString)
            if (!ok.createNewFile()) throw new java.io.IOException(
              s"WorldCache: marker create failed for $target")
            target.toString
          } finally lock.delete()
        } else {
          // another JVM is building: wait for its marker; a crashed
          // winner (stale lock, no marker) falls back to a private
          // unpublished copy so this process still runs correctly
          val deadline = System.nanoTime() + 10L * 60 * 1000 * 1000 * 1000
          while (!ok.exists() && System.nanoTime() < deadline)
            Thread.sleep(500)
          if (ok.exists()) target.toString
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
