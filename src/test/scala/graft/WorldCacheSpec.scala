package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.fixtures.WorldCache

/** The cross-JVM fixture-world cache's lock/crash/vacuum protocol
  * (r13 verdict #5 + ADVICE): build-once reuse, dirty-dir hygiene on
  * failed builds, stale-lock reclaim, and the superseded-build sweep.
  * Runs against a throwaway root via the test seam — the shared cache
  * under tmpdir is never touched. */
class WorldCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var root: java.io.File = _

  override def beforeAll(): Unit = {
    root = java.nio.file.Files.createTempDirectory("wc_spec").toFile
    WorldCache.cacheRootOverride = Some(root)
  }

  override def afterAll(): Unit = {
    WorldCache.cacheRootOverride = None
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(root)
  }

  private def uniqueTag(prefix: String): String =
    s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"

  test("a world builds once and is reused by key") {
    val tag = uniqueTag("once")
    var builds = 0
    def get() = WorldCache.dir(tag, "sfX", getClass) { d =>
      builds += 1
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, "data.txt"), "w".getBytes)
    }
    val d1 = get(); val d2 = get()
    assert(d1 == d2 && builds == 1)
    assert(new java.io.File(d1, "_WORLD_OK").exists())
  }

  test("a failed build publishes nothing and leaves no partial dir; " +
    "the next attempt rebuilds clean (r13 ADVICE: no poisoned cache)") {
    val tag = uniqueTag("fail")
    intercept[RuntimeException] {
      WorldCache.dir(tag, "sfX", getClass) { d =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, "partial.txt"), "x".getBytes)
        throw new RuntimeException("boom")
      }
    }
    // no lock left behind, no marker, no partial dir
    val leftovers = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(tag))
    assert(leftovers.isEmpty,
      s"failed build left ${leftovers.map(_.getName).mkString(",")}")
    // the retry builds into a clean dir and must NOT see partial.txt
    val d = WorldCache.dir(tag, "sfX", getClass) { dir =>
      assert(!new java.io.File(dir, "partial.txt").exists(),
        "retry built on top of a dirty dir")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "data.txt"), "ok".getBytes)
    }
    assert(new java.io.File(d, "data.txt").exists())
    assert(!new java.io.File(d, "partial.txt").exists())
  }

  test("a crashed winner's stale lock is reclaimed instead of " +
    "stalling every later JVM (r13 ADVICE)") {
    val tag = uniqueTag("stale")
    // simulate: a lock exists (crashed winner), old mtime, no marker
    // — the key must still be publishable. We can't know the key's
    // hash, so plant the lock by racing: first figure out the key via
    // a successful build with a sibling tag is useless; instead create
    // the lock for EVERY possible key by pre-creating after a dry run.
    // Simpler: run once to learn the dir name, tear down to simulate
    // the crash, plant a stale lock, and verify a rebuild happens.
    var dirName: String = null
    WorldCache.dir(tag, "sfX", getClass) { d =>
      dirName = new java.io.File(d).getName
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, "gen1.txt"), "1".getBytes)
    }
    // simulate crash mid-build of a NEW process: delete the marker,
    // leave a partial dir, plant an old lock
    val target = new java.io.File(root, dirName)
    assert(new java.io.File(target, "_WORLD_OK").delete())
    val lock = new java.io.File(root, s"$dirName.lock")
    assert(lock.createNewFile())
    assert(lock.setLastModified(
      System.currentTimeMillis() - WorldCache.LockStaleMs - 60000))
    // a fresh JVM is simulated by a fresh memo key — same tag+sf hits
    // the same on-disk key but the in-JVM memo already holds it, so
    // clear via a distinct sfDir? No: the memo key IS the dir key.
    // Use the package-private seam: re-run dir() from a new memo by
    // reflection-free route — the memo caches only SUCCESSFUL paths
    // keyed by the same key, so drop it by building through a fresh
    // ClassLoader is overkill; instead assert the reclaim path
    // directly: acquire must succeed despite the existing old lock.
    // (The memo entry points at the now-unmarked dir; a real fresh JVM
    // starts with an empty memo. Simulate by evicting via the seam.)
    WorldCache.evictMemo(dirName)
    val d2 = WorldCache.dir(tag, "sfX", getClass) { d =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, "gen2.txt"), "2".getBytes)
    }
    assert(new java.io.File(d2, "_WORLD_OK").exists())
    assert(new java.io.File(d2, "gen2.txt").exists())
    assert(!new java.io.File(d2, "gen1.txt").exists(),
      "rebuild must start from a clean dir, not the crashed remnant")
    assert(!lock.exists(), "the reclaimed lock must be released")
  }

  test("vacuum removes superseded-build worlds but spares " +
    "actively-locked ones (r13 verdict #5)") {
    // plant: an old-format dir (no _v marker), an old-stamp dir, an
    // old-stamp dir with a YOUNG lock, and a current-stamp dir
    val cur = s"_v${java.lang.Long.toHexString(WorldCache.buildStamp)}-0_"
    def mk(name: String): java.io.File = {
      val d = new java.io.File(root, name); d.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d.toString, "x"), "x".getBytes)
      d
    }
    val legacy = mk("cp6_scenario_deadbeef")
    val oldGen = mk("cp6_scenario_vffff_0123abcd")
    val oldLocked = mk("s25_world_vffff_77aa77aa")
    val youngLock = new java.io.File(root, s"${oldLocked.getName}.lock")
    assert(youngLock.createNewFile())
    val current = mk(s"tag${cur}12345678")
    WorldCache.vacuumNow()
    assert(!legacy.exists(), "pre-stamp format dirs must be vacuumed")
    assert(!oldGen.exists(), "superseded-stamp dirs must be vacuumed")
    assert(oldLocked.exists() && youngLock.exists(),
      "a dir with a young lock (another JVM mid-build) must be spared")
    assert(current.exists(), "current-stamp dirs must be kept")
    youngLock.delete(); ()
  }

  test("recipe stamp: distinct declaring files stamp differently; " +
    "stable within a JVM; engine stamp non-trivial") {
    val a = WorldCache.ownerStamp(graft.queries.WritePathQueries.getClass)
    val b = WorldCache.ownerStamp(graft.queries.VectorQueries.getClass)
    assert(a !== b, "distinct owner files must re-key independently")
    assert(a === WorldCache.ownerStamp(graft.queries.WritePathQueries.getClass))
    assert(WorldCache.buildStamp > 0L, "shared engine stamp must hash real bytecode")
    // same tag under different owners maps to different cache dirs
    val t = uniqueTag("ownerkey")
    val d1 = WorldCache.dir(t, "sfX", graft.queries.WritePathQueries.getClass)(
      dir => java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "a.txt"), "a".getBytes))
    val d2 = WorldCache.dir(t, "sfX", graft.queries.VectorQueries.getClass)(
      dir => java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "b.txt"), "b".getBytes))
    assert(d1 !== d2)
  }

  test("vacuum spares a superseded world whose marker was touched " +
    "recently — an older-build JVM mid-RUN keeps its fixtures") {
    def mkPublished(name: String, markerAge: Long): java.io.File = {
      val d = new java.io.File(root, name); d.mkdirs()
      val ok = new java.io.File(d, "_WORLD_OK")
      assert(ok.createNewFile())
      assert(ok.setLastModified(System.currentTimeMillis() - markerAge))
      d
    }
    val inUse = mkPublished("st11_world_vffff_aaaa1111", markerAge = 60000)
    val idle = mkPublished("st11_world_vffff_bbbb2222",
      markerAge = WorldCache.VacuumGraceMs + 60000)
    WorldCache.vacuumNow()
    assert(inUse.exists(),
      "a recently-read superseded world must survive the sweep")
    assert(!idle.exists(),
      "a superseded world idle past the grace window must be vacuumed")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(inUse)
  }

  test("every dir() lookup touches the marker, keeping the world " +
    "vacuum-safe for the lifetime of the run") {
    val tag = uniqueTag("touch")
    val d = WorldCache.dir(tag, "sfX", getClass) { dir =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "data.txt"), "w".getBytes)
    }
    val ok = new java.io.File(d, "_WORLD_OK")
    val old = System.currentTimeMillis() - WorldCache.VacuumGraceMs - 60000
    assert(ok.setLastModified(old))
    WorldCache.evictMemo(new java.io.File(d).getName)
    val d2 = WorldCache.dir(tag, "sfX", getClass)(_ =>
      fail("a published world must be reused, not rebuilt"))
    assert(d2 == d)
    assert(ok.lastModified() > old,
      "the cache-hit path must refresh the marker mtime")
  }
}
