package graft.tools

/** Prints the [[graft.fixtures.WorldCache]] recipe stamps and the
  * classpath resource they derive from — run it twice to check they are
  * stable across sbt invocations (the bug this caught: sbt's forked
  * `runMain` copies the packaged jar to a fresh bg-jobs path per run, so
  * a jar-MTIME stamp changed every invocation and every fixture world
  * rebuilt per Bench/Verify run). Run it before and after editing a
  * query body in a NON-world file (e.g. CoreQueries) to check the r15
  * verdict #3 criterion: both STAMP (engine bytecode) and OWNER_WPQ
  * (WritePathQueries' own bytecode) stay put, so every cached world is
  * reused; editing WritePathQueries itself moves only OWNER_WPQ. */
object StampProbe {
  def main(args: Array[String]): Unit = {
    val url = graft.fixtures.WorldCache.getClass.getClassLoader.getResource(
      graft.fixtures.WorldCache.getClass.getName.replace('.', '/') + ".class")
    println(s"STAMP=${java.lang.Long.toHexString(
      graft.fixtures.WorldCache.buildStamp)} " +
      s"OWNER_WPQ=${java.lang.Long.toHexString(graft.fixtures.WorldCache
        .ownerStamp(graft.queries.WritePathQueries.getClass))} URL=$url")
  }
}
