package graft.tools

/** Prints [[graft.fixtures.WorldCache.buildStamp]] and the classpath
  * resource it derives from — run it twice to check the stamp is stable
  * across sbt invocations (the bug this caught: sbt's forked `runMain`
  * copies the packaged jar to a fresh bg-jobs path per run, so a
  * jar-MTIME stamp changed every invocation and every fixture world
  * rebuilt per Bench/Verify run). */
object StampProbe {
  def main(args: Array[String]): Unit = {
    val url = graft.fixtures.WorldCache.getClass.getClassLoader.getResource(
      graft.fixtures.WorldCache.getClass.getName.replace('.', '/') + ".class")
    println(s"STAMP=${java.lang.Long.toHexString(
      graft.fixtures.WorldCache.buildStamp)} URL=$url")
  }
}
