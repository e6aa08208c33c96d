package graft

/** The extensions entry point registers every graft-native function and
  * the RangeJoin rule/strategy at session build. Since round 7 every
  * graft session (incl. the shared test session) is built with
  * `spark.sql.extensions=graft.GraftExtensions`, so `newSession()`
  * clones INHERIT the injected functions — that inheritance is itself
  * the injection-path proof. `registerAll` stays for sessions built
  * without the conf. */
class GraftExtensionsSpec extends SparkSuite {

  test("extension-built sessions (and their newSession clones) resolve every graft function") {
    val fresh = spark.newSession()
    val cos = fresh.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val keys = fresh.sql(
      "SELECT size(graft_sign_rp_keys(array(1.0D, -2.0D), 8, 8)) AS n")
      .collect().head.getInt(0)
    assert(keys === 8)
    // every declared function resolves (parse + analysis, not execution)
    GraftExtensions.functions.foreach { case (name, _) =>
      assert(fresh.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name not registered")
    }
  }

  test("registerAll restores a dropped function on a live session") {
    val fresh = spark.newSession()
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine")
    fresh.sessionState.functionRegistry.dropFunction(id)
    assert(!fresh.sessionState.functionRegistry.functionExists(id))
    GraftExtensions.registerAll(fresh)
    assert(fresh.sessionState.functionRegistry.functionExists(id))
    val cos = fresh.sql(
      "SELECT graft_cosine(array(0.0D, 2.0D), array(0.0D, 1.0D)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("the extension injector carries the same builder set") {
    // injectFunction is exercised structurally: the injector must expose
    // exactly the registry names registerAll installs (one shared list),
    // so the spark.sql.extensions path cannot drift from the ad-hoc one.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw on any entry
    assert(GraftExtensions.functions.map(_._1).distinct.size ===
      GraftExtensions.functions.size)
  }
}
