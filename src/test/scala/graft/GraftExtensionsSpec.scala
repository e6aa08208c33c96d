package graft

/** The extensions entry point registers every graft-native function on a
  * session that never called a per-object `register` — proven on an
  * isolated `newSession()` (fresh function registry, shared context). */
class GraftExtensionsSpec extends SparkSuite {

  test("registerAll makes every graft function resolvable on a fresh session") {
    val fresh = spark.newSession()
    // isolated registry: graft functions must NOT pre-exist here
    intercept[Exception] {
      fresh.sql("SELECT graft_cosine(array(1.0D), array(1.0D))").collect()
    }
    GraftExtensions.registerAll(fresh)
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
