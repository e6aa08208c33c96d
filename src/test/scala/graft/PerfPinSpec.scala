package graft

/** Steady-state regression tripwires for the queries whose bench
  * first-runs have historically swung enough (±20-50%, BASELINE.md) to
  * read as regressions: the round-5 review flagged dd4 (1.20→1.81 s)
  * and aj1 (0.28→0.46 s) purely on first-run deltas with unchanged
  * plans. A MEDIAN-of-3 after warmup is stable, so a pinned median
  * turns "is it noise?" into a mechanical check: the bounds below are
  * ≥2.5× the medians recorded on the reference machine (sf0.01,
  * local[4] test session — dd4 ~0.8 s, aj1 ~0.25 s, dd9 ~0.5 s), so
  * only a genuine ≥2× steady-state regression (or a pathological
  * environment) trips them, not run-to-run variance. sf0.1 medians
  * live in BASELINE.md for cross-round comparison.
  */
class PerfPinSpec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  private def median3(name: String): Double = {
    val fn = SparkEntry.queries(name)
    fn(spark, sf001).count() // warmup: planning + codegen + IO
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sf001).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    info(f"$name median=${runs(1)}%.3f s (runs: ${runs.map(r => f"$r%.3f").mkString(", ")})")
    runs(1)
  }

  test("dd4_minhash_lsh steady-state median stays in its recorded band") {
    assert(median3("dd4_minhash_lsh") < 2.5)
  }

  test("aj1_asof_join steady-state median stays in its recorded band") {
    assert(median3("aj1_asof_join") < 1.0)
  }

  test("dd9_substring_dup steady-state median stays in its recorded band") {
    assert(median3("dd9_substring_dup") < 1.6)
  }

  test("v5_ann_ivf steady-state median stays probe-only (index persisted, " +
       "never retrained in the query path)") {
    // round-8 regression tripwire: inline k-means re-training pushed the
    // sf0.1 median to 1.5 s; the persisted-index probe path medians
    // ~0.9 s here (sf0.01, local[4], index build amortized by the
    // median3 warmup). A breach means training crept back into the
    // query path or the partition-pruned index scan stopped pruning.
    assert(median3("v5_ann_ivf") < 2.5)
  }
}
