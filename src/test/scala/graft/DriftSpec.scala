package graft

/** Drift monitors (qc2 PSI, qc3 binned KS): statistical invariants that
  * hold for ANY input — per-bin PSI terms are non-negative ((p−q) and
  * ln(p/q) always share sign), the total is their sum, and the KS
  * statistic lands in [0,1] — plus a zero-drift fixture where both must
  * report (near) zero. The cross-engine value gate is the DuckDB oracle
  * at Verify time; these pin the semantics. */
class DriftSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  test("qc2: PSI terms non-negative, total equals their sum") {
    val rows = SparkEntry.queries("qc2_drift_psi")(spark, sf).collect()
    assert(rows.nonEmpty)
    val terms = rows.map(_.getDouble(3))
    assert(terms.forall(_ >= 0.0), s"negative PSI term in ${terms.toSeq}")
    val total = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) === total))
    assert(math.abs(terms.sum - total) < 1e-3,
      s"total $total != sum of terms ${terms.sum}")
  }

  test("qc3: KS statistic is in [0, 1] and totals cover every order") {
    val r = SparkEntry.queries("qc3_ks_drift")(spark, sf).head()
    val (nRef, nCur, d) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(d >= 0.0 && d <= 1.0)
    val total = Tables.orders(spark, sf).count()
    assert(nRef + nCur === total)
  }

  test("identical windows drift exactly zero under both monitors") {
    import spark.implicits._
    import graft.operators.Drift
    // same distribution on both sides: is_ref by parity, value depends
    // only on i/2, so both halves see identical multisets bin-for-bin
    val df = (0 until 4000)
      .map(i => (i % 2 == 0, (i / 2 % 50) * 1000.0))
      .toDF("is_ref", "price")
    val psiRows = Drift.psi(df, "price", "is_ref", 5000.0, 10).collect()
    assert(psiRows.forall(_.getDouble(3) === 0.0))
    assert(psiRows.forall(_.getDouble(4) === 0.0))
    val ks = Drift.ksBinned(df, "price", "is_ref", 5000.0, 10).head()
    assert(ks.getDouble(2) === 0.0)
    assert(ks.getLong(0) === 2000L && ks.getLong(1) === 2000L)
  }

  test("an entirely-empty side yields large finite PSI and KS, never NaN") {
    import spark.implicits._
    import graft.operators.Drift
    val allRef = (0 until 300).map(i => (true, (i % 10) * 100.0))
      .toDF("is_ref", "price")
    val psiRows = Drift.psi(allRef, "price", "is_ref", 100.0, 10).collect()
    assert(psiRows.nonEmpty)
    psiRows.foreach { r =>
      assert(!r.getDouble(3).isNaN && !r.getDouble(4).isNaN)
      assert(r.getDouble(3) > 0.0) // (p vs 1e-6 floor) is a large term
    }
    val ks = Drift.ksBinned(allRef, "price", "is_ref", 100.0, 10).head()
    assert(!ks.getDouble(2).isNaN)
    assert(ks.getDouble(2) === 1.0) // sup of the ref ECDF vs all-zero
  }

  test("NULL metric values are excluded, not binned into the top bin") {
    import spark.implicits._
    import graft.operators.Drift
    val withNulls = ((0 until 100).map(i => (i % 2 == 0, Some((i % 5) * 100.0)))
      ++ (0 until 40).map(i => (i % 2 == 0, Option.empty[Double])))
      .toDF("is_ref", "price")
    val hist = Drift.histogram(withNulls, "price", "is_ref", 100.0, 10)
      .collect()
    assert(hist.map(r => r.getLong(1) + r.getLong(2)).sum === 100L)
    assert(!hist.map(_.getInt(0)).contains(9),
      "nulls must not appear as a top-bin spike")
  }

  test("disjoint windows saturate: KS = 1, PSI large") {
    import spark.implicits._
    import graft.operators.Drift
    val df = ((0 until 500).map(i => (true, 100.0 + i % 7)) ++
      (0 until 500).map(i => (false, 9000.0 + i % 7))).toDF("is_ref", "price")
    val ks = Drift.ksBinned(df, "price", "is_ref", 1000.0, 10).head()
    assert(ks.getDouble(2) === 1.0)
    val psiTotal = Drift.psi(df, "price", "is_ref", 1000.0, 10)
      .head().getDouble(4)
    assert(psiTotal > 1.0, s"saturated PSI should be large, got $psiTotal")
  }
}
