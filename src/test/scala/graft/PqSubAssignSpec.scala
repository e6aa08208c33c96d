package graft

import org.apache.spark.sql.functions._
import graft.functions.PqSubAssign

/** Fused PQ subspace assignment: brute-force L2-argmin parity (with
  * the lowest-cid tie rule), pure-projection plan shape, and the null
  * edges (unknown subspace, wrong-length sub-vector). */
class PqSubAssignSpec extends SparkSuite {

  // 3 subspaces with different dims and centroid counts — the shapes
  // build() produces when the last subspace absorbs dim % PqSub and
  // Lloyd iteration drops emptied centroids
  private val book: Seq[(Int, Int, Seq[Double])] = Seq(
    (0, 0, Seq(0.0, 0.0)), (0, 1, Seq(1.0, 0.0)), (0, 2, Seq(0.0, 1.0)),
    (1, 0, Seq(5.0, 5.0)), (1, 3, Seq(-5.0, 5.0)),
    (2, 0, Seq(1.0, 2.0, 3.0)), (2, 1, Seq(3.0, 2.0, 1.0)))

  private def bruteBest(sub: Int, v: Seq[Double]): Option[(Int, Double)] = {
    val cands = book.filter(e => e._1 == sub && e._3.length == v.length)
    if (cands.isEmpty) None
    else {
      val scored = cands.map { case (_, cid, cv) =>
        (cid, v.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum,
          cv.map(x => x * x).sum)
      }
      val m = scored.minBy { case (cid, d2, _) => (d2, cid) }
      Some((m._1, m._3))
    }
  }

  test("argmin matches brute force, ties to the lowest cid") {
    val s = spark
    import s.implicits._
    val rows = (0 until 300).map { i =>
      val sub = i % 3
      val len = if (sub == 2) 3 else 2
      (i.toLong, sub,
        (0 until len).map(j => math.sin(i * 13 + j * 7) * 4).toSeq)
    }
    // a row equidistant from two centroids: (0.5, 0) is d2=0.25 from
    // both cid 0 and cid 1 of subspace 0 — the LOWER cid must win
    val tie = Seq((1000L, 0, Seq(0.5, 0.0)))
    val df = (rows ++ tie).toDF("id", "sub", "svec").localCheckpoint(true)
    val best = PqSubAssign.assignColumn(s, col("sub"), col("svec"), book)
    val out = df.withColumn("b", best)
      .select(col("id"), col("sub"), col("svec"),
        col("b.cid").as("cid"), col("b.cn2").as("cn2"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") &&
      !plan.contains("Window"), s"assignment must be a projection:\n$plan")
    assert(plan.contains("graft_pq_sub_assign"), plan)
    out.collect().foreach { r =>
      val expected = bruteBest(r.getInt(1), r.getSeq[Double](2))
      assert(expected.contains((r.getInt(3), r.getDouble(4))),
        s"id=${r.getLong(0)} sub=${r.getInt(1)}: got (${r.getInt(3)}, ${r.getDouble(4)}), expected $expected")
    }
    val tieRow = out.filter(col("id") === 1000L).head()
    assert(tieRow.getInt(3) === 0, "equidistant tie must pick the lowest cid")
  }

  test("whole-vector encode matches per-sub argmin; rnorm is the " +
    "reconstruction norm") {
    val s = spark
    import s.implicits._
    val rows = (0 until 200).map { i =>
      (i.toLong, (0 until 7).map(j => math.cos(i * 11 + j * 5) * 3).toSeq)
    }
    val df = rows.toDF("id", "emb").localCheckpoint(true)
    val enc = graft.functions.PqEncode.encodeColumn(s, col("emb"), book)
    val out = df.withColumn("e", enc)
      .select(col("id"), col("emb"), col("e.code").as("code"),
        col("e.rnorm").as("rnorm"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"encoding must be a projection:\n$plan")
    assert(plan.contains("graft_pq_encode"), plan)
    out.collect().foreach { r =>
      val v = r.getSeq[Double](1)
      val slices = Seq(v.slice(0, 2), v.slice(2, 4), v.slice(4, 7))
      val expected = slices.zipWithIndex.map { case (sl, sub) =>
        bruteBest(sub, sl).get
      }
      assert(r.getSeq[Int](2) === expected.map(_._1),
        s"id=${r.getLong(0)} code mismatch")
      assert(r.getDouble(3) === math.sqrt(expected.map(_._2).sum),
        s"id=${r.getLong(0)} rnorm mismatch")
    }
  }

  test("encode yields null on wrong length or an emptied subspace") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),                     // length 3 != 7
      (2L, (0 until 7).map(_.toDouble).toSeq)       // fine
    ).toDF("id", "emb").localCheckpoint(true)
    val enc = graft.functions.PqEncode.encodeColumn(s, col("emb"), book)
    val out = df.withColumn("e", enc).select("id", "e").orderBy("id").collect()
    assert(out(0).isNullAt(1) && !out(1).isNullAt(1))
    // a codebook whose middle subspace lost every centroid cannot emit
    // a silently short code — the whole row nulls instead
    val holey = book.filter(_._1 != 1)
    val enc2 = graft.functions.PqEncode.encodeColumn(s, col("emb"), holey)
    val lens = holey.groupBy(_._1).map(_._2.head._3.length).sum
    val df2 = Seq((3L, (0 until lens).map(_.toDouble).toSeq)).toDF("id", "emb")
      .localCheckpoint(true)
    assert(df2.withColumn("e", enc2).select("e").head().isNullAt(0))
  }

  test("unknown subspace and wrong-length sub-vector yield null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 7, Seq(1.0, 2.0)),      // no subspace 7
      (2L, 0, Seq(1.0, 2.0, 3.0)), // subspace 0 is 2-dim
      (3L, 0, Seq(1.0, 2.0))       // fine
    ).toDF("id", "sub", "svec").localCheckpoint(true)
    val best = PqSubAssign.assignColumn(s, col("sub"), col("svec"), book)
    val out = df.withColumn("b", best).select("id", "b").orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1) && !out(2).isNullAt(1))
  }
}
