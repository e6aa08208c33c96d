package graft

import java.security.MessageDigest
import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._

/** The round-10 curation extensions — BM25 retrieval (tx15), DSIR
  * importance resampling (sm9), per-source sqrt-cap (cp5) and JL random
  * projection (v9) — each checked against a FROM-SCRATCH Scala
  * recompute (an oracle independent of the Spark plan), plus the plan
  * shapes that make them scale.
  */
class CurationExtSpec extends SparkSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def tokens(text: String): Seq[String] =
    text.trim.replaceAll("\\s+", " ").toLowerCase.split(" ", -1).toSeq

  private lazy val docs: Seq[(Long, String, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq

  // ---------------------------------------------------------------- tx15

  test("tx15_bm25 equals a from-scratch Scala BM25 (all 10 ranks)") {
    val qTerms = Seq("spark", "vector", "merge")
    val toks = docs.map { case (id, text, _, _) => id -> tokens(text) }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
    val tf = toks.flatMap { case (id, ts) =>
      ts.filter(qTerms.contains).groupBy(identity).map {
        case (t, hits) => (id, t, hits.size.toLong)
      }
    }
    val df = tf.groupBy(_._2).map { case (t, rows) => t -> rows.size.toLong }
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val scored = tf.groupBy(_._1).map { case (id, rows) =>
      val s = rows.map { case (_, t, f) =>
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        val raw = idf * (f * 2.2) /
          (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
        BigDecimal(raw).setScale(6, RoundingMode.HALF_UP)
      }.sum
      (id, s.toDouble, rows.size.toLong)
    }.toSeq
    val expected = scored.sortBy { case (id, s, _) => (-s, id) }.take(10)
    val got = SparkEntry.queries("tx15_bm25")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (1 to got.length), "ranks must be 1..k")
    got.zip(expected).foreach { case ((rk, id, s, nt), (eid, es, ent)) =>
      assert(id == eid, s"rank $rk doc mismatch: got $id expected $eid")
      assert(math.abs(s - es) < 1e-9, s"rank $rk score: got $s expected $es")
      assert(nt == ent, s"rank $rk n_terms: got $nt expected $ent")
    }
  }

  test("tx15_bm25 plan: df side broadcast, no all-pairs join") {
    val plan = SparkEntry.queries("tx15_bm25")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the <=|Q|-row df broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"all-pairs shape:\n$plan")
  }

  // ----------------------------------------------------------------- cp5

  test("cp5_source_cap equals a per-source Scala recompute (isolation by construction)") {
    // expected keep-set computed source-by-source, each from that
    // source's rows ALONE — passing proves the draw never depends on
    // other sources' rows.
    val expected = docs.groupBy(_._4).flatMap { case (src, rows) =>
      val nSrc = rows.size.toLong
      val cap = math.ceil(math.sqrt(nSrc.toDouble)).toLong
      rows.map(_._1).sortBy(id => (md5hex(id.toString), id))
        .take(cap.toInt).zipWithIndex
        .map { case (id, i) => (id, src, nSrc, cap, i + 1) }
    }.toSet
    val got = SparkEntry.queries("cp5_source_cap")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(got == expected)
  }

  test("cp5_source_cap trims head sources superlinearly but keeps every source") {
    val out = SparkEntry.queries("cp5_source_cap")(spark, sf).collect()
    val kept = out.groupBy(_.getString(1)).map { case (s, rs) => s -> rs.length }
    val full = docs.groupBy(_._4).map { case (s, rs) => s -> rs.size }
    assert(kept.keySet == full.keySet, "every source keeps representation")
    full.foreach { case (s, n) =>
      assert(kept(s) == math.ceil(math.sqrt(n.toDouble)).toInt)
    }
  }

  test("cp5_source_cap plan: rank via bucketed two-phase windows, count " +
    "via broadcast — never a per-source single-task window") {
    val plan = SparkEntry.queries("cp5_source_cap")(spark, sf)
      .queryExecution.executedPlan.toString
    // the hashRank marker: per-(source, md5-prefix-bucket) windows. A
    // bare Window.partitionBy(source) would put a CommonCrawl-shaped
    // head source's ENTIRE slice through one task.
    assert(plan.contains("__bucket"),
      s"expected Interleave.hashRank's bucketed windows:\n$plan")
    // n_source arrives by broadcast of the |sources|-row aggregate, not
    // a count window over the same skewed per-source partitioning
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.forall(!_.contains("count(1)")),
      s"per-source count must be a broadcast agg, not a window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the broadcast n_source join:\n$plan")
  }

  // ----------------------------------------------------------------- sm9

  test("sm9_dsir equals a from-scratch Scala DSIR recompute") {
    val bucket = (t: String) => {
      val h = md5hex(t)
      (Integer.parseInt(h.substring(30, 32), 16) % 64).toLong
    }
    val toks = docs.flatMap { case (id, text, lang, _) =>
      tokens(text).map(t => (id, lang, bucket(t)))
    }
    val rtot = toks.size.toLong
    val ttot = toks.count(_._2 == "en").toLong
    val rawB = toks.groupBy(_._3).map { case (b, r) => b -> r.size.toLong }
    val tgtB = toks.filter(_._2 == "en").groupBy(_._3)
      .map { case (b, r) => b -> r.size.toLong }
    val lrMicro = rawB.map { case (b, rc) =>
      val tc = tgtB.getOrElse(b, 0L)
      val lr = (math.log((tc + 1).toDouble / (ttot + 64)) -
        math.log((rc + 1).toDouble / (rtot + 64))) * 1e6
      b -> BigDecimal(lr).setScale(0, RoundingMode.HALF_UP).toLong
    }
    val perDoc = toks.groupBy(t => (t._1, t._2)).map { case ((id, lang), rows) =>
      val w = rows.groupBy(_._3).map { case (b, r) =>
        r.size.toLong * lrMicro(b)
      }.sum
      (id, lang, w)
    }.toSeq
    val budget = math.ceil(0.2 * docs.size).toInt
    val expected = perDoc.sortBy { case (id, _, w) => (-w, id) }.take(budget).toSet
    val got = SparkEntry.queries("sm9_dsir")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.size == budget, s"must admit exactly ceil(0.2N)=$budget docs")
    assert(got == expected)
  }

  test("sm9_dsir selection favors target-like documents") {
    // every admitted doc's weight must be >= every rejected doc's weight
    // (the definition of a top-fraction cut), and the admitted set must
    // skew toward the target slice relative to the corpus base rate.
    val out = SparkEntry.queries("sm9_dsir")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val admitted = out.map(_._1).toSet
    val minAdmitted = out.map(_._3).min
    val baseEn = docs.count(_._3 == "en").toDouble / docs.size
    val selEn = out.count(_._2 == "en").toDouble / out.length
    assert(selEn > baseEn,
      s"en share selected=$selEn should exceed base=$baseEn")
    assert(out.forall(_._3 >= minAdmitted))
    assert(admitted.size == out.length)
  }

  test("sm9_dsir plan: no single-partition exchange (BudgetSelect prefix cut)") {
    val plan = SparkEntry.queries("sm9_dsir")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"top-fraction cut must stay distributed:\n$plan")
  }

  // ------------------------------------------------------------------ v9

  test("v9_random_projection sign literals match the md5 spec (engine parity)") {
    // the query inlines Scala-computed signs; the oracle derives them in
    // SQL from md5 — this pins that both derivations agree, via Spark's
    // own md5 expression as the referee.
    import spark.implicits._
    val fromSql = (0 to 63).flatMap(i => (0 to 15).map(j => (i, j)))
      .toDF("i", "j")
      .withColumn("s", when(
        conv(substring(md5(concat(col("i").cast("string"), lit("_"),
          col("j").cast("string"))), 32, 1), 16, 10).cast("long") % 2 === 0,
        1.0).otherwise(-1.0))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    (0 to 63).foreach { i =>
      (0 to 15).foreach { j =>
        val h = MessageDigest.getInstance("MD5")
          .digest(s"${i}_${j}".getBytes("UTF-8"))
        val lit = if ((h(15) & 1) == 0) 1.0 else -1.0
        assert(lit == fromSql((i, j)), s"sign mismatch at ($i,$j)")
      }
    }
  }

  test("v9_random_projection preserves pairwise distances (JL, k=16)") {
    val proj = SparkEntry.queries("v9_random_projection")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3)
      }
    val orig = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keySet.toSeq.sorted.take(101)
    val ratios = ids.zip(ids.tail).map { case (a, b) =>
      val dx = d2(orig(a), orig(b))
      assert(dx > 0, "degenerate pair")
      d2(proj(a), proj(b)) / dx
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.4, s"mean distance ratio $mean")
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      s"tail ratio out of band: ${ratios.min} .. ${ratios.max}")
  }

  test("v9_random_projection plan is a pure per-row projection") {
    val plan = SparkEntry.queries("v9_random_projection")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"projection must not join or aggregate:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1,
      s"only the output-sort range exchange is allowed:\n$plan")
  }
}
