package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixture

/** Round-11 training-data operators: the in-engine Naive Bayes
  * classifier (tx18), the exact prefix-filtering set-similarity join
  * (dd14), and temperature-scaled mixture allocation (sm10). Fixtures
  * are written as `documents.parquet` in a temp dir so the tests
  * exercise the REGISTERED queries end-to-end — the same code path the
  * driver's oracle gate runs. */
class ClassifierMixSpec extends SparkSuite {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cmx").toString
    rows.map { case (id, text, lang) =>
      (id, text, lang, "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---------------------------------------------------------- tx18 NB

  test("tx18: separable planted corpus classifies perfectly") {
    // class A speaks {alpha beta gamma}, class B speaks {delta eps zeta}
    // — unigram NB must recover the labels exactly
    val rows = (0 until 12).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta gamma alpha beta", "aa")
      else (i.toLong, "delta eps zeta delta eps", "bb")
    }
    val dir = writeDocs(rows)
    val out = graft.queries.TextQueries.queries("tx18_nb_classifier")(spark, dir)
      .collect()
    assert(out.length === 12)
    assert(out.forall(_.getAs[Boolean]("correct")))
  }

  test("tx18: scores match an independent local recomputation and are " +
    "invariant to input partitioning") {
    val rows = Seq(
      (0L, "x x y", "p"), (1L, "x y y", "p"),
      (2L, "y z z", "q"), (3L, "z z z", "q"), (4L, "x z y", "p"))
    val dir = writeDocs(rows)
    val out = graft.queries.TextQueries.queries("tx18_nb_classifier")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(3)))).toMap
    // local ground truth: multinomial NB with Laplace smoothing
    val toks = rows.map { case (id, t, l) => (id, l, t.split(" ").toSeq) }
    val classes = Seq("p", "q")
    val cnt = toks.flatMap { case (_, l, ts) => ts.map(l -> _) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tot = classes.map(c => c -> cnt.filter(_._1._1 == c).values.sum).toMap
    val vocab = cnt.keys.map(_._2).toSet.size
    val nd = toks.groupBy(_._2).map { case (k, v) => k -> v.size }
    for ((id, _, ts) <- toks) {
      val scores = classes.map { c =>
        val s = ts.map(t => math.log(
          (cnt.getOrElse((c, t), 0L) + 1).toDouble / (tot(c) + vocab))).sum +
          math.log(nd(c).toDouble / rows.size)
        c -> s
      }
      val (bestC, bestS) = scores.minBy { case (c, s) => (-s, c) }
      val (gotC, gotS) = out(id)
      assert(gotC === bestC, s"doc $id")
      assert(math.abs(gotS - bestS) < 1e-5, s"doc $id score")
    }
    // partitioning invariance: the registered query reads parquet, so
    // rewrite the fixture as many small files
    val s = spark
    import s.implicits._
    rows.map { case (i, t, l) => (i, t, l, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(7)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out2 = graft.queries.TextQueries.queries("tx18_nb_classifier")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    assert(out2.map(r => r._1 -> ((r._2, r._3))).toMap === out)
  }

  // -------------------------------------------- dd14 prefix filtering

  /** Brute-force ground truth: every pair with word-3-shingle Jaccard
    * ≥ 1/2, via the complete gram co-occurrence join (any pair with
    * jac > 0 shares a gram, so this misses nothing). */
  private def bruteTruth(dir: String): Set[(Long, Long)] = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")
          .as("toks"))
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, greatest(size(toks) - 2, 1)), " +
          "i -> md5(concat_ws(' ', toks[i-1], toks[i], toks[i+1])))")))
        .as("g"))
    val sz = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("o")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, o) => 3 * o >= (sz(a) + sz(b)) }
      .map { case (a, b, _) => (a, b) }.toSet
  }

  test("dd14: prefix-filtered result EQUALS brute-force all-pairs at " +
    "the threshold (completeness is provable, not probabilistic)") {
    // planted family: three mutations of one base doc (high overlap),
    // plus unrelated filler
    val base = "spark merge join scan filter table window agg batch " +
      "stream key value row column part hash sort"
    val rows = Seq(
      (1L, base, "en"),
      (2L, base + " extra tail", "en"),
      (3L, "prefix head " + base, "en"),
      (4L, "totally different words entirely unrelated content here " +
        "nothing shared with anyone at all", "en"),
      (5L, "another disjoint document about other things whatsoever " +
        "still sharing zero shingles with peers", "en"))
    val dir = writeDocs(rows)
    val got = graft.queries.DedupExtQueries
      .queries("dd14_prefix_filter_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === bruteTruth(dir))
    assert(got.nonEmpty && got.contains((1L, 2L)))
  }

  test("dd14: matches brute force on the real sf0.001 corpus and " +
    "plans no cartesian/nested-loop join") {
    val q = graft.queries.DedupExtQueries
      .queries("dd14_prefix_filter_join")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(2000))
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === bruteTruth(sf))
  }

  // ------------------------------------------- sm10 temperature mix

  test("temperatureAllocate: quotas sum to the budget and flatten the " +
    "head stratum") {
    val counts = Map("head" -> 6400L, "mid" -> 400L, "tail" -> 100L)
    val q = Mixture.temperatureAllocate(counts, 200)
    assert(q.values.sum === 200)
    // raw share of head = 6400/6900 ≈ 0.93; sqrt share = 80/110 ≈ 0.73
    assert(q("head") < 160, s"head not flattened: $q")
    // tail raw share ≈ 1.4% -> sqrt share 10/110 ≈ 9%
    assert(q("tail") >= 15, s"tail under-represented: $q")
    // exact integer apportionment: floor(w*B/T) with largest remainders
    val w = counts.map { case (k, n) => k -> math.sqrt(n.toDouble).toLong }
    val t = w.values.sum
    assert(q.forall { case (k, v) =>
      v == w(k) * 200 / t || v == w(k) * 200 / t + 1 })
  }

  test("temperatureAllocate: equal strata split evenly; singleton " +
    "stratum takes everything") {
    val e = Mixture.temperatureAllocate(
      Map("a" -> 100L, "b" -> 100L, "c" -> 100L, "d" -> 100L), 100)
    assert(e.values.sum === 100 && e.values.forall(v => v == 25))
    assert(Mixture.temperatureAllocate(Map("only" -> 7L), 50)
      === Map("only" -> 50))
  }

  test("sm10: the registered query draws exactly the temperature " +
    "quotas (capped by stratum size) on sf0.001") {
    val docs = Tables.documents(spark, sf)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val quotas = Mixture.temperatureAllocate(counts, 200)
    val out = graft.queries.SamplingQueries
      .queries("sm10_temperature_mix")(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((l, q) <- quotas)
      assert(out.getOrElse(l, 0L) === math.min(q.toLong, counts(l)),
        s"stratum $l")
  }
}
