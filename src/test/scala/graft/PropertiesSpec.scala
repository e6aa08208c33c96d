package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.transform.Transforms

/** ScalaCheck property tests for the invariants SURVEY.md §5.3 declares:
  * phone-normalizer output shape, avg ∈ [min, max], completeness ∈ [0, 1],
  * dedup keeps exactly one row per key, price banding is total. Generators
  * drive batches through Spark (one job per property batch, not per case).
  * (scalacheck is driven directly — the scalatestplus bridge isn't in the
  * offline artifact cache.) */
class PropertiesSpec extends SparkSuite {
  import org.scalacheck.Test.Parameters
  private val params = Parameters.default.withMinSuccessfulTests(15)

  private def check(p: Prop, ps: Parameters = params): Unit = {
    val res = org.scalacheck.Test.check(ps, p)
    assert(res.passed, res.status.toString)
  }

  private val noisyPhoneGen: Gen[String] = for {
    digits <- Gen.chooseNum(0, 14)
    body <- Gen.listOfN(digits, Gen.numChar).map(_.mkString)
    noise <- Gen.oneOf("", "-", " ", "()", "+84", "abc")
    lead <- Gen.oneOf("0", "", "9")
  } yield s"$noise$lead$body"

  test("phone normalizer output is empty or ^0\\d{9,10}$") {
    import spark.implicits._
    check(forAll(Gen.listOfN(20, noisyPhoneGen)) { phones =>
      phones.isEmpty || {
        val out = Transforms.standardizePhoneNumbers(
          phones.toDF("phone"), "phone").collect().map(_.getString(0))
        out.forall(p => p.isEmpty || p.matches("^0\\d{9,10}$"))
      }
    })
  }

  test("guarded average lies within [min, max] when both present") {
    import spark.implicits._
    val pairGen = for {
      a <- Gen.chooseNum(1e6, 1e12)
      b <- Gen.chooseNum(1e6, 1e12)
    } yield (math.min(a, b), math.max(a, b))
    check(forAll(Gen.listOfN(20, pairGen)) { pairs =>
      pairs.isEmpty || {
        val df = pairs.toDF("min_selling_price", "max_selling_price")
          .withColumn("min_unit_price", lit(null).cast("double"))
          .withColumn("max_unit_price", lit(null).cast("double"))
          .withColumn("min_rent_price", lit(null).cast("double"))
          .withColumn("max_rent_price", lit(null).cast("double"))
        Transforms.calculateAveragePrices(df)
          .select("min_selling_price", "avg_selling_price", "max_selling_price")
          .collect().forall { r =>
            r.getDouble(1) >= r.getDouble(0) && r.getDouble(1) <= r.getDouble(2)
          }
      }
    })
  }

  test("price banding is total: every double lands in exactly one band") {
    import spark.implicits._
    val bands = Set("Under 1B", "1B-3B", "3B-5B", "5B-10B", "Over 10B", "Unknown")
    check(forAll(Gen.listOfN(20,
      Gen.oneOf(Gen.chooseNum(-1e12, 1e12), Gen.const(Double.NaN)))) { vs =>
      vs.isEmpty || {
        Transforms.categorizePriceRange(vs.toDF("avg_selling_price"))
          .collect().forall(r => bands.contains(r.getString(1)))
      }
    })
  }

  test("keep-latest dedup leaves exactly one row per (spider, key)") {
    import spark.implicits._
    val rowGen = for {
      spider <- Gen.oneOf("chotot_api", "meeyproject_api", "onehousing_api")
      key <- Gen.chooseNum(1, 5).map(i => s"k$i")
      ts <- Gen.chooseNum(1, 28).map(d => f"2025-01-$d%02d 10:00:00")
    } yield (spider, key, ts)
    check(forAll(Gen.listOfN(30, rowGen)) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("spider_name", "source_id", "ingested_at_utc")
          .withColumn("ingested_at_utc", to_timestamp(col("ingested_at_utc")))
        val deduped = graft.silver.SilverEtl.dedupLatest(df)
        val keys = rows.map(r => (r._1, r._2)).distinct.size
        deduped.count() == keys &&
          deduped.groupBy("spider_name", "record_key").count()
            .filter(col("count") > 1).count() == 0
      }
    })
  }

  test("MinHash estimate of identical documents is 1.0") {
    // two byte-identical docs must collide in every band and estimate 1.0
    import spark.implicits._
    check(forAll(Gen.alphaLowerStr.suchThat(_.length > 10)) { text =>
      val body = s"$text the quick brown fox jumps over the lazy dog again and again"
      val dir = java.nio.file.Files.createTempDirectory("prop_mh").toString
      Seq((0L, body, "en", "src0", body.length.toLong),
          (1L, body, "en", "src0", body.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val pairs = graft.operators.MinHashLSH.candidatePairs(
        Tables.documents(spark, dir)).collect()
      pairs.length == 1 && pairs.head.getAs[Double]("est_jaccard") == 1.0
    }, params.withMinSuccessfulTests(3))
  }

  test("connected components match a local union-find on random graphs") {
    import spark.implicits._
    val graphGen = for {
      n <- Gen.chooseNum(2, 12)
      m <- Gen.chooseNum(0, 14)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(1, n); b <- Gen.chooseNum(1, n) if a != b
      } yield (a.toLong, b.toLong))
    } yield (n, edges)
    check(forAll(graphGen) { case (n, edges) =>
      // local union-find ground truth
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (1 to n).map(v => v.toLong -> find(v).toLong).toMap
      val vertices = (1L to n.toLong).toDF("id")
      val edf = if (edges.isEmpty)
        Seq.empty[(Long, Long)].toDF("src", "dst")
      else edges.toDF("src", "dst")
      val got = graft.operators.ConnectedComponents.run(vertices, edf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }, Parameters.default.withMinSuccessfulTests(8))
  }

  test("as-of join agrees with per-row linear scan on random series") {
    import spark.implicits._
    val seriesGen = for {
      leftTs <- Gen.listOfN(8, Gen.chooseNum(0L, 30L))
      rightTs <- Gen.listOfN(5, Gen.chooseNum(0L, 30L))
    } yield (leftTs.zipWithIndex, rightTs.distinct)
    check(forAll(seriesGen) { case (lefts, rights) =>
      val left = lefts.map { case (t, i) => (1L, t, i.toLong) }.toDF("k", "t", "eid")
      val right = rights.map(t => (1L, t, s"p$t")).toDF("k", "t", "payload")
      val got = graft.operators.AsOfJoin
        .backward(left, right, "k", "k", "t", "t", Seq("payload"))
        .collect().map(r => r.getLong(2) -> Option(r.getString(3))).toMap
      val expected = lefts.map { case (t, i) =>
        val cands = rights.filter(_ <= t)
        i.toLong -> (if (cands.isEmpty) None else Some(s"p${cands.max}"))
      }.toMap
      got == expected
    }, Parameters.default.withMinSuccessfulTests(8))
  }

  test("Misra–Gries: per-partition + summed-merge bounds on random streams") {
    // merging per-partition summaries by summation must obey
    // est ≤ exact and est ≥ exact − N/(k+1) for EVERY token, on any
    // stream and any partition split — the contract the a19 oracle gate
    // asserts on real data. Pure-JVM: drives mgSummarize directly.
    val tokGen = Gen.frequency(
      (5, Gen.oneOf("a", "b", "c", "d")),
      (2, Gen.choose(0, 500).map("t" + _)))
    val caseGen = for {
      toks <- Gen.listOfN(400, tokGen)
      k <- Gen.chooseNum(1, 8)
      nParts <- Gen.chooseNum(1, 5)
    } yield (toks, k, nParts)
    check(forAll(caseGen) { case (toks, k, nParts) =>
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size
      val chunk = math.max(1, n / nParts)
      val merged = toks.grouped(chunk).toList
        .flatMap(p => graft.operators.HeavyHitters.mgSummarize(p.iterator, k))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      exact.forall { case (t, ex) =>
        val e = merged.getOrElse(t, 0L)
        e <= ex && e.toDouble >= ex - n.toDouble / (k + 1)
      }
    })
  }

  test("quantile samples: emitted ranks are exact order statistics, top rank = n") {
    val caseGen = for {
      xs <- Gen.listOfN(300, Gen.chooseNum(-1e6, 1e6))
      eps <- Gen.chooseNum(0.01, 0.3)
    } yield (xs, eps)
    check(forAll(caseGen) { case (xs, eps) =>
      val sorted = xs.sorted
      val s = graft.operators.QuantileSketch
        .summarizePartition(xs.iterator, eps).toList
      s.nonEmpty && s.last._2 == xs.size &&
        s.forall { case (v, r) =>
          sorted(r.toInt - 1) == v && sorted.count(_ <= v) >= r
        }
    })
  }
}
