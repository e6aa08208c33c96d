package graft

import org.apache.spark.sql.functions._
import graft.corpus.CorpusPipeline

/** End-to-end corpus curation: stage monotonicity, dedup invariants,
  * split partition, and near-dup collapse on a planted duplicate. */
class CorpusPipelineSpec extends SparkSuite {

  test("portable md5 pair family: exact duplicates collide with " +
    "est_jaccard 1.0; disjoint-vocabulary docs never pair") {
    import spark.implicits._
    // 20 docs with pairwise-disjoint shingle vocabularies + 4 exact
    // duplicates of the first docs under new ids. Exact dups agree on
    // every signature position (est = 1.0, every band collides —
    // guaranteed, not probabilistic); disjoint-vocab docs share no
    // shingle, so a band collision would need a 4-minima md5 collision.
    val base = (0 until 20).map(i =>
      (i.toLong, (0 until 30).map(j => s"tok_${i}_$j").mkString(" ")))
    val dups = (0 until 4).map(i => (100L + i, base(i)._2))
    val docs = (base ++ dups).toDF("doc_id", "text")
    val pairs = graft.operators.MinHashLSH.portablePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      (0 until 4).map(i => (i.toLong, 100L + i)).toSet,
      s"exactly the planted duplicates must pair, got ${pairs.toSeq}")
    assert(pairs.forall(_._3 == 1.0),
      "an exact duplicate's signature agreement must be 1.0")
  }

  test("curate: stages shrink monotonically, output is exact-dup-free, split partitions") {
    val docs = Tables.documents(spark, sf)
    val (curated, stats) = CorpusPipeline.curate(spark, docs,
      langs = Seq("en", "vi", "de", "fr"), minChars = 1, minJaccard = 0.8)
    assert(stats.input >= stats.afterQuality)
    assert(stats.afterQuality >= stats.afterExact)
    assert(stats.afterExact >= stats.afterNear)
    assert(stats.afterNear === stats.train + stats.eval)
    assert(stats.afterNear === curated.count())
    // no two output docs share a content hash
    val dupHashes = curated.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dupHashes === 0)
    // split column is total and binary
    val splits = curated.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "eval")))
  }

  test("planted near-duplicates collapse to one canonical document") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again " * 5
    val docs = Seq(
      (1L, base, "en", "s", base.length.toLong),
      (2L, base + " tail", "en", "s", base.length + 5L), // near-dup of 1
      (3L, "an entirely different document about spark shuffles and joins " * 5,
        "en", "s", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (curated, stats) = CorpusPipeline.curate(spark, docs,
      langs = Seq("en"), minChars = 1, minJaccard = 0.5)
    val kept = curated.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 3L)) // 2 collapsed into 1's cluster
    assert(stats.afterNear === 2)
  }

  test("precomputed full-corpus pairs curate identically to the inline LSH pass") {
    val docs = Tables.documents(spark, sf)
    val params = (Seq("en", "vi", "de", "fr"), 1, 0.8)
    val (inline, statsInline) = CorpusPipeline.curate(spark, docs,
      langs = params._1, minChars = params._2, minJaccard = params._3)
    val full = graft.operators.MinHashLSH.candidatePairs(docs)
    val (shared, statsShared) = CorpusPipeline.curate(spark, docs,
      langs = params._1, minChars = params._2, minJaccard = params._3,
      precomputedPairs = Some(full))
    // candidate membership is per-pair, so restricting the full-corpus
    // pair set to the survivors must reproduce the subset LSH exactly
    assert(statsShared === statsInline)
    val a = inline.select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val b = shared.select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a === b)
  }

  test("leakage-safe split: every near-dup cluster lands WHOLE in one " +
    "split, and a planted pair the per-doc split separates stays together") {
    import spark.implicits._
    // search for a near-dup pair whose two doc ids hash to DIFFERENT
    // sides under the per-doc split — the exact leakage case the
    // grouped split exists to prevent. The base text is shared; the dup
    // flips one word; candidate id pairs are scanned until one splits.
    def docSide(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(1).map("%02x".format(_)).mkString
      if (hex < "cc") "train" else "eval"
    }
    val (a, b) = (0L until 500L).map(i => (i, 1000L + i))
      .find { case (x, y) => docSide(x) != docSide(y) }.get
    // 120 words, one flipped in the middle: J ≈ 115/121 ≈ 0.95 — far
    // above the 13/16 agreement cut for the fixed portable family
    val baseText = (0 until 120).map(j => s"w$j").mkString(" ")
    val dupText = (0 until 120).map(j => if (j == 60) "zq" else s"w$j")
      .mkString(" ")
    val fillers = (2000L until 2020L).map(i =>
      (i, (0 until 40).map(j => s"f${i}_$j").mkString(" ")))
    val docs = (Seq((a, baseText), (b, dupText)) ++ fillers)
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPipeline.leakageSafeSplit(spark, docs,
      langs = Seq("en"), minChars = 1, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byComp = out.groupBy(_._2)
    // invariant: one split per component, everywhere
    byComp.foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"component $c spans splits: ${rows.toSeq}")
    }
    // the planted pair shares a component (near-dups) and therefore a
    // split — though their PER-DOC hashes disagree (non-vacuity)
    val m = out.map(r => r._1 -> (r._2, r._3)).toMap
    assert(docSide(a) != docSide(b),
      "fixture must plant a pair the per-doc split would separate")
    assert(m(a)._1 == m(b)._1, "planted near-dups must share a component")
    assert(m(a)._2 == m(b)._2, "…and therefore a split")
  }

  test("fully-filtered corpus curates to empty without errors") {
    import spark.implicits._
    val docs = Seq((1L, "short", "de", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // lang filter removes the only doc -> every later stage sees 0 rows
    val (curated, stats) = CorpusPipeline.curate(spark, docs,
      langs = Seq("en"), minChars = 1, minJaccard = 0.5)
    assert(curated.count() === 0)
    assert(stats.afterQuality === 0 && stats.afterNear === 0)
  }
}
