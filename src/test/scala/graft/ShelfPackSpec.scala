package graft

import org.apache.spark.sql.functions._
import graft.operators.ShelfPack

/** Whole-document shelf packing: hand-checked placements, the
  * never-overflow guarantee, the >50%-utilization shelf bound on full
  * bins, oversize handling, and partitioning invariance (placement is a
  * pure function of (class, rank) in exact integer arithmetic). */
class ShelfPackSpec extends SparkSuite {

  private val Capacity = 10L

  private def docsOf(tokens: Seq[Long]) = {
    import spark.implicits._
    tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "n_tokens")
  }

  test("hand-checked placements: classes, bins, slots, overflow") {
    // tokens: 10,10 -> class 1 (1/bin); 4,4,4 -> class 2 (2/bin);
    // 3,3,3,3 -> class 3 (3/bin); 12 -> overflow
    val p = ShelfPack.placements(
      docsOf(Seq(10L, 10L, 4L, 4L, 4L, 3L, 3L, 3L, 3L, 12L)),
      "doc_id", "n_tokens", Capacity)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    val B = 1L << 40
    assert(p(0L) === ((1L, 1L * B + 0L, 0L, false)))
    assert(p(1L) === ((1L, 1L * B + 1L, 0L, false)))
    assert(p(2L) === ((2L, 2L * B + 0L, 0L, false)))
    assert(p(3L) === ((2L, 2L * B + 0L, 1L, false)))
    assert(p(4L) === ((2L, 2L * B + 1L, 0L, false)))
    assert(p(5L) === ((3L, 3L * B + 0L, 0L, false)))
    assert(p(6L) === ((3L, 3L * B + 0L, 1L, false)))
    assert(p(7L) === ((3L, 3L * B + 0L, 2L, false)))
    assert(p(8L) === ((3L, 3L * B + 1L, 0L, false)))
    assert(p(9L) === ((0L, 0L, 0L, true)))
  }

  test("no bin ever exceeds capacity; full bins clear the 50% shelf " +
    "bound; every doc placed exactly once") {
    import spark.implicits._
    // adversarial mix of sizes 1..10 plus oversize
    val tokens = (1 to 200).map(i => (i % 10 + 1).toLong) ++
      Seq(25L, 30L)
    val docs = docsOf(tokens)
    val p = ShelfPack.placements(docs, "doc_id", "n_tokens", Capacity)
    assert(p.count() === tokens.length.toLong)
    assert(p.select("doc_id").distinct().count() === tokens.length.toLong)
    val report = ShelfPack.binReport(p, "n_tokens", Capacity)
      .collect()
    report.filter(!_.getAs[Boolean]("overflow")).foreach { r =>
      assert(r.getAs[Long]("fill_tokens") <= Capacity,
        s"bin ${r.getAs[Long]("bin_id")} overfilled: $r")
    }
    // full bins (n_docs == size_class) are > capacity/2 utilized
    report.filter(r => !r.getAs[Boolean]("overflow") &&
      r.getAs[Long]("n_docs") === r.getAs[Long]("size_class"))
      .foreach { r =>
        assert(r.getAs[Long]("fill_tokens") * 2 > Capacity,
          s"full bin under the shelf bound: $r")
      }
    // oversize docs: one per bin, flagged
    val over = p.filter(col("overflow")).collect()
    assert(over.length === 2)
    assert(over.map(_.getAs[Long]("bin_id")).distinct.length === 2)
  }

  test("placements are partitioning-invariant") {
    val tokens = (1 to 300).map(i => (i % 13 + 1).toLong)
    def run(parts: Int) = ShelfPack.placements(
        docsOf(tokens).repartition(parts), "doc_id", "n_tokens", 16L)
      .select("doc_id", "size_class", "bin_id", "slot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(run(1) === run(7))
  }

  test("non-integral token column refused loudly") {
    import spark.implicits._
    val bad = Seq((1L, 2.5)).toDF("doc_id", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      ShelfPack.placements(bad, "doc_id", "n_tokens", Capacity)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("null/non-positive tokens refused by default; dropInvalid opts in") {
    import spark.implicits._
    val mixed = Seq((1L, Some(4L)), (2L, Some(0L)), (3L, None), (4L, Some(3L)))
      .toDF("doc_id", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      ShelfPack.placements(mixed, "doc_id", "n_tokens", Capacity)
    }
    assert(e.getMessage.contains("dropInvalid"))
    val p = ShelfPack.placements(mixed, "doc_id", "n_tokens", Capacity,
      dropInvalid = true)
    assert(p.select("doc_id").collect().map(_.getLong(0)).sorted
      === Array(1L, 4L))
  }
}
