package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Integer-arithmetic PageRank: bit-identity with a local reference on a
  * planted graph, partitioning invariance (integer ops are associative,
  * so the distributed fold cannot drift), hub dominance on a star, and
  * a no-cartesian plan pin across the unrolled iterations. */
class PageRankSpec extends SparkSuite {

  /** Local reference with the operator's exact update rule. */
  private def local(edges: Seq[(Long, Long)], iters: Int,
                    scale: Long = 1000000000000L, damp: Long = 85): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = deg.size.toLong
    val base = scale / n
    var score: Map[Long, Long] = deg.map { case (s, _) => s -> base }
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => score(s) / deg(s) }.sum
      }
      score = in.map { case (v, s) => v -> ((100L - damp) * base + damp * s) / 100L }
    }
    score
  }

  /** Symmetric: 0-1-2 triangle, pendant 3-0, isolated pair 4-5. */
  private val planted: Seq[(Long, Long)] = {
    val und = Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L), (4L, 5L))
    und ++ und.map(_.swap)
  }

  test("matches the local integer reference bit-for-bit, any partitioning") {
    import spark.implicits._
    val expect = local(planted, iters = 3)
    for (parts <- Seq(1, 5)) {
      val e = planted.toDF("src", "dst").repartition(parts)
      val got = PageRank.scores(e, "src", "dst", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"parts=$parts: $got vs $expect")
    }
  }

  test("hub of a star out-scores every leaf; scores stay positive and bounded") {
    import spark.implicits._
    val und = (1L to 8L).map(l => (0L, l))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = PageRank.scores(e, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = got(0L)
    (1L to 8L).foreach(l => assert(got(l) < hub, s"leaf $l >= hub"))
    assert(got.values.forall(s => s > 0L && s <= 1000000000000L))
  }

  test("indeg-0 source keeps its teleport mass every round (directed graphs)") {
    import spark.implicits._
    // node 9 points INTO a symmetric triangle but nothing points back at
    // it — legal under the outdeg ≥ 1 contract. A groupBy(dst)-only
    // update would drop it after round 1 (it never appears as a dst).
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val edges = tri ++ tri.map(_.swap) :+ (9L -> 0L)
    val got = PageRank.scores(edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // corrected local reference over the full SOURCE-node set
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = 1000000000000L / deg.size
    var score: Map[Long, Long] = deg.map { case (s, _) => s -> base }
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => score(s) / deg(s) }.sum }
      score = deg.keys.map(v =>
        v -> ((15L * base + 85L * in.getOrElse(v, 0L)) / 100L)).toMap
    }
    assert(got == score, s"$got vs $score")
    assert(got(9L) == 15L * base / 100L,
      "indeg-0 node must hold exactly its teleport term")
    assert(got.keySet == Set(0L, 1L, 2L, 9L),
      "score frame covers the full source-node set every round")
  }

  test("plan pin: iterations are equi-joins and aggregations, never a cartesian") {
    import spark.implicits._
    val e = planted.toDF("src", "dst")
    val plan = PageRank.scores(e, "src", "dst", iters = 3)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("dangling-mass redistribution matches the hand-computed reference " +
    "and conserves mass up to floor loss") {
    import spark.implicits._
    // 1→2 and 3→2: node 2 is a genuine sink. scale=300, N=3, base=100.
    // Round 1: D = score(2) = 100, share = 100 div 3 = 33;
    //   insum(2) = 100 + 100 = 200
    //   score'(1) = score'(3) = (15·100 + 85·33) div 100 = 43
    //   score'(2) = (1500 + 85·(200 + 33)) div 100 = 213
    val e = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val got = PageRank.scoresDangling(e, "src", "dst", iters = 1,
        scale = 300L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 43L, 2L -> 213L, 3L -> 43L))
    // more rounds: the sink never hoards everything (mass keeps cycling
    // back out), totals stay within floor loss of the scale
    val got3 = PageRank.scoresDangling(e, "src", "dst", iters = 3,
        scale = 1000000000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got3.keySet === Set(1L, 2L, 3L))
    assert(got3.values.forall(_ > 0L))
    val total = got3.values.sum
    // floor losses: < 100 per node per div-100, < deg per div-deg, < N
    // per share div, geometrically damped at 0.85 — thousands of scale
    // units against 10^12, never more
    assert(total <= 1000000000000L &&
      total > 1000000000000L - 10000L, s"mass drifted: $total")
  }

  test("scoresDangling on a sink-free symmetric graph stays close to " +
    "scores (no dangling mass to move)") {
    import spark.implicits._
    val e = planted.toDF("src", "dst")
    val a = PageRank.scores(e, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.scoresDangling(e, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b,
      "with zero dangling mass the two updates are identical")
  }
}
