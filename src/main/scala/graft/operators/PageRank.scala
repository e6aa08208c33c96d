package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer arithmetic — graph-centrality
  * quality weighting for corpus curation (the harmonic/PageRank signals
  * web-corpus pipelines attach per page), and the engine's canonical
  * ITERATED sparse-matvec shape: each round is one equi-join of the edge
  * list with the current scores on `src` plus one aggregation onto `dst`.
  * Nothing is ever quadratic in nodes; per-round cost is O(|edges|)
  * shuffled on the join key — the same plan GraphX/Pregel lowers to, with
  * Catalyst free to broadcast the score side if it is small.
  *
  * Determinism across engines: scores live in a fixed-point BIGINT domain
  * (`scale` = 10^12). The update is
  *
  *   score'(v) = ((100−d)·base + d·Σ_{u→v} score(u) div deg(u)) div 100
  *
  * with `base = scale div N` and every division an integer floor —
  * positive operands make Spark's truncating `div` and DuckDB's `//`
  * agree bit-for-bit, and integer addition is associative, so the result
  * is independent of partitioning, merge order, and engine. (Float
  * PageRank would drift between partial-agg orders; this one is gated by
  * a full DuckDB replay in gr1's oracle.)
  *
  * Caller contract for [[scores]]: `edges` deduplicated and every node
  * has outdeg ≥ 1 — a symmetric (undirected) edge set satisfies this for
  * free; directed graphs with sinks use [[scoresDangling]], which
  * redistributes dangling mass properly instead. The node set
  * is exactly the SOURCE set, and every round left-joins the in-mass
  * aggregate back onto it, so an indeg-0 node (legal under the contract:
  * it points at others, nothing points at it) keeps receiving its
  * teleport term every round instead of vanishing after round 1 — a
  * groupBy(dst) alone only emits destination nodes. Mass lost to
  * the double floor is deliberate (bounded by N·(100+d)/100 scale units
  * per round — ~10^-7 of total at N=10^6), not redistributed.
  *
  * The edge list and degree frames are `localCheckpoint`ed once: three
  * unrolled iterations reference them 7 times in the final plan, and at
  * 100 TB you persist the edge list anyway (it is the index; scores are
  * the cheap part).
  */
object PageRank {

  /** `edges(src, dst)` → `(node BIGINT, score BIGINT)` after `iters`
    * damped rounds from the uniform start. */
  def scores(edges: DataFrame, src: String, dst: String, iters: Int,
             scale: Long = 1000000000000L, dampPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    val e = edges
      .select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
    // one materialization: the deg-annotated edge list. Both join sides
    // shuffle e on src, so the exchange is planned once and reused —
    // checkpointing e separately would buy nothing and cost an extra
    // write of the whole edge list.
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint() // (src, dst, deg): the per-round join input
    // the node set is referenced every round (the left side of the
    // teleport join); it is |nodes| rows — cheap to pin once
    val nodes = withDeg.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "PageRank over an empty edge set")
    val base = scale / n
    var score = nodes.select(col("node"), lit(base).as("score"))
    for (_ <- 1 to iters) {
      val insum = withDeg
        .join(score.withColumnRenamed("node", "src"), "src")
        .groupBy("dst")
        .agg(sum(expr("score div deg")).as("insum"))
      // left-join onto the FULL node set: indeg-0 nodes get no insum row
      // but must keep their teleport mass (and keep contributing out)
      score = nodes
        .join(insum.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .selectExpr("node",
          s"(${(100L - dampPct) * base} + $dampPct * coalesce(insum, 0L))" +
            " div 100 AS score")
    }
    score
  }

  /** [[scores]] for graphs WITH dangling nodes — proper DANGLING-MASS
    * redistribution instead of the add-self-loops caller contract: the
    * node set is sources ∪ destinations, and each round the sinks'
    * total mass is shared equally (integer floor) across every node as
    * an extra teleport-like addend — the standard PageRank treatment
    * (Page et al. 1999's stochasticity fix), in the same exact BIGINT
    * domain as [[scores]] so DuckDB replays it bit-for-bit:
    *
    *   D       = Σ_{deg(u)=0} score(u)
    *   score'(v) = ((100−d)·base
    *               + d·(Σ_{u→v} score(u) div deg(u) + D div N)) div 100
    *
    * Per-round cost stays one edge equi-join + one dst aggregation,
    * plus an O(|nodes|) semi-join aggregate for D (a 1-row frame
    * cross-joined back — never a driver action). Rounds end in an eager
    * localCheckpoint: D makes each round reference the previous score
    * TWICE, so without the cut the unrolled plan doubles per round.
    *
    * Unlike [[scores]] (one unrolled job, where the planner reuses the
    * edge exchange), the setup here runs SEVERAL eager checkpoint jobs
    * — so `e` itself is checkpointed first: without that cut, the
    * `withDeg` / `nodes` / `dangling` jobs each re-derived the caller's
    * edge frame from scratch (for gr2 that is the whole rare-gram
    * self-join — measured as most of its 1.65 s gap over gr1, r15
    * verdict #4).
    *
    * Precondition: node ids must be NON-NEGATIVE after the long cast —
    * the dangling sentinel is dst = -1. Enforced with a cheap fused
    * aggregate, so violations fail loudly instead of misrouting a real
    * node's in-mass into the dangling sum. */
  def scoresDangling(edges: DataFrame, src: String, dst: String,
                     iters: Int, scale: Long = 1000000000000L,
                     dampPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    val e = edges
      .select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = e.join(deg, "src") // materialized once, inside aug
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    // SENTINEL-EDGE fusion of the dangling-mass aggregate (r15 verdict
    // #4: gr2's per-round dm semi-join branch was a second shuffle of
    // the score frame every round): each dangling node gets one VIRTUAL
    // edge (src = sink, dst = -1, deg = 1), so the round's single
    // edge-join + dst aggregation computes D as the sentinel row's
    // insum — `score div 1` sums the sinks' mass exactly. Non-negative
    // node ids are ENFORCED below (fused into the node-count action),
    // so -1 can't collide; both reads of the aggregate (the sentinel
    // row and the real rows) sit over the SAME exchange, which the
    // planner reuses.
    val dangling = nodes
      .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
    val aug = withDeg.unionByName(dangling.select(
        col("node").as("src"), lit(-1L).as("dst"), lit(1L).as("deg")))
      .localCheckpoint()
    // one action for BOTH the node count and the sentinel-safety guard:
    // dst = -1 is only collision-free if real ids are non-negative, and
    // the public API merely casts to long — a caller with hash-derived
    // ids could legitimately hold -1, whose in-mass would silently merge
    // into the dangling sum (r16 ADVICE). Fused into the count the setup
    // already pays, so the guard costs zero extra jobs.
    val nStats = nodes.agg(count(lit(1)).as("n"), min("node").as("mn")).head()
    val n = nStats.getLong(0)
    require(n > 0, "PageRank over an empty edge set")
    require(!nStats.isNullAt(1) && nStats.getLong(1) >= 0L,
      "scoresDangling requires non-negative node ids: the dangling-mass " +
        s"sentinel is dst = -1 (got min id ${nStats.getLong(1)})")
    val base = scale / n
    var score = nodes.select(col("node"), lit(base).as("score"))
    for (round <- 1 to iters) {
      val agg = aug
        .join(score.withColumnRenamed("node", "src"), "src")
        .groupBy("dst")
        .agg(sum(expr("score div deg")).as("insum"))
      // always exactly one row, zero when the graph has no sinks
      val dm = agg.filter(col("dst") === -1L)
        .agg(coalesce(sum("insum"), lit(0L)).as("dm"))
      score = nodes
        .join(agg.filter(col("dst") =!= -1L)
          .withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(dm)
        .selectExpr("node",
          s"(${(100L - dampPct) * base} + $dampPct * " +
            s"(coalesce(insum, 0L) + dm div ${n}L)) div 100 AS score")
      // plan-growth cut every SECOND round, not every round: one round
      // references `agg` twice, so between cuts the lazy plan carries 4
      // copies of the round join — all over the same exchange, which
      // the planner reuses — while halving the eager job barriers that
      // dominated gr2's gap over gr1 (each localCheckpoint is a full
      // job + |nodes|-row write)
      // (the final round is cut too: a lazy tail re-runs its doubled
      // agg under the caller's action — measured slower, not faster)
      if (round % 2 == 0 || round == iters)
        score = score.localCheckpoint(true)
    }
    score
  }
}
