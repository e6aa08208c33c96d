package graft

/** Global plan-shape guard: no registered query may plan a
  * CartesianProduct or BroadcastNestedLoopJoin — the all-pairs shapes
  * that kill 100 TB runs — except a short whitelist where the shape is
  * the documented design. A new query (or a refactor of an old one)
  * that regresses into an all-pairs plan fails here immediately instead
  * of surfacing as a bench cliff at scale.
  */
class PlanGuardSpec extends SparkSuite {

  /** Queries whose nested-loop plan is deliberate, with the reason. */
  private val allowedNestedLoop: Map[String, String] = Map(
    "v2_ann_topk" -> ("brute-force exact ANN baseline: broadcast 10-query " +
      "set against one corpus scan — the yardstick the bucketed paths are " +
      "measured against"),
    // v5_ann_ivf left this list in round 9: codebook training and cell
    // assignment moved into the persisted IvfIndex build (train-once),
    // and the query's own 10-row × 8-cell probe crossJoin materializes
    // behind a localCheckpoint — the registered plan is scan + broadcast
    // equi-join + top-k aggregate, no nested loop.
    // rj1_range_join left this list in round 7: the RangeJoinRewrite rule
    // (graft.plans.RangeJoin) now plans its band predicate as a
    // RangeJoinExec (binary search over the broadcast bands), so the
    // query no longer produces a BroadcastNestedLoopJoin at all.
    "p8_outlier_4sigma" -> ("global (mu, sd) stats broadcast back as a " +
      "1-row crossJoin — the no-driver-collect alternative to the " +
      "reference's collect loop; broadcast side is O(1)"),
    "tx17_hybrid_rrf" -> ("dense leg joins the corpus against the ONE " +
      "query embedding as a 1-row broadcast (the p8 shape: O(1) " +
      "broadcast side, one corpus scan into a k-bounded top-k " +
      "aggregate) — the v2 brute-force yardstick pattern with |Q| = 1"),
    "v10_binary_hamming" -> ("the v2 shape with the scan payload cut " +
      "32x: broadcast 10-query set against ONE pass over (nid, 2 " +
      "BIGINT sign words) — XOR+popcount shortlist into the k-bounded " +
      "TopKScored aggregate; the rerank re-joins <= 500 ids by equi-key"),
    "v11_hard_negatives" -> ("the v2 shape with the label inequality " +
      "fused into the broadcast join condition (10 anchors, one corpus " +
      "scan, k-bounded TopKScored) — at index scale the same mining " +
      "runs on the IVF/LSH candidate stream instead"),
    "st3_stream_drift" -> ("the PSI term grid is per-window totals " +
      "crossJoin the broadcast REFERENCE histogram — a static <= 8-row " +
      "frame (the p8 shape); round 12 moved it from a driver-collected " +
      "typedLit literal to the broadcast frame, trading a whitelisted " +
      "tiny cross join for a driver-clean fixture path")
    // dd3_ngram_jaccard left this list in round 5: its zero-overlap pair
    // skeleton is now a rank-explode + equi-join, not a theta join.
  )

  test("no registered query plans an all-pairs join outside the whitelist") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    val unusedWhitelist = scala.collection.mutable.Set(allowedNestedLoop.keys.toSeq: _*)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan =
        try q(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      val bad = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (bad && !allowedNestedLoop.contains(name)) offenders += name
      if (bad) unusedWhitelist -= name
    }
    assert(offenders.isEmpty,
      s"all-pairs plans outside the whitelist: ${offenders.mkString(", ")}")
    // a whitelist entry whose query no longer needs it should be removed
    assert(unusedWhitelist.isEmpty,
      s"stale whitelist entries (no longer nested-loop): ${unusedWhitelist.mkString(", ")}")
  }
}
