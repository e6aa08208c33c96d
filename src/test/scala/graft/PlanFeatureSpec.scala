package graft

import org.apache.spark.sql.functions._

/** Scale-path plan features the engine leans on at 100 TB, pinned so a
  * conf or upgrade regression surfaces here instead of as a cluster
  * bench cliff:
  *
  *  - runtime bloom-filter injection (`InjectRuntimeFilter`): a
  *    selective dim-side predicate becomes a bloom probe on the fact
  *    side of a shuffle join, pruning fact rows BEFORE the shuffle.
  *    The rule is threshold-gated (creation side under
  *    `...bloomFilter.creationSideThreshold`, application-side scan
  *    over `...bloomFilter.applicationSideScanSizeThreshold`, default
  *    10 GB — far above sf0.1, which is why the thresholds are lowered
  *    here: at the 100 TB target the defaults fire on their own);
  *  - `WindowGroupLimit`: the rank-filter top-n pattern (w2) prunes to
  *    k rows per group BEFORE the full window sort, so a top-10 over a
  *    100 TB partition never materializes the whole group.
  */
class PlanFeatureSpec extends SparkSuite {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a runtime bloom filter on the fact side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join shape
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val dim = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the probe is semantically free: result matches the plain join
      val got = joined.collect().head
      val want = fact.join(
          spark.read.parquet(s"$sf/orders.parquet")
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey").as("ok2")),
          col("l_orderkey") === col("ok2"))
        .agg(count(lit(1)), sum("l_quantity")).collect().head
      assert(got.getLong(0) === want.getLong(0))
      assert(got.getDouble(1) === want.getDouble(1))
    }
  }

  test("w2's rank<=k filter plans a WindowGroupLimit (per-group prune before the sort)") {
    val df = SparkEntry.queries("w2_rank_topn")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-n window lost its group-limit prune:\n$plan")
  }

  test("v7's ADC scan is compressed-domain: cell-pruned, embedding column " +
       "never read") {
    // the IVF-PQ claim is an IO claim — the candidate-generation scan
    // reads (vec_id, code, rnorm) from nprobe cell directories and the
    // 64-double embedding column stays on disk. A column reference
    // sneaking into the ADC phase (or a filter shape change that stops
    // partition pruning) silently turns the query back into a full
    // vector scan; pin both plan features here.
    val df = SparkEntry.queries("v7_ann_ivfpq")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val cellScans = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("code:array"))
      .toSeq
    assert(cellScans.nonEmpty, s"no code-column scan found:\n$plan")
    cellScans.foreach(l =>
      assert(!l.contains("emb:"),
        s"ADC scan reads the raw embedding column:\n$l"))
    assert(plan.contains("PartitionFilters: [cell"),
      s"cell partition pruning lost:\n$plan")
    // the rerank scan DOES read emb — but only that scan
    assert(plan.linesIterator.exists(l =>
      l.contains("ReadSchema") && l.contains("emb:")),
      s"exact-rerank vector scan missing:\n$plan")
  }

  test("sw2's funnel shuffles the event stream once: at most 4 Exchanges, " +
       "event-type filter pushed to the scan") {
    // the r12 plan ran one filtered agg + one equi-join per stage —
    // 9 Exchanges for 3 stages. The chained-window spelling pays one
    // user_id Exchange for all three greedy anchors plus the final
    // single-partition report agg; a regression back to per-stage
    // shuffles surfaces here.
    val df = SparkEntry.queries("sw2_funnel")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange"))
    assert(exchanges <= 4, s"sw2 shuffled $exchanges times:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("In(event_type"),
      s"event-type filter not pushed to the scan:\n$plan")
  }
}
