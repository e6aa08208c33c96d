package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{BudgetSelect, Interleave}

/** BudgetSelect + Interleave: the distributed two-phase prefix shapes
  * must EQUAL their single-window spellings row-for-row, and their
  * plans must never collapse the corpus into one window task. */
class BudgetInterleaveSpec extends SparkSuite {

  private def mkScored(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, ((i * 2654435761L) % 97).toDouble / 97.0,
        1L + (i * 40503L) % 50)
    }.toDF("id", "score", "w")
  }

  test("two-phase greedy equals the single-window running sum exactly") {
    val docs = mkScored(500).localCheckpoint(true)
    val got = BudgetSelect.greedy(docs, "id", "score", "w", lit(3000L))
      .select("id", "cum_w", "admitted").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val w = Window.orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = docs.withColumn("cum_w", sum(col("w")).over(w))
      .select(col("id"), col("cum_w"),
        (col("cum_w") - col("w") < 3000L).as("admitted"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expected)
  }

  test("greedy plan has no single-partition exchange feeding a window") {
    val docs = mkScored(500).localCheckpoint(true)
    val plan = BudgetSelect.greedy(docs, "id", "score", "w", lit(3000L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"two-phase prefix sum must not serialize the corpus:\n$plan")
    assert(plan.contains("__bucket"),
      s"expected the bucketed partial window:\n$plan")
  }

  test("degenerate single-score corpus still selects correctly") {
    import spark.implicits._
    val docs = (0 until 50).map(i => (i.toLong, 1.0, 10L))
      .toDF("id", "score", "w").localCheckpoint(true)
    val admitted = BudgetSelect.greedy(docs, "id", "score", "w", lit(100L))
      .filter(col("admitted")).select("id").collect().map(_.getLong(0)).toSet
    // budget 100 / weight 10 = exactly the 10 lowest ids (tiebreak id asc)
    assert(admitted == (0L until 10L).toSet)
  }

  test("hashRank equals the per-source single-window rank") {
    import spark.implicits._
    val docs = (0 until 400)
      .map(i => (i.toLong, s"src${i % 3}")).toDF("id", "src")
      .localCheckpoint(true)
    val got = Interleave.hashRank(docs, "src", "id")
      .select("src", "id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = Window.partitionBy("src")
      .orderBy(md5(col("id").cast("string").cast("binary")), col("id"))
    val expected = docs.withColumn("rn", row_number().over(w).cast("long"))
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("weightedOrder: every Σw-window prefix carries sources in ratio") {
    import spark.implicits._
    val docs = (0 until 300)
      .map(i => (i.toLong, if (i % 3 == 0) "a" else "b")).toDF("id", "src")
    val ord = Interleave.weightedOrder(docs, "src", "id",
        Map("a" -> 3, "b" -> 1))
      .orderBy("pos", "src", "id").select("src").collect().map(_.getString(0))
    // tickets 3:1 -> in any aligned window of 4 consecutive emits after
    // the schedule settles, 'a' appears 3 times ('a' has 100 docs, 'b'
    // 200: while both are live the 3:1 cadence must hold)
    val prefix = ord.take(120)
    val aCount = prefix.count(_ == "a")
    assert(math.abs(aCount - 90) <= 3,
      s"expected ~3:1 interleave in the live prefix, got $aCount/120 a's")
    // positions are exact integers and the full order is deterministic
    val again = Interleave.weightedOrder(docs, "src", "id",
        Map("a" -> 3, "b" -> 1))
      .orderBy("pos", "src", "id").select("src").collect().map(_.getString(0))
    assert(ord.sameElements(again))
  }
}
