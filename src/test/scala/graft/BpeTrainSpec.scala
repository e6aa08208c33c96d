package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrain

/** BPE training: merge-for-merge identity with a local reference
  * (including the overlapping-pair fold semantics: "aaaa" + (a,a) →
  * [aa, aa]), hand-computed merges on a planted vocabulary with a tie,
  * partitioning invariance, and final-tokenization correctness. */
class BpeTrainSpec extends SparkSuite {

  /** Local reference: identical update rule and greedy fold. */
  private def local(words: Map[String, Long], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, List[String]]) = {
    var toks: Map[String, List[String]] = words.map { case (w, _) => w -> w.map(_.toString).toList }
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, s) <- toks; i <- 0 until s.length - 1)
        pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + words(w)
      val ((a, b), c) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      merges += ((a, b, c))
      toks = toks.map { case (w, s) =>
        w -> s.foldLeft(List.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b)
            acc.init :+ (a + b)
          else acc :+ x
        }
      }
    }
    (merges.result(), toks)
  }

  private def run(words: Map[String, Long], rounds: Int, parts: Int) = {
    import spark.implicits._
    val df = words.toSeq.toDF("word", "cnt").repartition(parts)
    BpeTrain.train(df, rounds)
  }

  test("hand-computed merges on a planted vocabulary, tie broken pair-ascending") {
    // "abab"×10: pairs (a,b)=20, (b,a)=10; "abc"×5 adds (a,b)=5, (b,c)=5.
    // Round 1 must pick (a,b)=25. After merge: ab ab / ab c →
    // (ab,ab)=10, (ab,c)=5 → round 2 picks (ab,ab)=10.
    val words = Map("abab" -> 10L, "abc" -> 5L)
    val (merges, _) = run(words, 2, 3)
    assert(merges.map(m => (m.a, m.b, m.pairCount)) ==
      Seq(("a", "b", 25L), ("ab", "ab", 10L)))
  }

  test("overlapping pairs fold left-greedily: aaaa -> [aa, aa]") {
    val (merges, toks) = run(Map("aaaa" -> 1L), 1, 1)
    assert(merges.head.a == "a" && merges.head.b == "a" &&
      merges.head.pairCount == 3L)
    val syms = toks.select("syms").head().getSeq[String](0)
    assert(syms == Seq("aa", "aa"))
  }

  test("each a!=b merge removes exactly its pair count from the token total") {
    import spark.implicits._
    // no self-pair (a,a) candidates can win here: with a == b the pair
    // COUNT includes overlapping occurrences the fold can't all merge,
    // so the exact-drop identity is an a != b property
    val words = Map("spark" -> 7L, "parse" -> 11L, "park" -> 2L,
      "banana" -> 6L)
    val df = words.toSeq.toDF("word", "cnt")
    val (merges, history) = BpeTrain.trainHistory(df, 3)
    def tot(f: org.apache.spark.sql.DataFrame): Long =
      f.agg(sum(col("cnt") * size(col("syms")))).head().getLong(0)
    val totals = history.map(tot)
    merges.zipWithIndex.foreach { case (m, i) =>
      assert(m.a != m.b, s"fixture let a self-pair win: $m")
      assert(totals(i) - totals(i + 1) == m.pairCount,
        s"round ${m.round}: ${totals(i)} -> ${totals(i + 1)} vs ${m.pairCount}")
    }
  }

  test("matches the local reference on a mixed vocabulary, any partitioning") {
    val words = Map("spark" -> 7L, "shark" -> 5L, "sparse" -> 3L,
      "parse" -> 11L, "park" -> 2L, "aaaa" -> 4L, "banana" -> 6L)
    val (refMerges, refToks) = local(words, 3)
    for (parts <- Seq(1, 5)) {
      val (merges, toks) = run(words, 3, parts)
      assert(merges.map(m => (m.a, m.b, m.pairCount)) == refMerges,
        s"parts=$parts")
      val got = toks.collect()
        .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
      assert(got == refToks, s"parts=$parts")
    }
  }
}
