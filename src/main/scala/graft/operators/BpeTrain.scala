package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-table training (Sennrich et al., ACL 2016) over a weighted
  * word-frequency frame — the tokenizer-FITTING step of an LLM data
  * pipeline (tx3 applies a fixed tokenizer; this learns one).
  *
  * Per round:
  *   1. adjacent-symbol pair stats: one explode over the (word, cnt,
  *      syms) frame + a map-side-combined groupBy — after the initial
  *      corpus aggregation, all work lives on the VOCABULARY frame
  *      (|vocab| rows), never the corpus;
  *   2. argmax merge pick: a 1-row driver pull ordered (count DESC,
  *      pair ASC) — deterministic, bounded (the a14 scalar pattern);
  *   3. merge application: a pure-projection greedy left-to-right fold
  *      over each word's symbol array — no shuffle, no join; the merge
  *      rule is inlined as two string literals.
  *
  * The fold merges non-overlapping occurrences left-to-right ("aaaa"
  * with rule (a,a) → [aa, aa]) — exactly the leftmost-first iterative
  * rewriting BPE specifies; single-pair replace-all is confluent, which
  * is what lets tx19's DuckDB oracle re-train via a recursive CTE and
  * still match symbol-for-symbol.
  *
  * Each round ends in `localCheckpoint` (the ConnectedComponents
  * iteration rule: without it Catalyst re-optimizes the nested plan
  * per round and planning time grows superlinearly).
  *
  * Symbols must be SQL-literal-safe (callers filter words to ^[a-z]+$;
  * merged symbols are concatenations of those).
  */
object BpeTrain {

  final case class Merge(round: Int, a: String, b: String, pairCount: Long) {
    def merged: String = a + b
  }

  /** `words`: (word STRING, cnt BIGINT). Returns the learned merges and
    * the final (word, cnt, syms) tokenization frame. */
  def train(words: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    val (merges, history) = trainHistory(words, rounds)
    (merges, history.last)
  }

  /** [[train]] keeping every round's tokenization frame —
    * `history(0)` is the character split, `history(r)` the state after
    * r merges (what tx20's compression accounting reads). Frames are
    * all localCheckpoint'ed vocabulary-sized tables. */
  def trainHistory(words: DataFrame,
                   rounds: Int): (Seq[Merge], Seq[DataFrame]) = {
    var w = words
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint()
    val history = Seq.newBuilder[DataFrame]
    history += w
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val best = w.select(col("cnt"), explode(expr(
          """transform(sequence(1, size(syms) - 1), i -> named_struct(
            |  'a', element_at(syms, i), 'b', element_at(syms, i + 1)))"""
            .stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("a"), col("b"))
        .limit(1).head()
      val m = Merge(r, best.getString(0), best.getString(1), best.getLong(2))
      merges += m
      w = w.select(col("word"), col("cnt"), expr(
        s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
           |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '${m.a}'
           |      AND x = '${m.b}'
           |    THEN concat(slice(acc, 1, size(acc) - 1), array('${m.merged}'))
           |    ELSE concat(acc, array(x)) END)""".stripMargin).as("syms"))
        .localCheckpoint()
      history += w
    }
    (merges.result(), history.result())
  }
}
