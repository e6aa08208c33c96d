package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew soak for the boilerplate-heavy dedup paths (the SkewSpec rule —
  * skew-safety MEASURED, not hoped for): dd15's paragraph dedup and
  * dd14's prefix-filter join both claim that a boilerplate element
  * repeated across a large fraction of the corpus cannot pile its
  * occurrences into one task or mint quadratic candidate pairs. Each
  * claim is exercised on a 60k-doc planted corpus at sf0.1-like scale
  * by running the REAL registered queries against a synthetic
  * documents.parquet:
  *
  *   - dd15: one sentence planted in a third of all paragraph rows.
  *     The min-struct canonicalization collapses the hot key MAP-SIDE
  *     (partial agg), so the per-task shuffle-read balance of the whole
  *     query stays bounded — a window partitioned on the hash would put
  *     every hot occurrence into one task (~33% of rows vs a 1/32
  *     mean). Measured via task metrics, plus a no-Window plan pin.
  *   - dd14: one ultra-common trigram planted in half the docs. The
  *     rarest-first prefix cut excludes a maximal-df gram from every
  *     prefix (it ranks last), so the candidate equi-join never sees
  *     its 30k-row posting list and total shuffle volume stays linear
  *     in the gram relation — the hot posting self-joined would emit
  *     ~450M pair rows. Measured as a total-shuffle-records budget,
  *     plus exact output checks (planted near-dup pairs found,
  *     boilerplate-only pairs absent).
  */
class DedupSkewSpec extends SparkSuite {

  private val Docs = 60000L

  /** Write `docs(doc_id, text)` as a documents.parquet table dir so the
    * registered queries run verbatim against the planted corpus. */
  private def asTableDir(tag: String, docs: DataFrame): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_skew_$tag").toString
    docs.write.parquet(s"$dir/documents.parquet")
    dir
  }

  /** Per-task shuffle metrics of everything run inside `body`, with
    * AQE's small-partition coalescing OFF for the duration: at test
    * scale the coalescer deliberately merges every tiny shuffle into
    * one task, which is indistinguishable from the hot-key pile-up this
    * spec exists to detect. (Coalescing never UNsplits a genuinely hot
    * partition at production scale — partitions over the advisory size
    * stay separate — so disabling it here only removes the test-scale
    * confounder, not the property under test.) */
  private def measuringTasks[T](body: => T): (T, Seq[(Long, Long)]) = {
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val oldCoalesce = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try measuringTasksInner(body)
    finally oldCoalesce match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
  }

  private def measuringTasksInner[T](body: => T): (T, Seq[(Long, Long)]) = {
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) acc.add(
          (m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.recordsWritten))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      // the listener bus is async; tasks of a finished job land shortly
      var waited = 0
      var last = -1
      while (waited < 5000 && acc.size != last) {
        last = acc.size; Thread.sleep(200); waited += 200
      }
      (r, acc.toArray(Array.empty[(Long, Long)]).toSeq)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("dd15 paragraph dedup: a boilerplate sentence in HALF of all " +
      "paragraph rows collapses map-side — balanced tasks, no window") {
    // each doc: boilerplate + 1 unique sentence => the hot key holds
    // HALF of the corpus's 120k paragraph rows (60k occurrences)
    val docs = spark.range(Docs).select(col("id").as("doc_id"),
      concat(lit("all your base are belong to us. "),
        expr("concat('unique u', CAST(id AS STRING), " +
          "' body w', CAST(id * 2 AS STRING))"))
        .as("text"))
    val dir = asTableDir("dd15", docs)
    val q = SparkEntry.queries("dd15_paragraph_dedup")(spark, dir)
    assert(!q.queryExecution.executedPlan.toString.contains("Window"),
      "canonicalization must be min-struct aggregation, never a window " +
        "partitioned on the paragraph hash")
    val (rows, tasks) = measuringTasks(q.collect())
    // survival accounting: every doc keeps its unique paragraph; the
    // boilerplate survives exactly once corpus-wide (at doc 0, pos 0)
    assert(rows.length == Docs)
    val kept = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(kept(0L) == 2L, "doc 0 keeps its boilerplate (least (doc,pos))")
    assert(kept.count(_._2 == 1L) == Docs - 1,
      "every other doc loses exactly the boilerplate paragraph")
    assert(rows.forall(_.getLong(1) == 2L), "2 paragraphs per doc")
    // task balance: the hot key reduces to <= #map-partitions rows
    // after partial aggregation, so no task's shuffle read approaches
    // the hot key's 60k occurrences — a window-on-hash plan would put
    // all 60k into ONE task
    val reads = tasks.map(_._1).filter(_ > 0)
    assert(reads.nonEmpty)
    info(s"dd15 task shuffle reads: max=${reads.max} n=${reads.length}")
    assert(reads.max < 40000,
      s"one task read ${reads.max} shuffled records — the hot paragraph " +
        "key is piling into a single task")
  }

  test("dd14 prefix-filter join: an ultra-common trigram in HALF the " +
      "docs never enters a prefix — linear shuffle, exact pairs") {
    // 60k docs: evens/odds pair up as near-dups for the first 200 ids
    // (9 of 10 words shared => 7 of 9 distinct trigrams shared, Jaccard
    // 7/9 >= tau 1/2); every ODD doc past that opens with the same
    // 3-word boilerplate (one maximal-df trigram, ~30k postings)
    val nd = 200L
    val text = expr(
      s"""CASE
         |  WHEN doc_id < $nd AND doc_id % 2 = 0 THEN
         |    concat_ws(' ', transform(sequence(0, 9),
         |      j -> concat('p', CAST(doc_id DIV 2 AS STRING), 'w',
         |                  CAST(j AS STRING))))
         |  WHEN doc_id < $nd THEN
         |    concat(concat_ws(' ', transform(sequence(0, 8),
         |      j -> concat('p', CAST(doc_id DIV 2 AS STRING), 'w',
         |                  CAST(j AS STRING)))), ' odd',
         |      CAST(doc_id AS STRING))
         |  WHEN doc_id % 2 = 0 THEN
         |    concat_ws(' ', transform(sequence(0, 9),
         |      j -> concat('q', CAST(doc_id AS STRING), 'w',
         |                  CAST(j AS STRING))))
         |  ELSE
         |    concat('omni alpha beta ', concat_ws(' ',
         |      transform(sequence(0, 6),
         |        j -> concat('q', CAST(doc_id AS STRING), 'w',
         |             CAST(j AS STRING)))))
         |END""".stripMargin)
    val fixture = spark.range(Docs)
      .select(col("id").as("doc_id"), text.as("text"))
    val dir = asTableDir("dd14", fixture)
    val q = SparkEntry.queries("dd14_prefix_filter_join")(spark, dir)
    val (rows, tasks) = measuringTasks(q.collect())
    // exactly the planted near-dup pairs: (2i, 2i+1) for i < 100 share
    // 7 of 9 distinct trigrams (J = 7/9 >= 1/2); boilerplate-only doc
    // pairs share ONE trigram of 15 (J = 1/15) and must not appear
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until nd / 2).map(i => (2 * i, 2 * i + 1)).toSet
    assert(got == want,
      s"expected exactly the ${nd / 2} planted pairs, got ${got.size}")
    // shuffle budget: gram relation is ~60k docs x <=8 grams ~ 500k
    // rows; every stage is linear in it. The hot trigram's posting list
    // (30k rows) self-joined would emit ~450M rows — any prefix leak
    // blows this budget three orders of magnitude
    val written = tasks.map(_._2).sum
    info(s"dd14 total shuffle-write records: $written")
    assert(written < 6000000L,
      s"total shuffle-write records $written — the hot gram's postings " +
        "are leaking into the candidate join")
  }
}
