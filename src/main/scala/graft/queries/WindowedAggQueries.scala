package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Event-time windowed aggregations over the events table — the batch
  * equivalents of the StreamingOps windows (same `window()` operator
  * Catalyst uses under a watermark), registered so the capability is
  * oracle-checked. */
object WindowedAggQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // tumbling 1h windows: count + exact decimal sum per (window, type)
    "st1_tumbling_window" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy("win_start", "event_type")),

    // sliding 2h windows every 1h: each event lands in two windows
    "st2_sliding_window" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"))
        .orderBy("win_start", "event_type")),

    // st1 ACTUALLY STREAMED: the same tumbling aggregation through a
    // two-micro-batch FILE SOURCE into a complete-mode memory sink —
    // window state must carry across micro-batches to reproduce the
    // batch result, and the SAME oracle gates both forms. The fixture
    // is driver-clean: events written once as two parquet files,
    // streamed back one file per trigger (see fileSource).
    "st1b_stream_tumbling" -> ((s, d) => {
      val src = fileSource(s, d, "st1b",
        events(s, d).select(col("ts"), col("event_type"), col("value")))
      val sink = s"st1b_sink_${StreamSinkSeq.incrementAndGet()}"
      runAvailableNow(src
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete"))
      s.table(sink).orderBy("win_start", "event_type")
    }),

    // ST8: STREAMING HLL distinct — the last sketch joins the streaming
    // family (st4 CM, st6 quantiles, st7 MG): a complete-mode
    // aggregation whose per-group state is the Datasketches HLL binary
    // itself (hll_sketch_agg — registers, never the live key set), with
    // the cross-group union (a14's mergeability proof) running over the
    // bounded sink frame after the stream. Gate: a14's oracle VERBATIM
    // — per-priority exact distincts + the merged-estimate boolean.
    "st8_stream_hll" -> ((s, d) => {
      val o = graft.Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_custkey"))
      val src = fileSource(s, d, "st8", o)
      val sink = s"st8_sink_${StreamSinkSeq.incrementAndGet()}"
      runAvailableNow(src
        .groupBy("o_orderpriority")
        .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete"))
      val sk = s.table(sink).localCheckpoint(true)
      val exact = o.groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      val per = sk.join(broadcast(exact), Seq("o_orderpriority"))
        .select(col("o_orderpriority").as("scope"), col("n_exact"),
          expr("hll_sketch_estimate(sk)").as("est"))
      val globalExact = o.agg(countDistinct(col("o_custkey")))
        .head().getLong(0)
      val merged = sk
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        .select(lit("ALL_MERGED").as("scope"),
          lit(globalExact).as("n_exact"), col("est"))
      per.unionByName(merged)
        .select(col("scope"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("est_within_5pct"))
        .orderBy("scope")
    }),

    // ST7: STREAMING heavy hitters — the Misra–Gries member joins st4
    // (count-min) and st6 (quantiles): per micro-batch, one bounded MG
    // summary frame (≤ partitions·k rows) accumulates via foreachBatch;
    // summaries merge by plain SUMMATION (Agarwal et al. mergeability),
    // and the error bound sums to Σ N_batch/(k+1) = N/(k+1) — a19's
    // bound for the whole stream, so a19's oracle gates VERBATIM. State
    // never holds the live vocabulary: ≤ batches·partitions·k rows.
    "st7_stream_heavy_hitters" -> ((s, d) => {
      val k = 64
      // stream DOCUMENTS, tokenize in-stream (the realistic shape — raw
      // documents arrive, the engine tokenizes executor-side)
      val src = fileSource(s, d, "stdocs",
        graft.Tables.documents(s, d).select(col("text")))
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.DataFrame]
      runAvailableNow(src.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val toks = batch
            .select(explode(split(trim(col("text")), "\\s+")).as("token"))
            .filter(length(col("token")) > 0)
          buf.synchronized {
            buf += graft.operators.HeavyHitters
              .approxCounts(toks, "token", k).localCheckpoint(true)
          }
          ()
        })
      val merged = buf.synchronized(buf.reduce(_.unionByName(_)))
        .groupBy("token").agg(sum("est").as("est"))
        .localCheckpoint(true)
      // a19's gate body over the streamed summary (r17: n + top-10 from
      // ONE persisted vocab-sized aggregate — one verify-side tokenize
      // pass, was two)
      val toks = graft.Tables.documents(s, d)
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      val grouped = toks.groupBy("token")
        .agg(count(lit(1)).as("n_exact"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = grouped.agg(coalesce(sum("n_exact"), lit(0L)))
        .head().getLong(0)
      val bound = n.toDouble / (k + 1)
      val exactTop = grouped
        .orderBy(col("n_exact").desc, col("token"))
        .limit(10)
      exactTop.join(broadcast(merged), Seq("token"), "left")
        .select(col("token"), col("n_exact"),
          (coalesce(col("est"), lit(0L)) <= col("n_exact")).as("est_le_exact"),
          (coalesce(col("est"), lit(0L)).cast("double") >=
            col("n_exact").cast("double") - lit(bound)).as("est_within_bound"))
        .orderBy(col("n_exact").desc, col("token"))
    }),

    // ST6: STREAMING ε-quantile sketch — the quantile member goes
    // streaming like the count-min (st4): each micro-batch contributes
    // its rank-spaced tagged samples (pids offset into a per-batch
    // namespace), accumulated as bounded checkpointed frames via
    // foreachBatch; ONE merge at read time serves the quantiles. The
    // rank-error bound is Σ per-summary ε·N_summary = ε·N no matter how
    // many batches contributed, so the gate is a20's oracle VERBATIM —
    // streaming costs nothing but more summary rows through the same
    // two-phase merge. (Fixture collect bounded by the gate's orders
    // table, as in st1b.)
    "st6_stream_quantile" -> ((s, d) => {
      import s.implicits._
      val ep = 0.01
      val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
      val o = graft.Tables.orders(s, d).select(col("o_totalprice").as("price"))
      val src = fileSource(s, d, "st6", o)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.DataFrame]
      runAvailableNow(src.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          buf.synchronized {
            buf += graft.operators.QuantileSketch
              .taggedSamples(batch, "price", ep)
              .withColumn("pid",
                col("pid") + lit(((batchId + 1) * 100000).toInt))
              .localCheckpoint(true)
          }
          ()
        })
      val tagged = buf.synchronized(buf.reduce(_.unionByName(_)))
        .localCheckpoint(true)
      val est = graft.operators.QuantileSketch
        .quantilesFromMerged(
          graft.operators.QuantileSketch.mergeTagged(tagged), qs)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      // a20's duplicate-safe rank-interval gate, one aggregation pass —
      // with a20's r15 single-array-percentile buffer (5 independent
      // percentile aggregates were the measured dominant cost)
      val rankCols =
        qs.map(qq => sum(when(col("price") < est(qq), 1L).otherwise(0L))
          .as(s"lo$qq")) ++
          qs.map(qq => sum(when(col("price") <= est(qq), 1L).otherwise(0L))
            .as(s"hi$qq")) :+
          percentile(col("price"), array(qs.map(lit(_)): _*)).as("ps") :+
          count(lit(1)).as("n")
      val row = o.agg(rankCols.head, rankCols.tail: _*)
        .withColumn("ps", expr("transform(ps, x -> round(x, 4))"))
        .head()
      val n = row.getAs[Long]("n")
      val ps = row.getAs[scala.collection.Seq[Double]]("ps")
      val tol = 2 * ep * n
      val out = qs.zipWithIndex.map { case (qq, i) =>
        val (lo, hi) = (row.getLong(i), row.getLong(i + qs.size))
        (qq, ps(i),
          lo.toDouble <= qq * n + tol && hi.toDouble >= qq * n - tol)
      }
      out.toDF("q", "exact_q", "sketch_rank_ok").orderBy("q")
    }),

    // ST5: STREAMING session windows — sw1's 12-hour-gap sessionization
    // as an always-on stream (the st1b twin for SESSION windows: state
    // is the engine's session-window store, sessions MERGE across
    // micro-batch boundaries when a later epoch bridges two earlier
    // fragments). Two epochs split mid-corpus, complete mode; gated by
    // sw1's gaps-and-islands ORACLE VERBATIM — the streamed session
    // store must reproduce the batch semantics exactly. (Fixture
    // collect bounded by the gate's events table, as in st1b.)
    "st5_stream_session" -> ((s, d) => {
      val src = fileSource(s, d, "st5",
        events(s, d).select(col("ts"), col("user_id"), col("value")))
      val sink = s"st5_sink_${StreamSinkSeq.incrementAndGet()}"
      runAvailableNow(src
        .groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double")
            .as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("n_events"), col("sum_value"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete"))
      s.table(sink).orderBy("user_id", "session_start")
    }),

    // ST4: STREAMING count-min sketch — the frequency-sketch member of
    // the streaming family (st1b windows, st3 drift). Count-min cells
    // are LINEAR in the input multiset, so the running sketch over an
    // unbounded token stream is nothing more than a complete-mode
    // streaming aggregation whose state is the d×w cell grid — bounded
    // at 4×512 rows FOREVER, regardless of stream length or vocabulary
    // (contrast a streaming groupBy(token): state = live vocabulary).
    // After two micro-batch epochs the sink IS the whole-corpus sketch,
    // bit-identical to a22's batch build (same deterministic md5 cells),
    // so this query probes it with a22's estimate path and is gated by
    // a22's ORACLE SQL VERBATIM — the streaming execution can never
    // silently diverge from the batch spelling. Documents stream from
    // the file fixture and tokenize IN-STREAM, executor-side — the
    // realistic shape.
    "st4_stream_countmin" -> ((s, d) => {
      val (depth, width) = (4, 512)
      val toks = graft.Tables.documents(s, d)
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      val src = fileSource(s, d, "stdocs",
        graft.Tables.documents(s, d).select(col("text")))
      val sink = s"st4_sink_${StreamSinkSeq.incrementAndGet()}"
      val streamToks = src
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      runAvailableNow(graft.operators.CountMin
        .sketch(streamToks, "token", depth, width)
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete"))
      val sk = s.table(sink).localCheckpoint(true)
      val exactTop = toks.groupBy("token")
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token"))
        .limit(10)
      val est = graft.operators.CountMin
        .estimate(exactTop.select("token"), "token", sk, depth, width)
      exactTop.join(broadcast(est), Seq("token"))
        .select(col("token"), col("n_exact"), col("est"),
          (col("est") >= col("n_exact")).as("never_under"))
        .orderBy(col("n_exact").desc, col("token"))
    }),

    // ST9: WATERMARKED APPEND-MODE late-data handling — the semantics
    // complete mode cannot show: a window is emitted exactly once, when
    // the 1-hour watermark passes its end, and a row arriving LATER
    // than the watermark is dropped rather than mutating an emitted
    // window. The fixture plants a poison row (a unique event_type at
    // the corpus's OLDEST timestamp) in the THIRD file — not the
    // second: Spark filters late events against the PREVIOUS batch's
    // watermark (the SPARK-40925 leniency; eviction uses the current
    // one), so a row arriving in the batch right after the advance is
    // still admitted by design. Two batches after the first half has
    // raised the watermark weeks past the poison window, the row must
    // vanish. The oracle is the batch tumbling count over the ORIGINAL
    // events restricted to finalized windows (end <= max(ts) - 1h) —
    // if the poison row were admitted, an extra LATE_PLANT row appears
    // and the gate hash-mismatches; if on-time windows leaked early or
    // dropped, counts mismatch. Non-vacuous in both directions.
    "st9_stream_watermark_append" -> ((s, d) => {
      import s.implicits._
      val dir = FixtureDirCache.getOrElseUpdate((d, "st9"), {
        val out = java.nio.file.Files
          .createTempDirectory("graft_stgate_st9").toString + "/src"
        val ev = events(s, d).select(col("ts"), col("event_type"))
        val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
        val (lo, hi) = (mm.getTimestamp(0), mm.getTimestamp(1))
        val t50 = new java.sql.Timestamp((lo.getTime + hi.getTime) / 2)
        val t75 = new java.sql.Timestamp(
          (lo.getTime + 3 * hi.getTime) / 4)
        val fs = new org.apache.hadoop.fs.Path(out)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        def parts() = {
          val p = new org.apache.hadoop.fs.Path(out)
          if (!fs.exists(p)) Set.empty[org.apache.hadoop.fs.Path]
          else fs.listStatus(p)
            .filter(_.getPath.getName.startsWith("part-"))
            .map(_.getPath).toSet
        }
        // three arrival files: the file source admits them in
        // modification-time order, pinned strictly apart regardless of
        // FS timestamp granularity
        val t0 = System.currentTimeMillis()
        Seq(
          ev.filter(col("ts") < lit(t50)),
          ev.filter(col("ts") >= lit(t50) && col("ts") < lit(t75)),
          ev.filter(col("ts") >= lit(t75))
            .unionByName(Seq((lo, "LATE_PLANT")).toDF("ts", "event_type"))
        ).zipWithIndex.foreach { case (f, i) =>
          val before = parts()
          f.coalesce(1).write.mode("append").parquet(out)
          (parts() -- before).foreach(p =>
            fs.setTimes(p, t0 - 300000 + i * 60000, -1))
        }
        out
      })
      val src = s.readStream.schema(s.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val sink = s"st9_sink_${StreamSinkSeq.incrementAndGet()}"
      runAvailableNow(src
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append"))
      s.table(sink).orderBy("win_start", "event_type")
    }),

    // ST10: STREAMING EXACT DEDUP with bounded state
    // (StreamingOps.dedupWithinWatermark → dropDuplicatesWithinWatermark:
    // keys live in state only until the watermark passes their event
    // time — O(window keys), never O(all keys ever)). The fixture
    // redelivers 40 first-file events in the second file: RECENT
    // duplicates are still in state and drop there; OLD duplicates are
    // past the watermark and drop as late data — either path, every
    // duplicate vanishes, which is exactly the at-least-once-ingest
    // guarantee the operator sells. A broken state handoff between
    // micro-batches would double those rows and hash-mismatch against
    // the oracle's original (duplicate-free) event set.
    // ST11: STREAMING CURATION — the flagship always-on ingest
    // composite (StreamingOps.curateStream) as a driver gate: the
    // documents corpus streams in as TWO ordered micro-batches
    // (doc_id < 400 first — it bootstraps the curated store + portable
    // band index via the day-1 full curation; the rest second — curated
    // O(batch) against the store's sidecar blooms and the persisted
    // index, delta-published with a fenced commit, index advanced
    // count-verified). The gate reads the FINAL store — commit,
    // manifest, and per-batch decisions end-to-end — and the oracle is
    // s19's sequential-curation SQL verbatim: history curated alone ∪
    // the batch curated against it. The world builds once per
    // (JVM, sfDir); the stream is idempotent under re-runs by the
    // redelivery guard, so caching the root is sound.
    "st11_stream_curate" -> ((s, d) => {
      val world = graft.fixtures.WorldCache.dir("st11_curate", d,
          WindowedAggQueries.getClass) { base =>
        val srcDir = s"$base/src"
        val docs = graft.Tables.documents(s, d)
        val fs = new org.apache.hadoop.fs.Path(srcDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        def parts() = {
          val p = new org.apache.hadoop.fs.Path(srcDir)
          if (!fs.exists(p)) Set.empty[org.apache.hadoop.fs.Path]
          else fs.listStatus(p)
            .filter(_.getPath.getName.startsWith("part-"))
            .map(_.getPath).toSet
        }
        // mtime-staggered files: the file source must see history FIRST
        val t0 = System.currentTimeMillis()
        Seq(docs.filter(col("doc_id") < 400),
            docs.filter(col("doc_id") >= 400))
          .zipWithIndex.foreach { case (f, i) =>
            val before = parts()
            f.coalesce(1).write.mode("append").parquet(srcDir)
            (parts() -- before).foreach(p =>
              fs.setTimes(p, t0 - 240000 + i * 60000, -1))
          }
        val curatedRoot = s"$base/store"
        val src = s.readStream.schema(s.read.parquet(srcDir).schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        runAvailableNow(
          graft.streaming.StreamingOps.curateStream(src, curatedRoot))
      }
      graft.store.SnapshotStore.read(s, s"$world/store")
        .filter(col("is_canonical"))
        .select("doc_id", "split").orderBy("doc_id")
    }),

    "st10_stream_dedup" -> ((s, d) => {
      val dir = FixtureDirCache.getOrElseUpdate((d, "st10"), {
        val out = java.nio.file.Files
          .createTempDirectory("graft_stgate_st10").toString + "/src"
        val ev = events(s, d).select(col("event_id"), col("ts"),
          col("event_type"))
        val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
        val (lo, hi) = (mm.getTimestamp(0), mm.getTimestamp(1))
        val split = new java.sql.Timestamp((lo.getTime + hi.getTime) / 2)
        val f1 = ev.filter(col("ts") < lit(split))
        val oldDups = f1.orderBy("ts", "event_id").limit(20)
        val recentDups = f1.orderBy(col("ts").desc, col("event_id")).limit(20)
        val fs = new org.apache.hadoop.fs.Path(out)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        def parts() = {
          val p = new org.apache.hadoop.fs.Path(out)
          if (!fs.exists(p)) Set.empty[org.apache.hadoop.fs.Path]
          else fs.listStatus(p)
            .filter(_.getPath.getName.startsWith("part-"))
            .map(_.getPath).toSet
        }
        val t0 = System.currentTimeMillis()
        Seq(f1,
          ev.filter(col("ts") >= lit(split))
            .unionByName(oldDups).unionByName(recentDups)
        ).zipWithIndex.foreach { case (f, i) =>
          val before = parts()
          f.coalesce(1).write.mode("append").parquet(out)
          (parts() -- before).foreach(p =>
            fs.setTimes(p, t0 - 240000 + i * 60000, -1))
        }
        out
      })
      val src = s.readStream.schema(s.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val sink = s"st10_sink_${StreamSinkSeq.incrementAndGet()}"
      runAvailableNow(graft.streaming.StreamingOps
        .dedupWithinWatermark(src, Seq("event_id"), "1 hour")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append"))
      s.table(sink).orderBy("event_id")
    }),

    // ST3: STREAMING dataset-drift monitor — per-tumbling-window PSI of
    // the value distribution against the corpus-wide reference
    // histogram. The streamed stage is the stateful part (windowed
    // fixed-bin histogram accumulating across micro-batches, complete
    // mode); the PSI arithmetic then runs over the bounded sink frame
    // (windows × ≤8 bins) with the qc2 conventions (fixed-width bins,
    // 1e-6 Laplace floors, exact integer ratios). A window's PSI term
    // set covers its PRESENT bins (identical construction in the
    // oracle). This is the ingest-monitoring shape: the reference
    // histogram is static infrastructure; each arriving window costs
    // one bounded aggregate. (The fixture collect is bounded by the
    // gate's events table, as in st1b; production streams never pass
    // through the driver.)
    "st3_stream_drift" -> ((s, d) => {
      val binCol = least(floor(col("value") / 100.0), lit(7.0)).cast("int")
      // the static REFERENCE histogram (≤ 8 rows) stays a DataFrame —
      // broadcast into the term grid below, never collected
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      val ref = events(s, d)
        .groupBy(binCol.as("bin")).agg(count(lit(1)).as("rn"))
        .withColumn("p", greatest(col("rn").cast("double") /
          greatest(sum(col("rn")).over(wAll), lit(1L)), lit(1e-6)))
        .select("bin", "p")
      val src = fileSource(s, d, "st3",
        events(s, d).select(col("ts"), col("value")))
      val sink = s"st3_sink_${StreamSinkSeq.incrementAndGet()}"
      runAvailableNow(src
        .groupBy(window(col("ts"), "1 hour"), binCol.as("bin"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("bin"), col("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete"))
      // The term grid is every (window × REFERENCE bin), not just the
      // bins a window happens to contain: a reference bin whose mass
      // VANISHES from a window is the strongest drift signal, and an
      // inner join on the window's own bins would silently drop exactly
      // that term. Reference bins are a superset of any window's bins
      // (the reference is the whole corpus), so the grid covers
      // everything — built as a broadcast cross join of the per-window
      // totals with the ≤8-row reference frame (the j2 back-join shape).
      // The sink frame is localCheckpoint'd first: both join sides
      // derive from the same memory-sink view, and DeduplicateRelations
      // does not re-alias MemoryPlan leaves (INTERNAL_ERROR "conflicting
      // references"), while a LogicalRDD self-join dedups fine. The
      // frame is windows × ≤8 bins — checkpointing it is free.
      val hist = s.table(sink).localCheckpoint(true)
      val grid = hist.groupBy("win_start").agg(sum(col("n")).as("wn"))
        .crossJoin(broadcast(ref))
      grid.join(hist.select("win_start", "bin", "n"),
          Seq("win_start", "bin"), "left")
        .withColumn("q", greatest(
          coalesce(col("n"), lit(0L)).cast("double") / col("wn"), lit(1e-6)))
        .groupBy("win_start")
        .agg(max(col("wn")).as("n"),
          round(sum((col("q") - col("p")) * log(col("q") / col("p"))), 4)
            .as("psi"))
        .orderBy("win_start")
    })
  )

  /** Unique memory-sink names: the same query re-runs within one JVM
    * (bench medians, verify), and an active-name collision would fail
    * the second start. */
  private val StreamSinkSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** One written fixture dir per (sfDir, gate) — the arriving data is a
    * deterministic function of the gate tables, so re-runs (bench
    * medians, verify) stream the same files without re-writing them. */
  private val FixtureDirCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** FILE-SOURCE streaming fixture — the production shape: the gate
    * frame is written once to a temp dir as `nFiles` parquet files and
    * streamed back with `maxFilesPerTrigger=1` under
    * `Trigger.AvailableNow`, so the stream executes >= nFiles
    * micro-batches (state provably carries across them) and NO data row
    * ever passes through the driver. This replaces the MemoryStream
    * fixtures that collected the gate table driver-side and fed it back
    * row by row — harness-only, but it capped the sf a gate could run
    * at and padded every median with per-epoch driver hops. */
  private def fileSource(s: SparkSession, d: String, tag: String,
                         frame: => DataFrame, nFiles: Int = 2): DataFrame = {
    val dir = FixtureDirCache.getOrElseUpdate((d, tag), {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_stgate_$tag").toString + "/src"
      frame.repartition(nFiles).write.parquet(out)
      out
    })
    s.readStream
      .schema(s.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
  }

  /** Start `w` with Trigger.AvailableNow and run it to completion: all
    * fixture files are processed (respecting maxFilesPerTrigger) and
    * the query self-terminates — the batch-gate-friendly way to drain
    * a bounded stream.
    *
    * The stream runs NARROW (shuffle.partitions=4 for its lifetime,
    * restored after — r13 verdict #7): the session's 32-way width is
    * sized for the batch corpus, but a stateful micro-batch materializes
    * one state-store instance per shuffle partition per batch (each a
    * delta + commit file), so a 2-file gate fixture paid 32×2 store
    * lifecycles plus 32-way micro-shuffles for kilobytes of state —
    * pure lifecycle, not the operator under test. Results are
    * partition-count-invariant: the aggregations are exact, and the
    * bounded sketches' per-partition summaries just get fewer and
    * larger under the same merge guarantees (their error bounds sum
    * over batches, not partitions). Streaming queries clone the session
    * conf at start, so the narrowing is frozen into the stream and the
    * restore cannot race it. */
  private def runAvailableNow(
      w: org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row]): Unit = {
    val s = org.apache.spark.sql.SparkSession.active
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "4")
    try {
      val q = w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    } finally s.conf.set(key, prev)
  }

  val oracle: Map[String, String] = Map(
    // s19's sequential-curation oracle VERBATIM: the streamed composite
    // must publish exactly the store the two-day batch scenario does
    "st11_stream_curate" ->
      WritePathQueries.oracle("s19_incremental_curate_publish"),
    // a22's oracle VERBATIM: the streamed sketch must estimate exactly
    // like the batch build (cells are deterministic md5 — linearity
    // makes the micro-batch split invisible)
    "st4_stream_countmin" -> AnalyticQueries.oracle("a22_countmin"),
    // sw1's gaps-and-islands oracle VERBATIM: streamed session state
    // must reproduce batch sessionization exactly
    "st5_stream_session" -> AnalyticQueries.oracle("sw1_session_window"),
    // a20's oracle VERBATIM: batch-accumulated summaries keep the same
    // ε rank guarantee, so the identical gate booleans must hold
    "st6_stream_quantile" -> AnalyticQueries.oracle("a20_quantile_sketch"),
    // a19's oracle VERBATIM: MG summaries merge by summation with the
    // same summed error bound, so the identical gate booleans must hold
    "st7_stream_heavy_hitters" -> AnalyticQueries.oracle("a19_heavy_hitters"),
    // a14's oracle VERBATIM: streamed HLL registers must estimate like
    // the batch sketches, per group and union-merged
    "st8_stream_hll" -> CoverageQueries.oracle("a14_hll_sketch_merge"),
    "st1b_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // finalized windows only (end <= max(ts) - 1h, Spark's append
    // emission rule), over the ORIGINAL events — the planted late row
    // must have been dropped for the row sets to agree
    "st9_stream_watermark_append" ->
      """WITH mx AS (SELECT MAX(ts) AS hi FROM events)
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        |  COUNT(*) AS n
        |FROM events, mx
        |WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
        |      <= hi - INTERVAL '1 hour'
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // the ORIGINAL duplicate-free event set: every redelivered row must
    // have been dropped (in-state or late — either path)
    "st10_stream_dedup" ->
      """SELECT event_id, ts, event_type FROM events
        |ORDER BY event_id""".stripMargin,
    "st1_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "st2_sliding_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) - o.i * INTERVAL '1 hour' AS win_start,
        |  event_type, COUNT(*) AS n
        |FROM events CROSS JOIN UNNEST([0, 1]) AS o(i)
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "st3_stream_drift" ->
      """WITH wh AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
        |    CAST(LEAST(FLOOR(value / 100.0), 7.0) AS INTEGER) AS bin,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |wt AS (SELECT win_start, SUM(n) AS wn FROM wh GROUP BY 1),
        |r AS (
        |  SELECT CAST(LEAST(FLOOR(value / 100.0), 7.0) AS INTEGER) AS bin,
        |    COUNT(*) AS rn
        |  FROM events GROUP BY 1),
        |rt AS (SELECT SUM(rn) AS rtot FROM r),
        |terms AS (
        |  SELECT wt.win_start, wt.wn,
        |    GREATEST(CAST(COALESCE(wh.n, 0) AS DOUBLE)
        |      / CAST(wt.wn AS DOUBLE), 1e-6) AS q,
        |    GREATEST(CAST(r.rn AS DOUBLE) / CAST(rt.rtot AS DOUBLE), 1e-6) AS p
        |  FROM wt
        |  CROSS JOIN r
        |  CROSS JOIN rt
        |  LEFT JOIN wh ON wh.win_start = wt.win_start AND wh.bin = r.bin)
        |SELECT win_start, CAST(MAX(wn) AS BIGINT) AS n,
        |  ROUND(SUM((q - p) * LN(q / p)), 4) AS psi
        |FROM terms GROUP BY win_start ORDER BY win_start""".stripMargin
  )
}
