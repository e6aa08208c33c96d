package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sampling / splitting primitives a training-data pipeline needs
  * (beyond the reference, which samples nothing):
  *
  *  - content-hash train/eval split: reproducible across runs, engines
  *    and re-partitioning — membership is a pure function of the key, so
  *    a re-crawled document lands in the same split (no leakage when the
  *    corpus grows). Oracle-checked: md5 hex agrees across engines.
  *  - stratified sampling via sampleBy: per-stratum Bernoulli fractions
  *    (rows-only: per-partition RNG stream is engine-internal; the
  *    deterministic-for-a-seed property is spec-tested instead).
  */
object SamplingQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // SM6: cluster-balanced sampling — the diversity-preserving
    // subsample a curation pipeline draws before training: k-means
    // cells (operators.KMeans, the v8 fit — deterministic and
    // oracle-replicated end-to-end) instead of a metadata stratum, then
    // the sm3 per-group idiom (≤10 per cell, md5-ordered) inside each
    // cell. Head-heavy topics stop dominating the sample while every
    // semantic region keeps representation.
    "sm6_cluster_balanced" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val m = graft.operators.KMeans.fit(e, "vec_id", "emb", k = 8, rounds = 1)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster")
        .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
      m.assigned
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("cluster"), col("vec_id"), col("rn"))
        .orderBy("cluster", "rn")
    }),

    // SM7: mixture sampling — the data-mixing draw (Pile/Dolma-style
    // source proportions) as a deterministic operator: per-language
    // quotas from largest-remainder apportionment of a 200-doc budget
    // over target weights (en .4, zh/es .2, de/fr .1), each stratum
    // taking its FIRST quota rows in md5 order. Membership is a pure
    // function of (stratum, key): re-runs, re-partitionings, and the
    // DuckDB oracle draw the same mixture, and growing one stratum
    // never reshuffles another's draw.
    "sm7_mixture_sample" -> ((s, d) =>
      graft.operators.Mixture.sample(documents(s, d), "lang", "doc_id",
          graft.operators.Mixture.allocate(
            Map("en" -> 0.4, "zh" -> 0.2, "es" -> 0.2,
              "de" -> 0.1, "fr" -> 0.1), budget = 200))
        .select(col("lang"), col("doc_id"), col("rn"))
        .orderBy("lang", "rn")),

    // SM10: TEMPERATURE-scaled mixture (α = 1/2) — sm7 with the quotas
    // DERIVED from the observed stratum sizes instead of hand weights:
    // stratum s draws ∝ floor(sqrt(n_s)) of a 200-doc budget, the
    // Gopher/PaLM multilingual flattening that stops the head language
    // from dominating while keeping every tail language represented.
    // The size pull is one bounded groupBy (≤ |strata| rows, the tx14
    // scalar-pull shape); apportionment is exact integer arithmetic
    // (Mixture.temperatureAllocate), so the DuckDB oracle re-derives
    // identical quotas from the same counts, and the draw itself is
    // sm7's pure-function-of-(stratum, key) membership. One corpus
    // pass + one per-stratum window — allocation work is O(|strata|).
    "sm10_temperature_mix" -> ((s, d) => {
      val docs = documents(s, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      graft.operators.Mixture.sample(docs, "lang", "doc_id",
          graft.operators.Mixture.temperatureAllocate(counts, budget = 200))
        .select(col("lang"), col("doc_id"), col("rn"))
        .orderBy("lang", "rn")
    }),

    // SM4: deterministic weighted sampling without replacement
    // (Efraimidis–Spirakis): priority = u^(1/w) with u a pure function
    // of the key (md5 prefix → uniform in (0,1), engine-agnostic like
    // sm1) and w = n_chars, so longer documents are proportionally more
    // likely to be drawn — the quality-weighted corpus-sampling shape.
    // Ordering by ln(u)/w (same order, one less libm call); top-10 per
    // language stratum. Deterministic: re-runs, re-partitioning, and
    // other engines draw the SAME sample, which is what makes the DuckDB
    // oracle possible and corpus experiments reproducible. One pass +
    // one per-stratum window — no RNG state anywhere.
    "sm4_weighted_sample" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("es_key").desc, col("doc_id"))
      documents(s, d)
        .withColumn("u",
          (expr("conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10)")
            .cast("double") + lit(0.5)) / lit(16777216.0))
        .withColumn("es_key", log(col("u")) / col("n_chars"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .select(col("lang"), col("rnk"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "rnk")
    }),

    // 80/20 split on the first two md5 hex chars of the key: 'cc' = 204
    // of 256 buckets ≈ 79.7% train (shared definition — operators.Splits).
    "sm1_hash_split" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        graft.operators.Splits.hashSplit(col("doc_id")).as("split"))
        .orderBy("doc_id")),

    // CM1: train/eval contamination audit — an eval document is
    // contaminated when any of its distinct character-8-grams appears
    // anywhere in the train split (the n-gram-overlap decontamination
    // check training pipelines run before eval). Linear shape: grams
    // shuffle once on the gram key, the train gram set is an equi-join
    // side — never a doc×doc comparison.
    "cm1_split_contamination" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"),
        graft.operators.Splits.hashSplit(col("doc_id")).as("split"))
      val grams = docs.select(col("doc_id"), col("split"),
        explode(array_distinct(expr(
          "transform(sequence(1, greatest(length(text) - 7, 1)), i -> substring(text, i, 8))")))
          .as("g"))
      val trainGrams = grams.filter(col("split") === "train")
        .select("g").distinct()
      val shared = grams.filter(col("split") === "eval")
        .join(trainGrams, "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      docs.filter(col("split") === "eval").select("doc_id")
        .join(shared, Seq("doc_id"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        .withColumn("contaminated", col("n_shared") > 0)
        .orderBy("doc_id")
    }),

    // CM2: FUZZY train/eval decontamination — the near-duplicate
    // counterpart of cm1's exact n-gram audit (the check GPT-3/PaLM-era
    // pipelines actually run: an eval doc is contaminated when a TRAIN
    // doc is a near-duplicate, not only an exact substring match). Keyed
    // on the engine-portable md5-MinHash family (MinHashLSH
    // .portableBandRows — cp1's fully-oracled chain), candidates come
    // from an ASYMMETRIC band join: eval bands equi-join train bands on
    // (band_id, band_hash), so train×train pairs — the quadratic bulk at
    // 100 TB, where train is the corpus and eval is a benchmark — are
    // NEVER formed, and the shape degenerates to dd13's probe when the
    // train side is the persisted portable LshBandIndex (same band-row
    // schema; the eval side is then benchmark-sized and broadcastable).
    // Agreement ≥ 0.8 (13/16 positions) is the dedup cut; ≥13/16
    // agreement forces ≥1 of 4 bands to agree as a raw slice, so the
    // md5 band join and the oracle's raw-slice join surface identical
    // post-threshold pairs (cp1's argument).
    "cm2_fuzzy_decontam" -> ((s, d) =>
      graft.operators.Decontam.fuzzyFlags(
        documents(s, d).select(col("doc_id"), col("text"),
          graft.operators.Splits.hashSplit(col("doc_id")).as("split")))
        .orderBy("doc_id")),

    // CP1: full corpus-curation composite (quality gate → lang filter →
    // exact dedup → MinHash-LSH near-dup clustering → canonical select →
    // content-hash split). FULLY ORACLED since round 11: the near-dup
    // stage is keyed on the md5-derived MinHash family
    // (MinHashLSH.portablePairs — the dd5-proved engine-portable hash),
    // so DuckDB replicates signatures, band collisions, the agreement
    // threshold, the recursive-CTE connected components (dd7's reach
    // spelling) and the canonical-min select end-to-end. The LSH pass is
    // still one shared per-corpus pass (cachedPortablePairs; restricting
    // full-corpus pairs to the curation survivors is exact — the
    // per-pair property, see CorpusPipeline). The fused xxhash family
    // (dd4) remains the 100 TB hot path; pipeline invariants stay
    // spec-tested in CorpusPipelineSpec.
    "cp1_corpus_curate" -> ((s, d) => {
      val docs = graft.Tables.documents(s, d)
      val (curated, _) = graft.corpus.CorpusPipeline.curate(
        s, docs,
        langs = Seq("en", "vi", "de", "fr"), minChars = 1, minJaccard = 0.8,
        precomputedPairs = Some(
          graft.operators.MinHashLSH.cachedPortablePairs(docs, cacheKey = d)))
      curated.select("doc_id", "split").orderBy("doc_id")
    }),

    // SM11: LEAKAGE-SAFE train/eval split — the split key is the
    // near-dup COMPONENT id, so every cluster of near-duplicate
    // documents lands WHOLE on one side (a per-doc hash split puts a
    // near-dup pair across the boundary ~25% of the time, turning eval
    // into memorization). Composition: cp1's quality gate → exact dedup
    // → portable MinHash pairs → connected components, then
    // Splits.hashSplit keyed on the component minimum. The oracle
    // replays the ENTIRE chain — including the recursive CC — in
    // DuckDB, so cluster membership AND the grouped assignment are both
    // engine-portable facts, not Spark-side choices.
    "sm11_leakage_safe_split" -> ((s, d) => {
      val docs = graft.Tables.documents(s, d)
      graft.corpus.CorpusPipeline.leakageSafeSplit(
        s, docs,
        langs = Seq("en", "vi", "de", "fr"), minChars = 1, minJaccard = 0.8,
        precomputedPairs = Some(
          graft.operators.MinHashLSH.cachedPortablePairs(docs, cacheKey = d)))
        .orderBy("doc_id")
    }),

    // CP6: INCREMENTAL curation — today's change-feed batch curated
    // against the indexed history (corpus.IncrementalCurate): raw-store
    // change feed → quality gate → exact dedup vs the curated table's
    // content_hash column → near-dup probe of the persisted PORTABLE
    // LshBandIndex → batch-component decisions → fenced delta publish +
    // O(batch) index advance. History text is never re-read; the oracle
    // is cp1's full recompute over history ∪ batch restricted to batch
    // rows — the dd13 identity lifted to the whole pipeline.
    "cp6_incremental_curate" -> ((s, d) => {
      val (_, accepted) = graft.corpus.IncrementalCurate.scenario(s, d)
      accepted.filter(col("is_canonical"))
        .select("doc_id", "split").orderBy("doc_id")
    }),

    // CP2: the deterministic sub-pipeline of cp1 — quality gate → exact
    // dedup → content-hash split, the SAME production stage functions
    // cp1 composes, minus the probabilistic near-dup stage — so the
    // driver's DuckDB oracle gates the curation stages end-to-end while
    // cp1's MinHash composite stays rows-only.
    "cp2_curate_exact" -> ((s, d) =>
      graft.corpus.CorpusPipeline.curateExact(
        graft.Tables.documents(s, d),
        langs = Seq("en", "vi", "de", "fr"), minChars = 1)
        .select("doc_id", "split").orderBy("doc_id")),

    // SM3: deterministic per-group sample — the k docs with the smallest
    // content-hash per source. Reproducible across runs/engines (unlike
    // rand()-based sampleBy) and shuffles only (source, hash) pairs.
    "sm3_per_group_sample" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("source", "doc_id", "rn")
        .orderBy("source", "rn")
    }),

    // SM9: DSIR-style importance resampling (arXiv:2302.03169 — Data
    // Selection via Importance Resampling): estimate hashed-unigram bag
    // distributions for a TARGET slice (here lang='en') and the RAW
    // corpus, weight every document by its log importance ratio
    // Σ_tokens ln(p̂_target/p̂_raw), and keep the top 20% — "select raw
    // data that looks like the target domain" with two 64-bucket
    // histograms instead of a model. Determinism/oracle: bucket = md5
    // hex-pair % 64 (engine-identical), the per-bucket log-ratio is
    // frozen to integer MICRO-nats, and each doc's weight is then an
    // exact integer Σ c_b·lr_b — associative, partition-order-free.
    // Scale: one conditional-agg histogram pass (64 rows, broadcast
    // back), one per-(doc,bucket) agg, and the top-fraction cut via
    // BudgetSelect's two-phase prefix sum — no global sort, no Exchange
    // SinglePartition. The corpus TOKENIZES exactly twice (histograms,
    // per-doc scoring): `perDoc` is localCheckpoint'd to doc-count-sized
    // rows before BudgetSelect.greedy, whose documented precondition is
    // that it evaluates its input three times — un-checkpointed, those
    // three evaluations re-ran the explode+groupBy tokenize chain each
    // (measured ~4× tokenize, median 3.1 s vs ~1 s comparable queries).
    "sm9_dsir" -> ((s, d) => {
      val docs = documents(s, d)
      val budget = math.ceil(0.2 * docs.count()).toLong
      val toks = docs.select(col("doc_id"), col("lang"),
        explode(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "))
          .as("term"))
      val tb = toks.withColumn("b",
        conv(substring(md5(col("term")), 31, 2), 16, 10).cast("long") % 64)
      // BOTH histograms in one tokenize pass (raw count + target count
      // as a conditional agg), and the smoothing totals from the 64-row
      // histogram frame itself — one bounded driver agg, no extra
      // corpus pass. The whole query costs two corpus scans: histograms
      // here, per-doc scoring below.
      val hist = tb.groupBy("b").agg(count(lit(1)).as("rc"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"))
        .localCheckpoint(true)
      val totRow = hist.agg(sum(col("rc")), sum(col("tc"))).head()
      val (rtot, ttot) = (totRow.getLong(0), totRow.getLong(1))
      val lr = hist
        .withColumn("lr_micro",
          round((log((col("tc") + 1).cast("double") / lit(ttot + 64L)) -
            log((col("rc") + 1).cast("double") / lit(rtot + 64L))) * 1e6, 0)
            .cast("long"))
        .select("b", "lr_micro")
      val perDoc = tb.groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("c"))
        .join(broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(sum(col("c") * col("lr_micro")).as("w_micro"))
        .localCheckpoint(true)
      graft.operators.BudgetSelect.greedy(
          perDoc.withColumn("unit", lit(1L)), "doc_id", "w_micro", "unit",
          lit(budget))
        .filter(col("admitted"))
        .select("doc_id", "lang", "w_micro")
        .orderBy("doc_id")
    }),

    // CP5: per-source sqrt-cap downsampling — keep ceil(sqrt(n_source))
    // docs per source, drawn in content-hash order (the CommonCrawl-
    // curation move: head-heavy sources are trimmed superlinearly while
    // every source keeps representation; a 1M-doc source contributes
    // 1000, a 100-doc source contributes 10). Deterministic: the draw is
    // a pure function of (source, doc_id), so a source growing never
    // changes another source's sample. Shape: the per-source rank is
    // Interleave.hashRank's two-phase form — per-(source, md5-prefix-
    // bucket) windows + broadcast bucket offsets — NOT a bare
    // Window.partitionBy(source), which would sort a CommonCrawl-shaped
    // head source (most of the corpus) through ONE task. The per-source
    // count is a map-side-partial groupBy broadcast back (|sources|
    // rows), not a count window over the same skewed partitioning.
    "cp5_source_cap" -> ((s, d) => {
      val docs = documents(s, d)
      val nSrc = docs.groupBy("source").agg(count(lit(1)).as("n_source"))
      graft.operators.Interleave.hashRank(docs, "source", "doc_id")
        .join(broadcast(nSrc), "source")
        .withColumn("cap", ceil(sqrt(col("n_source").cast("double"))))
        .filter(col("rn") <= col("cap"))
        // rn fits int AFTER the cap filter: surviving rn ≤ ceil(√n)
        .select(col("doc_id"), col("source"), col("n_source"), col("cap"),
          col("rn").cast("int").as("rn"))
        .orderBy("doc_id")
    }),

    // SQL1: the SQL-text surface — temp views + spark.sql, same Catalyst
    // plan as the DataFrame API (oracle is the identical statement).
    "sql1_text_query" -> ((s, d) => {
      graft.Tables.orders(s, d).createOrReplaceTempView("sql1_orders")
      graft.Tables.customer(s, d).createOrReplaceTempView("sql1_customer")
      s.sql("""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM sql1_orders o JOIN sql1_customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment""")
    }),

    // per-label stratified sample: ~50% of even labels, ~10% of odd, via a
    // per-stratum hash threshold on the key (not sampleBy's RNG): pure
    // function of (vec_id, label) → identical membership across runs,
    // engines and repartitioning, and DuckDB-replicable. The first 8 md5
    // hex chars are a uniform 32-bit draw; '80000000' = 0.5, '1999999a'
    // ≈ 0.1 of the space. (sampleBy determinism-for-a-seed is spec-tested
    // in SamplingSpec instead.)
    "sm2_stratified_sample" -> ((s, d) =>
      embeddings(s, d)
        .filter(substring(md5(col("vec_id").cast("string").cast("binary")), 1, 8) <
          when(col("label") % 2 === 0, lit("80000000")).otherwise(lit("1999999a")))
        .select("vec_id", "label").orderBy("vec_id")),

    // SM5: deterministic k-fold cross-validation assignment — fold =
    // md5(key) mod k, a pure function of the key like sm1's split:
    // folds survive re-runs, engine swaps, repartitioning, and corpus
    // growth (a new document lands in a fold without moving any existing
    // one). Narrow per-row math; the only exchange is the output sort.
    "sm5_kfold" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        pmod(expr("conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10)")
          .cast("long"), lit(5L)).cast("int").as("fold"))
        .orderBy("doc_id")),

    // CP3: quality-ranked token-budget selection — "keep the best 40%
    // of the corpus's tokens": rank by the tx3 quality score, admit
    // greedily until the budget is spent. The running sum is the
    // distributed two-phase prefix sum (operators.BudgetSelect:
    // score-bucketed partial windows + ≤64 broadcast bucket offsets),
    // NEVER a single-partition global window; the oracle is the plain
    // one-window spelling — two-phase must equal it exactly.
    "cp3_token_budget" -> ((s, d) => {
      val docs = documents(s, d)
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
        .withColumn("q_score",
          round(least(lit(1.0), col("n_tokens") / lit(50.0)) * 0.5 +
            when(col("n_chars").between(100, 5000), 0.5).otherwise(0.25), 6))
      val total = docs.agg(sum("n_tokens")).head().getLong(0)
      graft.operators.BudgetSelect
        .greedy(docs, "doc_id", "q_score", "n_tokens",
          budget = lit(total * 2 / 5))
        .filter(col("admitted"))
        .select(col("doc_id"), col("n_tokens"), col("q_score"),
          col("cum_n_tokens"))
        .orderBy("doc_id")
    }),

    // CP4: deterministic training-shard bin packing — assign each doc
    // to the shard where the running token count (over the content-hash
    // order) crosses its 2000-token capacity: shards come out
    // near-uniform in tokens, assignment is a pure function of the
    // corpus (reproducible across runs/engines/partitionings), and a
    // shard's members are contiguous in hash order so the export writer
    // can emit shard files with one range-partitioned pass. Same
    // two-phase prefix sum as cp3 — never a single-partition window.
    "cp4_shard_pack" -> ((s, d) => {
      val docs = documents(s, d)
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
        // 48-bit md5 prefix: exact in double, so the bucketing phase
        // can't mis-order what the window then orders exactly
        .withColumn("hscore",
          -expr("conv(substring(md5(cast(doc_id as string)), 1, 12), 16, 10)")
            .cast("long").cast("double"))
      graft.operators.BudgetSelect
        .greedy(docs, "doc_id", "hscore", "n_tokens",
          budget = lit(Long.MaxValue))
        .withColumn("shard_id",
          floor((col("cum_n_tokens") - col("n_tokens")) / lit(2000L))
            .cast("int"))
        .select(col("doc_id"), col("n_tokens"), col("shard_id"))
        .orderBy("doc_id")
    }),

    // CP7: GPT-style concat-then-chunk CONTEXT PACKING — the corpus as
    // one doc_id-ordered token stream cut into 512-token training
    // contexts; output is each document's placement map (first/last
    // window, windows straddled), the attribution/contamination/loss-
    // masking bookkeeping a training-data writer needs. cp4's shard
    // packing bounds FILES; this places tokens into the EXAMPLES a
    // loader emits. Same two-phase prefix sum (operators.ContextPack) —
    // never a single-partition window; exact integer placement math, so
    // DuckDB replays it bit-for-bit.
    "cp7_context_pack" -> ((s, d) => {
      val docs = documents(s, d)
        .filter(length(trim(col("text"))) > 0)
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
      graft.operators.ContextPack
        .placements(docs, "doc_id", "n_tokens", window = 512L)
        .select(col("doc_id"), col("n_tokens"), col("first_window"),
          col("last_window"), col("n_windows"))
        .orderBy("doc_id")
    }),

    // CP8: WHOLE-DOCUMENT sequence packing by size class (shelf
    // packing) — cp7 cuts a concatenated stream so docs straddle
    // boundaries; SFT/eval formatting must keep each doc whole in one
    // fixed-capacity example. True FFD bin packing is sequential and
    // non-replayable; the shelf approximation (class k = capacity div
    // tokens, bins fill k docs at a time in id order) is a pure
    // function of (class, rank) in exact integer arithmetic, bins
    // provably never overflow, and full bins are >50% utilized. The
    // per-class rank is the two-phase (class, bucket) prefix pattern —
    // a dominant doc-length band never funnels through one window task.
    // Oversize docs emit overflow=true, one per bin, never dropped.
    "cp8_shelf_pack" -> ((s, d) => {
      val docs = documents(s, d)
        .filter(length(trim(col("text"))) > 0)
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
        .select("doc_id", "n_tokens")
      graft.operators.ShelfPack
        .placements(docs, "doc_id", "n_tokens", capacity = 256L)
        .select(col("doc_id"), col("n_tokens"), col("size_class"),
          col("bin_id"), col("slot"), col("overflow"))
        .orderBy("doc_id")
    }),

    // SM8: deterministic weighted interleave — the training-epoch ORDER
    // for a multi-source mixture (en 4 : zh 2 : es 2 : de 1 : fr 1 per
    // 10-slot cycle): per-source content-hash shuffle, exact-integer
    // round-robin positions, one range-exchange output sort. Per-source
    // rank is the bucketed two-phase shape (operators.Interleave), not a
    // one-task-per-source window.
    "sm8_interleave" -> ((s, d) =>
      graft.operators.Interleave.weightedOrder(documents(s, d),
          "lang", "doc_id",
          Map("en" -> 4, "zh" -> 2, "es" -> 2, "de" -> 1, "fr" -> 1))
        .select(col("pos"), col("lang"), col("doc_id"), col("rn"))
        .orderBy("pos", "lang", "doc_id"))
  )

  /** The cp1 curation chain as SQL CTEs, parameterized for reuse by the
    * cp6/s19 oracles: `sfx` suffixes every CTE name (so two chains can
    * coexist in one statement), `srcWhere` restricts the source corpus.
    * The chain: cp2's gate+exact-dedup, the md5-MinHash signature table
    * (16 perms over the fused kernel's word-3-shingles — list-slice+join
    * ≡ concat_ws's null-skipping for short docs — one md5 per shingle
    * giving a 48-bit base, permutation i = xor(h, c_i) with c_i the
    * first 48 bits of md5('perm'||i), exact in BIGINT and double
    * alike; see MinHashLSH.portableSignatures for why the linear
    * no-modulus family was rejected), 4-band slice-key collisions,
    * agreement >= 0.8 (13/16 positions; /16.0 is exact in binary),
    * dd7's recursive-CTE min-label connected components, canonical =
    * each component's min doc_id.
    * Exposes `exact<sfx>` and `canon<sfx>`; compose with
    * [[curateSelectSql]]. */
  private[graft] def curateChainSql(sfx: String, srcWhere: String): String =
    s"""gated$sfx AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE ($srcWhere) AND n_chars BETWEEN 1 AND 100000
       |    AND CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
       |        / GREATEST(len(text), 1) <= CAST(0.2 AS DOUBLE)
       |    AND lang IN ('en', 'vi', 'de', 'fr')),
       |keepx$sfx AS (SELECT MIN(doc_id) AS doc_id FROM gated$sfx GROUP BY md5(text)),
       |exact$sfx AS (SELECT g.doc_id, g.text FROM gated$sfx g
       |              SEMI JOIN keepx$sfx USING (doc_id)),
       |toks$sfx AS (
       |  SELECT doc_id, string_split(lower(trim(
       |    regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
       |  FROM exact$sfx),
       |shingles$sfx AS (
       |  SELECT DISTINCT doc_id, array_to_string(toks[i : i + 2], ' ') AS sh
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, GREATEST(len(toks) - 2, 1))) AS i
       |        FROM toks$sfx)),
       |shash$sfx AS (
       |  SELECT doc_id,
       |    CAST('0x' || substring(md5(sh), 1, 12) AS BIGINT) AS h
       |  FROM shingles$sfx),
       |perms$sfx AS (
       |  SELECT i, CAST('0x' || substring(
       |      md5('perm' || CAST(i AS VARCHAR)), 1, 12) AS BIGINT) AS c
       |  FROM generate_series(0, 15) AS gs(i)),
       |hashes$sfx AS (
       |  SELECT doc_id, p.i AS i, MIN(xor(h, p.c)) AS m
       |  FROM shash$sfx, perms$sfx p
       |  GROUP BY doc_id, p.i),
       |sigs$sfx AS (SELECT doc_id, list(m ORDER BY i) AS sig
       |             FROM hashes$sfx GROUP BY doc_id),
       |bands$sfx AS (
       |  SELECT doc_id, b.b AS band,
       |    array_to_string(sig[b.b * 4 + 1 : b.b * 4 + 4], '_') AS bkey
       |  FROM sigs$sfx, generate_series(0, 3) AS b(b)),
       |cand$sfx AS (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM bands$sfx a JOIN bands$sfx b ON a.band = b.band AND a.bkey = b.bkey
       |    AND a.doc_id < b.doc_id),
       |pairs$sfx AS (
       |  SELECT c.src, c.dst
       |  FROM cand$sfx c JOIN sigs$sfx sa ON sa.doc_id = c.src
       |    JOIN sigs$sfx sb ON sb.doc_id = c.dst
       |  WHERE list_sum(list_transform(list_zip(sa.sig, sb.sig),
       |      p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) / 16.0 >= 0.8),
       |edges$sfx AS (SELECT src AS u, dst AS v FROM pairs$sfx
       |          UNION ALL SELECT dst AS u, src AS v FROM pairs$sfx),
       |reach$sfx AS (
       |  SELECT doc_id AS id, doc_id AS lbl FROM exact$sfx
       |  UNION
       |  SELECT e.v AS id, r.lbl FROM reach$sfx r JOIN edges$sfx e ON e.u = r.id
       |  WHERE r.lbl < e.v),
       |comp$sfx AS (SELECT id, MIN(lbl) AS component FROM reach$sfx GROUP BY id),
       |canon$sfx AS (SELECT id AS doc_id FROM comp$sfx WHERE id = component)""".stripMargin

  /** The curated (doc_id, split) selection over a [[curateChainSql]]
    * chain, optionally restricted by `finalWhere`. */
  private[graft] def curateSelectSql(sfx: String, finalWhere: String): String =
    s"""SELECT e.doc_id,
       |  CASE WHEN substring(md5(CAST(e.doc_id AS VARCHAR)), 1, 2) < 'cc'
       |       THEN 'train' ELSE 'eval' END AS split
       |FROM exact$sfx e SEMI JOIN canon$sfx USING (doc_id)
       |WHERE ($finalWhere)""".stripMargin

  val oracle: Map[String, String] = Map(
    "cp1_corpus_curate" ->
      s"""WITH RECURSIVE ${curateChainSql("", "TRUE")}
         |${curateSelectSql("", "TRUE")}
         |ORDER BY e.doc_id""".stripMargin,
    // the full chain INCLUDING the recursive connected components, with
    // the split keyed on the component id instead of the doc id — every
    // exact survivor appears, canonical or not
    "sm11_leakage_safe_split" ->
      s"""WITH RECURSIVE ${curateChainSql("", "TRUE")}
         |SELECT e.doc_id, c.component,
         |  CASE WHEN substring(md5(CAST(c.component AS VARCHAR)), 1, 2) < 'cc'
         |       THEN 'train' ELSE 'eval' END AS split
         |FROM exact e JOIN comp c ON c.id = e.doc_id
         |ORDER BY e.doc_id""".stripMargin,
    // cp6: THE FULL RECOMPUTE RESTRICTED TO THE BATCH — cp1's exact
    // chain over history ∪ batch, keeping only batch rows. The
    // sequential path (probe the persisted exact-survivor index, drop
    // any component touching history, keep batch-component minima) is
    // provably identical on batch rows — the dd13 identity lifted to
    // the whole pipeline (see corpus.IncrementalCurate's scaladoc for
    // the stage-by-stage argument).
    "cp6_incremental_curate" ->
      s"""WITH RECURSIVE ${curateChainSql("", "TRUE")}
         |${curateSelectSql("", "e.doc_id >= 400")}
         |ORDER BY e.doc_id""".stripMargin,
    "cp3_token_budget" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens,
        |    ROUND(LEAST(1.0, len(string_split_regex(TRIM(text), '\s+')) / 50.0) * 0.5
        |      + CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 0.5 ELSE 0.25 END, 6)
        |      AS q_score
        |  FROM documents),
        |b AS (SELECT (CAST(SUM(n_tokens) AS BIGINT) * 2) // 5 AS budget FROM docs),
        |c AS (SELECT doc_id, n_tokens, q_score,
        |        SUM(n_tokens) OVER (ORDER BY q_score DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n_tokens
        |      FROM docs)
        |SELECT doc_id, n_tokens, q_score, CAST(cum_n_tokens AS BIGINT) AS cum_n_tokens
        |FROM c, b WHERE cum_n_tokens - n_tokens < budget
        |ORDER BY doc_id""".stripMargin,
    "cp4_shard_pack" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
        |      AS hnum
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        SUM(n_tokens) OVER (ORDER BY hnum, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM docs)
        |SELECT doc_id, n_tokens,
        |  CAST((CAST(cum AS BIGINT) - n_tokens) // 2000 AS INTEGER) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "cp7_context_pack" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents WHERE LENGTH(TRIM(text)) > 0),
        |c AS (SELECT doc_id, n_tokens,
        |        SUM(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM toks)
        |SELECT doc_id, n_tokens,
        |  (CAST(cum AS BIGINT) - n_tokens) // 512 AS first_window,
        |  (CAST(cum AS BIGINT) - 1) // 512 AS last_window,
        |  ((CAST(cum AS BIGINT) - 1) // 512)
        |    - ((CAST(cum AS BIGINT) - n_tokens) // 512) + 1 AS n_windows
        |FROM c ORDER BY doc_id""".stripMargin,
    // exact replay: size class, per-class 0-based rank over doc_id,
    // bin = class·2^40 + rank // class, slot = rank % class; overflow
    // (tokens > capacity) one per bin
    "cp8_shelf_pack" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents WHERE LENGTH(TRIM(text)) > 0),
        |cls AS (SELECT doc_id, n_tokens,
        |    CAST(CASE WHEN n_tokens > 256 THEN 0
        |         ELSE 256 // n_tokens END AS BIGINT) AS size_class
        |  FROM toks),
        |r AS (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY size_class ORDER BY doc_id) - 1 AS rnk
        |  FROM cls)
        |SELECT doc_id, n_tokens, size_class,
        |  CAST(CASE WHEN size_class = 0 THEN rnk
        |       ELSE size_class * 1099511627776 + rnk // size_class
        |       END AS BIGINT) AS bin_id,
        |  CAST(CASE WHEN size_class = 0 THEN 0
        |       ELSE rnk % size_class END AS BIGINT) AS slot,
        |  size_class = 0 AS overflow
        |FROM r ORDER BY doc_id""".stripMargin,
    "sm8_interleave" ->
      """WITH r AS (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents WHERE lang IN ('en', 'zh', 'es', 'de', 'fr'))
        |SELECT CAST(rn AS BIGINT) * CASE lang WHEN 'en' THEN 1
        |    WHEN 'zh' THEN 2 WHEN 'es' THEN 2 ELSE 4 END AS pos,
        |  lang, doc_id, rn
        |FROM r ORDER BY pos, lang, doc_id""".stripMargin,
    // the v8_kmeans CTE chain (seed → assign → decimal-exact recenter
    // → reassign) feeding the sm3 per-group sampling idiom
    "sm6_cluster_balanced" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |seeds AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
        |    emb AS cvec
        |  FROM base ORDER BY vec_id LIMIT 8),
        |s1 AS (
        |  SELECT b.vec_id, b.emb, c.cl,
        |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
        |      ORDER BY list_cosine_similarity(b.emb, c.cvec) DESC, c.cl) AS rn
        |  FROM base b CROSS JOIN seeds c),
        |a1 AS (SELECT vec_id, emb, cl FROM s1 WHERE rn = 1),
        |ex AS (SELECT cl, unnest(emb) AS v,
        |         unnest(range(len(emb))) AS pos FROM a1),
        |r1 AS (SELECT cl, pos,
        |         CAST(SUM(CAST(v AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS m
        |       FROM ex GROUP BY cl, pos),
        |c1 AS (SELECT cl, list(m ORDER BY pos) AS cvec FROM r1 GROUP BY cl),
        |s2 AS (
        |  SELECT b.vec_id, c.cl,
        |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
        |      ORDER BY list_cosine_similarity(b.emb, c.cvec) DESC, c.cl) AS rn
        |  FROM base b CROSS JOIN c1 c),
        |asg AS (SELECT vec_id, cl FROM s2 WHERE rn = 1)
        |SELECT cl AS cluster, vec_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY cl
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INTEGER) AS rn
        |FROM asg
        |QUALIFY rn <= 10
        |ORDER BY cluster, rn""".stripMargin,
    // quotas are the largest-remainder apportionment of 200 over the
    // literal weights — exact here (no remainders): 80/40/40/20/20
    "sm7_mixture_sample" ->
      """SELECT lang, doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn
        |FROM documents
        |WHERE lang IN ('de', 'en', 'es', 'fr', 'zh')
        |QUALIFY rn <= CASE lang WHEN 'en' THEN 80 WHEN 'zh' THEN 40
        |  WHEN 'es' THEN 40 WHEN 'de' THEN 20 WHEN 'fr' THEN 20 ELSE 0 END
        |ORDER BY lang, rn""".stripMargin,
    // quotas re-derived from the observed stratum sizes in exact
    // integer arithmetic: w = floor(sqrt(n)), floor quota
    // (w·200) // T, remainders (w·200) % T bumped largest-first
    "sm10_temperature_mix" ->
      """WITH counts AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |wts AS (SELECT lang, CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)
        |          AS w FROM counts),
        |tot AS (SELECT SUM(w) AS t FROM wts),
        |fl AS (SELECT lang, (w * 200) // t AS f, (w * 200) % t AS r
        |       FROM wts CROSS JOIN tot),
        |lft AS (SELECT 200 - SUM(f) AS lf FROM fl),
        |quota AS (
        |  SELECT lang, f + CASE WHEN ROW_NUMBER() OVER
        |      (ORDER BY r DESC, lang) <= lf THEN 1 ELSE 0 END AS q
        |  FROM fl CROSS JOIN lft),
        |drawn AS (
        |  SELECT lang, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn
        |  FROM documents)
        |SELECT d.lang, d.doc_id, d.rn
        |FROM drawn d JOIN quota USING (lang)
        |WHERE d.rn <= q
        |ORDER BY lang, rn""".stripMargin,
    "sm2_stratified_sample" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 8) <
        |  CASE WHEN label % 2 = 0 THEN '80000000' ELSE '1999999a' END
        |ORDER BY vec_id""".stripMargin,
    "sm9_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id, lang,
        |    ((strpos('0123456789abcdef', substring(md5(term), 31, 1)) - 1) * 16
        |     + strpos('0123456789abcdef', substring(md5(term), 32, 1)) - 1) % 64 AS b
        |  FROM toks),
        |rawb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rc FROM tb GROUP BY 1),
        |tgtb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS tc
        |         FROM tb WHERE lang = 'en' GROUP BY 1),
        |totals AS (SELECT CAST(COUNT(*) AS BIGINT) AS rtot,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ttot
        |  FROM tb),
        |lr AS (
        |  SELECT rawb.b,
        |    CAST(ROUND((ln(CAST(COALESCE(tc, 0) + 1 AS DOUBLE) / (ttot + 64)) -
        |                ln(CAST(rc + 1 AS DOUBLE) / (rtot + 64))) * 1000000.0, 0)
        |      AS BIGINT) AS lr_micro
        |  FROM rawb LEFT JOIN tgtb USING (b), totals),
        |db AS (SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM tb GROUP BY 1, 2, 3),
        |perdoc AS (
        |  SELECT doc_id, lang, CAST(SUM(c * lr_micro) AS BIGINT) AS w_micro
        |  FROM db JOIN lr USING (b) GROUP BY 1, 2)
        |SELECT doc_id, lang, w_micro
        |FROM perdoc
        |QUALIFY ROW_NUMBER() OVER (ORDER BY w_micro DESC, doc_id)
        |  <= CEIL(0.2 * (SELECT COUNT(*) FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "cp5_source_cap" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_source,
        |    CAST(CEIL(SQRT(CAST(COUNT(*) OVER (PARTITION BY source) AS DOUBLE))) AS BIGINT) AS cap,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn
        |  FROM documents)
        |SELECT doc_id, source, n_source, cap, rn
        |FROM ranked WHERE rn <= cap
        |ORDER BY doc_id""".stripMargin,
    "sm3_per_group_sample" ->
      """SELECT source, doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn
        |FROM documents
        |QUALIFY rn <= 5
        |ORDER BY source, rn""".stripMargin,
    "sql1_text_query" ->
      """SELECT c.c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderstatus = 'F'
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin,
    "sm4_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT lang, doc_id, n_chars,
        |    ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |           AS BIGINT) + CAST(0.5 AS DOUBLE))
        |       / CAST(16777216 AS DOUBLE)) / n_chars AS es_key
        |  FROM documents)
        |SELECT lang,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY es_key DESC, doc_id) AS INTEGER) AS rnk,
        |  doc_id, n_chars
        |FROM keyed QUALIFY rnk <= 10
        |ORDER BY lang, rnk""".stripMargin,
    "sm1_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
        |       THEN 'train' ELSE 'eval' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "cm1_split_contamination" ->
      """WITH docs AS (
        |  SELECT doc_id, text,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
        |         THEN 'train' ELSE 'eval' END AS split
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, split,
        |    UNNEST(list_distinct(list_transform(
        |      generate_series(1, GREATEST(len(text) - 7, 1)),
        |      i -> substr(text, CAST(i AS INT), 8)))) AS g
        |  FROM docs),
        |tg AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),
        |shared AS (
        |  SELECT doc_id, COUNT(*) AS n_shared
        |  FROM grams JOIN tg USING (g)
        |  WHERE split = 'eval' GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(s.n_shared, 0) AS n_shared,
        |  COALESCE(s.n_shared, 0) > 0 AS contaminated
        |FROM docs d LEFT JOIN shared s USING (doc_id)
        |WHERE d.split = 'eval'
        |ORDER BY d.doc_id""".stripMargin,
    // cm2: the portable-family chain (cp1's sig/band CTE spelling, over
    // the RAW documents table — no quality gate) + an eval→train band
    // join and per-eval aggregation. The oracle joins raw signature
    // slices where Spark joins their 60-bit md5; identical
    // post-threshold (≥13/16 agreement ⇒ ≥1 band agrees raw ⇒ both
    // joins surface the pair; raw-equal ⇒ md5-equal ⇒ no pair lost).
    "cm2_fuzzy_decontam" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(trim(
        |    regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
        |  FROM documents),
        |shingles AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i : i + 2], ' ') AS sh
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(1, GREATEST(len(toks) - 2, 1))) AS i
        |        FROM toks)),
        |shash AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(sh), 1, 12) AS BIGINT) AS h
        |  FROM shingles),
        |perms AS (
        |  SELECT i, CAST('0x' || substring(
        |      md5('perm' || CAST(i AS VARCHAR)), 1, 12) AS BIGINT) AS c
        |  FROM generate_series(0, 15) AS gs(i)),
        |hashes AS (
        |  SELECT doc_id, p.i AS i, MIN(xor(h, p.c)) AS m
        |  FROM shash, perms p GROUP BY doc_id, p.i),
        |sigs AS (SELECT doc_id, list(m ORDER BY i) AS sig
        |         FROM hashes GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, b.b AS band,
        |    array_to_string(sig[b.b * 4 + 1 : b.b * 4 + 4], '_') AS bkey
        |  FROM sigs, generate_series(0, 3) AS b(b)),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
        |         THEN 'train' ELSE 'eval' END AS split
        |  FROM documents),
        |cand AS (
        |  SELECT DISTINCT e.doc_id AS doc_id, t.doc_id AS train_id
        |  FROM bands e JOIN sp se ON se.doc_id = e.doc_id AND se.split = 'eval'
        |    JOIN bands t ON t.band = e.band AND t.bkey = e.bkey
        |    JOIN sp st ON st.doc_id = t.doc_id AND st.split = 'train'),
        |scored AS (
        |  SELECT c.doc_id, c.train_id,
        |    list_sum(list_transform(list_zip(sa.sig, sb.sig),
        |      p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) / 16.0 AS est
        |  FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_id
        |    JOIN sigs sb ON sb.doc_id = c.train_id),
        |agg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
        |    CAST(MAX(est) AS DOUBLE) AS max_est,
        |    MIN(train_id) AS nearest_train
        |  FROM scored WHERE est >= 0.8 GROUP BY doc_id)
        |SELECT s.doc_id, COALESCE(a.n_matches, 0) AS n_matches,
        |  a.max_est, a.nearest_train,
        |  COALESCE(a.n_matches, 0) > 0 AS contaminated
        |FROM sp s LEFT JOIN agg a USING (doc_id)
        |WHERE s.split = 'eval'
        |ORDER BY s.doc_id""".stripMargin,
    "sm5_kfold" ->
      """SELECT doc_id,
        |  CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |    AS BIGINT) % 5 AS INTEGER) AS fold
        |FROM documents ORDER BY doc_id""".stripMargin,
    "cp2_curate_exact" ->
      """WITH gated AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE n_chars BETWEEN 1 AND 100000
        |    AND CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |        / GREATEST(len(text), 1) <= CAST(0.2 AS DOUBLE)
        |    AND lang IN ('en', 'vi', 'de', 'fr')),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text))
        |SELECT g.doc_id,
        |  CASE WHEN substring(md5(CAST(g.doc_id AS VARCHAR)), 1, 2) < 'cc'
        |       THEN 'train' ELSE 'eval' END AS split
        |FROM gated g SEMI JOIN keep USING (doc_id)
        |ORDER BY g.doc_id""".stripMargin
  )
}
