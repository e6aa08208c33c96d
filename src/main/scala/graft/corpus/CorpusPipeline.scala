package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** End-to-end training-corpus curation — the composite the individual
  * operators exist for, in the order a 100 TB pipeline runs them
  * (cheapest filter first, so each stage sees fewer rows):
  *
  *  1. quality gate: per-document ratio features, threshold filter
  *     (pure per-row math — no shuffle);
  *  2. language filter (per-row);
  *  3. exact dedup: md5 content hash, keep min doc_id per hash
  *     (one shuffle on the 16-byte hash, never on text);
  *  4. near-dup clustering: word-shingle MinHash signatures, LSH band
  *     buckets → candidate pairs (equi-join on band hash — candidates
  *     ≪ n², the point of LSH), estimated-Jaccard threshold, connected
  *     components over surviving pairs, keep each cluster's min doc_id;
  *  5. reproducible content-hash train/eval split (pure function of
  *     doc_id — re-runs and corpus growth never reshuffle membership).
  *
  * Everything shuffles fixed-width hashes; text leaves the executors
  * only as the final curated corpus.
  */
object CorpusPipeline {

  final case class CorpusStats(input: Long, afterQuality: Long,
                               afterExact: Long, afterNear: Long,
                               train: Long, eval: Long)

  /** Near-dup candidate pairs (shared MinHash+LSH implementation in
    * [[graft.operators.MinHashLSH]]), filtered to estimated Jaccard ≥
    * `minJaccard`. */
  def nearDupPairs(docs: DataFrame, minJaccard: Double): DataFrame =
    graft.operators.MinHashLSH.candidatePairs(docs)
      .filter(col("est_jaccard") >= minJaccard)
      .select("src", "dst")

  /** Stage 1+2: per-row quality + language gate (no shuffle). */
  def qualityGate(docs: DataFrame, langs: Seq[String], minChars: Int,
                  maxChars: Int, maxPunctRatio: Double): DataFrame =
    docs
      .withColumn("__len", greatest(length(col("text")), lit(1)))
      .withColumn("__punct",
        expr("CAST(regexp_count(text, '[.,!?;:]') AS DOUBLE)") / col("__len"))
      .filter(col("n_chars").between(minChars, maxChars) &&
        col("__punct") <= maxPunctRatio &&
        col("lang").isin(langs: _*))
      .drop("__len", "__punct")

  /** Stage 3: exact dedup on content hash, keep min doc_id (one shuffle
    * on the 16-byte hash, never on text). */
  def exactDedupKeepMin(gated: DataFrame): DataFrame = {
    val keep = gated
      .groupBy(md5(col("text")).as("__fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .drop("__fp")
    gated.join(keep, Seq("doc_id"), "left_semi")
  }

  /** The deterministic (SQL-expressible) sub-pipeline: quality gate →
    * exact dedup → content-hash split, skipping the probabilistic
    * near-dup stage — runs the SAME production stage functions `curate`
    * composes, which is what lets the driver's DuckDB oracle gate them
    * end-to-end (cp2) while the full composite stays rows-only (cp1). */
  def curateExact(docs: DataFrame, langs: Seq[String] = Seq("en"),
                  minChars: Int = 100, maxChars: Int = 100000,
                  maxPunctRatio: Double = 0.2,
                  trainHexThreshold: String = "cc"): DataFrame =
    exactDedupKeepMin(
      qualityGate(docs, langs, minChars, maxChars, maxPunctRatio))
      .withColumn("split",
        graft.operators.Splits.hashSplit(col("doc_id"), trainHexThreshold))

  /** Curate `docs` (doc_id, text, lang, n_chars …) → (curated corpus with
    * `split` column, per-stage stats).
    *
    * `precomputedPairs`: optional FULL-CORPUS candidate pairs
    * (`MinHashLSH.cachedPairs` output) to reuse instead of running the
    * LSH pass here. Candidate membership is per-pair (two docs collide
    * iff their own band hashes match), so restricting full-corpus pairs
    * to the quality+exact survivors is exactly the pair set an LSH pass
    * over the survivors would produce — one shared pass per corpus
    * instead of one per consumer. */
  def curate(spark: SparkSession, docs: DataFrame,
             langs: Seq[String] = Seq("en"),
             minChars: Int = 100, maxChars: Int = 100000,
             maxPunctRatio: Double = 0.2,
             minJaccard: Double = 0.8,
             trainHexThreshold: String = "cc",
             precomputedPairs: Option[DataFrame] = None): (DataFrame, CorpusStats) = {
    val input = docs.count()

    // 1+2: per-row quality + language gate
    val gated = qualityGate(docs, langs, minChars, maxChars, maxPunctRatio)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterQuality = gated.count()

    // 3: exact dedup on content hash, keep min doc_id
    val exact = exactDedupKeepMin(gated)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterExact = exact.count()
    gated.unpersist()

    // 4: near-dup clusters → keep each component's min doc_id
    val pairs = precomputedPairs match {
      case Some(all) =>
        val ids = exact.select("doc_id")
        all.filter(col("est_jaccard") >= minJaccard)
          .join(ids.withColumnRenamed("doc_id", "src"), Seq("src"), "left_semi")
          .join(ids.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_semi")
          .select("src", "dst")
      case None => nearDupPairs(exact, minJaccard)
    }
    val components = ConnectedComponents.run(
      exact.select(col("doc_id").as("id")), pairs)
    val canonical = components.filter(col("id") === col("component"))
      .select(col("id").as("doc_id"))
    val near = exact.join(canonical, Seq("doc_id"), "left_semi")

    // 5: reproducible split (shared definition — operators.Splits)
    val curated = near.withColumn("split",
      graft.operators.Splits.hashSplit(col("doc_id"), trainHexThreshold))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one action yields both stage counts (total + per-split)
    val bySplit = curated.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val afterNear = bySplit.values.sum
    exact.unpersist()
    val train = bySplit.getOrElse("train", 0L)

    (curated, CorpusStats(input, afterQuality, afterExact, afterNear,
      train, afterNear - train))
  }

  /** LEAKAGE-SAFE train/eval split — the eval-contamination guard the
    * plain per-doc hash split cannot give: two near-duplicate documents
    * split independently land one in train and one in eval ~25% of the
    * time, and the eval copy is then memorized, not generalized to. The
    * split key here is the near-dup COMPONENT id (each cluster's
    * minimum doc_id), so every cluster lands WHOLE on one side — the
    * standard grouped-split discipline (GroupKFold / dedup-aware eval
    * construction), composed from the engine's own pieces: quality gate
    * → exact dedup → portable MinHash pairs → connected components →
    * `Splits.hashSplit(component)`. Deterministic and engine-portable
    * end to end (the same recursive-CC DuckDB chain that gates cp1
    * replays it exactly).
    *
    * Returns ALL quality+exact survivors — canonical or not — each
    * tagged (component, split): downstream curation may still drop
    * non-canonicals, but the split assignment must be made (and is
    * reproducible) for every retained document. */
  def leakageSafeSplit(spark: SparkSession, docs: DataFrame,
                       langs: Seq[String] = Seq("en"),
                       minChars: Int = 100, maxChars: Int = 100000,
                       maxPunctRatio: Double = 0.2,
                       minJaccard: Double = 0.8,
                       trainHexThreshold: String = "cc",
                       precomputedPairs: Option[DataFrame] = None): DataFrame = {
    val gated = qualityGate(docs, langs, minChars, maxChars, maxPunctRatio)
    val exact = exactDedupKeepMin(gated)
      .localCheckpoint(true) // feeds pairs, CC, and the final join
    val pairs = precomputedPairs match {
      case Some(all) =>
        val ids = exact.select("doc_id")
        all.filter(col("est_jaccard") >= minJaccard)
          .join(ids.withColumnRenamed("doc_id", "src"), Seq("src"), "left_semi")
          .join(ids.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_semi")
          .select("src", "dst")
      case None => nearDupPairs(exact, minJaccard)
    }
    val components = ConnectedComponents.run(
      exact.select(col("doc_id").as("id")), pairs)
    exact.join(components.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("component"),
        graft.operators.Splits.hashSplit(col("component"), trainHexThreshold)
          .as("split"))
  }
}
