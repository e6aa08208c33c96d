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

  /** Near-dup candidate pairs via MinHash (16 perms) + LSH (4 bands × 4
    * rows), filtered to estimated Jaccard ≥ `minJaccard`. */
  def nearDupPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val hashed = docs
      .select(col("doc_id"),
        split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(1, greatest(size(toks) - 2, 1)),
          |  i -> xxhash64(concat_ws(' ', toks[i-1], toks[i], toks[i+1]))))""".stripMargin))
        .as("h"))
    val aggs = (0 until 16).map(p => min(xxhash64(col("h"), lit(p))).as(s"m$p"))
    val sigs = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until 16).map(p => col(s"m$p")): _*).as("sig"),
        array((0 until 4).map(b => struct(
          lit(b).as("band_id"),
          xxhash64((b * 4 until b * 4 + 4).map(i => col(s"m$i")): _*).as("band_hash"))): _*)
          .as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs
      .select(col("doc_id"), col("sig"), explode(col("bands")).as("band"))
      .select(col("doc_id"), col("sig"), col("band.band_id"), col("band.band_hash"))
    val a = banded.select(col("doc_id").as("src"), col("sig").as("sig_a"),
      col("band_id"), col("band_hash"))
    val b = banded.select(col("doc_id").as("dst"), col("sig").as("sig_b"),
      col("band_id"), col("band_hash"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("src") < col("dst"))
      .withColumn("est_jaccard",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) / CAST(16.0 AS DOUBLE)"))
      .filter(col("est_jaccard") >= minJaccard)
      .select("src", "dst").distinct()
  }

  /** Curate `docs` (doc_id, text, lang, n_chars …) → (curated corpus with
    * `split` column, per-stage stats). */
  def curate(spark: SparkSession, docs: DataFrame,
             langs: Seq[String] = Seq("en"),
             minChars: Int = 100, maxChars: Int = 100000,
             maxPunctRatio: Double = 0.2,
             minJaccard: Double = 0.8,
             trainHexThreshold: String = "cc"): (DataFrame, CorpusStats) = {
    val input = docs.count()

    // 1+2: per-row quality + language gate
    val gated = docs
      .withColumn("__len", greatest(length(col("text")), lit(1)))
      .withColumn("__punct",
        expr("CAST(regexp_count(text, '[.,!?;:]') AS DOUBLE)") / col("__len"))
      .filter(col("n_chars").between(minChars, maxChars) &&
        col("__punct") <= maxPunctRatio &&
        col("lang").isin(langs: _*))
      .drop("__len", "__punct")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterQuality = gated.count()

    // 3: exact dedup on content hash, keep min doc_id
    val keepExact = gated
      .groupBy(md5(col("text")).as("__fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .drop("__fp")
    val exact = gated.join(keepExact, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterExact = exact.count()
    gated.unpersist()

    // 4: near-dup clusters → keep each component's min doc_id
    val pairs = nearDupPairs(exact, minJaccard)
    val components = ConnectedComponents.run(
      exact.select(col("doc_id").as("id")), pairs)
    val canonical = components.filter(col("id") === col("component"))
      .select(col("id").as("doc_id"))
    val near = exact.join(canonical, Seq("doc_id"), "left_semi")

    // 5: reproducible split
    val curated = near.withColumn("split",
      when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
        < trainHexThreshold, lit("train")).otherwise(lit("eval")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterNear = curated.count()
    exact.unpersist()
    val train = curated.filter(col("split") === "train").count()

    (curated, CorpusStats(input, afterQuality, afterExact, afterNear,
      train, afterNear - train))
  }
}
