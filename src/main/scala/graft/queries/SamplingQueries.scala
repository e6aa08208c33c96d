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
    // 80/20 split on the first two md5 hex chars of the key: 'cc' = 204
    // of 256 buckets ≈ 79.7% train.
    "sm1_hash_split" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
          < "cc", lit("train")).otherwise(lit("eval")).as("split"))
        .orderBy("doc_id")),

    // CP1: full corpus-curation composite (quality gate → lang filter →
    // exact dedup → MinHash-LSH near-dup clustering → canonical select →
    // content-hash split). Rows-only: MinHash internals aren't
    // SQL-expressible; invariants are spec-tested (CorpusPipelineSpec).
    "cp1_corpus_curate" -> ((s, d) => {
      val (curated, _) = graft.corpus.CorpusPipeline.curate(
        s, graft.Tables.documents(s, d),
        langs = Seq("en", "vi", "de", "fr"), minChars = 1, minJaccard = 0.8)
      curated.select("doc_id", "split").orderBy("doc_id")
    }),

    // per-label stratified sample: 50% of even labels, 10% of odd.
    "sm2_stratified_sample" -> ((s, d) => {
      val fractions: Map[Any, Double] =
        (0 until 10).map(l => (l: Any) -> (if (l % 2 == 0) 0.5 else 0.1)).toMap
      embeddings(s, d).stat.sampleBy("label", fractions, 42L)
        .select("vec_id", "label").orderBy("vec_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "sm1_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
        |       THEN 'train' ELSE 'eval' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
