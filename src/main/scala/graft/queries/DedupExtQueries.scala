package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.CosineSimilarity

/** Remaining training-data dedup/text primitives: embedding-cosine
  * near-duplicate detection, BPE-style regex tokenization, and
  * winnowing-style rolling-hash fingerprints.
  *
  * Scale notes: dd6's all-pairs join is the CORRECTNESS baseline — at
  * corpus scale candidate pairs come from v4's sign-projection buckets
  * (equi-join) and only candidates get the exact cosine; tx6 shuffles
  * fixed-width hashes, never raw text.
  */
object DedupExtQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // embedding-cosine near-dup pairs: keeper = lower vec_id. (0.4 threshold: the synthetic embeddings are near-orthogonal random vectors, real corpora use ~0.95)
    "dd6_embedding_neardup" -> ((s, d) => {
      CosineSimilarity.register(s)
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val a = e.select(col("vec_id").as("keep_id"), col("emb").as("ea"))
      val b = e.select(col("vec_id").as("dup_id"), col("emb").as("eb"))
      a.join(b, col("keep_id") < col("dup_id"))
        .withColumn("cs", expr("graft_cosine(ea, eb)"))
        .filter(col("cs") >= 0.4)
        .select(col("keep_id"), col("dup_id"), round(col("cs"), 6).as("cos_sim"))
        .orderBy("keep_id", "dup_id")
    }),

    // near-dup CLUSTERING: cosine pairs → connected components → one
    // canonical member per cluster. Pairs alone under-dedupe (A≈B, B≈C
    // must collapse together even when A≈C missed the threshold);
    // operators.ConnectedComponents runs min-label propagation to
    // fixpoint. Oracle: DuckDB recursive CTE transitive closure.
    "dd7_neardup_clusters" -> ((s, d) => {
      CosineSimilarity.register(s)
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val a = e.select(col("vec_id").as("src"), col("emb").as("ea"))
      val b = e.select(col("vec_id").as("dst"), col("emb").as("eb"))
      val pairs = a.join(b, col("src") < col("dst"))
        .withColumn("cs", expr("graft_cosine(ea, eb)"))
        .filter(col("cs") >= 0.4)
        .select("src", "dst")
      graft.operators.ConnectedComponents
        .run(e.select(col("vec_id").as("id")), pairs)
        .select(col("id").as("vec_id"), col("component").as("cluster"),
          (col("id") === col("component")).as("is_canonical"))
        .orderBy("vec_id")
    }),

    // BPE-ish tokenization: words / numbers / single punctuation, the
    // GPT-2-style pre-tokenizer shape.
    "tx5_bpe_tokens" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          expr("CAST(regexp_count(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]') AS INT)")
            .as("n_bpe_tokens"),
          expr("CAST(regexp_count(text, '[0-9]+') AS INT)").as("n_numeric"))
        .orderBy("doc_id")),

    // winnowing-style fingerprint: the 4 smallest distinct xxhash64 values
    // over the document's character-8-grams (rows-only: engine-specific
    // hash function by design). Shape: explode gram START POSITIONS, then
    // substring+xxhash64 as codegen'd per-row expressions, then ONE
    // ObjectHashAggregate pass with a k-bounded dedup buffer
    // (graft.functions.BottomKLong) — no interpreted per-doc HOF arrays,
    // no array_distinct materialization, no window sort of every gram.
    // Measured 5x faster than transform+array_distinct at this corpus's
    // doc sizes; note the generator carries `text` per position row
    // (O(len²) bytes), so for very long documents flip to the
    // gram-array-then-explode shape (see tx8) — crossover is where 64+
    // interpreted array walks beat the duplicated-string volume.
    "tx6_winnow_fingerprint" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1))))
            .as("i"))
        .select(col("doc_id"), expr("xxhash64(substring(text, i, 8))").as("h"))
        .groupBy("doc_id")
        // concat_ws: driver gate hashes columns via pandas, which can't
        // sort/hash raw array cells — serialize the 4 hashes to one string.
        .agg(concat_ws(",",
          transform(graft.functions.BottomK.bottomK(col("h"), 4),
            x => x.cast("string"))).as("fingerprint"))
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "dd7_neardup_clusters" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS u, b.vec_id AS v
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(
        |      list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.4),
        |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
        |reach AS (
        |  SELECT vec_id AS id, vec_id AS lbl FROM embeddings
        |  UNION
        |  SELECT e.v AS id, r.lbl
        |  FROM reach r JOIN edges e ON e.u = r.id
        |  WHERE r.lbl < e.v)
        |SELECT id AS vec_id, MIN(lbl) AS cluster, (id = MIN(lbl)) AS is_canonical
        |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin,
    "dd6_embedding_neardup" ->
      """WITH cs AS (
        |  SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
        |    list_cosine_similarity(
        |      list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))) AS c
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT keep_id, dup_id, ROUND(c, 6) AS cos_sim
        |FROM cs WHERE c >= 0.4 ORDER BY keep_id, dup_id""".stripMargin,
    "tx5_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_numeric
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
