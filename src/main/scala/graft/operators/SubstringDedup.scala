package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring duplicate detection — "which documents share a
  * verbatim k-word span?" — the deterministic complement to MinHash
  * (which estimates whole-document overlap and misses a long quote
  * inside two otherwise-different documents).
  *
  * Suffix-array pipelines answer this with a corpus-wide sorted suffix
  * structure; the shuffle-friendly equivalent is a postings join:
  *
  *   1. every k-word shingle of every document, deduplicated per doc,
  *      hashed to a fixed-width md5 key (only 32-byte hashes shuffle —
  *      text never leaves the scan stage);
  *   2. a document-frequency cap drops shingles appearing in more than
  *      `dfCap` documents. This is the scale valve, not a heuristic
  *      nicety: a boilerplate span shared by f documents would emit
  *      f·(f−1)/2 pairs from the self-join — one viral header in 1M
  *      docs is 5·10¹¹ rows. Real substring-dedup pipelines cap or
  *      drop hot postings for exactly this reason; a capped shingle
  *      still contributes nothing to "near-identical pair" evidence
  *      because everything matches it.
  *   3. the self-equi-join on the shingle hash counts shared spans per
  *      ordered pair.
  *
  * Work is Σ f_i² over per-shingle doc frequencies, bounded by
  * dfCap·Σ f_i = dfCap·|postings| — linear in corpus size for a fixed
  * cap.
  */
object SubstringDedup {

  /** Ordered pairs (doc_a < doc_b, n_shared) of documents in `docs`
    * sharing at least one exact `k`-word shingle that occurs in at most
    * `dfCap` documents. `docs` must carry (`idCol`, `textCol`);
    * documents shorter than k words contribute their whole text as one
    * shingle.
    *
    * Shape: ONE aggregation builds each shingle's posting list (the
    * dfCap bound makes collect_list safe — a list never exceeds cap+1
    * entries because oversized postings are dropped anyway), postings
    * with a single document vanish there too (no pair to emit), and the
    * surviving lists expand to their ordered pairs in-place with array
    * HOFs. No join-back, no self-join: two data shuffles total (shingle
    * agg, pair agg), and the pair generator's input is only the shared
    * shingles — a sliver of the postings at real corpus skew. */
  def pairs(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", k: Int = 5,
            dfCap: Int = 50): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(1, greatest(size(w) - ${k - 1}, 1)), " +
          s"i -> concat_ws(' ', slice(w, i, $k)))"))).as("g"))
      // 60-bit key from the md5 prefix: an 8-byte long shuffles 5x
      // lighter than the 32-char hex string and still collides only at
      // ~|postings|²/2^61 (engine-reproducible, unlike xxhash64, should
      // an oracle ever need to mirror it).
      .select(col("doc_id"),
        expr("conv(substring(md5(g), 1, 15), 16, 10)").cast("long").as("gh"))
    val postings = grams.groupBy("gh")
      .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")).between(2, dfCap))
    // ds is strictly increasing (per-doc shingles are distinct), so
    // pairing each element with its successors yields doc_a < doc_b.
    postings
      .select(explode(expr(
        """flatten(transform(ds, (a, i) ->
          |  transform(slice(ds, i + 2, size(ds)), b ->
          |    struct(a AS doc_a, b AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
  }
}
