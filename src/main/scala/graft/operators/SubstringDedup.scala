package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring duplicate detection — "which documents share a
  * verbatim k-word span?" — the deterministic complement to MinHash
  * (which estimates whole-document overlap and misses a long quote
  * inside two otherwise-different documents).
  *
  * Suffix-array pipelines answer this with a corpus-wide sorted suffix
  * structure; the shuffle-friendly equivalent is a postings pipeline:
  *
  *   1. every k-word shingle of every document, deduplicated per doc,
  *      hashed to an 8-byte long (a 60-bit md5 prefix — only fixed-width
  *      keys shuffle; text never leaves the scan stage);
  *   2. a document-frequency cap drops shingles appearing in more than
  *      `dfCap` documents — BEFORE any posting list materializes (a
  *      count aggregate whose buffer is one counter, then a semi-join).
  *      This is the scale valve, not a heuristic nicety: a boilerplate
  *      span shared by f documents would emit f·(f−1)/2 pairs — one
  *      viral header in 1M docs is 5·10¹¹ rows — and would equally
  *      build an f-element aggregation buffer if collected first. A
  *      capped shingle contributes nothing to "near-identical pair"
  *      evidence anyway, because everything matches it.
  *   3. each surviving (≤ dfCap-element) posting list expands to its
  *      ordered pairs in place — no postings self-join.
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
    * Shape: a count aggregate (constant-size buffer, map-side partial
    * combine) finds the shingles shared by 2..dfCap documents; a
    * semi-join keeps only their postings — so when collect_list THEN
    * builds the posting lists, no list can exceed dfCap entries, even
    * for a shingle viral across millions of documents (collecting
    * first and size-filtering after would build the multi-million-entry
    * buffer before discarding it). Singleton postings vanish in the
    * same count filter (no pair to emit), and the surviving lists
    * expand to their ordered pairs in-place with array HOFs. No
    * join-back, no self-join: three hash-key shuffles total (count agg,
    * postings semi-join, pair agg) — the middle one is the price of the
    * bounded buffers — and the pair generator's input is only the
    * shared shingles, a sliver of the postings at real corpus skew. */
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
    // hot-shingle valve FIRST: survivors known from a counter before any
    // posting list exists, so the collect below is provably ≤ dfCap
    val shared = grams.groupBy("gh").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, dfCap))
      .select("gh")
    val postings = grams.join(shared, Seq("gh"), "left_semi")
      .groupBy("gh")
      .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
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
