package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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
  *      `dfCap` documents — with a BOUNDED aggregation buffer, so the
  *      cap protects memory as well as output size. This is the scale
  *      valve, not a heuristic nicety: a boilerplate span shared by f
  *      documents would emit f·(f−1)/2 pairs — one viral header in 1M
  *      docs is 5·10¹¹ rows — and a plain collect-then-filter would
  *      equally build the f-element posting list in one aggregation
  *      buffer before discarding it. A capped shingle contributes
  *      nothing to "near-identical pair" evidence anyway, because
  *      everything matches it.
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
    * Shape: ONE aggregation builds each shingle's posting list through
    * [[graft.functions.CappedCollectLong]] — a collect whose buffer
    * never exceeds dfCap+1 entries, so a shingle viral across millions
    * of documents costs dfCap+1 longs of executor memory, not an
    * f-element array (the hot-postings OOM a plain collect_list +
    * size-filter would hit, since the filter only runs AFTER the full
    * list materializes). Over-cap lists come out truncated at dfCap+1
    * and the size filter drops them — identical results, bounded
    * memory, still one pass over the postings (the count-then-semi-join
    * alternative is equally safe but re-derives every shingle for the
    * join side: measured 1.8× slower end-to-end). Singleton postings
    * vanish in the same filter (no pair to emit), and the surviving
    * lists expand to their ordered pairs in-place with array HOFs. No
    * join-back, no self-join: two data shuffles total (posting agg,
    * pair agg), and the pair generator's input is only the shared
    * shingles — a sliver of the postings at real corpus skew.
    *
    * Integral id columns ride the capped-buffer path; other id types
    * fall back to the two-pass count+semi-join, which bounds every
    * buffer (a counter, then ≤ dfCap-element lists) at the cost of
    * re-deriving the shingles once. */
  def pairs(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", k: Int = 5,
            dfCap: Int = 50): DataFrame = {
    val idType = docs.schema(idCol).dataType
    val integral = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val grams = docs
      // null ids are dropped EXPLICITLY on both paths: the typed
      // CappedCollectLong aggregator's primitive Long input would
      // otherwise deserialize a null id as 0L — fabricating pairs for a
      // doc "0" — while the non-integral collect_list path silently
      // skips nulls (r16 adversarial review)
      .filter(col(idCol).isNotNull)
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
    val postings =
      if (integral)
        grams.groupBy("gh")
          .agg(graft.functions.CappedCollect
            .cappedCollectLong(col("doc_id").cast("long"), dfCap).as("ds"))
          .filter(size(col("ds")).between(2, dfCap))
      else {
        // non-integral ids: bound the buffers with a counter + semi-join
        val shared = grams.groupBy("gh").agg(count(lit(1)).as("df"))
          .filter(col("df").between(2, dfCap))
          .select("gh")
        grams.join(shared, Seq("gh"), "left_semi")
          .groupBy("gh")
          .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
      }
    // ds is strictly increasing (per-doc shingles are distinct), so
    // pairing each element with its successors yields doc_a < doc_b.
    postings
      .select(explode(expr(
        """flatten(transform(ds, (a, i) ->
          |  transform(slice(ds, i + 2, size(ds)), b ->
          |    struct(a AS doc_a, b AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a").cast(idType).as("doc_a"),
        col("p.doc_b").cast(idType).as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
  }
}
