package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact substring-duplication coverage (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499 —
  * the ExactSubstr criterion): a span duplicated VERBATIM anywhere
  * else in the corpus marks low-value text even when the documents as
  * wholes are distinct (mirrored boilerplate, quoted chains, licence
  * blocks). The paper removes 50-token repeated spans via a corpus
  * suffix array; the distributed re-expression samples fixed-length
  * character grams on a stride and scores each document by the share
  * of its grams that occur in at least one OTHER document — the
  * curation signal (filter/downweight by `dup_ratio`) without the
  * suffix array's global sort.
  *
  * Shape: one (doc, gram) table (per-doc-distinct, ~len/stride rows
  * per doc), one groupBy(gram) for the distinct-doc count, one join
  * back, one groupBy(doc). All keys hash-partition; nothing driver-
  * side, nothing quadratic — candidate cost is linear in corpus size,
  * unlike pairwise near-dup detection.
  *
  * Scale note: raw grams are `l`-character shuffle keys (exact, and
  * what the DuckDB oracle can reproduce — the registered default);
  * `hashGrams` folds them to 8-byte xxhash64 keys first, cutting
  * shuffle width ~5× at the usual fingerprint trade (a 64-bit
  * collision falsely marks one gram duplicated; at corpus scale
  * choose it deliberately). Parity at collision-free scale is
  * spec-pinned.
  */
object SubstringDedup {

  /** Distinct (doc_id, gram) pairs: every `l`-char substring starting
    * at stride multiples (docs shorter than `l` carry no gram and are
    * excluded, same as the oracle's length filter).
    */
  def gramTable(docs: DataFrame, idCol: String, textCol: String,
      l: Int, stride: Int): DataFrame = {
    require(l >= 1 && stride >= 1, s"need l >= 1, stride >= 1; got $l, $stride")
    docs.filter(length(col(textCol)) >= l)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(expr(
          s"transform(sequence(0, (length($textCol) - $l) div $stride)," +
            s" i -> substring($textCol, i * $stride + 1, $l))"))).as("gram"))
  }

  /** Per-document duplicated-substring coverage:
    * (doc_id, n_grams, n_dup_grams, dup_ratio), where a gram counts as
    * duplicated iff some OTHER document contains it too.
    */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
      l: Int = 40, stride: Int = 10, hashGrams: Boolean = false): DataFrame = {
    val g0 = gramTable(docs, idCol, textCol, l, stride)
    val g = if (hashGrams) g0.select(col("doc_id"), xxhash64(col("gram")).as("gram"))
            else g0
    val nd = g.groupBy(col("gram"))
      .agg(count_distinct(col("doc_id")).as("nd"))
    g.join(nd, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_ratio",
        round(col("n_dup_grams").cast("double") / col("n_grams"), 4))
  }
}
