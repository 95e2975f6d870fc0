package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Exact n-gram Jaccard pair mining via an inverted index.
  *
  * Classic shape: explode (doc, shingle); self-join on shingle; count
  * rows per (id_a, id_b) — that count IS |A ∩ B| because shingle sets
  * are distinct per doc; then J = |A∩B| / (|A|+|B|-|A∩B|) with per-doc
  * set sizes joined in (one row per doc — AQE broadcasts it when it
  * fits, shuffle-joins on id otherwise). No per-pair array
  * materialization: the whole thing is joins + a partial-aggregatable
  * count.
  *
  * `maxDf` drops shingles with document frequency > maxDf before the
  * self-join — the standard guard against the Σ df² blowup (one shingle
  * in 1M docs would alone emit 5·10¹¹ pairs). With the cap active the
  * computed J is a LOWER bound (common shingles no longer counted), so
  * pruning is conservative for near-duplicate detection: a true
  * near-dup pair shares mostly rare shingles and keeps J ≈ exact, while
  * background pairs glued only by ubiquitous shingles drop out — they
  * were never near-dups. Set maxDf ≥ corpus size for fully exact output
  * (the regime the DuckDB oracle checks).
  *
  * All shuffles key on shingle or (id_a, id_b): uniform, AQE-safe.
  */
object NgramJaccard {

  /** Jaccard ≥ tau pairs over word n-grams.
    * Output: (id_a, id_b, jaccard rounded to 4), id_a < id_b.
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, maxDf: Int = 100): DataFrame = {
    // attribute-bound tokens: wordNgrams references the array n+1 times
    val shingled = docs.withColumn("graft_toks", TextOps.tokens(col(textCol)))
      .select(col(idCol).as("doc_id"),
        TextOps.wordNgrams(col("graft_toks"), n).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val sizes = shingled.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    val sh = shingled.select(col("doc_id"), explode(col("shingles")).as("sh"))
    // df = 1 shingles can't form a pair — dropping them shrinks the index
    // (singletons usually dominate) without changing ANY pair's count
    val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 1 && col("df") <= maxDf)
      .select(col("sh"))
    val indexed = sh.join(rare, "sh")
    val common = indexed.as("a")
      .join(indexed.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard", round(
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"), 4))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
