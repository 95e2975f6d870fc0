package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share at least
  * `minShared` distinct word n-grams with ANY document of a holdout set
  * (the standard guard against test-set leakage into training data).
  *
  * Shape: distinct n-grams per side (MinHashLSH.shingled — one native
  * pass per row), the holdout's gram set deduplicated ACROSS docs, then
  * an inverted-index join on gram + one partial-aggregatable count per
  * corpus doc. No pair materialization: a corpus doc is scored against
  * the holdout set as a whole, not per holdout doc.
  *
  * Scale: the holdout is benchmark-sized (thousands of docs) while the
  * corpus is the 100 TB side, so the joined gram set is tiny — AQE
  * broadcasts it and the corpus-side explode never shuffles (map-side
  * join + partial count). If the holdout ever rivals the corpus, the
  * join degrades gracefully to a shuffle keyed on gram (uniform keys).
  */
object Decontaminate {

  /** (doc_id, n_shared) for corpus docs sharing ≥ minShared distinct
    * n-grams with the holdout gram set.
    */
  def overlap(corpus: DataFrame, holdout: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Int): DataFrame = {
    val corpusGrams = MinHashLSH.shingled(corpus, idCol, textCol, n)
      .select(col("doc_id"), explode(col("shingles")).as("g"))
    val holdoutGrams = MinHashLSH.shingled(holdout, idCol, textCol, n)
      .select(explode(col("shingles")).as("g")).distinct()
    // per-doc grams are distinct (wordNgrams dedups) and the holdout set
    // is distinct, so a plain count after the join IS |doc ∩ holdout|
    corpusGrams.join(holdoutGrams, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
