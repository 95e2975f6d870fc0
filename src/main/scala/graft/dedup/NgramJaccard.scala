package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Exact n-gram Jaccard pair mining via an inverted index.
  *
  * Two phases, both distributed:
  *  1. candidates — explode (doc, shingle), drop shingles with document
  *     frequency > maxDf, self-join on shingle, distinct pairs. The df
  *     cap is the standard guard against the Σ df² blowup (one shingle
  *     in 1M docs would alone emit 5·10¹¹ pairs); it cannot miss a
  *     near-duplicate pair unless the pair shares ONLY ubiquitous
  *     shingles — for J ≥ tau the pair shares most of their shingles,
  *     so any rare shingle in either doc is almost surely shared.
  *  2. verify — join candidates back to the full (unpruned) shingle
  *     arrays and compute EXACT Jaccard with array_intersect/union, so
  *     the reported value is never affected by the df cap.
  *
  * Shuffles key on shingle then (id_a, id_b): uniform, AQE-safe.
  */
object NgramJaccard {

  /** Exact Jaccard ≥ tau pairs over word n-grams.
    * Output: (id_a, id_b, jaccard rounded to 4), id_a < id_b.
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, maxDf: Int = 100): DataFrame = {
    val shingled = docs.select(col(idCol).as("doc_id"),
        TextOps.wordNgrams(TextOps.tokens(col(textCol)), n).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val sh = shingled.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("sh"))
    val indexed = sh.join(rare, "sh")
    val cand = indexed.as("a")
      .join(indexed.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val shA = shingled.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val shB = shingled.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    cand.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
