package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Exact deduplication: group documents by a normalization key, keep the
  * smallest id per class.
  *
  * The normalization used throughout (lowercase → whitespace tokens →
  * distinct → sort → join) makes token-permuted copies collide — the
  * kind of duplicate a crawl actually produces. Swap `normKey` for
  * `lower(trim(text))` for byte-exact semantics.
  *
  * Scale: one hash-partitioned aggregation on the key; the key is the
  * shuffle payload, so at 100 TB prefer `xxhash64(normKey)` as the
  * grouping column (128-bit via two seeds if collision-paranoid) to ship
  * 8-byte keys instead of document text. Kept as the raw key here so the
  * SQL oracle is byte-identical.
  */
object Dedup {

  /** Order-insensitive token-set normalization key. */
  def normKey(text: Column): Column =
    array_join(array_sort(array_distinct(TextOps.tokens(text))), " ")

  /** One row per duplicate class: surviving (min) doc id + class size. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(normKey(col(textCol)).as("k"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))
      .select(col("keep_id"), col("n_docs"))

  /** Histogram of duplicate-class sizes: (class_size, n_classes). */
  def classHistogram(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(docs, idCol, textCol)
      .groupBy(col("n_docs").as("class_size"))
      .agg(count(lit(1)).as("n_classes"))
}
