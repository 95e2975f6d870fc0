package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact edit-distance (Levenshtein) fuzzy self-join via q-gram PREFIX
  * filtering — the EDJoin family (Xiao, Wang, Lin VLDB'08; Gravano
  * VLDB'01), the entity-resolution primitive behind typo clustering,
  * catalog reconciliation, and near-identical-key dedup.
  *
  * The naive plan is a quadratic crossJoin with `levenshtein(a,b) <= k`
  * — dead at any scale (and Levenshtein is O(|a|·|b|) per pair). The
  * blocked plan is exact but near-linear:
  *
  *  1. q-gram signatures: each distinct value's DISTINCT q-grams. One
  *     edit operation rewrites at most q gram occurrences, so
  *     ed(a,b) ≤ k ⟹ |G(a)\G(b)| ≤ k·q (every lost gram TYPE must have
  *     had an occurrence touched) ⟹ the pair shares
  *     ≥ max(|G(a)|,|G(b)|) − k·q grams.
  *  2. prefix filtering (the same smallest-common-element argument as
  *     [[graft.dedup.NgramJaccard]]): order every value's grams by the
  *     canonical (global df, gram) order; the smallest SHARED gram of a
  *     qualifying pair sits within the first k·q + 1 grams of BOTH
  *     sides. Indexing only that prefix — the RARE end of each value,
  *     since the order is df-ascending — still surfaces every
  *     qualifying pair, while high-df grams almost never enter the
  *     index (the Σ df² blow-up the naive inverted index dies of).
  *  3. candidates (distinct prefix-join pairs, pre-filtered by
  *     |len(a) − len(b)| ≤ k — an edit changes length by ≤ 1) are
  *     verified with Spark's codegen'd `levenshtein`; every emitted
  *     pair carries its exact distance.
  *
  * Values with ≤ k·q distinct grams get no overlap guarantee (a
  * qualifying pair may share NO gram: ed("ab","cd") = 2). They are
  * routed to a broadcast short-side: shorts × everything, still
  * length-filtered and verified. Short strings have bounded useful
  * cardinality (|Σ|^len), so the broadcast side stays KB-scale however
  * big the corpus — and the main index never sees them.
  *
  * Shuffles: gram df (uniform), per-value ranking window on the value,
  * prefix join on gram (rare grams only), candidate distinct. All
  * uniform keys; nothing quadratic except inside verified candidates.
  */
object FuzzyJoin {

  /** Distinct (name_a < name_b, dist) pairs with ed ≤ maxDist over the
    * distinct values of `valueCol`. Exact: blocked candidate
    * generation is lossless (see above), verification is exact.
    */
  def selfJoin(values: DataFrame, valueCol: String, maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1 && q >= 2, s"need maxDist >= 1, q >= 2")
    val kq = maxDist * q
    val names = values.select(col(valueCol).cast("string").as("name"))
      .filter(col("name").isNotNull)
      .distinct()
      .select(col("name"), length(col("name")).as("len"),
        array_distinct(
          when(length(col("name")) >= q,
            transform(sequence(lit(1), length(col("name")) - (q - 1)),
              i => col("name").substr(i, lit(q))))
            .otherwise(array(col("name")))).as("grams"))
      .withColumn("ng", size(col("grams")))
    val longs = names.filter(col("ng") > kq)
    val shorts = names.filter(col("ng") <= kq)

    // canonical (df, gram) order → index the first kq+1 grams per value
    val ex = longs.select(col("name"), col("len"), explode(col("grams")).as("gram"))
    val dfs = ex.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val prefix = ex.join(dfs, "gram")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("name")).orderBy(col("df"), col("gram"))))
      .filter(col("rk") <= kq + 1)
      .select(col("name"), col("len"), col("gram"))
    val candLong = prefix.as("a").join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.name") < col("b.name") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()

    // shorts × everything (broadcast, bounded cardinality), canonical order
    val allNames = names.select(col("name"), col("len"))
    val candShort = broadcast(shorts.select(col("name").as("s_name"),
        col("len").as("s_len")))
      .join(allNames, col("s_name") =!= col("name") &&
        abs(col("s_len") - col("len")) <= maxDist)
      .select(least(col("s_name"), col("name")).as("name_a"),
        greatest(col("s_name"), col("name")).as("name_b"))
      .distinct()

    candLong.union(candShort).distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
  }
}
