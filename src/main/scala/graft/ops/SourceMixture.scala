package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted source mixing: replicate each document according to its
  * source's target weight (epochs) so the mixed corpus matches a recipe
  * like "wiki ×2.5, web ×1, forums ×0.25". Fractional weights resolve
  * per document, deterministically: every doc gets floor(w) copies, plus
  * one more iff its seeded uniform hash (ShuffleShard.hashKey / 2^32)
  * falls below frac(w) — the realized mix converges to the recipe with
  * zero RNG state and identical output on rerun. Weight 0 drops the
  * source entirely.
  *
  * The weights table is a dozen rows of config — it joins in as a
  * BROADCAST join (never a shuffle), the same shape as any
  * dimension-table enrichment. Replication is a map-side
  * `explode(array_repeat(...))`: no shuffle, output flows straight to
  * the sink. Downstream, compose with ShuffleShard so copies of a doc
  * land in different shards.
  *
  * Scale (100 TB): map-only except the final stats aggregation;
  * upweighting multiplies bytes written, not bytes shuffled.
  */
object SourceMixture {

  /** floor(w) + 1 more iff u(id) < frac(w); sources missing from the
    * recipe default to weight 1.
    */
  private def copies(idCol: String, seed: Long): Column = {
    val u = ShuffleShard.hashKey(col(idCol), seed) /
      lit(4294967296.0) // 2^32 → u uniform in [0,1)
    val w = coalesce(col("weight"), lit(1.0))
    (floor(w) + when(u < w - floor(w), 1).otherwise(0)).cast("int")
  }

  private def withCopies(docs: DataFrame, sourceCol: String, idCol: String,
                         weights: Map[String, Double], seed: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = broadcast(weights.toSeq.toDF(sourceCol, "weight"))
    docs.join(w, Seq(sourceCol), "left")
      .withColumn("n_copies", copies(idCol, seed))
      .drop("weight")
  }

  /** Replicated corpus: one row per output copy, `copy` in [0, n_copies).
    * Zero-copy docs are dropped.
    */
  def mix(docs: DataFrame, sourceCol: String, idCol: String,
          weights: Map[String, Double], seed: Long): DataFrame =
    withCopies(docs, sourceCol, idCol, weights, seed)
      .select(col("*"),
        posexplode(array_repeat(lit(1), col("n_copies"))).as(Seq("copy", "one")))
      .drop("one")

  /** Temperature-based sampling weights (the multilingual α-sampling
    * scheme of XLM-R / mT5: sources drawn ∝ p_i^α, α < 1 upweighting
    * the rare ones): with p_i = n_i / N, the per-document replication
    * weight that realizes q_i = p_i^α / Σ_j p_j^α while preserving the
    * corpus size is w_i = p_i^(α−1) / Σ_j p_j^α. α = 1 is the identity
    * recipe (every weight 1); α → 0 flattens all sources to equal
    * output mass. Feed the result to [[mix]]/[[mixStats]].
    *
    * Driver-side by design: the input is the per-source COUNT table
    * (one row per source — config-scale, the same KB regime as the
    * recipe it produces), and weights are rounded to `scale` decimals
    * so the arithmetic is reproducible across engines (the DuckDB
    * oracle recomputes the same pow/sum to 6 decimals).
    */
  def temperatureWeights(docs: DataFrame, sourceCol: String, alpha: Double,
      scale: Int = 6): Map[String, Double] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    // NULL sources are excluded from the derivation (a Map[String, _]
    // cannot carry them); downstream mix/mixStats already defaults
    // recipe-less sources to weight 1 via coalesce, so null-source docs
    // pass through unscaled instead of crashing the driver sort
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().filterNot(_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1).toDouble)
      .sortBy(_._1)
    val total = counts.map(_._2).sum
    val z = counts.map { case (_, n) => math.pow(n / total, alpha) }.sum
    counts.map { case (s, n) =>
      s -> BigDecimal(math.pow(n / total, alpha - 1.0) / z)
        .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  /** Per-source recipe audit over the REPLICATED stream (explode_outer
    * keeps dropped-source rows visible with n_out = 0): input docs,
    * output copies, output chars.
    */
  def mixStats(docs: DataFrame, sourceCol: String, idCol: String,
               charsCol: String, weights: Map[String, Double],
               seed: Long): DataFrame =
    withCopies(docs, sourceCol, idCol, weights, seed)
      .select(col(sourceCol), col(idCol), col(charsCol),
        explode_outer(array_repeat(lit(1), col("n_copies"))).as("one"))
      .groupBy(col(sourceCol))
      .agg(countDistinct(col(idCol)).as("n_in"),
        count(col("one")).as("n_out"),
        coalesce(sum(when(col("one").isNotNull, col(charsCol))), lit(0L))
          .as("chars_out"))
      .orderBy(col(sourceCol))
}
