package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Data Selection with Importance Resampling (Xie et al.
  * arXiv:2302.03169, re-expressed): score every raw document by how much
  * more likely its hashed-unigram features are under a TARGET
  * distribution (e.g. curated high-quality text) than under the raw
  * corpus itself, then keep the docs that look target-like. The standard
  * pretraining-data selection move when you have a small trusted corpus
  * and a huge crawl.
  *
  * Features are hashed token buckets (the paper's hashed n-gram trick —
  * a FIXED model size regardless of vocabulary): bucket =
  * seeded-md5-prefix(token) mod B, the same engine-portable hash
  * ShuffleShard uses, so a DuckDB oracle computes identical buckets. The
  * bucket unigram models are add-1 smoothed; a document's importance
  * weight is Σ_tokens log2(p_target(bucket) ∕ p_raw(bucket)).
  *
  * Engine parity: each bucket's log-ratio is floor-quantized to 1e-6
  * units as a BIGINT (the text_entropy / text_lmscore milli-bit
  * pattern), and the per-doc score is an EXACT integer sum of
  * (count × unit-weight) terms — no float accumulation order anywhere.
  *
  * Scale (100 TB): ONE tokenization pass folds the corpus to a
  * (doc, is_target, bucket, count) table (partial-agg groupBy, shared
  * via localCheckpoint across the three consumers); the two bucket
  * models are ≤ B rows each (constant — B is a knob, not data-driven)
  * and the fitted model rides a broadcast join back onto the per-doc
  * bucket counts. Totals are two scalar aggregates (KB driver state,
  * the centroids/codebook pattern). No driver loop, no global sort, no
  * corpus-scale shuffle beyond the doc-keyed aggregate.
  */
object Dsir {

  /** Hashed feature bucket of a token, identical in DuckDB:
    * ('0x' || substr(md5(tok || ':' || seed), 1, 8))::BIGINT % nBuckets.
    */
  def bucket(tok: Column, seed: Long, nBuckets: Int): Column =
    pmod(ShuffleShard.hashKey(tok, seed), lit(nBuckets.toLong))

  /** Per-document importance weights: (id, n_tokens, weight_units, sel)
    * where weight_units is the 1e-6-quantized log2 importance sum and
    * sel = 1 iff the weight is positive — the threshold-zero selection
    * rule ("more target-like than raw"), a map-side flag needing no
    * global order statistic. Tokenless docs carry weight 0 (unselected).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, seed: Long, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"need >= 2 buckets, got $nBuckets")
    val id = col(idCol)
    val docBuckets = docs
      .select(id, isTarget.as("is_t"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("b", bucket(col("tok"), seed, nBuckets))
      .groupBy(id, col("is_t"), col("b"))
      .agg(count(lit(1)).as("cd"))
      .localCheckpoint(false)
    try {
      val raw = docBuckets.groupBy(col("b")).agg(sum(col("cd")).as("cr"))
      val tgt = docBuckets.where(col("is_t"))
        .groupBy(col("b")).agg(sum(col("cd")).as("ct"))
      val model = raw.join(tgt, Seq("b"), "left")
      // totals: one scalar-aggregate collect over the <= B-row model
      val totRow = model.agg(sum(col("cr")), sum(coalesce(col("ct"), lit(0L))))
        .collect()(0)
      val tr = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
      val tt = if (totRow.isNullAt(1)) 0L else totRow.getLong(1)
      val wModel = model.select(col("b"),
        floor(log2(
          ((coalesce(col("ct"), lit(0L)) + 1).cast("double")
            / lit((tt + nBuckets).toDouble))
          / ((col("cr") + 1).cast("double")
            / lit((tr + nBuckets).toDouble))) * 1000000 + 0.5)
          .cast("long").as("w"))
      val dw = docBuckets.join(broadcast(wModel), "b")
        .groupBy(id)
        .agg(sum(col("cd")).as("n_tokens"),
          sum(col("cd") * col("w")).as("weight_units"))
      docs.select(id).join(dw, Seq(idCol), "left")
        .select(id,
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("weight_units"), lit(0L)).as("weight_units"),
          (coalesce(col("weight_units"), lit(0L)) > 0).cast("long").as("sel"))
        .localCheckpoint(true)
    } finally graft.util.Caches.release(docBuckets)
  }
}
