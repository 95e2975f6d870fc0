package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Asymmetric shingle-set CONTAINMENT pairs: C(A,B) = |A∩B| ∕ |A| ≥ τ
  * flags doc A as (near-)contained in doc B — quotes, wrapped reposts,
  * and aggregated pages that symmetric Jaccard misses whenever the
  * container is much larger than the contained doc (J is dragged down
  * by the |B∖A| mass that containment deliberately ignores). The
  * set-level complement of `SubstringDedup`'s char-level coverage.
  *
  * Scale shape: the CONTAINED side reuses `NgramJaccard.prefixIndex`
  * unchanged — the pigeonhole behind the symmetric prefix bound
  * (|kept| − ⌈τ·|A|⌉ + 1 rarest shingles must hit any B missing at
  * most |A| − ⌈τ·|A|⌉ of A's shingles) only ever constrains the A
  * side, so the same index is sound for containment with τ read as
  * the containment floor. The CONTAINER side cannot be prefix-cut
  * (nothing bounds |B∖A|) and joins with its full df-capped postings:
  * candidate volume Σ_sh df_prefix·df_full, the price of asymmetry.
  * Verification is one `array_intersect` on the full (distinct)
  * shingle arrays; df = 1 postings can witness no cross-doc pair and
  * are dropped from BOTH indexes, and the maxDf cap carries the same
  * documented caveat as the symmetric op (pairs glued solely by
  * stop-shingles above the cap are missed — set it above the corpus
  * max df when exactness is required).
  *
  * Reference framing: hadoop-multiple-streaming users run overlap
  * detection as a mapper emitting (shingle, doc) and a reducer walking
  * each shingle's posting list (MultiPipeMapper.java:137 fan-out);
  * here both indexes are narrow derived tables and the pair join rides
  * one shuffle on the shingle key.
  */
object Containment {

  /** Containment ≥ tau pairs over word n-grams. Output:
    * (id_in, id_out, containment rounded to 4), id_in ≠ id_out; both
    * directions can appear (near-identical docs contain each other).
    * Same eager-materialization lifecycle as [[NgramJaccard.pairs]]:
    * nothing cached outlives the call.
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, maxDf: Int = 1000): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    val shingled = NgramJaccard.shingle(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the narrow kept-postings table (doc, sh, df) feeds BOTH indexes —
    // unlike the symmetric op (where the container side has no full
    // index), calling prefixIndex here would re-run the whole
    // explode + df aggregation a second time for the container
    // postings; persist (not checkpoint: AQE, the r5 ngram lesson)
    val kept = shingled
      .select(col("doc_id"), size(col("shingles")).as("n_orig"),
        explode(col("shingles")).as("sh"))
      .join(
        shingled.select(explode(col("shingles")).as("sh"))
          .groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") > 1 && col("df") <= maxDf),
        "sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the contained-side prefix: NgramJaccard.prefixIndex's ranking
      // verbatim (rarest |kept|−⌈τ·|A|⌉+1 postings; the pigeonhole
      // bound constrains only this side), re-rooted on the shared table
      val byDoc = Window.partitionBy(col("doc_id"))
      val prefix = kept
        .select(col("doc_id"), col("n_orig"), col("sh"),
          row_number().over(byDoc.orderBy(col("df"), col("sh"))).as("rk"),
          count(lit(1)).over(byDoc).as("n_kept"))
        .filter(col("rk") <=
          col("n_kept") - ceil(lit(tau) * col("n_orig") - lit(1e-9)) + 1)
        .select(col("doc_id"), col("sh"))
      val full = kept.select(col("doc_id"), col("sh"))
      val cand = prefix.as("a")
        .join(full.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("id_in"), col("b.doc_id").as("id_out"))
        .distinct()
      cand
        .join(shingled.select(col("doc_id").as("id_in"),
          col("shingles").as("sh_a")), "id_in")
        .join(shingled.select(col("doc_id").as("id_out"),
          col("shingles").as("sh_b")), "id_out")
        .withColumn("n_common",
          size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("containment", round(
          col("n_common").cast("double") / size(col("sh_a")).cast("double"),
          4))
        .filter(col("containment") >= tau)
        .select(col("id_in"), col("id_out"), col("containment"))
        .localCheckpoint(true)
    } finally {
      kept.unpersist()
      shingled.unpersist()
    }
  }
}
