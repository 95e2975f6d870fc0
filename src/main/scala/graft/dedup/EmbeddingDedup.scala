package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sim.Vectors

/** Embedding-cosine near-duplicate pairs.
  *
  * This is the exact quadratic baseline: norms precomputed per row (once,
  * not once per pair), then a range self-join on id with the cosine as a
  * codegen'd double fold. At corpus scale the quadratic join is replaced
  * by the LSH/IVF candidate generators in `graft.sim` — same verify step,
  * different candidate set; this module stays the ground truth the
  * approximate paths are measured against.
  */
object EmbeddingDedup {

  /** Pairs (id_a < id_b) with cosine ≥ tau, cosine rounded to 6 (the
    * threshold is applied to the ROUNDED value so Spark and the DuckDB
    * oracle agree on boundary pairs).
    */
  def pairs(embs: DataFrame, idCol: String, vecCol: String, tau: Double): DataFrame = {
    graft.functions.GraftFunctions.register(embs.sparkSession)
    val withNorm = embs.select(col(idCol).as("id"), col(vecCol).as("v"),
      Vectors.normD(col(vecCol)).as("nrm"))
    val a = withNorm.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = withNorm.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(
        Vectors.cosineWithNorms(Vectors.dotD(col("v_a"), col("v_b")),
          col("n_a"), col("n_b")), 6))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
