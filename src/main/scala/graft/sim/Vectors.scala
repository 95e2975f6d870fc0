package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Catalyst
  * expressions (higher-order functions — codegen'd, no UDF).
  *
  * Precision contract: every product/sum is computed in DOUBLE with a
  * sequential left fold, matching the DuckDB oracle's
  * `list_sum(list_transform(...))` on ::DOUBLE casts — so cosine values
  * agree to far better than the 1e-6 comparison tolerance.
  */
object Vectors {

  /** Sequential-fold double dot product of two float vectors. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)

  /** Euclidean norm in double. */
  def normD(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, p) => acc + p))

  /** Cosine similarity given precomputed norms (precompute per row before
    * a pair join so each norm is evaluated once, not once per pair).
    */
  def cosineWithNorms(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)

  /** Cosine similarity of two raw vectors. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(dotD(a, b), normD(a), normD(b))
}
