package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registers graft's native expressions in the session's function
  * registry so they are callable from both the Column API
  * (`call_function("graft_dot", a, b)`) and plain SQL — the same way
  * Spark exposes its own builtins. Idempotent; every entry point that
  * needs a native function calls this first.
  */
object GraftFunctions {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { case Seq(a, b) => DotProductD(a, b) },
    "graft_l2norm" -> { case Seq(a) => L2NormD(a) },
    "graft_simhash64" -> { case Seq(a) => SimHash64(a) },
    "graft_minhash_lanes" -> { case Seq(a) => MinHashLanes(a) },
    "graft_fingerprint" -> { case Seq(a) => PolyFingerprint(a) },
    "graft_heavy_hitters" -> { case Seq(a, k) =>
      HeavyHitters(a, foldableCapacity(k)).toAggregateExpression() })

  /** Plan-time capacity arg: must be a foldable integral expression —
    * a clear error beats the ClassCastException/NPE a bare
    * `eval().asInstanceOf[Int]` throws on BIGINT literals or columns.
    */
  private[graft] def foldableCapacity(k: Expression): Int = {
    if (!k.foldable)
      throw new IllegalArgumentException(
        "graft_heavy_hitters capacity must be a literal, got a non-foldable " +
          s"expression: ${k.sql}")
    k.eval() match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_heavy_hitters capacity must be integral, got $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
