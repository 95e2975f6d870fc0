package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductD, L2NormD, MinHashLanes, SimHash64}

/** Standard Spark extension packaging: enables graft's native functions
  * in ANY session via configuration —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * — the same wiring `GraftFunctions.register` does imperatively, but
  * available to pure-SQL users and notebooks that never touch graft's
  * Scala API. Both paths register identical builders, so either (or
  * both) can be active.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double-precision dot product of two float arrays"),
      (es: Seq[Expression]) => DotProductD(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_l2norm"),
      info("graft_l2norm", "graft_l2norm(a) - Euclidean norm of a float array in double"),
      (es: Seq[Expression]) => L2NormD(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(tokens) - 64-bit SimHash of a string array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_minhash_lanes"),
      info("graft_minhash_lanes", "graft_minhash_lanes(shingles) - 64 MinHash lane minima"),
      (es: Seq[Expression]) => MinHashLanes(es.head)))
  }
}
