package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4 routes every public `Column` through ColumnNode (the Connect
  * abstraction) and marks the classic converters `private[sql]`, so a
  * library expression can only become a Column via the function
  * registry (`call_function`) — which needs the function registered on
  * whatever session ANALYZES the plan. That side-effect coupling is
  * fragile for Column-building helpers with no session in hand (the
  * advisor's TextOps.normalized finding: build the Column under no / a
  * different active session and analysis fails unresolved).
  *
  * This bridge lives in an `org.apache.spark.sql` subpackage to reach
  * the same converters Spark's own classic API uses — the established
  * extension-library pattern for expression-first APIs. Wrapping an
  * expression directly removes the registry round-trip AND the
  * active-session dependency: the expression is already resolved into
  * the plan the moment the Column is built.
  */
object ColumnBridge {

  /** Wrap a Catalyst expression as a Column (no registry, no session). */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a classic Column to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
