package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `graft_cms_estimate(sketch, item)` — point-query a Count-Min sketch
  * built by Spark's `count_min_sketch(...)` aggregate (Cormode &
  * Muthukrishnan, J. Algorithms '05). Spark ships the builder but no SQL
  * reader; this closes the loop so frequency estimation stays entirely
  * in-plan: aggregate a constant-size sketch (merges through the shuffle
  * like the other graft sketches), broadcast the one row, estimate per
  * key. Guarantee: estimate ≥ true count, ≤ true + ε·N w.p. the
  * sketch's confidence.
  *
  * String items are estimated on their UTF-8 bytes — the same encoding
  * `CountMinSketchAgg` used on the add side, so add/estimate hash
  * identically.
  *
  * Deliberately NOT codegen (CodegenFallback): the sketch argument is a
  * kilobyte-scale blob that must be deserialized, so this expression
  * belongs on a handful of (key, sketch) rows after aggregation, never
  * in a per-corpus-row hot path. The deserialized sketch is memoized by
  * buffer identity, so the per-row cost on those rows is one reference
  * compare.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  // analysis-time misuse guard: a non-binary sketch or an item type the
  // CountMinSketch add side never hashed (float, array, …) otherwise
  // dies at runtime in readFrom/estimateCount (ExpectsInputTypes is
  // private[sql], so the check is hand-rolled)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types._
    if (left.dataType != BinaryType && left.dataType != NullType)
      TypeCheckResult.TypeCheckFailure(
        "graft_cms_estimate sketch argument must be BINARY " +
          s"(a count_min_sketch(...) result), got ${left.dataType.simpleString}")
    else right.dataType match {
      // NullType folds to NULL (null-intolerant eval), like builtins
      case StringType | BinaryType | ByteType | ShortType | IntegerType |
          LongType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "graft_cms_estimate item must be a string, binary, or integral " +
          s"column (the count_min_sketch add-side domain), got " +
          other.simpleString)
    }
  }

  // single reference so concurrent tasks sharing this instance can never
  // observe a sketch paired with another buffer's bytes (reference
  // assignment is atomic; worst case under a race is a redundant
  // deserialization, never a wrong pairing). The content-equality
  // fallback matters: UnsafeRow.getBinary allocates a FRESH copy per
  // access, so an identity-only check would re-deserialize the KB-scale
  // sketch on every row; Arrays.equals on equal-length buffers is a
  // linear byte scan, ~100× cheaper than readFrom
  @transient private var cache: (Array[Byte], CountMinSketch) = _

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    val c = cache
    val sketch =
      if (c != null &&
          ((c._1 eq bytes) || java.util.Arrays.equals(c._1, bytes))) c._2
      else {
        val s = CountMinSketch.readFrom(bytes)
        cache = (bytes, s)
        s
      }
    val key = item match {
      case s: UTF8String => s.getBytes
      case other => other
    }
    sketch.estimateCount(key)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
