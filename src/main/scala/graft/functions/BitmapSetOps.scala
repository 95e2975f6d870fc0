package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Popcount of the byte-wise AND of two bitmaps — the set-INTERSECTION
  * cardinality Spark 4's bitmap builtins leave out (the engine ships
  * `bitmap_construct_agg` / `bitmap_or_agg` / `bitmap_count`, i.e.
  * build and union, but no intersection — you can de-Morgan one from
  * three unions, which triples the shuffle state for no reason).
  *
  * Operand bitmaps come from `bitmap_construct_agg` (fixed 4 KB
  * segments), but the loop only assumes "byte array": the AND of the
  * common prefix is correct for mismatched lengths because a byte
  * beyond either operand's end is an absent bit. No intermediate array
  * is allocated — the generated loop folds AND + popcount in one pass
  * (Long.bitCount on 8-byte strides would add ~nothing at 4 KB; the
  * byte loop keeps eval and codegen trivially identical).
  */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_and_count expects (BINARY, BINARY), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapAndCount.compute(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitmapAndCount.compute($a, $b);")

  override def prettyName: String = "graft_bitmap_and_count"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCount =
    copy(left = newLeft, right = newRight)
}

object BitmapAndCount {

  /** Static so generated code calls it directly (stays inside
    * whole-stage codegen).
    */
  def compute(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var cnt = 0L
    var i = 0
    while (i < n) {
      cnt += java.lang.Integer.bitCount((a(i) & b(i)) & 0xff)
      i += 1
    }
    cnt
  }
}
