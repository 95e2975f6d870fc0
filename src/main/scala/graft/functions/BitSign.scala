package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-bit (binary) embedding quantization — the 1-bit-per-dimension
  * code behind binary-embedding retrieval: bit i of the code is set iff
  * `vec[i] > 0`, packed little-endian into ⌈dim/64⌉ longs. A 64-dim
  * float32 vector (256 B) becomes ONE long (8 B) — a 32× cut — and the
  * Hamming distance between two codes is a proven monotone proxy for
  * angular distance under random-hyperplane theory (Charikar STOC'02:
  * P[sign bit differs] = θ/π per dimension).
  *
  * At 100 TB this is the cheapest ANN shortlist there is: the whole
  * 10⁹-vector corpus's codes fit in ~8 GB, the scan is xor+popcount
  * (memory-bandwidth-bound, no multiplies), and both sides stay inside
  * whole-stage codegen. Exactness is the point of the pair: unlike
  * LSH/IVF/PQ the Hamming top-k over sign codes is DETERMINISTIC given
  * the vectors, so the DuckDB oracle can replay it bit-for-bit
  * (`(q[i] > 0) <> (c[i] > 0)` summed) — an exact-hash gate, not a
  * recall floor.
  *
  * Why not compose from builtins: packing via
  * `aggregate(sequence(0,dim-1), 0L, ...)` is a CodegenFallback HOF
  * chain evaluated per ROW, and pairwise Hamming via
  * `aggregate(zip_with(a,b,...))` evaluates per PAIR — the same
  * interpreted-HOF trap VectorExpressions documents. These two
  * expressions are tight fused loops with `doGenCode`.
  */
case class SignPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_sign_pack expects ARRAY<FLOAT>, got ${other.sql}")
    }
  }

  override def nullSafeEval(a: Any): Any =
    SignPack.compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SignPack.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

object SignPack {
  /** Static so generated code calls it directly. Little-endian packing:
    * dimension i lands in word i/64, bit i%64. `> 0f` (not >= 0) so an
    * exact-zero or NaN coordinate contributes a 0 bit — identical to
    * the oracle's `embedding[i] > 0` which is FALSE for both.
    */
  def compute(x: ArrayData): ArrayData = {
    val n = x.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (x.getFloat(i) > 0f) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }
}

/** Hamming distance between two packed sign codes (array<long>):
  * Σ Long.bitCount(a[w] ^ b[w]). Returns BIGINT to match the oracle's
  * CAST(list_sum(...) AS BIGINT). Codes of unequal length compare over
  * the shorter prefix (same trailing-dim contract as DotProductD).
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hamming expects two ARRAY<BIGINT> codes, got ${l.sql}, ${r.sql}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingDist.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HammingDist.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}

object HammingDist {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }
}
