package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char) of a string's Unicode-codepoint
  * distribution as ONE native map-side pass — the classic low-quality
  * text signal (binary blobs and repeated-char spam sit near 0, natural
  * language near 4–4.5 bits/char; Gopher-class quality filters threshold
  * on it).
  *
  * Cross-engine parity is engineered, not hoped for: the definition IS
  * the milli-bit-quantized sum
  *
  *   H = (Σ_c ⌊cnt_c · log2(n / cnt_c) · 1000 + 0.5⌋) / (n · 1000)
  *
  * Each per-character term is rounded to an integer number of
  * milli-bits, so the sum is exact integer arithmetic — independent of
  * hash-map iteration order here and of aggregation order in the DuckDB
  * twin (a raw float Σ p·log2 p differs across engines in the last ulp
  * per accumulation order; the quantization only needs to be IDENTICAL
  * on both sides, not small). log2 itself is evaluated once per
  * DISTINCT character as log(x)/log(2) vs DuckDB's log2 — a ≤ few-ulp
  * relative difference on a ≤ 1e7-scale term, ~1e-9 absolute, which the
  * 0.5 rounding boundary absorbs with ~1e-9 failure odds per term.
  *
  * Why not the composable spelling (explode chars → two groupBys): that
  * shuffles one row per CHARACTER — O(corpus bytes) through two
  * exchanges for a per-doc scalar. This is a single codegen'd pass per
  * row, embarrassingly parallel, no shuffle at all.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_entropy expects STRING, got ${child.dataType.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    CharEntropy.compute(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharEntropy.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  private val Ln2 = math.log(2.0)

  /** Static so generated code calls it directly (stays inside
    * whole-stage codegen; no boxing, no interpreter).
    */
  def compute(u: UTF8String): Double = {
    val s = u.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var sumMilli = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next()(0)
      // identical op order to the DuckDB twin:
      //   cnt * log2(n / cnt::DOUBLE) * 1000.0, then floor(x + 0.5)
      val term = cnt * (math.log(n.toDouble / cnt) / Ln2) * 1000.0
      sumMilli += math.floor(term + 0.5).toLong
    }
    sumMilli.toDouble / (n * 1000.0)
  }
}
