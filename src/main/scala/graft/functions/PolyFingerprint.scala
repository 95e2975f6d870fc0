package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hash of a string as ONE native pass:
  * h = (h·31 + codepoint) mod 1e9+7, folded left over Unicode
  * codepoints. The modulus keeps every step inside non-overflowing
  * long arithmetic (31·(1e9+6) + cp ≪ 2⁶³), so the result is exact —
  * no ANSI overflow concerns.
  *
  * Replaces the composable form (`aggregate(transform(split(text, ''),
  * ascii), ...)`): higher-order functions are CodegenFallback and
  * re-evaluate non-attribute argument subtrees per lambda call, so that
  * chain re-split the string once per character — O(n²) interpreted
  * work per row. This is a single codegen'd loop, O(n) per row, and
  * rows are independent — embarrassingly parallel at any scale.
  *
  * Normalization (lowercase, whitespace collapse) stays in the caller:
  * those are codegen'd builtins, and keeping them out preserves
  * one-expression-one-job composability.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_fingerprint expects STRING, got ${child.dataType.sql}")
  }

  private val Mod = 1000000007L

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $a.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31 + $cp) % ${Mod}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}
