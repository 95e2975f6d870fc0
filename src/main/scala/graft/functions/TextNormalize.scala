package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd native expression.
  *
  * A crawl mixes composed ("é" U+00E9) and decomposed ("e"+U+0301)
  * spellings of the same text; every downstream key — dedup norm keys,
  * shingles, token counts — silently splits unless the corpus is
  * canonicalized first. Java's `Normalizer` detects the (overwhelmingly
  * common) already-normalized case in a cheap scan and returns the input
  * string unchanged, so ASCII-heavy corpora pay near-zero cost.
  *
  * There is no Spark SQL builtin for this (only locale case mapping);
  * a Scala UDF would box every row out of Tungsten. This stays inside
  * whole-stage codegen: the generated code calls one static-shaped
  * helper, same pattern as the embedding expressions. DuckDB's
  * `nfc_normalize` computes the identical transform, so it is fully
  * oracle-able.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  // reject misuse during analysis — without this a non-string argument
  // surfaces as a janino compile error or ClassCastException at runtime
  // (ExpectsInputTypes is private[sql], so the check is hand-rolled)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // NullType folds to NULL (null-intolerant eval), matching how
      // Spark's own string functions accept a bare NULL literal
      case StringType | org.apache.spark.sql.types.NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_nfc expects a STRING argument, got ${other.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($s);")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NfcNormalize {
  /** Static entry for generated code (and eval). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
