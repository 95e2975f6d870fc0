package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token count of a string under a trained BPE model ([[graft.text.Bpe]])
  * — one native map-side pass per row: lowercase, pretokenize with the
  * BPE pretokenizer regex, greedy lowest-rank-first merge per pretoken
  * (the shared `Bpe.encodeSyms` engine, so expression and driver encode
  * can never disagree), sum the piece counts. The merge-rank table
  * rides the plan as ONE codegen reference object (the
  * BigramLogProb/LshBuckets lesson: model state above ~KB never belongs
  * in literal trees).
  */
case class BpeTokenCount(
    child: Expression,
    ranks: java.util.HashMap[String, Integer])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(a: Any): Any =
    BpeTokenCount.compute(a.asInstanceOf[UTF8String], ranks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
      s"${ev.value} = graft.functions.BpeTokenCount.compute($a, $ranksRef);"
    })

  override def prettyName: String = "graft_bpe_count"

  override def toString: String =
    s"graft_bpe_count($child, model[${ranks.size()} merges])"

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {

  private val pretokenizer: Pattern =
    Pattern.compile(graft.text.TextOps.BpePattern)

  /** Static so generated code calls it directly (stays inside
    * whole-stage codegen).
    */
  def compute(u: UTF8String,
      ranks: java.util.HashMap[String, Integer]): Int = {
    val s = u.toString.toLowerCase(java.util.Locale.ROOT)
    val m = pretokenizer.matcher(s)
    var n = 0
    while (m.find()) {
      val w = m.group()
      // single-codepoint pretokens (punctuation, unseen chars) are one
      // token by definition — skip the merge machinery
      if (w.length <= 1) n += 1
      else n += graft.text.Bpe.encodeSyms(ranks, w).length
    }
    n
  }
}
