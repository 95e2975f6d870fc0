package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mean character-bigram log2-probability of a string under a trained
  * bigram model — the statistical-LM quality score (the CCNet/KenLM
  * perplexity-filter shape, at character-bigram order so the model is
  * alphabet²-sized driver state instead of a gigabyte LM).
  *
  * One native pass per row: build the doc's bigram occurrence counts
  * over Unicode codepoints, look each DISTINCT bigram's precomputed
  * log2 P(c2|c1) up in the model (a codegen reference object), and
  * return
  *
  *   score = (Σ_g ⌊cnt_g · logp_g · 1000 + 0.5⌋) / (n_bigrams · 1000)
  *
  * — the same milli-quantized integer-sum trick as [[CharEntropy]], so
  * the value is exact across engines and iteration orders (the DuckDB
  * twin quantizes identically; log2's last-ulp spread is absorbed by
  * the 0.5 rounding margin). Unseen bigrams take the model's fallback
  * log-prob (never fires when scoring the training corpus itself);
  * fewer than two codepoints scores 0.0 by convention.
  */
case class BigramLogProb(
    child: Expression,
    logp: java.util.HashMap[java.lang.Long, java.lang.Double],
    fallback: Double)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bigram_logprob expects STRING, got ${child.dataType.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    BigramLogProb.compute(a.asInstanceOf[UTF8String], logp, fallback)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val modelRef = ctx.addReferenceObj("bigramLogp", logp, "java.util.HashMap")
      s"${ev.value} = graft.functions.BigramLogProb.compute($a, $modelRef, $fallback);"
    })

  override def prettyName: String = "graft_bigram_logprob"

  // the model is plan STATE, not syntax: eliding it keeps explain
  // strings readable (a CJK-corpus model has ~10⁵ entries which the
  // default case-class toString would inline into every plan dump)
  override def toString: String =
    s"graft_bigram_logprob($child, model[${logp.size()} bigrams])"

  override protected def withNewChildInternal(newChild: Expression): BigramLogProb =
    copy(child = newChild)
}

object BigramLogProb {

  /** Static so generated code calls it directly (stays inside
    * whole-stage codegen).
    */
  def compute(u: UTF8String,
      logp: java.util.HashMap[java.lang.Long, java.lang.Double],
      fallback: Double): Double = {
    val s = u.toString
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]]()
    var nB = 0L
    var i = 0
    var prev = -1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (prev >= 0) {
        val key = java.lang.Long.valueOf((prev.toLong << 32) | cp.toLong)
        val slot = counts.get(key)
        if (slot == null) counts.put(key, Array(1L)) else slot(0) += 1
        nB += 1
      }
      prev = cp
      i += Character.charCount(cp)
    }
    if (nB == 0L) return 0.0
    var sumMilli = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val lp = logp.get(e.getKey)
      val l = if (lp == null) fallback else lp.doubleValue()
      // identical op order to the DuckDB twin: cnt * log2p * 1000.0,
      // then floor(x + 0.5)
      sumMilli += math.floor(e.getValue()(0) * l * 1000.0 + 0.5).toLong
    }
    sumMilli.toDouble / (nB * 1000.0)
  }
}
