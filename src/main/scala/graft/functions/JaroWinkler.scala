package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen expression — the
  * scoring half of entity resolution (q_er_link). Spark ships only
  * `levenshtein`; Jaro-Winkler is the standard record-linkage score
  * (short-string-friendly, transposition-tolerant, prefix-weighted)
  * and the one DuckDB exposes as `jaro_winkler_similarity`, which is
  * what makes the q_er_link face SQL-oracle-able.
  *
  * Exact semantics (pinned by probe against DuckDB, FunctionsSpec):
  *  - either side empty → 0.0 (INCLUDING both empty — DuckDB's choice);
  *  - Jaro: match window = max(|a|,|b|)/2 − 1 (floor, min 0),
  *    transpositions counted pairwise over matched units and HALVED,
  *    jaro = (m/|a| + m/|b| + (m−t)/m) / 3, m = 0 → 0;
  *  - Winkler boost only when jaro > 0.7 (the standard boost
  *    threshold — verified against DuckDB: a 4-char shared prefix at
  *    jaro 0.667 gets NO boost, 0.733 does):
  *    jw = jaro + min(prefix, 4) · 0.1 · (1 − jaro).
  *
  * Comparison is per **UTF-8 byte** — DuckDB's unit (probed:
  * 'café'/'cafe' → 0.8483…, which is the 5-byte/4-byte Jaro, not the
  * 4-char 0.8833; '日本語'/'日本' → 0.9333, the 9/6-byte run), so
  * parity holds on NON-ASCII text too, not just the ASCII fixtures.
  * UTF8String hands the bytes over without a decode, and on ASCII the
  * byte and char runs are the same sequence — the r12 pins are
  * unchanged. Consumers quantize to 1e-4 before any cross-engine
  * compare so ulp-level double drift in the 3-term average can never
  * flip a hash.
  *
  * Reference anchor: the reference has no string-similarity operator
  * at all (mappers shell out to user binaries —
  * hadoop-multiple-streaming MultiPipeMapper.java:118-137); this is
  * part of the Spark-native widening for training-data curation.
  */
object JaroWinkler {

  /** 0.0–1.0 similarity; static so generated code calls it directly. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aFlag = new Array[Boolean](la)
    val bFlag = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bFlag(j) && a(i) == b(j)) {
          aFlag(i) = true; bFlag(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched bytes of a vs matched bytes of b, in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aFlag(i)) {
        while (!bFlag(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a(prefix) == b(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** `graft_jaro_winkler(a, b)` — see [[JaroWinkler.similarity]].
  * Null-intolerant (null in → null out, the BinaryExpression default);
  * whole-stage codegen emits a direct static call.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // analysis-time misuse guard (the repo-wide expression convention —
  // see CmsEstimate): a non-string argument otherwise dies mid-job in
  // the generated similarity(UTF8String, UTF8String) call instead of
  // failing analysis cleanly
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{NullType, StringType}
    Seq(("first", left), ("second", right)).collectFirst {
      // NullType folds to NULL (null-intolerant eval), like builtins
      case (pos, e) if e.dataType != StringType && e.dataType != NullType =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_jaro_winkler $pos argument must be STRING, got " +
            e.dataType.simpleString)
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}
