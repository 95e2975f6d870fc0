package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Language prediction over a token array as ONE native pass.
  *
  * Semantics (identical to the composable formulation in
  * `TextOps.langPredict`): for each language, count token occurrences
  * that appear in its marker set; return the language with the highest
  * count, ties broken by smallest language code. `markerTable` is
  * `(langCode, markers)` pairs, already sorted by code.
  *
  * The composable form runs one higher-order `filter()` per language —
  * five interpreted CodegenFallback array passes per row. Here a single
  * loop looks each token up once in a token→language-bitmask hash map
  * (markers shared between languages cost nothing extra) and bumps
  * per-language counters; fully codegen'd, per-row cost O(tokens).
  * Rows are independent — embarrassingly parallel at any scale.
  */
case class LangMarkerBest(
    child: Expression,
    markerTable: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  @transient private lazy val langs: Array[UTF8String] =
    markerTable.map { case (lang, _) => UTF8String.fromString(lang) }.toArray

  /** token → bitmask of marker-set memberships across languages. */
  @transient private lazy val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    markerTable.zipWithIndex.foreach { case ((_, ms), i) =>
      ms.foreach { tok =>
        val k = UTF8String.fromString(tok)
        m.put(k, Integer.valueOf(Option(m.get(k)).fold(0)(_.intValue()) | (1 << i)))
      }
    }
    m
  }

  private def bestOf(counts: Array[Int]): UTF8String = {
    var best = 0
    var j = 1
    while (j < counts.length) {
      if (counts(j) > counts(best)) best = j
      j += 1
    }
    langs(best)
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val m = masks.get(arr.getUTF8String(i))
        if (m != null) {
          var mm = m.intValue()
          while (mm != 0) {
            counts(Integer.numberOfTrailingZeros(mm)) += 1
            mm &= mm - 1
          }
        }
      }
      i += 1
    }
    bestOf(counts)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val masksRef = ctx.addReferenceObj("langMasks", masks, "java.util.HashMap")
      val langsRef = ctx.addReferenceObj("langCodes", langs, "UTF8String[]")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val mm = ctx.freshName("mm")
      val best = ctx.freshName("best")
      val j = ctx.freshName("j")
      s"""
         |int[] $counts = new int[${langs.length}];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    Integer $m = (Integer) $masksRef.get($a.getUTF8String($i));
         |    if ($m != null) {
         |      int $mm = $m.intValue();
         |      while ($mm != 0) {
         |        $counts[Integer.numberOfTrailingZeros($mm)]++;
         |        $mm &= $mm - 1;
         |      }
         |    }
         |  }
         |}
         |int $best = 0;
         |for (int $j = 1; $j < ${langs.length}; $j++) {
         |  if ($counts[$j] > $counts[$best]) $best = $j;
         |}
         |${ev.value} = $langsRef[$best];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LangMarkerBest =
    copy(child = newChild)
}

object LangMarkerBest {

  /** Marker tokens per language, picked by frequency lift on the corpus,
    * sorted by language code (the tie-break order). Deliberately
    * data-derived-but-frozen: the scoring is what's under test, and the
    * DuckDB oracle runs the identical scoring in SQL. Canonical copy —
    * `TextOps.LangMarkers` aliases this.
    */
  val DefaultMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("small", "table", "part", "key"),
    "en" -> Seq("window", "big", "sort", "key"),
    "es" -> Seq("line", "hash", "slow", "agg"),
    "fr" -> Seq("query", "scan", "order", "stream"),
    "zh" -> Seq("join", "fast", "the", "vector"))
}
