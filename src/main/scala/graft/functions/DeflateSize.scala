package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte count of a string — the compression-ratio
  * quality signal (CCNet §4.2-adjacent, and the filter the RefinedWeb/
  * Gopher lineage applies as "too compressible = boilerplate or spam"):
  * natural language deflates to ~0.4–0.6 of its bytes, templated or
  * repeated junk far below, already-compressed/binary junk near (or
  * above) 1.0. One native map-side pass per row; no shuffle, no UDF.
  *
  * Determinism: Deflater with a FIXED level (6) and default strategy
  * over the same bytes is a pure function within a JVM — the
  * partition-count determinism gate holds byte-exactly. Across zlib
  * builds the exact count could differ by a few bytes, which is why the
  * ratio is a rows-only signal gated by spec (no cross-engine oracle:
  * DuckDB exposes no deflate), with the keep-threshold chosen far from
  * any build-dependent wobble.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_size expects STRING, got ${child.dataType.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    DeflateSize.compute(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateSize.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  // one native zlib state + scratch buffer per task thread, reused via
  // reset(): deflateInit allocates ~256 KB of native window per call,
  // which would otherwise be paid (and freed) once PER ROW in the
  // codegen hot loop; reset() restarts the stream with identical output
  private val local = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6))
  private val buf =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  /** Static so generated code calls it directly (stays inside
    * whole-stage codegen).
    */
  def compute(u: UTF8String): Long = {
    val bytes = u.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val out = buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(out)
    total
  }
}
