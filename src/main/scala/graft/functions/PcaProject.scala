package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Project a float vector onto a PCA basis: y_j = Σ_i (x_i − μ_i)·B_ji,
  * accumulated in double, sequential order. Mean and basis ride the
  * plan as codegen reference objects (KB model state — the
  * BigramLogProb/LshBuckets rule); the basis is row-major k×d flattened
  * so the generated loop is two tight index walks with no nested array
  * dereferences.
  */
case class PcaProject(
    child: Expression,
    mean: Array[Double],
    basisFlat: Array[Double],
    k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if basisFlat.length == k * mean.length =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_pca_project basis shape ${basisFlat.length} != k=$k x d=${mean.length}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pca_project expects ARRAY<FLOAT>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    PcaProject.compute(a.asInstanceOf[ArrayData], mean, basisFlat, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val meanRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
      val basisRef = ctx.addReferenceObj("pcaBasis", basisFlat, "double[]")
      s"${ev.value} = graft.functions.PcaProject.compute($a, $meanRef, $basisRef, $k);"
    })

  override def prettyName: String = "graft_pca_project"

  override def toString: String =
    s"graft_pca_project($child, basis[${k}x${mean.length}])"

  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
}

object PcaProject {

  /** Static so generated code calls it directly (stays inside
    * whole-stage codegen).
    */
  def compute(x: ArrayData, mean: Array[Double], basisFlat: Array[Double],
      k: Int): GenericArrayData = {
    val d = mean.length
    // fail loudly on a corpus/model dimension mismatch: truncating or
    // zero-padding here would project onto the wrong subspace with no
    // symptom (the GramianAgg update enforces the same contract)
    if (x.numElements() != d)
      throw new IllegalArgumentException(
        s"graft_pca_project: input vector has ${x.numElements()} elements, " +
          s"expected d=$d")
    val n = d
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      val row = j * d
      var i = 0
      while (i < n) {
        acc += (x.getFloat(i).toDouble - mean(i)) * basisFlat(row + i)
        i += 1
      }
      out(j) = java.lang.Double.valueOf(acc)
      j += 1
    }
    new GenericArrayData(out)
  }
}
