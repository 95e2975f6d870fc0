package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, NullType}

/** The `nProbe` nearest IVF cell ids of a float vector (by cosine,
  * descending; ties on the smaller cell id) in ONE per-row pass — the
  * centroid matrix rides as a codegen reference object instead of C
  * struct literals.
  *
  * Why this exists: the composable formulation
  * (`array_sort(array(struct(-cosine(v, lit(c_0)), 0), …))`) embeds
  * every centroid as a 64-element array literal — C×dim literal leaves
  * PER assignment site, and the Lloyd fit builds a fresh one per
  * iteration. At the test geometry (C = 16) that is tolerable; at a
  * production IVF (C in the thousands for a 100 TB corpus) the plan
  * tree itself becomes the bottleneck — the same pathological class
  * the LshBuckets expression removed from the LSH path. Here the plan
  * carries ONE node regardless of C.
  *
  * Parity contract with the literal formulation (SimSpec pins it):
  * cos = dot(v, c) / (‖v‖·‖c‖), all double, sequential products over
  * min(|v|, dim(c)); ordering = ascending (−cos, cell) with Spark's
  * double semantics — NaN sorts last, −0.0 == 0.0 (normalized before
  * compare).
  *
  * One deliberate divergence (PropertySpec pins it): a zero-norm or
  * empty vector makes the literal formulation fail the whole job
  * under ANSI mode (DIVIDE_BY_ZERO from `cos`'s division); here the
  * Java division yields NaN cosines, which sort last uniformly, so
  * the row deterministically probes the smallest `nProbe` cell ids
  * instead of killing a 100 TB job over one garbage embedding.
  *
  * Null ELEMENTS read as 0.0f (the shared graft vector-kernel
  * contract — see [[LshBuckets]]; PropertySpec pins nulls ≡ zeros):
  * one missing dimension degrades that dimension's contribution, it
  * does not null the row's probe set.
  */
case class NearestCells(child: Expression, cellIds: Array[Int],
    centroids: Array[Array[Float]], nProbe: Int) extends UnaryExpression {

  require(cellIds.length == centroids.length,
    s"cellIds (${cellIds.length}) and centroids (${centroids.length}) differ")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft nearest-cells expects ARRAY<FLOAT>, got ${other.simpleString}")
    }

  @transient private lazy val norms: Array[Double] =
    NearestCells.cellNorms(centroids)

  override def nullSafeEval(a: Any): Any =
    NearestCells.compute(a.asInstanceOf[ArrayData], cellIds, centroids, norms,
      nProbe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ids = ctx.addReferenceObj("ivfCellIds", cellIds, "int[]")
      val cs = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
      val ns = ctx.addReferenceObj("ivfNorms", norms, "double[]")
      s"""
         |${ev.value} = graft.functions.NearestCells.compute(
         |  $a, $ids, $cs, $ns, $nProbe);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {

  def cellNorms(centroids: Array[Array[Float]]): Array[Double] =
    centroids.map { c =>
      var acc = 0.0
      var i = 0
      while (i < c.length) { val v = c(i).toDouble; acc += v * v; i += 1 }
      math.sqrt(acc)
    }

  /** Shared by interpreted eval and codegen. Selection sort over the
    * negcos scores — C is index geometry (≤ thousands), nProbe a
    * handful, so O(C·nProbe) with no allocation beats a heap here.
    */
  def compute(vec: ArrayData, cellIds: Array[Int],
      centroids: Array[Array[Float]], norms: Array[Double],
      nProbe: Int): ArrayData = {
    val c = centroids.length
    // ‖v‖ once per row (the literal formulation recomputed it per
    // centroid — same value, so parity holds)
    var vAcc = 0.0
    var i = 0
    val vn = vec.numElements()
    while (i < vn) { val x = vec.getFloat(i).toDouble; vAcc += x * x; i += 1 }
    val vNorm = math.sqrt(vAcc)
    val neg = new Array[Double](c)
    var k = 0
    while (k < c) {
      val cv = centroids(k)
      val n = math.min(vn, cv.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += vec.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
      // -(dot / (‖v‖·‖c‖)); +0.0 normalizes -0.0 to 0.0 (Spark treats
      // them equal in ordering; java Double.compare does not)
      neg(k) = -(dot / (vNorm * norms(k))) + 0.0
      k += 1
    }
    val m = math.min(nProbe, c)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](c)
    var p = 0
    while (p < m) {
      var best = -1
      var b = 0
      while (b < c) {
        if (!taken(b) && (best < 0 ||
            java.lang.Double.compare(neg(b), neg(best)) < 0 ||
            (java.lang.Double.compare(neg(b), neg(best)) == 0 &&
              cellIds(b) < cellIds(best)))) best = b
        b += 1
      }
      taken(best) = true
      out(p) = cellIds(best)
      p += 1
    }
    new GenericArrayData(out)
  }
}
