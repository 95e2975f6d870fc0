package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** All sign-LSH bucket values of a float vector in ONE per-row pass —
  * returns `array<int>` of `tables` bucket ids, bit b of table t set iff
  * the vector's double dot product with hyperplane (t, b) is ≥ 0.
  *
  * Replaces the literal-tree formulation (one `when(dot >= 0, …)` chain
  * per plane, each dot against a 64-element array literal): at 16 tables
  * × 8 bits that tree carries 2×16384 literal leaves through analysis,
  * optimization, and codegen on EVERY query construction — measured as
  * the dominant cost of the LSH path at sf0.1 (the execution itself
  * touches only thousands of rows). Here the planes live in one
  * reference object, the tree is a single node, and the generated code
  * is the same fused multiply-add loop.
  *
  * Bit-identical contract with the literal formulation: planes are the
  * Rademacher ±1 matrix drawn from `scala.util.Random(seed)` in
  * `Array.fill(tables, bits, dim)` order; each dot accumulates float
  * products in DOUBLE, sequentially, over `min(|vec|, dim)` elements —
  * exactly `DotProductD(vec, plane)`. SimSpec pins the parity.
  *
  * Null ELEMENTS (accepted — parquet list elements read back
  * nullable): a null element contributes 0.0 to every dot product,
  * i.e. the vector buckets exactly as if the null were 0.0f — the
  * shared contract of all graft vector kernels (DotProductD, L2NormD,
  * NearestCells, the PQ kernels), chosen over SQL null-propagation
  * because one missing dimension must not null out a whole row's
  * bucket set and silently drop it from every table. PropertySpec
  * pins nulls ≡ zeros.
  */
case class LshBuckets(child: Expression, tables: Int, bits: Int, seed: Long,
    dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // analysis-time misuse guard (same discipline as CmsEstimate): an
  // array<double> argument would read misaligned 4-byte halves through
  // getFloat and compute garbage buckets with no error; anything else
  // dies in codegen. NullType folds to NULL like every null-intolerant
  // expression.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{FloatType, NullType}
    child.dataType match {
      case ArrayType(FloatType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_buckets expects ARRAY<FLOAT>, got ${other.simpleString}")
    }
  }

  @transient private lazy val planes: Array[Float] =
    LshBuckets.planes(tables, bits, seed, dim)

  override def nullSafeEval(a: Any): Any =
    LshBuckets.compute(a.asInstanceOf[ArrayData], planes, tables, bits, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("lshPlanes", planes, "float[]")
      s"""
         |${ev.value} = graft.functions.LshBuckets.compute(
         |  $a, $p, $tables, $bits, $dim);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** Plane matrix memoized per geometry — KB-scale driver/executor state
    * (16×8×64 floats = 32 KB), shared by every expression instance with
    * the same parameters.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long, Int), Array[Float]]()

  /** Flattened [tables][bits][dim] Rademacher planes; the fill order
    * consumes the PRNG exactly as `Array.fill(tables, bits, dim)` does,
    * so bucket values match the legacy literal formulation bit for bit.
    */
  def planes(tables: Int, bits: Int, seed: Long, dim: Int): Array[Float] =
    cache.computeIfAbsent((tables, bits, seed, dim), { _ =>
      val rng = new scala.util.Random(seed)
      Array.fill(tables * bits * dim)(if (rng.nextBoolean()) 1.0f else -1.0f)
    })

  /** Shared by interpreted eval and codegen (janino resolves the static
    * forwarder).
    */
  def compute(vec: ArrayData, planes: Array[Float], tables: Int, bits: Int,
      dim: Int): ArrayData = {
    val n = math.min(vec.numElements(), dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var acc = 0.0
        var j = 0
        while (j < n) {
          acc += vec.getFloat(j).toDouble * planes(base + j).toDouble
          j += 1
        }
        // !(acc < 0), not acc >= 0: Spark's comparison operators order
        // NaN above every double, so the literal when(dot >= 0, ...)
        // formulation set the bit for NaN dots — Java's >= would not
        if (!(acc < 0)) bucket |= 1 << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
