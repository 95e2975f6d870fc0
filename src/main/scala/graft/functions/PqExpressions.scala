package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, NullType}

/** Native expressions for the product-quantization SEARCH path
  * (asymmetric distance computation — ADC — Jégou et al., TPAMI 2011
  * §IV.A). Three per-row kernels, all carrying the KB-scale codebooks
  * as codegen reference objects (the NearestCells pattern — plan size
  * stays O(1) in m×ks×subDim):
  *
  *  - [[PqCodes]]: corpus side, vector → m code bytes in ONE map pass.
  *    Replaces the explode/broadcast-join/groupBy `Pq.encode` shuffle
  *    with zero exchanges — at corpus scale encoding is a scan, full
  *    stop. Bit-parity with `Pq.encode`'s argmin is spec-pinned, so the
  *    distributed formulation stays the oracle.
  *  - [[PqIpTable]]: query side, vector → the m×ks inner-product table
  *    (dot of each query subvector with every code centroid). Computed
  *    ONCE per query; every corpus row is then scored with m array
  *    lookups instead of a dim-length float fold — the entire point of
  *    ADC.
  *  - [[PqReconNorm]]: corpus side, codes → ‖reconstruction‖. Exact
  *    for the quantized vector (the reconstruction is the concatenation
  *    of the chosen centroids, so its squared norm is the sum of the
  *    chosen centroids' squared norms).
  *
  * The per-pair kernel [[PqAdcSum]] is codebook-free: it gathers
  * table[sub·ks + codes[sub]] and sums — 8 loads per pair at the
  * default geometry, vs 64 multiply-adds for the exact dot product,
  * over rows that carry 8 ints instead of 64 floats.
  */
private[graft] object PqKernels {

  /** Argmin code per subspace, replicating Pq.assign's arithmetic
    * bit-for-bit: dist = ‖s‖·‖s‖ + ‖c‖·‖c‖ − 2·(s·c) with every term a
    * sequential double fold over float elements (the norms go through
    * sqrt then square, exactly as `normD(x) * normD(x)` evaluates);
    * ties break on the smaller code, as `min(struct(dist, code))` does.
    */
  def codes(vec: ArrayData, books: Array[Array[Array[Float]]],
      cn2: Array[Array[Double]]): ArrayData = {
    val m = books.length
    val vn = vec.numElements()
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val codebook = books(sub)
      val subDim = if (codebook.length > 0) codebook(0).length else 0
      val base = sub * subDim
      val sLen = math.max(0, math.min(subDim, vn - base))
      var sAcc = 0.0
      var j = 0
      while (j < sLen) {
        val x = vec.getFloat(base + j).toDouble; sAcc += x * x; j += 1
      }
      val sNorm = math.sqrt(sAcc)
      val sn2 = sNorm * sNorm
      var best = 0
      var bestDist = java.lang.Double.POSITIVE_INFINITY
      var k = 0
      while (k < codebook.length) {
        val cv = codebook(k)
        val n = math.min(sLen, cv.length)
        var dot = 0.0
        j = 0
        while (j < n) {
          dot += vec.getFloat(base + j).toDouble * cv(j).toDouble; j += 1
        }
        val dist = sn2 + cn2(sub)(k) - 2.0 * dot
        if (java.lang.Double.compare(dist, bestDist) < 0) {
          bestDist = dist; best = k
        }
        k += 1
      }
      out(sub) = best
      sub += 1
    }
    new GenericArrayData(out)
  }

  def ipTable(vec: ArrayData, books: Array[Array[Array[Float]]],
      ks: Int): ArrayData = {
    val m = books.length
    val vn = vec.numElements()
    val out = new Array[Double](m * ks)
    var sub = 0
    while (sub < m) {
      val codebook = books(sub)
      val subDim = if (codebook.length > 0) codebook(0).length else 0
      val base = sub * subDim
      val sLen = math.max(0, math.min(subDim, vn - base))
      var k = 0
      while (k < codebook.length) {
        val cv = codebook(k)
        val n = math.min(sLen, cv.length)
        var dot = 0.0
        var j = 0
        while (j < n) {
          dot += vec.getFloat(base + j).toDouble * cv(j).toDouble; j += 1
        }
        out(sub * ks + k) = dot
        k += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  // The geometry checks below exist for the encode-once/search-many
  // path: a codes table read back from disk can meet a model it was
  // NOT encoded under (codebooks refit at a different m×ks, a caller
  // mixing artifacts). Without them the mismatch surfaces as a raw
  // ArrayIndexOutOfBoundsException deep inside an executor's generated
  // code — with them it's one compare per row and a message that names
  // the actual problem.
  private def badGeometry(detail: String): Nothing =
    throw new IllegalArgumentException(
      s"PQ geometry mismatch: $detail — the codes table was encoded " +
        "under a different model than the one searching it")

  def reconNorm(codes: ArrayData, nsq: Array[Array[Double]]): Double = {
    var acc = 0.0
    var sub = 0
    val m = codes.numElements()
    if (m != nsq.length)
      badGeometry(s"$m code bytes per row vs model m=${nsq.length}")
    while (sub < m) {
      val c = codes.getInt(sub)
      if (c < 0 || c >= nsq(sub).length)
        badGeometry(s"code $c at subspace $sub vs model ks=${nsq(sub).length}")
      acc += nsq(sub)(c)
      sub += 1
    }
    math.sqrt(acc)
  }

  def adcSum(tab: ArrayData, codes: ArrayData, ks: Int): Double = {
    var acc = 0.0
    var sub = 0
    val m = codes.numElements()
    if (tab.numElements() != m * ks)
      badGeometry(s"$m code bytes per row vs an m×ks = " +
        s"${tab.numElements() / ks}×$ks inner-product table")
    while (sub < m) {
      val c = codes.getInt(sub)
      if (c < 0 || c >= ks)
        badGeometry(s"code $c at subspace $sub vs model ks=$ks")
      acc += tab.getDouble(sub * ks + c)
      sub += 1
    }
    acc
  }

  /** ‖c‖·‖c‖ per (sub, code) — sqrt-then-square to match normD². */
  def centroidNorm2(books: Array[Array[Array[Float]]]): Array[Array[Double]] =
    books.map(_.map { c =>
      var acc = 0.0
      var i = 0
      while (i < c.length) { val v = c(i).toDouble; acc += v * v; i += 1 }
      val n = math.sqrt(acc)
      n * n
    })

  // containsNull=true is accepted (parquet list elements read back
  // nullable); a null ELEMENT reads as 0.0f — the shared null-element
  // contract of all graft vector kernels, property-pinned in
  // PropertySpec ("null vector elements read as 0.0f ...")
  private[functions] def checkVec(dt: DataType, who: String):
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft $who expects ARRAY<FLOAT>, got ${other.simpleString}")
    }
}

/** Corpus vector → its m PQ codes (map-only native encoder). */
case class PqCodes(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    PqKernels.checkVec(child.dataType, "pq-codes")

  @transient private lazy val cn2: Array[Array[Double]] =
    PqKernels.centroidNorm2(codebooks)

  override def nullSafeEval(a: Any): Any =
    PqKernels.codes(a.asInstanceOf[ArrayData], codebooks, cn2)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.addReferenceObj("pqBooks", codebooks, "float[][][]")
      val n = ctx.addReferenceObj("pqCn2", cn2, "double[][]")
      s"${ev.value} = graft.functions.PqKernels.codes($a, $b, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** Query vector → flattened m×ks inner-product table (entry
  * [sub·ks + code] = query subvector · centroid, double fold).
  */
case class PqIpTable(child: Expression,
    codebooks: Array[Array[Array[Float]]], ks: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    PqKernels.checkVec(child.dataType, "pq-ip-table")

  override def nullSafeEval(a: Any): Any =
    PqKernels.ipTable(a.asInstanceOf[ArrayData], codebooks, ks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.addReferenceObj("pqBooks", codebooks, "float[][][]")
      s"${ev.value} = graft.functions.PqKernels.ipTable($a, $b, $ks);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqIpTable =
    copy(child = newChild)
}

/** PQ codes → norm of the reconstructed vector (exact for the
  * reconstruction: √Σ ‖centroid[sub][code]‖²).
  */
case class PqReconNorm(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft pq-recon-norm expects ARRAY<INT>, got ${other.simpleString}")
    }

  @transient private lazy val nsq: Array[Array[Double]] =
    PqKernels.centroidNorm2(codebooks)

  override def nullSafeEval(a: Any): Any =
    PqKernels.reconNorm(a.asInstanceOf[ArrayData], nsq)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.addReferenceObj("pqNsq", nsq, "double[][]")
      s"${ev.value} = graft.functions.PqKernels.reconNorm($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqReconNorm =
    copy(child = newChild)
}

/** (ip table, codes) → Σ table[sub·ks + codes[sub]] — the per-pair ADC
  * gather. Codebook-free: m loads + adds per pair.
  */
case class PqAdcSum(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      // containsNull accepted either way: a parquet round-trip of the
      // codes table reads list elements back nullable; a null element
      // reads as 0 (the shared graft kernel contract)
      case (ArrayType(DoubleType, _) | NullType,
            ArrayType(IntegerType, _) | NullType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft pq-adc-sum expects (ARRAY<DOUBLE>, ARRAY<INT>), " +
            s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.adcSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqKernels.adcSum($a, $b, $ks);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcSum =
    copy(left = newLeft, right = newRight)
}
