package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Moment accumulator for PCA: one pass over the vectors builds
  * count n, per-dimension sums s, and the upper-triangular second
  * moment Σ xxᵀ — everything the covariance matrix needs
  * (C = Σxxᵀ∕n − μμᵀ). State is ONE double array of
  * 1 + d + d(d+1)∕2 entries (~17 KB at d=64): constant through the
  * shuffle, partial-aggregatable (merge = element-wise add), so the
  * covariance of 100 TB of vectors costs a map pass plus a KB-scale
  * reduce — the textbook distributed-PCA shape (the naive posexplode
  * pair join shuffles n·d² rows instead).
  *
  * Products of float inputs are EXACT in double; only the cross-row
  * additions carry order dependence, which the driver absorbs by
  * rounding the assembled covariance (see [[graft.sim.Pca]]).
  *
  * Output: array<double> [n, s₀..s_{d−1}, g₀₀, g₀₁.., g₁₁..] (upper
  * triangle row-major).
  */
case class GramianAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val gOff = 1 + dim
  private val stateLen = 1 + dim + dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (dim <= 0)
      TypeCheckResult.TypeCheckFailure(s"dim must be positive, got $dim")
    else child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_gramian needs ARRAY<FLOAT>, got ${other.sql}")
    }
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](stateLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData]
      // fail loudly: a corpus/model dimension mismatch silently skipped
      // here would fit a basis on a partial corpus — wrong answer with
      // no symptom (checkInputDataTypes can only see the TYPE, the
      // per-row length is a runtime property)
      if (x.numElements() != dim) {
        throw new IllegalArgumentException(
          s"graft_gramian: input vector has ${x.numElements()} elements, " +
            s"expected dim=$dim")
      } else {
        buf(0) += 1.0
        var i = 0
        var g = gOff
        while (i < dim) {
          val xi = x.getFloat(i).toDouble
          buf(1 + i) += xi
          var j = i
          while (j < dim) {
            buf(g) += xi * x.getFloat(j).toDouble
            g += 1
            j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < stateLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(java.lang.Double.valueOf).toArray[Any])

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramianAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramianAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramianAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_gramian"
}
