package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a native Spark aggregate.
  *
  * State: at most `capacity` (item → (count, err)) slots. On overflow
  * the minimum-count slot is evicted and the newcomer inherits its
  * count (+1) with `err` = the inherited amount — the classic
  * Metwally et al. SpaceSaving guarantee: reported count overestimates
  * by at most err, and any item with true frequency > N/capacity is
  * retained. Merging two sketches sums matching slots (errs add) and
  * re-truncates, so the aggregate is partial-aggregatable: each
  * partition keeps a bounded sketch and only `capacity` slots travel
  * through the shuffle — the whole point at 100 TB, where exact
  * wordcount's shuffle is the cost.
  *
  * When capacity exceeds the true cardinality the sketch is EXACT
  * (nothing ever evicted, err = 0) — which is how the query layer
  * oracles this against plain GROUP BY counts at test scale.
  *
  * Output: array<struct<item string, cnt long, err long>>, descending
  * by cnt then item (deterministic).
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"graft_heavy_hitters needs a string column, got ${child.dataType.sql}")
    else if (capacity <= 0)
      TypeCheckFailure(s"capacity must be positive, got $capacity")
    else TypeCheckSuccess
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType),
    StructField("err", LongType))), containsNull = false)

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  private def bump(buf: mutable.LinkedHashMap[String, (Long, Long)],
      item: String, by: Long, err: Long): Unit = {
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + by, e + err))
      case None =>
        if (buf.size < capacity) buf.update(item, (by, err))
        else {
          // evict the min-count slot; newcomer inherits its count as error
          val (minItem, (minCnt, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
          buf.remove(minItem)
          buf.update(item, (minCnt + by, minCnt + err))
        }
    }
  }

  override def update(buf: mutable.LinkedHashMap[String, (Long, Long)],
      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) bump(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: mutable.LinkedHashMap[String, (Long, Long)],
      other: mutable.LinkedHashMap[String, (Long, Long)]): mutable.LinkedHashMap[String, (Long, Long)] = {
    // combine WITHOUT per-item eviction (bump would evict on every
    // insert once full, making the result depend on other's iteration
    // order and able to drop genuinely frequent items), THEN truncate
    // once with a deterministic (-count, item) order
    other.foreach { case (item, (c, e)) =>
      buf.get(item) match {
        case Some((c0, e0)) => buf.update(item, (c0 + c, e0 + e))
        case None => buf.update(item, (c, e))
      }
    }
    if (buf.size > capacity) {
      val keep = buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
      buf.clear()
      keep.foreach { case (k, v) => buf.update(k, v) }
    }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[String, (Long, Long)]): Any = {
    val rows = buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.map {
      case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  // length-prefixed UTF-8, not writeUTF: writeUTF hard-fails on any
  // string whose encoding exceeds 64 KiB (real document-sized items)
  override def serialize(buf: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (c, e)) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      val k = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      buf.update(k, (c, e))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}
