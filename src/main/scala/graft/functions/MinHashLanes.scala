package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All MinHash lanes of a shingle set in ONE per-row pass — returns
  * `array<long>` of NumLanes minima.
  *
  * Per shingle: one xxHash64 of the bytes, then each lane applies a
  * 2-universal mix `a_i * h + b_i` (odd multipliers from a fixed seed)
  * and keeps the min. 64 multiply-adds per shingle on JIT'd longs.
  *
  * The alternative formulation — explode shingles and groupBy doc with
  * 64 min-aggregates — SHUFFLES every (doc, shingle) pair; at corpus
  * scale that shuffle dominates the whole dedup pipeline. This
  * expression makes signature computation map-only: nothing moves until
  * the (much smaller) band-bucket join.
  */
case class MinHashLanes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val mins = Array.fill(MinHashLanes.NumLanes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes,
          MinHashLanes.Seed)
        var l = 0
        while (l < MinHashLanes.NumLanes) {
          val v = MinHashLanes.A(l) * h + MinHashLanes.B(l)
          if (v < mins(l)) mins(l) = v
          l += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val l = ctx.freshName("l")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      val aRef = ctx.addReferenceObj("minhashA", MinHashLanes.A, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", MinHashLanes.B, "long[]")
      val n = MinHashLanes.NumLanes
      s"""
         |long[] $mins = new long[$n];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $s = $a.getUTF8String($i);
         |    long $h = $xxh.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(),
         |      ${MinHashLanes.Seed}L);
         |    for (int $l = 0; $l < $n; $l++) {
         |      long $v = $aRef[$l] * $h + $bRef[$l];
         |      if ($v < $mins[$l]) $mins[$l] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashLanes =
    copy(child = newChild)
}

object MinHashLanes {
  val NumLanes = 64
  val Seed = 42L
  // 2-universal mixers: odd multipliers + offsets from a fixed-seed PRNG
  private val rng = new scala.util.Random(Seed)
  val A: Array[Long] = Array.fill(NumLanes)(rng.nextLong() | 1L)
  val B: Array[Long] = Array.fill(NumLanes)(rng.nextLong())
}
