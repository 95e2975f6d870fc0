package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional data clustering — the
  * lakehouse OPTIMIZE ZORDER BY layout primitive. Interleaving the bits
  * of two sort keys makes a 1-D sort order in which points close in
  * EITHER dimension stay close on disk, so per-file min/max statistics
  * prune scans filtered on either column — a lexicographic sort only
  * ever prunes its leading column.
  *
  * The interleave is the classic magic-number bit spread (public-domain
  * "Bit Twiddling Hacks" / Morton 1966): 5 shift-mask rounds per
  * dimension, all Spark bitwise Column ops — whole-stage codegen'd,
  * no UDF, no loop. 16 bits per dimension → a 32-bit zvalue in a
  * BIGINT, enough for 65k buckets per axis (layout granularity, not
  * key cardinality: callers bucket larger domains first).
  *
  * At 100 TB the layout path is `repartitionByRange($"zvalue")` +
  * sortWithinPartitions + write: one range shuffle, then every output
  * file covers a compact z-range = a small rectangle in (x, y) space,
  * and the parquet footer min/max on BOTH columns become selective.
  * The zvalue itself is a pure deterministic per-row function — which
  * is what the exact SQL oracle on [[zvalue]] rollups checks; file
  * ASSIGNMENT (range-sampler dependent) is deliberately not part of
  * any oracled output.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i. */
  private[ops] def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit non-negative keys: x in the even
    * bits, y in the odd bits. Keys beyond 16 bits are masked (bucket
    * before calling if the domain is larger).
    */
  def zvalue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Physically cluster `df` by the z-order of (x, y) into `numFiles`
    * range partitions — the layout job.
    *
    * Both dimensions are first SCALED to the full 16-bit budget from
    * their observed [min, max] (two scalar aggregates — driver-held
    * config state): raw interleave is only fair when both dims use
    * comparable bit widths, otherwise the wider dim owns every
    * significant z-bit and the curve degenerates to a plain sort on it
    * (a 0..150 key against a 0..2400 key loses all clustering —
    * measured, not hypothetical). Scaling by range is the same move
    * production z-order layouts make (Delta's OPTIMIZE ZORDER
    * interleaves per-column range-partition ids, i.e. rank-scaled
    * values). Deterministic per-row zvalue; the range boundaries come
    * from Spark's reservoir sampler.
    */
  def layout(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    val b = df.agg(min(x), max(x), min(y), max(y)).head()
    def scaled(c: Column, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else floor((c - lit(lo)).cast("double") * 65535.0 / (hi - lo).toDouble)
    df.withColumn("zvalue", zvalue(
        scaled(x, b.getLong(0), b.getLong(1)),
        scaled(y, b.getLong(2), b.getLong(3))))
      .repartitionByRange(numFiles, col("zvalue"))
      .sortWithinPartitions(col("zvalue"))
  }
}
