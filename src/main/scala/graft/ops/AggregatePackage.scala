package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Hadoop Aggregate package (`-reducer aggregate` in Hadoop
  * Streaming) — the stock reducers users of the reference chain after
  * their mappers: LongValueSum, DoubleValueSum, LongValueMax/Min,
  * StringValueMax/Min, UniqValueCount, ValueHistogram.
  *
  * Each is a Spark aggregate `Column`, so any combination runs as ONE
  * partial+final aggregation (map-side combine) instead of one MR job
  * per metric.
  */
object AggregatePackage {
  def longValueSum(c: String): Column    = sum(col(c).cast("long")).as(s"sum_$c")
  def doubleValueSum(c: String): Column  = sum(col(c).cast("double")).as(s"dsum_$c")
  def longValueMax(c: String): Column    = max(col(c).cast("long")).as(s"max_$c")
  def longValueMin(c: String): Column    = min(col(c).cast("long")).as(s"min_$c")
  def stringValueMax(c: String): Column  = max(col(c).cast("string")).as(s"smax_$c")
  def stringValueMin(c: String): Column  = min(col(c).cast("string")).as(s"smin_$c")
  /** Exact distinct — expands to a two-phase distinct agg in Spark. */
  def uniqValueCount(c: String): Column  = countDistinct(col(c)).as(s"uniq_$c")
  /** Scale path: HLL sketch instead of exact distinct (one pass, tiny state). */
  def approxUniqValueCount(c: String): Column =
    approx_count_distinct(col(c)).as(s"approx_uniq_$c")

  /** Skew-proof exact distinct count: `countDistinct` plans the distinct
    * expansion keyed on the GROUP key, so one hot key funnels its whole
    * value set through one reducer. This form shuffles on (key, value)
    * instead — a hot key's values spread across the cluster — then
    * counts with an ordinary partial-aggregatable count. Same exact
    * result, skew-immune plan: the 100 TB spelling of UniqValueCount
    * when group keys are Zipfian.
    */
  def uniqValueCountTwoPhase(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value)).distinct()
      .groupBy(col(key))
      .agg(count(lit(1)).as(s"uniq_$value"))

  /** Exact distinct count via segment BITMAPS (Spark 4
    * `bitmap_bucket_number` / `bitmap_construct_agg` / `bitmap_count`):
    * values bucket into 32768-bit segments, each (key, segment)
    * partial-aggregates into a ≤ 4 KB bitmap, and the key's distinct
    * count is the sum of segment popcounts. The shuffle key shape is
    * the same skew-proof (key, segment) as [[uniqValueCountTwoPhase]],
    * but the wire carries CONSTANT-size bitmaps instead of one row per
    * distinct value — the cheapest exact-distinct at 100 TB for DENSE
    * INTEGER key domains (1-based, the builtins' convention).
    *
    * Guarded: a non-integral value column fails HERE with the right
    * alternative named, not at runtime inside `bitmap_bit_position` —
    * a migrating user can't silently mis-apply the dense-int plan to
    * strings or decimals.
    */
  def bitmapDistinct(df: DataFrame, key: String, value: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(value).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"bitmapDistinct requires an integral value column " +
          s"(bitmap_bit_position is defined on 1-based integer domains); " +
          s"'$value' is ${other.simpleString}. Use uniqValueCountTwoPhase " +
          s"(exact, any type) or approxUniqValueCount (HLL) instead.")
    }
    df.groupBy(col(key),
        call_function("bitmap_bucket_number", col(value)).as("seg"))
      .agg(call_function("bitmap_construct_agg",
        call_function("bitmap_bit_position", col(value))).as("w"))
      .groupBy(col(key))
      .agg(sum(call_function("bitmap_count", col("w"))).as(s"uniq_$value"))
  }

  /** ValueHistogram semantics (hadoop's ValueHistogram reducer): for each
    * key, over the multiset of values, report statistics of the per-unique-
    * value frequencies: #unique, min/median/max/avg/stddev of counts.
    *
    * Two-level aggregation — (key, value) counts, then per-key stats.
    * Both levels partial-aggregate; no value list is ever materialized
    * (the Hadoop reducer holds all values of a key in one JVM — this
    * doesn't).
    */
  def valueHistogram(df: DataFrame, key: String, value: String): DataFrame =
    df.groupBy(col(key), col(value))
      .agg(count(lit(1)).as("vcnt"))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_unique"),
        min(col("vcnt")).as("min_cnt"),
        // exact interpolated median for oracle parity (matches DuckDB
        // quantile_cont); swap to percentile_approx at extreme cardinality
        round(expr("percentile(vcnt, 0.5)"), 4).as("median_cnt"),
        max(col("vcnt")).as("max_cnt"),
        round(avg(col("vcnt")), 4).as("avg_cnt"),
        round(coalesce(stddev_pop(col("vcnt")), lit(0.0)), 4).as("std_cnt"))
}
