package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join: left rows with a point column
  * matched to right rows with [start, end] interval columns, point ∈
  * interval — "which session/window/deployment does this event fall
  * in". Catalyst plans a plain `l.p BETWEEN r.s AND r.e` predicate as
  * a nested-loop join (no equi-key to hash on): quadratic.
  *
  * The scale path is BIN BUCKETING: pick a bin width, explode each
  * interval into the bins it covers (`sequence(s ÷ W, e ÷ W)`), bin
  * the point, equi-join on (extra keys…, bin), then filter the exact
  * containment. Every join key is hashable, the explode factor is
  * interval-length ÷ W (choose W near the typical interval length so
  * it stays small), and no pair outside ±1 bin is ever materialized.
  * Matches are unique per (left row, interval) because a point lives
  * in exactly one bin — no post-join dedup needed.
  *
  * `keys` are additional equi-columns (e.g. user_id) present on both
  * sides; they ride the same hash join.
  */
object RangeJoin {

  def binned(left: DataFrame, right: DataFrame, pointCol: String,
      startCol: String, endCol: String, keys: Seq[String],
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("graft_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val r = right.withColumn("graft_bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    l.join(r, keys :+ "graft_bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("graft_bin")
  }
}
