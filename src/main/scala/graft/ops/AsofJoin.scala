package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: each left row picks up the value columns
  * of the LATEST right row with the same key and `rightTs ≤ leftTs` —
  * the "attach the prevailing quote/config/tier to each event" join
  * that plain equi/range joins can't express without a per-row
  * aggregation.
  *
  * Spark-first formulation — no custom physical operator needed: union
  * both sides tagged, ONE window per key ordered by (ts, side) with
  * right rows sorting before left rows at equal timestamps (that
  * ordering IS the ≤ semantics), and a `last(value, ignoreNulls)`
  * carry-forward; left rows contribute nulls so they never pollute the
  * carry. One shuffle, keyed on the join key — the same exchange a
  * plain equi-join would pay — and the window is a single forward scan
  * per partition. Left rows with no prior right row are dropped
  * (inner as-of semantics).
  *
  * The right side must be unique per (key, ts) — ties would make
  * "latest" ambiguous in any engine; pre-aggregate duplicates first
  * (the query layer shows the pattern).
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String): DataFrame = {
    val valueCols = right.columns.filterNot(c => c == rightKey || c == rightTs)
    val rSchema = right.schema
    val lTagged = left
      .withColumn("graft_k", col(leftKey))
      .withColumn("graft_t", col(leftTs))
      .withColumn("graft_isl", lit(1))
      // match marker: null on left rows, true on right rows — carries
      // independently of the value columns, which may be legitimately null
      .withColumn("graft_m", lit(null).cast("boolean"))
    val lWithNulls = valueCols.foldLeft(lTagged) { (df, v) =>
      df.withColumn(v, lit(null).cast(rSchema(v).dataType))
    }
    val rTagged0 = right
      .withColumn("graft_k", col(rightKey))
      .withColumn("graft_t", col(rightTs))
      .withColumn("graft_isl", lit(0))
      .withColumn("graft_m", lit(true))
    val rAligned = left.schema.fields.foldLeft(rTagged0) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.drop(rightKey, rightTs)
    val unioned = lWithNulls.unionByName(
      rAligned.select(lWithNulls.columns.toIndexedSeq.map(col): _*))
    // right (isl=0) sorts before left (isl=1) at equal ts → a left row's
    // inclusive window sees same-timestamp right rows: the ≤ semantics
    val w = Window.partitionBy(col("graft_k"))
      .orderBy(col("graft_t"), col("graft_isl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (valueCols :+ "graft_m").foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("graft_isl") === 1 && col("graft_m"))
      .drop("graft_k", "graft_t", "graft_isl", "graft_m")
  }
}
