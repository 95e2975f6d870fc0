package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `dir`. All reads go through here so
  * every operator benefits from the same source: parquet with predicate
  * pushdown + column pruning (verify via `.explain` → `PushedFilters`,
  * `ReadSchema`). At cluster scale the same call reads a partitioned
  * directory tree; nothing here assumes single-file inputs.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame    = table("region")
  def nation: DataFrame    = table("nation")
  def customer: DataFrame  = table("customer")
  def supplier: DataFrame  = table("supplier")
  def part: DataFrame      = table("part")
  def orders: DataFrame    = table("orders")
  def lineitem: DataFrame  = table("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's converter
    * rejects. Read nanos as long (legacy conf, runtime-settable) and
    * normalize to a microsecond timestamp — identical to DuckDB's own
    * ns→us truncation, so oracle parity holds.
    *
    * NOTE: the conf is session-global and deliberately left set — the
    * read plan's schema AND its execution both honor it, so restoring
    * it eagerly could break this very frame's execution. Side effect:
    * other TIMESTAMP(NANOS) parquet reads in the session also see raw
    * longs (without the conf, Spark refuses to read them at all).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
