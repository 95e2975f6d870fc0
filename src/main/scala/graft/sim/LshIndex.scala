package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A TRAINED, PERSISTENT sign-LSH index — the production shape of
  * `Knn.lsh` (which buckets and searches in one call, right for
  * one-shot queries but not for a serving corpus), and the LSH
  * counterpart of [[IvfIndex]].
  *
  * `build` buckets every corpus vector (with its precomputed norm)
  * into all `tables` hash tables. `save` writes the bucket table
  * PARTITIONED BY (table_id, bucket) plus a one-row geometry table —
  * the planes themselves never need storing, they are re-derived from
  * `(tables, bits, seed, dim)`. A search against a loaded index joins
  * the broadcast query probes against the partitioned bucket table,
  * and dynamic partition pruning cuts the scan to ONLY the probed
  * buckets: at radius-1 multiprobe that is tables×(bits+1) directories
  * of tables×2^bits — e.g. 144 of 4096 (3.5%) at the default 16×8
  * geometry. The spec pins the `dynamicpruning` subquery in the plan
  * and the result parity with one-shot `Knn.lsh`.
  */
final case class LshIndex(tables: Int, bits: Int, seed: Long, dim: Int,
    buckets: DataFrame) {

  /** Approximate top-k for `queries` against the indexed corpus. */
  def search(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, probeRadius: Int = 1): DataFrame =
    Knn.searchBuckets(buckets, queries, idCol, vecCol, k,
      dim, tables, bits, seed, probeRadius)

  /** Persist as `<dir>/geometry` + `<dir>/buckets` (partitioned by
    * (table_id, bucket)).
    */
  def save(dir: String): Unit = {
    val spark = buckets.sparkSession
    import spark.implicits._
    Seq((tables, bits, seed, dim))
      .toDF("tables", "bits", "seed", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/geometry")
    buckets.write.mode("overwrite").partitionBy("table_id", "bucket")
      .parquet(s"$dir/buckets")
  }
}

object LshIndex {

  /** Bucket the corpus into every table; columns of `buckets`:
    * (neighbor_id, nv, nn, table_id, bucket).
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, tables: Int = 16, bits: Int = 8, seed: Long = 42L): LshIndex =
    LshIndex(tables, bits, seed, dim,
      Knn.bucketCorpus(corpus, idCol, vecCol, dim, tables, bits, seed))

  def load(spark: SparkSession, dir: String): LshIndex = {
    // by NAME, not ordinal: a silent column-order change in the
    // geometry table would otherwise swap parameters (wrong planes →
    // garbage search results, no error) — the on-disk contract is
    // self-describing
    val g = spark.read.parquet(s"$dir/geometry").head()
    LshIndex(g.getAs[Int]("tables"), g.getAs[Int]("bits"),
      g.getAs[Long]("seed"), g.getAs[Int]("dim"),
      spark.read.parquet(s"$dir/buckets"))
  }
}
