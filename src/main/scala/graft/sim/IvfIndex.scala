package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A TRAINED, PERSISTENT IVF index — the production shape of `Knn.ivf`
  * (which fits and searches in one call, the right form for one-shot
  * queries but not for a serving corpus).
  *
  * `fit` runs the Lloyd iterations once and assigns every corpus
  * vector (with its precomputed norm) to its nearest cell. `save`
  * writes the assigned corpus PARTITIONED BY CELL plus a tiny centroid
  * table; `load` reopens it. A search against a loaded index joins the
  * broadcast query probes against the cell-partitioned table, and
  * Spark's dynamic partition pruning turns that into a scan of ONLY
  * the probed cells — at corpus scale a search touches
  * nProbe/C of the index files, which is the entire point of IVF.
  * The spec pins the `dynamicpruning` subquery in the plan.
  */
final case class IvfIndex(
    centroids: Array[(Int, Array[Float])], assigned: DataFrame) {

  /** Approximate top-k for `queries` against the indexed corpus. */
  def search(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 4): DataFrame =
    Knn.searchIndex(this, queries, idCol, vecCol, k, nProbe)

  /** Persist as `<dir>/centroids` + `<dir>/cells` (partitioned by cell). */
  def save(dir: String): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    centroids.map { case (cid, v) => (cid, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/cells")
  }
}

object IvfIndex {

  /** Train centroids and assign the corpus; columns of `assigned`:
    * (neighbor_id, nv, nn, cell).
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
      c: Int = 16, iters: Int = 3): IvfIndex = {
    val centroids = Knn.fitCentroids(corpus, idCol, vecCol, c, iters)
    IvfIndex(centroids, Knn.assignCorpus(corpus, idCol, vecCol, centroids))
  }

  def load(spark: SparkSession, dir: String): IvfIndex = {
    // by NAME, not ordinal — same self-describing on-disk contract as
    // LshIndex.load (a column-order change must not scramble the model)
    val centroids = spark.read.parquet(s"$dir/centroids")
      .collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Seq[Float]]("centroid").toArray))
      .sortBy(_._1)
    IvfIndex(centroids, spark.read.parquet(s"$dir/cells"))
  }
}
