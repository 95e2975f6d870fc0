package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-balanced diversity sampling (the data-pruning scheme of
  * Sorscher et al. arXiv:2206.14486, "SSL prototypes", re-expressed):
  * assign every vector to its nearest IVF cell and keep the `perCell`
  * vectors FARTHEST from their centroid — per that paper, with
  * abundant data the easy/prototypical examples (near the centroid)
  * are the ones to prune, and per-cell quotas stop a dominant cluster
  * from monopolizing the kept set. The embedding-space counterpart of
  * sample_stratified's per-column strata.
  *
  * Deterministic: farthest = lowest cosine to own centroid (round 6,
  * the corpus-wide cosine convention), ties by vector id.
  *
  * Scale (100 TB): cell assignment is the memoized NearestCells kernel
  * (ONE map pass, centroid matrix as a codegen reference object); the
  * centroid lookup is a broadcast join on the C-row centroid table;
  * the quota is a rank window on the cell exchange that compiles to
  * WindowGroupLimit — each map task forwards at most `perCell`
  * candidates per cell before the shuffle, so the exchange carries
  * O(C·perCell·tasks), not the corpus.
  */
object DiverseSample {

  /** Kept rows: (id, cell, rank, cos) — rank 1 = farthest from the
    * centroid; at most `perCell` rows per cell.
    */
  def farthestPerCell(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Array[Float])], perCell: Int): DataFrame = {
    require(perCell >= 1, s"perCell must be >= 1, got $perCell")
    val spark = corpus.sparkSession
    import spark.implicits._
    val normed = Knn.withNorm(corpus, idCol, vecCol, "id", "v", "vn")
    val assigned = Knn.assignCells(normed, "id", "v", centroids, nProbe = 1)
    val cents = centroids.map { case (cid, c) => (cid, c.toSeq) }.toSeq
      .toDF("cell", "cv")
      .select(col("cell"), col("cv"), Vectors.normD(col("cv")).as("cn"))
    val scored = assigned.join(broadcast(cents), "cell")
      .withColumn("cos", round(
        Vectors.cosineWithNorms(Vectors.dotD(col("v"), col("cv")),
          col("vn"), col("cn")), 6))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("cos"), col("id"))))
      .filter(col("rank") <= perCell)
      .select(col("id").as(idCol), col("cell"), col("rank").cast("long").as("rank"),
        col("cos"))
  }
}
