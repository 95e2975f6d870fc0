package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph by iterative
  * min-label propagation — turns pairwise matches into duplicate-cluster
  * ids (cluster id = smallest doc id in the component).
  *
  * Each iteration is one distributed join + partial-aggregatable min:
  * every node adopts the smallest label among itself and its neighbors.
  * Iterations needed = graph diameter, and duplicate clusters are
  * near-cliques (diameter ≤ 2-3 in practice), so the loop converges in
  * a handful of rounds; `maxIters` bounds the worst case. The driver
  * holds only the convergence counter — labels never leave the cluster.
  * Results are materialized each round (persist + count) so the lineage
  * doesn't re-run prior rounds; at true scale swap the persist for
  * `checkpoint` to also truncate lineage.
  */
object ConnectedComponents {

  /** (id, label) for every node of `edges` (columns id_a, id_b); label =
    * min node id reachable. Only nodes with at least one edge appear.
    */
  def labels(edges: DataFrame, maxIters: Int = 10): DataFrame = {
    val sym = edges.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(edges.select(col("id_b").as("u"), col("id_a").as("v")))
      .persist()
    var cur = sym.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()
    cur.count()
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val prop = sym.join(cur, sym("v") === cur("id"))
        .select(sym("u").as("id"), col("label"))
      val next = cur.unionByName(prop)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .persist()
      val changed = next.as("n")
        .join(cur.as("c"), col("n.id") === col("c.id"))
        .filter(col("n.label") =!= col("c.label"))
        .count()
      cur.unpersist()
      cur = next
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    cur
  }

  /** Cluster summary: (cluster_id = min doc id, n_docs), one row per
    * component of the pair graph.
    */
  def clusters(edges: DataFrame, maxIters: Int = 10): DataFrame =
    labels(edges, maxIters)
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"))
}
