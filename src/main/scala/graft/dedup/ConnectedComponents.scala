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
  *
  * Two costs this version engineers away (measured: they dominated the
  * sf0.1 bench):
  *  - **Round 0 is free.** The initial label table is already one
  *    neighbor-min pass (`label = least(id, min(neighbor))`), computed by
  *    the same groupBy that collects the node set — a clique converges in
  *    one propagation round + one confirm round.
  *  - **Plans must not grow.** `persist` short-circuits execution but the
  *    logical plan still accretes one join+union+agg per round, so
  *    analysis/optimization cost grows quadratically with iterations.
  *    Each round ends in a lazy `localCheckpoint`, truncating plan AND
  *    lineage; the round's single action materializes it. Superseded
  *    round buffers become unreferenced and the ContextCleaner reclaims
  *    them (no cache-manager pinning as with `persist`) — including the
  *    final buffer once the caller drops it, which closes the
  *    cached-block leak `persist` had. localCheckpoint trades fault
  *    tolerance for speed: an executor loss fails the job instead of
  *    recomputing. On a real cluster with flaky nodes, prefer
  *    `spark.sparkContext.setCheckpointDir` + reliable `checkpoint`
  *    every few rounds; the loop structure is identical.
  */
object ConnectedComponents {

  /** Below this node count the label table joins with an explicit
    * broadcast hint — on a small graph the per-iteration cost is all
    * scheduling overhead, while a large graph wants the shuffle path.
    * (Deliberately NOT toggling session-global confs like AQE here:
    * labels() can run concurrently with other queries — e.g. inside a
    * MultiPipeline branch — and a save/set/restore of session conf
    * races and can leave the session misconfigured.)
    */
  val SmallGraphNodes = 1000000L

  /** (id, label) for every node of `edges` (columns id_a, id_b); label =
    * min node id reachable. Only nodes with at least one edge appear.
    */
  def labels(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // persist the EDGE LIST, not just the symmetrized view: sym unions two
    // projections of `edges`, so an unpersisted edges plan (e.g. a whole
    // MinHash pipeline) would execute once per union branch per action
    val e = edges.persist()
    val sym = e.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(e.select(col("id_b").as("u"), col("id_a").as("v")))
    // round 0 fused into initialization: one aggregation yields both the
    // node set and each node's first neighbor-min label
    var cur = sym.groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("label"))
      .select(col("u").as("id"), col("label"))
      .localCheckpoint(false)
    val nNodes = cur.count()
    val small = nNodes < SmallGraphNodes
    var converged = false
    try {
      var it = 0
      while (it < maxIters && !converged) {
        // change detection rides the SAME aggregation: each node's own row
        // carries its previous label in `old` (max ignores the nulls from
        // propagated rows), so converged ⟺ no node got a smaller label —
        // one shuffle and one action per iteration, no extra join.
        val labelSide = if (small) broadcast(cur) else cur
        val prop = sym.join(labelSide, sym("v") === cur("id"))
          .select(sym("u").as("id"), col("label"),
            lit(null).cast("long").as("old"))
        val own = cur.select(col("id"), col("label"), col("label").as("old"))
        val agg = own.unionByName(prop)
          .groupBy(col("id"))
          .agg(min(col("label")).as("label"), max(col("old")).as("old"))
          .localCheckpoint(false)
        val changed = agg.filter(col("label") < col("old")).count()
        cur = agg // previous round's buffer is now unreferenced → cleaned
        converged = changed == 0
        it += 1
      }
    } finally {
      e.unpersist()
    }
    // silent non-convergence would return WRONG labels (nodes farther
    // than maxIters hops from their component's min keep a stale label)
    // and diverge from the exact transitive-closure oracle — fail loudly
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIters iterations " +
          s"($nNodes nodes); raise maxIters (graph diameter exceeds it)")
    cur.select(col("id"), col("label"))
  }

  /** Cluster summary: (cluster_id = min doc id, n_docs), one row per
    * component of the pair graph.
    */
  def clusters(edges: DataFrame, maxIters: Int = 10): DataFrame =
    labels(edges, maxIters)
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"))

  /** Eagerly drop the cached checkpoint blocks behind a frame returned
    * by [[labels]]/[[clusters]]. The final round's buffer is otherwise
    * reclaimed only when the caller's reference is garbage-collected
    * (ContextCleaner); long-lived sessions that hold many results can
    * release deterministically instead. Call ONLY after every action on
    * the frame (and anything derived from it) has run: a localCheckpoint
    * truncates lineage, so unpersisted blocks cannot be recomputed.
    */
  def release(df: DataFrame): Unit = graft.util.Caches.release(df)
}
