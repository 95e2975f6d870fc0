package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TextRank keyword scoring (Mihalcea & Tarau, EMNLP'04): PageRank over
  * the word co-occurrence graph — adjacent-pretoken edges, symmetric,
  * weighted by occurrence count. The graph view of "which words matter"
  * that tf·idf can't give (a word is important if important words sit
  * next to it).
  *
  * The iteration is INTEGER-ARITHMETIC PageRank: ranks live in 1e-6
  * units (BIGINT), the damping update is
  *
  *   rank'(v) = ⌊150000∕N⌋ + Σ_{u→v} ⌊85·rank(u)·w(u,v) ∕ (100·W(u))⌋
  *
  * — every operation exact integer math, so the fixpoint trajectory is
  * bit-identical regardless of partitioning, accumulation order, or
  * engine. That buys something float PageRank can't have: an EXACT
  * DuckDB oracle (the classic float formulation drifts by accumulation
  * order and would trip both the hash gate and the determinism sweep).
  * The damping loss to flooring (≤ 1e-6 per in-edge) is noise at
  * keyword-ranking granularity.
  *
  * Scale shape: the edge table is one partial-aggregatable groupBy of
  * the corpus bigram stream (built once, shared across all rounds via
  * lazy localCheckpoint); each round is one equi-join of the KB-scale
  * rank table to the edges + one partial-agg sum — the rank table is
  * vocab-sized, broadcastable when the vocabulary is; per-round eager
  * localCheckpoint truncates the growing plan exactly like
  * ConnectedComponents. Isolated words (no neighbors) keep the
  * teleport-only rank.
  */
object TextRank {

  val Iterations = 10

  /** (node, rank_x6) after `Iterations` integer-PageRank rounds over
    * the adjacent-word graph of `textCol`.
    */
  def ranks(docs: DataFrame, textCol: String,
      iterations: Int = Iterations): DataFrame = {
    // scan-parallelism floor (graft.util.Fanout doc): the tokenize +
    // pair-explode below is the heavy map work — no-op at scale
    val toks = graft.util.Fanout.ensure(docs).select(
      regexp_extract_all(lower(col(textCol)),
        lit(TextOps.BpePattern), lit(0)).as("a"))
    // adjacent pairs with multiplicity (zip_with pads the shorter side
    // with null -> struct(x, null); dropped below), self-loops excluded
    // the symmetric union is two projections of the SAME pair stream —
    // materialize it once (the ConnectedComponents edge-list lesson) so
    // the corpus is tokenized once, not twice
    val occ = toks
      .select(explode(zip_with(col("a"),
        slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
        (x, y) => struct(x.as("s"), y.as("d")))).as("p"))
      .select(col("p.s").as("s"), col("p.d").as("d"))
      .filter(col("d").isNotNull && col("s") =!= col("d"))
      .localCheckpoint(false)
    val edges = occ
      .select(col("s").as("src"), col("d").as("dst"))
      .union(occ.select(col("d").as("src"), col("s").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    val wout = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val edgesW = edges.join(wout, "src")
      .select(col("src"), col("dst"), col("w"), col("wout"))
      .localCheckpoint(true) // vocab²-bounded; frees the pair stream
    graft.util.Caches.release(occ)
    val nodes = toks.select(explode(col("a")).as("node")).distinct()
      .localCheckpoint(false)
    try {
      val n = nodes.count()
      require(n > 0, "TextRank needs a non-empty vocabulary")
      val r0 = 1000000L / n
      val tp = 150000L / n
      var ranks = nodes.select(col("node"), lit(r0).as("rank"))
      var i = 0
      while (i < iterations) {
        val contrib = edgesW
          .join(ranks, edgesW("src") === ranks("node"))
          .select(col("dst"),
            expr("(85 * rank * w) div (100 * wout)").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
        ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
          .select(nodes("node"),
            (lit(tp) + coalesce(col("inflow"), lit(0L))).as("rank"))
          .localCheckpoint(true) // truncate the per-round plan growth
        i += 1
      }
      ranks.withColumnRenamed("rank", "rank_x6")
    } finally {
      // the final frame is an EAGER checkpoint — it no longer reads the
      // shared edge/node blocks, so free them deterministically
      graft.util.Caches.release(edgesW)
      graft.util.Caches.release(nodes)
    }
  }
}
