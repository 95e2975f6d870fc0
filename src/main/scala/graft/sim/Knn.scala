package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** k-nearest-neighbor search over an `array<float>` embedding column.
  *
  * Three paths, one contract (query_id, rank, neighbor_id, cos):
  *
  *  - `brute`: exact. Queries are broadcast against the corpus (the
  *    query set is the small side by construction); every (query,
  *    corpus) pair is scored with the native codegen dot product and
  *    ranked per query. The pair scoring is embarrassingly parallel;
  *    the rank is one shuffle keyed by query_id. This is the
  *    correctness baseline — at 100 TB its pair count is the problem,
  *    which is what the two approximate paths fix.
  *
  *  - `lsh`: random-hyperplane (sign) LSH. L tables × b Rademacher
  *    hyperplanes; bucket = the b sign bits. Same-bucket-in-any-table
  *    candidates, then exact scoring + rank on candidates only. The
  *    hyperplanes are literal constants baked into the plan (seeded
  *    deterministic), so bucketing is a pure per-row map — no fit step,
  *    no model state.
  *
  *  - `ivf`: inverted-file index. C centroids learned by a few Lloyd
  *    iterations (centroids collected to the driver between iterations
  *    — C×dim floats, i.e. KB — and re-broadcast as literals; the
  *    per-row assignment stays fully distributed). Queries probe the
  *    nProbe nearest cells and score only those cells' vectors.
  */
object Knn {

  private[sim] def pairTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  private[sim] def withNorm(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, nAs: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
      Vectors.normD(col(vecCol)).as(nAs))
  }

  private def scorePairs(qs: DataFrame, corpus: DataFrame): DataFrame =
    qs.join(corpus, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        Vectors.cosineWithNorms(Vectors.dotD(col("qv"), col("nv")),
          col("qn"), col("nn")), 6))

  /** Exact brute-force top-k (query set broadcast). The corpus side is
    * fanned out to the cluster's default parallelism before the pair
    * scoring: the scoring stage's task count is otherwise capped by
    * the corpus SCAN's split count, and a small single-row-group
    * parquet file is ONE unsplittable split while the work above it is
    * |Q|·|C| dot products — the guide's unsplittable-input move
    * (repartition right after the read; the fan-out shuffle is
    * O(|C|·dim), the compute it parallelizes is O(|Q|·|C|·dim)).
    */
  def brute(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val qs = broadcast(withNorm(queries, idCol, vecCol, "query_id", "qv", "qn"))
    val cs = withNorm(graft.util.Fanout.ensure(corpus),
      idCol, vecCol, "neighbor_id", "nv", "nn")
    pairTopK(scorePairs(qs, cs), k)
  }

  // ---- random-hyperplane LSH ------------------------------------------

  /** One bucket value per table (array of `tables` ints), computed by
    * the native [[graft.functions.LshBuckets]] expression — one plan
    * node holding the plane matrix as a reference object. The previous
    * literal formulation (a `when(dot ≥ 0, …)` chain per plane, each
    * against a 64-element array literal) put 2×16384 literal leaves
    * through analysis/optimization/codegen per query construction,
    * which dominated the LSH path's wall clock at sf0.1. Bucket values
    * are bit-identical (SimSpec pins the parity), so multiprobe XOR
    * flips on the materialized value are unchanged.
    */
  private def bucketsCol(vec: Column, dim: Int, tables: Int, bits: Int,
      seed: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.LshBuckets(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec),
        tables, bits, seed, dim))

  /** (neighbor_id, nv, nn, table_id, bucket) — the corpus bucketed into
    * every table, the materialized half of an [[LshIndex]].
    */
  private[sim] def bucketCorpus(corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, tables: Int, bits: Int, seed: Long): DataFrame =
    withNorm(corpus, idCol, vecCol, "neighbor_id", "nv", "nn")
      .select(col("neighbor_id"), col("nv"), col("nn"),
        posexplode(bucketsCol(col("nv"), dim, tables, bits, seed))
          .as(Seq("table_id", "bucket")))

  /** Probe-and-score against an already-bucketed corpus table. */
  private[sim] def searchBuckets(buckets: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, tables: Int, bits: Int,
      seed: Long, probeRadius: Int): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 1,
      s"only Hamming radius 0 or 1 probing is implemented, got $probeRadius")
    val probes = (b: Column) => array((b +:
      (if (probeRadius >= 1) (0 until bits).map(i => b.bitwiseXOR(lit(1 << i)))
       else Seq.empty)): _*)
    val qs = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn")
      .select(col("query_id"), col("qv"), col("qn"),
        posexplode(bucketsCol(col("qv"), dim, tables, bits, seed))
          .as(Seq("table_id", "bucket0")))
      .select(col("query_id"), col("qv"), col("qn"), col("table_id"),
        explode(probes(col("bucket0"))).as("bucket"))
    // Score each candidate OCCURRENCE map-side, then dedupe on the id
    // pair with max(cos) — a partial-aggregatable shuffle of
    // (long, long, double) rows. The previous shape (distinct() on the
    // pair WITH both vectors, score after) shipped 2×64 floats per row
    // through the dedup exchange and compared whole arrays in the
    // grouping key; re-scoring a pair per colliding table is cheap
    // codegen'd CPU, shuffle bytes are the scarce resource. cos is
    // identical across a pair's occurrences, so max() is just dedup.
    val scored = broadcast(qs).join(buckets, Seq("table_id", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), round(
        Vectors.cosineWithNorms(Vectors.dotD(col("qv"), col("nv")),
          col("qn"), col("nn")), 6).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cos")).as("cos"))
    pairTopK(scored, k)
  }

  /** Approximate top-k via sign-LSH with query-side multiprobe: the
    * query also probes every bucket within Hamming `probeRadius` of its
    * own (cheap XORs on the bucket value), the corpus stays
    * single-bucketed — so multiprobe cost scales with the QUERY side
    * only. Bucket + search in one call; for a long-lived corpus use
    * [[LshIndex]].
    */
  def lsh(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, tables: Int = 16, bits: Int = 8, seed: Long = 42L,
      probeRadius: Int = 1): DataFrame =
    searchBuckets(
      bucketCorpus(corpus, idCol, vecCol, dim, tables, bits, seed),
      queries, idCol, vecCol, k, dim, tables, bits, seed, probeRadius)

  // ---- IVF -------------------------------------------------------------

  /** The largest C×dim this driver-mediated Lloyd fit supports: each
    * iteration collects C×dim doubles of per-cell sums (plus row
    * overhead) to the driver — 16M doubles ≈ 128 MB, comfortably
    * inside a default driver heap while still admitting e.g. 16k cells
    * × 1k dims. Past it the collect silently becomes the job's
    * failure point, so the fit REFUSES loudly instead (spec-pinned):
    * at that scale run the centroid update as a distributed table
    * (keep (cell, dim, sum) rows partitioned; join instead of
    * collect) — the assignment side of this module already scales,
    * it is only the update hop that is driver-mediated here.
    */
  val MaxDriverFitCells: Long = 16L * 1024 * 1024

  /** Lloyd iterations with driver-held centroids (C×dim floats). Returns
    * the final centroids. Assignment/update are distributed; only the
    * centroid table moves through the driver — which is why C×dim is
    * guarded by [[MaxDriverFitCells]].
    */
  def fitCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int): Array[(Int, Array[Float])] = {
    GraftFunctions.register(corpus.sparkSession)
    val dimRow = corpus.select(size(col(vecCol))).head()
    val dim = dimRow.getInt(0)
    require(c.toLong * dim <= MaxDriverFitCells,
      s"C×dim = ${c.toLong * dim} exceeds the driver-mediated Lloyd " +
        s"ceiling $MaxDriverFitCells (each iteration collects C×dim " +
        "doubles of cell sums to the driver); distribute the centroid " +
        "update for this geometry")
    // deterministic init: first C vectors by id
    var centroids: Array[(Int, Array[Float])] = corpus
      .orderBy(col(idCol)).limit(c)
      .select(col(vecCol)).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0).toArray) }
    var it = 0
    while (it < iters) {
      val assigned = assignCells(corpus, idCol, vecCol, centroids, 1)
      val sums = assigned
        .select(col("cell"), col(vecCol).as("v"))
        .groupBy(col("cell"))
        .agg(
          count(lit(1)).as("n"),
          array((0 until dim).map(d =>
            sum(element_at(col("v"), d + 1).cast("double"))): _*).as("vsum"))
        .collect()
      centroids = sums.map { r =>
        val n = r.getLong(1).toDouble
        val s = r.getSeq[Double](2)
        (r.getInt(0), s.map(x => (x / n).toFloat).toArray)
      }.sortBy(_._1)
      it += 1
    }
    centroids
  }

  /** Lloyd iterations with the centroid state kept DISTRIBUTED — the
    * documented path PAST [[MaxDriverFitCells]]: no collect anywhere,
    * so C×dim is bounded by executor memory for ONE broadcast copy of
    * the centroid table (a 16k×1k geometry is 64 MB — broadcastable),
    * never by driver-heap boxing. Assignment is a broadcast join +
    * struct-min argmin (same argmax-cosine / tie→smaller-cell contract
    * as the NearestCells kernel, parity spec-pinned); the update is a
    * partial-aggregatable per-(cell,dim) mean reassembled into arrays.
    * Each round ends in an EAGER localCheckpoint of the C-row result —
    * the per-iteration lineage truncation pattern from
    * ConnectedComponents, so `iters` cannot stack analysis cost.
    *
    * Trade vs [[fitCentroids]]: the join materializes n×C scored rows
    * per round through codegen instead of the fused O(C·dim)-per-row
    * loop — same flop count, higher constant. Below the ceiling the
    * driver-mediated fit is faster; this is the shape that keeps
    * working above it. Returns (cell, cvec) rows.
    *
    * Input contract (where the two fits could diverge): `idCol` must be
    * unique (the assignment groupBy keys on it — duplicate ids with
    * identical vectors would collapse to one mean contribution) and
    * vector elements non-null (the update's per-dim avg divides by the
    * non-null count; fitCentroids divides by the cell's row count).
    * Both hold for any sane embedding corpus and match the
    * requirements the driver-mediated fit already has in practice.
    */
  def fitCentroidsDistributed(corpus: DataFrame, idCol: String,
      vecCol: String, c: Int, iters: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    // deterministic init mirroring fitCentroids: first C vectors by id,
    // cell = rank in id order (C rows — the single-partition window is
    // over the centroid table, never the corpus)
    var cents = corpus.orderBy(col(idCol)).limit(c)
      .select(col(idCol).as("init_id"), col(vecCol).as("cvec"))
      .withColumn("cell",
        (row_number().over(Window.orderBy(col("init_id"))) - 1).cast("int"))
      .select(col("cell"), col("cvec"))
      .localCheckpoint(true)
    var it = 0
    while (it < iters) {
      val assigned = assignCellsJoin(
        corpus.select(col(idCol).as("fit_id"), col(vecCol).as("v")),
        "fit_id", "v", cents)
      cents = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell"),
          expr("transform(dm, s -> cast(s.m as float))").as("cvec"))
        .localCheckpoint(true)
      it += 1
    }
    cents
  }

  /** Broadcast-join cell assignment against a centroid TABLE — the
    * past-the-ceiling twin of the NearestCells(nProbe=1) kernel: argmax
    * cosine, ties → smaller cell id (min of (−score, cell) structs).
    * Degenerate scores (zero-norm vector or centroid) coalesce to −2 —
    * strictly below any real cosine, so they never outrank one; an
    * all-degenerate row falls to the smallest cell id, matching the
    * NearestCells degenerate contract.
    */
  private[sim] def assignCellsJoin(df: DataFrame, idCol: String,
      vecCol: String, cents: DataFrame): DataFrame =
    df.withColumn("vn_", Vectors.normD(col(vecCol)))
      .join(broadcast(cents.select(col("cell"),
        col("cvec"), Vectors.normD(col("cvec")).as("cn_"))))
      .withColumn("score_", coalesce(
        Vectors.cosineWithNorms(Vectors.dotD(col(vecCol), col("cvec")),
          col("vn_"), col("cn_")), lit(-2.0)))
      .groupBy(col(idCol), col(vecCol))
      .agg(min(struct((col("score_") * lit(-1.0)).as("neg"),
        col("cell").as("cell"))).as("best"))
      .select(col(idCol), col(vecCol), col("best.cell").as("cell"))

  /** Attach the `nProbe` nearest cell ids (by cosine to each centroid)
    * to every row — pure map via the native
    * [[graft.functions.NearestCells]] expression, whose centroid matrix
    * rides as ONE codegen reference object. The literal formulation
    * (array_sort over C `struct(-cosine(v, lit(c)), id)` entries) put
    * C×dim literal leaves into the plan per assignment site — and the
    * Lloyd fit builds a fresh site per iteration; at a production cell
    * count the plan tree itself becomes the bottleneck, the same class
    * LshBuckets removed from the LSH path. SimSpec pins bit-parity
    * against the literal twin.
    */
  private[graft] def assignCells(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Array[Float])], nProbe: Int): DataFrame = {
    val probes = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.NearestCells(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(vecCol)),
        centroids.map(_._1), centroids.map(_._2), nProbe))
    if (nProbe == 1)
      df.withColumn("cell", probes.getItem(0))
    else
      df.withColumn("cells", probes)
  }

  /** All-pairs k-nearest-neighbor GRAPH over the corpus, IVF-cell
    * blocked — the SemDeDup/diversity-filter building block where every
    * vector is simultaneously a query. Unlike [[searchIndex]], NOTHING
    * broadcasts (both sides are the corpus): each vector probes its
    * `nProbe` nearest cells, the corpus is indexed at its single
    * nearest cell, and candidates ride one shuffle-hash EQUI-join on
    * `cell` — candidate volume ≈ n²·nProbe∕C instead of n², and a
    * skewed giant cell re-splits under AQE. The corpus side carries one
    * cell per vector, so a (query, neighbor) pair can match at most
    * once — no dedup pass. Exact cosine on candidates, per-query top-k
    * via the row_number window (compiles to WindowGroupLimit: each map
    * task forwards ≤ k candidates per query before the rank exchange).
    * Recall vs the exact graph ([[brute]] with queries = corpus) is
    * SimSpec-gated; rank quality degrades gracefully with nProbe like
    * IVF search.
    */
  def graphCells(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      centroids: Array[(Int, Array[Float])], nProbe: Int): DataFrame = {
    val indexed = assignCorpus(corpus, idCol, vecCol, centroids)
    val qs = assignCells(
        withNorm(corpus, idCol, vecCol, "query_id", "qv", "qn"),
        "query_id", "qv", centroids, nProbe)
      .select(col("query_id"), col("qv"), col("qn"),
        explode(col("cells")).as("cell"))
    val scored = qs.join(indexed, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        Vectors.cosineWithNorms(Vectors.dotD(col("qv"), col("nv")),
          col("qn"), col("nn")), 6))
    pairTopK(scored, k)
  }

  /** Cell-assign the normalized corpus: (neighbor_id, nv, nn, cell) —
    * the materialized half of an [[IvfIndex]].
    */
  private[sim] def assignCorpus(corpus: DataFrame, idCol: String,
      vecCol: String, centroids: Array[(Int, Array[Float])]): DataFrame =
    assignCells(
      withNorm(corpus, idCol, vecCol, "neighbor_id", "nv", "nn"),
      "neighbor_id", "nv", centroids, 1)

  /** Probe-and-score against an already-fitted index. */
  private[sim] def searchIndex(index: IvfIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val qs = assignCells(
        withNorm(queries, idCol, vecCol, "query_id", "qv", "qn"),
        "query_id", "qv", index.centroids, nProbe)
      .select(col("query_id"), col("qv"), col("qn"),
        explode(col("cells")).as("cell"))
    val scored = broadcast(qs).join(index.assigned, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        Vectors.cosineWithNorms(Vectors.dotD(col("qv"), col("nv")),
          col("qn"), col("nn")), 6))
    pairTopK(scored, k)
  }

  /** Approximate top-k probing nProbe IVF cells per query — fit +
    * search in one call; for a long-lived corpus use [[IvfIndex]].
    */
  def ivf(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, c: Int = 16, iters: Int = 3, nProbe: Int = 4): DataFrame =
    ivfWith(fitCentroids(corpus, idCol, vecCol, c, iters),
      queries, corpus, idCol, vecCol, k, nProbe)

  /** IVF search against ALREADY-FITTED centroids — the entry point for
    * callers that hold a corpus's centroid table across queries (the
    * Lloyd fit is the expensive, corpus-only half; re-running it per
    * query re-scans the corpus `iters` times for an identical KB-scale
    * result).
    */
  def ivfWith(centroids: Array[(Int, Array[Float])], queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 4): DataFrame =
    searchIndex(
      IvfIndex(centroids, assignCorpus(corpus, idCol, vecCol, centroids)),
      queries, idCol, vecCol, k, nProbe)
}
