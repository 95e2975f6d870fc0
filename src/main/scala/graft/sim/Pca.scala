package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Principal-component analysis for the embedding pipeline — the
  * dimensionality reduction you run BEFORE the ANN index (FAISS's
  * PCAMatrix / the first half of OPQ): 64-d vectors carrying most
  * variance in a few directions search faster and bucket better at the
  * same recall.
  *
  * Distributed part = ONE pass: [[graft.functions.GramianAgg]] folds
  * count/sums/Σxxᵀ into a single ~17 KB state that partial-aggregates
  * through the shuffle. Driver part = assemble the d×d covariance and
  * eigendecompose it with cyclic Jacobi — d=64 makes that microseconds
  * of KB-scale driver math (the centroids/codebooks/BPE pattern).
  *
  * Determinism: the Gramian's cross-row sums carry ~1e-13 relative
  * accumulation-order drift, so the assembled covariance is rounded to
  * 1e-9 BEFORE eigendecomposition — from there Jacobi (fixed sweep
  * order), the eigenvalue sort (value desc, index asc) and the sign
  * canonicalization (largest-|component| positive) are pure functions,
  * so the basis is identical across partition layouts. Projection is
  * per-row arithmetic with no cross-row accumulation at all.
  */
object Pca {

  final case class Model(
      mean: Array[Double],
      basis: Array[Array[Double]], // k rows, each a unit d-vector
      eigenvalues: Array[Double], // descending, all d of them
      n: Long)

  /** One-pass moments → covariance → Jacobi. */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim, s"k=$k out of range 1..$dim")
    val state = df
      .select(ColumnBridge.column(
        graft.functions.GramianAgg(
          ColumnBridge.expression(col(vecCol)), dim).toAggregateExpression())
        .as("s"))
      .collect()(0).getSeq[Double](0).toArray
    val n = state(0).toLong
    require(n > 1, s"PCA needs at least 2 vectors, got $n")
    val mean = Array.tabulate(dim)(i => state(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var g = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        // round to 1e-9: absorbs partition-order accumulation drift so
        // the eigenproblem input is partitioning-invariant
        val c = math.rint((state(g) / n - mean(i) * mean(j)) * 1e9) / 1e9
        cov(i)(j) = c
        cov(j)(i) = c
        g += 1
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // order by eigenvalue desc (ties: original index asc), canonical sign
    val order = values.indices.sortBy(idx => (-values(idx), idx))
    val basis = order.take(k).map { idx =>
      val v = Array.tabulate(dim)(r => vectors(r)(idx))
      var m = 0
      var bi = 0
      while (bi < dim) {
        if (math.abs(v(bi)) > math.abs(v(m))) m = bi
        bi += 1
      }
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    Model(mean, basis, order.map(values(_)).toArray, n)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector columns). Deterministic: fixed (p, q) sweep order,
    * fixed convergence threshold.
    */
  private[graft] def jacobiEigen(
      a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += m(i)(j) * m(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (offNorm > 1e-18 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val app = m(p)(p); val aqq = m(q)(q)
            m(p)(p) = app - t * apq
            m(q)(q) = aqq + t * apq
            m(p)(q) = 0.0; m(q)(p) = 0.0
            var i = 0
            while (i < d) {
              if (i != p && i != q) {
                val aip = m(i)(p); val aiq = m(i)(q)
                m(i)(p) = c * aip - s * aiq; m(p)(i) = m(i)(p)
                m(i)(q) = s * aip + c * aiq; m(q)(i) = m(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => m(i)(i)), v)
  }

  /** Per-row projection onto the model's basis (native expression,
    * session-free wrap).
    */
  def project(vec: Column, model: Model): Column =
    ColumnBridge.column(graft.functions.PcaProject(
      ColumnBridge.expression(vec),
      model.mean, model.basis.flatten, model.basis.length))

  /** PCA-WHITENED projection (FAISS PCAMatrix with eigen_power = -0.5):
    * component j additionally scaled by 1∕√(λ_j + eps), so the
    * projected corpus has unit variance per component and identity
    * covariance — the normalization that makes Euclidean/cosine
    * distances weight every retained direction equally (dominant
    * directions stop drowning out the rest) before an ANN index or
    * embedding-similarity dedup. Implemented by folding the scale into
    * the basis rows, so it is the SAME single map-side native
    * expression as [[project]] — zero extra plan nodes, zero extra
    * passes; `eps` guards degenerate (≈0-variance) components.
    */
  def whiten(vec: Column, model: Model, eps: Double = 1e-9): Column = {
    val scaled = model.basis.zipWithIndex.map { case (row, j) =>
      val s = 1.0 / math.sqrt(model.eigenvalues(j) + eps)
      row.map(_ * s)
    }
    ColumnBridge.column(graft.functions.PcaProject(
      ColumnBridge.expression(vec),
      model.mean, scaled.flatten, model.basis.length))
  }
}
