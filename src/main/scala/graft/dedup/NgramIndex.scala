package graft.dedup

import org.apache.spark.sql.DataFrame
import graft.util.Caches

/** A FITTED n-gram Jaccard index — the fit-once / search-many shape of
  * [[NgramJaccard.pairs]] (which derives, searches, and cleans up per
  * call), joining the [[graft.sim.LshIndex]]/[[graft.sim.IvfIndex]]
  * handle family.
  *
  * Why it exists: pairs() honestly pays the full shingle → df → prefix
  * derivation (~2.3 s at sf0.1) on EVERY call — right for a one-shot
  * batch job, wasteful for a session that mines pairs repeatedly over
  * the same corpus (a dedup dashboard, threshold tuning, a warm
  * benchmark loop). `fit` materializes the two tables the search
  * actually touches — the narrow prefix index and the shingle arrays
  * for verification — as EAGER local checkpoints, so each `pairs()`
  * call afterwards runs only the candidate self-join + exact verify.
  *
  * Lifecycle is explicit, mirroring the siblings: the handle OWNS the
  * checkpoint blocks; call [[release]] when done (nothing registers in
  * the session CacheManager — the r4 leak class — and the
  * ContextCleaner reclaims the blocks on GC if release is never
  * called, but a long-lived session shouldn't wait for that).
  * DedupSpec pins result parity with pairs(), CacheManager emptiness,
  * and block release.
  *
  * τ and maxDf are FIT parameters: the prefix length per doc depends
  * on both (a lower τ keeps a longer prefix), so searching a fitted
  * index at a different τ would silently miss pairs. Refit to change
  * them — same contract as re-bucketing an LshIndex for new geometry.
  */
final class NgramIndex private (val n: Int, val tau: Double, val maxDf: Int,
    shingled: DataFrame, prefix: DataFrame) {

  /** Jaccard ≥ tau pairs: candidate self-join on the materialized
    * prefix index + one array_intersect verify against the
    * materialized shingle arrays. Output: (id_a, id_b, jaccard rounded
    * to 4), id_a < id_b — identical to [[NgramJaccard.pairs]].
    */
  def pairs(): DataFrame = NgramJaccard.verifiedPairs(prefix, shingled, tau)

  /** Eagerly free the index blocks. Results already computed from this
    * index remain valid only if they were materialized (collected or
    * checkpointed) — the index tables cannot be recomputed afterwards.
    */
  def release(): Unit = {
    Caches.release(prefix)
    Caches.release(shingled)
  }
}

object NgramIndex {

  /** Derive and MATERIALIZE the prefix + shingle tables (two eager
    * localCheckpoint jobs run here — fit is the expensive half by
    * design).
    */
  def fit(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tau: Double = 0.7, maxDf: Int = 100): NgramIndex = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    val shingled = NgramJaccard.shingle(docs, idCol, textCol, n)
      .localCheckpoint()
    // derive the prefix FROM the materialized shingle table: the
    // shingling pass runs once, and the join+window derivation plans
    // against checkpoint blocks
    val prefix = NgramJaccard.prefixIndex(shingled, tau, maxDf)
      .localCheckpoint()
    new NgramIndex(n, tau, maxDf, shingled, prefix)
  }
}
