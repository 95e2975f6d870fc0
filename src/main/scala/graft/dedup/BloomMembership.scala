package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BloomUtil, GraftFunctions}

/** Membership at corpus scale: "which probe rows' keys already exist in
  * the seen corpus" — exact answers at bloom-prefilter cost.
  *
  * The naive form is a semi join probe ⋈ seen: both sides shuffle on
  * the key, and at 100 TB the seen side IS the corpus. Here the seen
  * side collapses map-side into an m-bit bloom filter
  * ([[graft.functions.BloomFilterAgg]] partial-aggregates: per-partition
  * filters OR-merge, so the shuffle carries m/8-byte blobs, not keys),
  * the probe side drops every row the broadcast filter rejects — a
  * codegen'd hash per row, no shuffle — and only the surviving ~fpp
  * fraction plus true matches pay the exact verification join. No false
  * negatives means the final output is EXACTLY the semi join's, which
  * is what the DuckDB oracle checks.
  */
object BloomMembership {

  /** One-row frame holding the bloom filter (column `graft_bloom`) of
    * `key` over `seen`, sized for expectedN keys at the given fpp.
    */
  def seenFilter(seen: DataFrame, key: Column, expectedN: Long,
      fpp: Double): DataFrame = {
    GraftFunctions.register(seen.sparkSession)
    val m = BloomUtil.optimalNumBits(expectedN, fpp)
    val k = BloomUtil.optimalNumHashes(m, expectedN)
    seen.agg(call_function("graft_bloom_agg",
      xxhash64(key), lit(m), lit(k)).as("graft_bloom"))
  }

  /** Probe rows whose key exists in `seen` — bloom-prefiltered, then
    * exactly verified (distinct seen keys) so false positives never
    * reach the output.
    */
  def matches(probe: DataFrame, seen: DataFrame, probeKey: Column,
      seenKey: Column, expectedN: Long, fpp: Double = 0.01): DataFrame = {
    val candidates = probe
      .crossJoin(broadcast(seenFilter(seen, seenKey, expectedN, fpp)))
      .filter(call_function("graft_bloom_contains",
        col("graft_bloom"), xxhash64(probeKey)))
      .drop("graft_bloom")
    // no distinct() on the seen side: left_semi already emits each
    // candidate at most once, and a pre-dedup would shuffle+aggregate
    // the corpus-scale seen side — the cost the bloom prefilter saves
    candidates.join(
      seen.select(seenKey.as("graft_seen_k")),
      probeKey === col("graft_seen_k"), "left_semi")
  }
}
