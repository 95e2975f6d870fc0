#!/bin/sh
# Full Verify + DuckDB-oracle pass at sf0.1 — the per-round hardening
# sweep on top of the driver's sf0.01 gate: 10x the rows means 10x the
# collisions on window tie-breaks, float rounding edges, and
# first-occurrence ordering, which is where engine-vs-oracle divergence
# hides. Writes the per-query report to CORRECTNESS_SF01.txt.
#
# Usage: tools/sweep_sf01.sh [verify-out-dir]
set -e
OUT=${1:-/tmp/verify_sf01}
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT"
# dedup_clusters (+ its _star twin) / dedup_keep_best: their DuckDB twins compute the pair
# graph's transitive closure with a RECURSIVE CTE — fine at sf0.01,
# intractable at sf0.1 (the sweep hung >15 min there).
# dedup_ngram_jaccard joined them when the driver regenerated sf0.1
# with 5,000 documents (r7): its brute-force DuckDB twin burned >50
# CPU-minutes on the ~100× pair count (the Spark side prefix-filters;
# the oracle deliberately doesn't). dedup_containment (r8) is the same
# class: its uncapped quadratic twin runs 25M list_intersect pairs at
# the 5,000-doc corpus. q_takedown_propagate (r8) composes that same
# quadratic pairs CTE with the recursive reachability closure, so it
# joins the list for BOTH reasons. All five stay fully checked at
# sf0.01 by the driver gate; every other oracle runs here.
# no tee: piping would make the pipeline status tee's 0 and swallow the
# checker's failure exit under set -e — write, then show, then exit
# with the checker's own status so CI sees a mismatch as a failure
st=0
python3 tools/check_oracle.py /root/testdata/sf0.1 "$OUT" \
  --skip dedup_clusters,dedup_clusters_star,dedup_keep_best,dedup_ngram_jaccard,dedup_containment,q_takedown_propagate \
  > CORRECTNESS_SF01.txt || st=$?
cat CORRECTNESS_SF01.txt
exit $st
