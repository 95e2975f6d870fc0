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
python3 tools/check_oracle.py /root/testdata/sf0.1 "$OUT" | tee CORRECTNESS_SF01.txt
