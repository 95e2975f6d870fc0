#!/usr/bin/env python3
"""Regenerate SCALING.md's full per-query minima table (the one headed
`| query | sf0.001 | sf0.01 | sf0.1 | ratio |` — there is an EARLIER,
different table in the file; match the full header) from three stashed
BENCH_RAW.json captures. Minima across passes per query; ratio =
sf0.1 / sf0.001. The table is the last section of the file, so rows
are replaced from below the header to the end.

Usage: regen_scaling.py RAW_sf0001.json RAW_sf001.json RAW_sf01.json
"""
import json, sys

def minima(path):
    raw = json.load(open(path))
    qs = raw["queries"] if "queries" in raw else raw
    # Bench writes "q": [] for a query with no successful pass — that
    # is a failure to surface, never a row to fabricate or a crash
    failed = sorted(k for k, v in qs.items() if isinstance(v, list) and not v)
    assert not failed, (
        f"{path}: no successful pass for {failed} — fix the queries or "
        "recapture; a SCALING row cannot be fabricated")
    return {k: min(v) if isinstance(v, list) else float(v)
            for k, v in qs.items()}

def main(p0001, p001, p01, md="SCALING.md"):
    m = [minima(p0001), minima(p001), minima(p01)]
    names = sorted(m[2])
    # symmetric coverage: a query in ANY capture must be in ALL three —
    # asymmetry means the captures span different code revisions
    for col in m:
        diff = set(names) ^ set(col)
        assert not diff, f"capture coverage mismatch on: {sorted(diff)}"
    rows = []
    for n in names:
        a, b, c = (col[n] for col in m)
        ratio = c / a if a > 0 else float("nan")
        rows.append(f"| {n} | {a:.2f} | {b:.2f} | {c:.2f} | {ratio:6.1f} |")
    src = open(md).read()
    header = "| query | sf0.001 | sf0.01 | sf0.1 | ratio |"
    i = src.index(header)
    j = src.index("\n", i) + 1          # end of header line
    j = src.index("\n", j) + 1          # end of the |---| separator line
    open(md, "w").write(src[:j] + "\n".join(rows) + "\n")
    print(f"wrote {len(rows)} rows; totals: "
          + " ".join(f"{sum(col.values()):.1f}s" for col in m))

if __name__ == "__main__":
    main(*sys.argv[1:])
