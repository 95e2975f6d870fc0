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
    return {k: min(v) if isinstance(v, list) else float(v)
            for k, v in qs.items()}

def main(p0001, p001, p01, md="SCALING.md"):
    m = [minima(p0001), minima(p001), minima(p01)]
    names = sorted(m[2])
    for col in m:
        missing = set(names) - set(col)
        assert not missing, f"missing queries in a capture: {missing}"
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
