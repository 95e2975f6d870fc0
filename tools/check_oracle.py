#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name, and compares row-by-row.
Dev tooling only — the engine itself never depends on Python.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return sorted(out, key=repr), [colnames[i] for i in order]

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v

def normtype(t):
    """Collapse Arrow type spellings that hash identically in the driver.

    Empirically (round 1): int width does NOT affect the driver's hash
    (int32 vs int64 queries passed), but HUGEINT → decimal128 DOES fail
    it. So fold all plain ints together and keep decimal distinct.
    """
    s = str(t)
    s = s.replace("large_string", "string").replace("large_list", "list")
    if s in ("int8", "int16", "int32", "int64", "uint8", "uint16",
             "uint32", "uint64"):
        return "int"
    if s in ("float", "float32", "float64", "double", "halffloat"):
        return "float"
    # timestamp unit/tz noise: Spark writes us/UTC, DuckDB us (no tz)
    if s.startswith("timestamp"):
        return "timestamp"
    return s

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # --skip a,b: oracles whose DuckDB twin is intractable at the given
    # scale (recursive transitive-closure CTEs at sf0.1); the skipped
    # names are reported so a sweep can't silently claim full coverage
    skip = set()
    if len(sys.argv) > 4 and sys.argv[3] == "--skip":
        skip = set(sys.argv[4].split(","))
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIPPED  {name} (oracle intractable at this scale)")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            # a partial Verify dump (dev iteration with explicit names)
            # has no directory at all for unselected queries: skip those.
            # Verify pre-creates each SELECTED query's dir before running
            # it, so an EMPTY directory means the query ran and crashed
            # (or wrote nothing) — that must surface as MISSING
            if not os.path.isdir(f"{out_dir}/{name}"):
                continue
            print(f"MISSING  {name}: no spark result"); n_bad += 1; continue
        t = pq.read_table(files[0])
        got_rows = [tuple(r) for r in zip(*[c.to_pylist() for c in t.columns])] if t.num_columns else []
        if t.num_rows and not got_rows:
            got_rows = [()] * t.num_rows
        got, got_cols = canon(got_rows, t.column_names)
        got_types = {n: normtype(t.schema.field(n).type) for n in t.column_names}
        try:
            cur = con.execute(sql)
            exp_t = cur.arrow()
            exp_cols = exp_t.column_names
            exp, exp_cols = canon([tuple(r) for r in zip(*[c.to_pylist() for c in exp_t.columns])] if exp_t.num_columns else [], exp_cols)
            exp_types = {n: normtype(exp_t.schema.field(n).type) for n in exp_t.column_names}
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        if got_cols != exp_cols:
            print(f"COLS     {name}: spark={got_cols} duckdb={exp_cols}"); n_bad += 1; continue
        # The driver hashes Arrow-materialized values, so a HUGEINT →
        # decimal128 oracle column hash-mismatches Spark's int64 even at
        # equal numeric values. Flag any differing Arrow type.
        tdiff = {c: (got_types[c], exp_types[c]) for c in got_cols
                 if got_types[c] != exp_types[c]}
        if tdiff:
            print(f"TYPES    {name}: {tdiff}"); n_bad += 1; continue
        if len(got) != len(exp):
            print(f"ROWS     {name}: spark={len(got)} duckdb={len(exp)}"); n_bad += 1; continue
        bad = [(g, e) for g, e in zip(got, exp) if g != e]
        if bad:
            print(f"VALUES   {name}: {len(bad)}/{len(got)} differ; first: spark={bad[0][0]} duckdb={bad[0][1]}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(got)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
