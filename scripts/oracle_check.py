#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query result parquet written by `graft.Verify`, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, then
compares: columns sorted by name, rows sorted by all columns, exact values.
This is development tooling only — not part of the shipped library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append("NaN")
                else:
                    canon_row.append(repr(v))  # exact double repr
            else:
                canon_row.append(repr(v))
        out.append(tuple(canon_row))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())

    n_pass = n_fail = n_noracle = 0
    present = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    manifest_path = Path(out_dir, "queries.json")
    if manifest_path.exists():
        expected = set(json.loads(manifest_path.read_text()))
        for name in sorted(expected - present):
            print(f"  FAIL  {name}: no output written (query failed in Verify)")
            n_fail += 1
        # Compare only manifest queries: stale dumps from a previous run
        # with a different filter must not masquerade as current results.
        for name in sorted(present - expected):
            print(f"  WARN  {name}: stale/unexpected dump (not in queries.json) — skipped")
        present &= expected
    for name in sorted(present):
        qdir = Path(out_dir, name)
        got_rel = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        if name not in oracle:
            print(f"  (no oracle)  {name:24s} rows={len(got)}")
            n_noracle += 1
            continue
        exp_rel = con.execute(oracle[name])
        exp_cols = [d[0] for d in exp_rel.description]
        exp = exp_rel.fetchall()
        if sorted(got_cols) != sorted(exp_cols):
            print(f"  FAIL  {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # reorder both to sorted column order
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = canon([[r[i] for i in gidx] for r in got])
        e = canon([[r[i] for i in eidx] for r in exp])
        if g == e:
            print(f"  ok    {name:24s} rows={len(g)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  FAIL  {name}: {len(g)} vs {len(e)} rows")
            only_g = [r for r in g if r not in set(e)][:3]
            only_e = [r for r in e if r not in set(g)][:3]
            print(f"        spark-only: {only_g}")
            print(f"        duck-only:  {only_e}")
    print(f"== {n_pass} pass, {n_fail} FAIL, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
