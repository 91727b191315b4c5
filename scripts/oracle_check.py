#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes the driver-shaped CORRECTNESS json (one entry
per registered query: rows/schema/hash match booleans + row counts) so a
round can certify itself even when the driver's own t2 pass is cut short
(round 12 shipped an empty CORRECTNESS artifact exactly that way).

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

    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    report = {}
    n_pass = n_fail = n_noracle = 0
    present = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    manifest_path = Path(out_dir, "queries.json")
    if manifest_path.exists():
        expected = set(json.loads(manifest_path.read_text()))
        for name in sorted(expected - present):
            print(f"  FAIL  {name}: no output written (query failed in Verify)")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": 0,
                            "oracle_rows": None,
                            "err": "no output written (query failed in Verify)"}
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
            report[name] = {"rows_match": len(got) > 0, "schema_match": None,
                            "hash_match": None, "spark_rows": len(got),
                            "oracle_rows": None, "err": None}
            n_noracle += 1
            continue
        exp_rel = con.execute(oracle[name])
        exp_cols = [d[0] for d in exp_rel.description]
        exp = exp_rel.fetchall()
        if sorted(got_cols) != sorted(exp_cols):
            print(f"  FAIL  {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            report[name] = {"rows_match": None, "schema_match": False,
                            "hash_match": False, "spark_rows": len(got),
                            "oracle_rows": None, "err": "column mismatch"}
            n_fail += 1
            continue
        # reorder both to sorted column order
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = canon([[r[i] for i in gidx] for r in got])
        e = canon([[r[i] for i in eidx] for r in exp])
        ok = g == e
        report[name] = {"rows_match": len(g) == len(e), "schema_match": True,
                        "hash_match": ok, "spark_rows": len(g),
                        "oracle_rows": len(e), "err": None}
        if ok:
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
    if json_out:
        Path(json_out).write_text(json.dumps(
            dict(sorted(report.items())), indent=1) + "\n")
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
