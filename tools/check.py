#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sf parquet tables,
sorts columns by name + rows by all columns, and compares values exactly.
"""
import json, sys, math
import duckdb
import pandas as pd

out = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fail += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fail += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fail += 1
        continue
    g = got.sort_values(by=list(got.columns), kind="mergesort").reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns), kind="mergesort").reset_index(drop=True)
    bad = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            eq = (gv == ev) | (gv.isna() & ev.isna())
        except Exception:
            eq = gv.astype(str) == ev.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            bad = f"col {c} row {i}: spark={gv[i]!r} oracle={ev[i]!r}"
            break
    if bad:
        print(f"FAIL {name}: {bad}")
        fail += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
# Surface Verify-side failures (analysis errors etc.) from errors.json:
# a query absent from the parquet dump should be diagnosed by its actual
# Spark error, not a DuckDB file-not-found message.
try:
    errs = json.load(open(f"{out}/errors.json"))
except Exception:
    errs = {}
for name, msg in sorted(errs.items()):
    print(f"ERR  {name} (verify-side): {msg}")
print(f"\n{len(oracle) - fail}/{len(oracle)} passed" +
      (f", {len(errs)} verify-side errors" if errs else ""))
sys.exit(1 if fail or errs else 0)
