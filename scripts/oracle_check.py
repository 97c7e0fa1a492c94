#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB executing oracle_sql.json on the same parquet tables.
Compares schema (sorted column names), row count, and exact values.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        ora = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    got = con.sql(f"SELECT * FROM '{files[0]}'").df()
    ora = ora.reindex(sorted(ora.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(ora.columns) != list(got.columns):
        print(f"FAIL {name}: cols oracle={list(ora.columns)} got={list(got.columns)}"); fail += 1; continue
    if len(ora) != len(got):
        print(f"FAIL {name}: rows oracle={len(ora)} got={len(got)}"); fail += 1; continue
    bad = None
    for c in ora.columns:
        a, b = ora[c].tolist(), got[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None: continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y): continue
                if x != y:  # exact: the driver hashes values
                    bad = (c, i, x, y); break
            elif str(x) != str(y):
                bad = (c, i, x, y); break
        if bad: break
    if bad:
        c, i, x, y = bad
        print(f"FAIL {name}: col {c} row {i}: oracle={x!r} got={y!r}"); fail += 1
    else:
        print(f"PASS {name} ({len(ora)} rows x {len(ora.columns)} cols)")
print(f"\n{len(oracle)-fail}/{len(oracle)} passed")
sys.exit(1 if fail else 0)
