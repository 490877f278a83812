#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: load each Verify output
parquet, run the corresponding oracle SQL in DuckDB over the same testdata
parquet tables, and compare (column-name-sorted, row-sorted, hashed).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    pq = f"{outdir}/{name}"
    if not os.path.isdir(pq):
        print(f"MISSING OUTPUT {name}"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ERROR {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA MISMATCH {name}: got {list(got.columns)} exp {list(exp.columns)}")
        fail += 1; continue
    if len(got) != len(exp):
        print(f"ROWCOUNT MISMATCH {name}: got {len(got)} exp {len(exp)}")
        fail += 1; continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
        print(f"OK {name} ({len(got)} rows)"); ok += 1
    except AssertionError as e:
        print(f"VALUE MISMATCH {name}: {str(e).splitlines()[-1] if str(e) else e}")
        fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
