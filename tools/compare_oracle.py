#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against DuckDB running oracle_sql.json on the same
tables.  Mimics the driver: columns sorted by name, rows sorted, values
hashed/compared.  Usage: compare_oracle.py <sfDir> <outDir> [query...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: spark output missing")
        fails += 1
        continue
    try:
        got = canon(pd.read_parquet(spark_path))
        want = canon(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        fails += 1
        continue
    # exact compare (driver hashes values; NaN-safe equality here)
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)
        print(f"OK   {name}: {len(got)} rows")
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
        # show first differing rows
        for c in got.columns:
            neq = ~(got[c].eq(want[c]) | (got[c].isna() & want[c].isna()))
            if neq.any():
                i = neq.idxmax()
                print(f"  col {c} row {i}: spark={got[c][i]!r} duckdb={want[c][i]!r}")
                break
        fails += 1

sys.exit(1 if fails else 0)
