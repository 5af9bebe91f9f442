#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sf_dir> <verify_out_dir>

Reads each <out>/<name> parquet written by graft.Verify, runs the
matching SQL from <out>/oracle_sql.json in DuckDB (tables = the sf
dir's parquet files), and compares values after sorting columns by
name and rows by all columns.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result");  fail += 1; continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    except Exception as e:
        print(f"FAIL {name}: read error {e}"); fail += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]")
            elif df[c].dtype == object and df[c].map(lambda x: hasattr(x, "year"), na_action="ignore").all():
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); fail += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fail += 1; continue
    # the real driver gate hashes type-sensitively: dtype skew (e.g. a
    # DuckDB HUGEINT window sum vs Spark BIGINT) must fail locally too
    gd, ed = [str(t) for t in g.dtypes], [str(t) for t in e.dtypes]
    if gd != ed:
        bad = [f"{c}: {a} vs {b}" for c, a, b in zip(g.columns, gd, ed) if a != b]
        print(f"FAIL {name}: dtypes {'; '.join(bad)}"); fail += 1; continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
        print(f"OK   {name} ({len(g)} rows)")
    except AssertionError as ex:
        print(f"FAIL {name}: {str(ex)[:400]}"); fail += 1
print("ALL OK" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
