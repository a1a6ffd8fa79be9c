#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

For each query dir under verify_out: load the Spark parquet result, run the
oracle SQL (oracle_sql.json) in DuckDB over views named after the sf_dir
tables, sort columns by name, sort rows, hash values, compare.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize: floats rounded, everything to str
    for c in df.columns:
        if df[c].dtype.kind == 'f':
            df[c] = df[c].round(9)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = os.path.join(out_dir, name)
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result");  n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}"); n_fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: cols {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
        sa, da = s.astype(str), d.astype(str)
        if not sa.equals(da):
            neq = (sa != da).any(axis=1)
            print(f"FAIL {name}: {neq.sum()} differing rows; first:")
            print(pd.concat([s[neq].head(3), d[neq].head(3)], keys=["spark", "duck"]))
            n_fail += 1; continue
        print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    missing = set(os.listdir(out_dir)) - set(oracle) - {"oracle_sql.json"}
    for name in sorted(missing):
        print(f"NOORACLE {name} (rows-only check)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
