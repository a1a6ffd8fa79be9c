#!/usr/bin/env python3
"""Self-check: replay the driver's DuckDB-oracle compare locally.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the oracle SQL
from oracle_sql.json against the testdata tables and compares: column names
(sorted), row counts, and full multiset equality (EXCEPT ALL both ways).
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(oracle):
    res_glob = glob.glob(f"{outdir}/{name}/*.parquet")
    if not res_glob:
        fails.append((name, "no spark output"))
        continue
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        oracle_rel = con.sql(oracle[name])
        scols, ocols = sorted(spark_rel.columns), sorted(oracle_rel.columns)
        if scols != ocols:
            fails.append((name, f"cols: spark={scols} oracle={ocols}"))
            continue
        cols = ", ".join(f'"{c}"' for c in scols)
        con.execute(f"CREATE OR REPLACE VIEW __s AS SELECT {cols} FROM read_parquet('{outdir}/{name}/*.parquet')")
        con.execute(f"CREATE OR REPLACE VIEW __o AS SELECT {cols} FROM ({oracle[name]})")
        sn = con.sql("SELECT count(*) FROM __s").fetchone()[0]
        on = con.sql("SELECT count(*) FROM __o").fetchone()[0]
        d1 = con.sql("SELECT count(*) FROM (SELECT * FROM __s EXCEPT ALL SELECT * FROM __o)").fetchone()[0]
        d2 = con.sql("SELECT count(*) FROM (SELECT * FROM __o EXCEPT ALL SELECT * FROM __s)").fetchone()[0]
        # schema types
        st = [str(t) for t in con.sql("SELECT * FROM __s LIMIT 0").types]
        ot = [str(t) for t in con.sql("SELECT * FROM __o LIMIT 0").types]
        if sn != on or d1 or d2:
            ex = con.sql("SELECT * FROM __s EXCEPT ALL SELECT * FROM __o LIMIT 3").fetchall() if d1 else \
                 con.sql("SELECT * FROM __o EXCEPT ALL SELECT * FROM __s LIMIT 3").fetchall()
            fails.append((name, f"rows spark={sn} oracle={on} diff={d1}/{d2} sample={ex}"))
        elif st != ot:
            fails.append((name, f"TYPE drift: spark={st} oracle={ot} (rows match)"))
        else:
            passes.append((name, sn))
    except Exception as e:
        fails.append((name, f"error: {e}"))

for n, c in passes:
    print(f"PASS  {n}  ({c} rows)")
for n, why in fails:
    print(f"FAIL  {n}: {why}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
