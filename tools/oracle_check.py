#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py [sfdir] [outdir]
Runs after `sbt "runMain graft.Verify <sfdir> <outdir>"`:
compares each <outdir>/<name>/*.parquet against the DuckDB result of
<outdir>/oracle_sql.json's SQL over the same sf tables.
"""
import duckdb, json, sys
import numpy as np


def canon(df):
    """list/ndarray cells -> tuples so multi-column sorts (which hash
    object columns) and equals() work on array-valued results."""
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for name in TABLES:
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sfdir}/{name}.parquet')")

sqls = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for k, sql in sorted(sqls.items()):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{k}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
        got = canon(got[sorted(got.columns)])
        exp = canon(exp[sorted(exp.columns)])
        # row-order-insensitive compare (driver sorts before hashing)
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        ok = gs.equals(es)
    except Exception as e:
        print(f"{k}: ERROR {e}")
        fails += 1
        continue
    print(f"{k}: {'MATCH' if ok else 'MISMATCH'} rows={len(got)}/{len(exp)}")
    if not ok:
        fails += 1
        print("  spark:", gs.head(3).to_dict("records"))
        print("  duckdb:", es.head(3).to_dict("records"))
        print("  spark dtypes:", dict(gs.dtypes.astype(str)))
        print("  duckdb dtypes:", dict(es.dtypes.astype(str)))
sys.exit(1 if fails else 0)
