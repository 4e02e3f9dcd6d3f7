#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet
tables, sort columns by name (and rows), and hash-compare values.
Usage: check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 6)
        if hasattr(v, "tolist"):  # numpy arrays / lists
            return tuple(norm(x) for x in v.tolist())
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v
    rows = sorted((tuple(norm(v) for v in r) for r in df.itertuples(index=False, name=None)), key=repr)
    return rows

fails = 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    spark_df = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')").df()
    if name not in oracle:
        print(f"{name:24s} rows-only: {len(spark_df)} rows " + ("OK" if len(spark_df) > 0 else "EMPTY!"))
        if len(spark_df) == 0: fails += 1
        continue
    try:
        ora_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    a, b = canon(spark_df), canon(ora_df)
    if sorted(spark_df.columns) != sorted(ora_df.columns):
        print(f"{name:24s} SCHEMA MISMATCH spark={sorted(spark_df.columns)} oracle={sorted(ora_df.columns)}")
        fails += 1
    elif a == b:
        print(f"{name:24s} MATCH ({len(a)} rows)")
    else:
        print(f"{name:24s} VALUE MISMATCH spark_rows={len(a)} oracle_rows={len(b)}")
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"   first diff row {i}:\n   spark : {x}\n   oracle: {y}")
                break
        fails += 1
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
