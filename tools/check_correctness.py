#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped parquet result against its DuckDB oracle on the same
fixture tables (columns sorted by name, values hashed row-wise).

Usage: check_correctness.py <verifyOutDir> <sfDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stable canonical order mirroring the driver: sort by all columns
    try:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    except TypeError:
        pass
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"MISSING {name}: no spark result")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
            ora_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ERROR   {name}: {e}")
            n_fail += 1
            continue
        if len(spark_df) != len(ora_df):
            print(f"ROWS    {name}: spark={len(spark_df)} oracle={len(ora_df)}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(ora_df.columns):
            print(f"SCHEMA  {name}: {list(spark_df.columns)} vs {list(ora_df.columns)}")
            n_fail += 1
            continue
        # value compare: exact on object/int, exact-ish on float via repr
        mismatch = None
        for c in spark_df.columns:
            a, b = spark_df[c], ora_df[c]
            try:
                eq = (a.astype(str).values == b.astype(str).values).all()
            except Exception:
                eq = False
            if not eq:
                mismatch = c
                break
        if mismatch:
            print(f"VALUES  {name}: column {mismatch} differs")
            bad = spark_df[mismatch].astype(str) != ora_df[mismatch].astype(str)
            print("  spark:", spark_df[bad].head(3).to_dict("records"))
            print("  oracle:", ora_df[bad].head(3).to_dict("records"))
            n_fail += 1
        else:
            n_pass += 1
    print(f"\npass={n_pass} fail={n_fail}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
