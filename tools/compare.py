#!/usr/bin/env python3
"""Local driver-mimic: run Verify output vs DuckDB oracle and diff.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Mirrors the driver's t2 check: for each query, load the Spark parquet
result and the DuckDB oracle result, sort columns by name, sort rows,
compare values exactly.
"""
import sys, os, json
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def cmp_frames(a: pd.DataFrame, b: pd.DataFrame):
    """Return (ok, msg). a=spark, b=oracle."""
    if sorted(a.columns) != sorted(b.columns):
        return False, f"schema mismatch: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"row count: spark={len(a)} oracle={len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            eq = (pd.isna(av) & pd.isna(bv)) | (av.astype("float64") == bv.astype("float64"))
        else:
            eq = (pd.isna(av) & pd.isna(bv)) | (av == bv)
        if not np.all(eq):
            i = int(np.argmin(eq))
            return False, f"col {c}: first diff at sorted-row {i}: spark={av[i]!r} oracle={bv[i]!r}"
    return True, "ok"

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = n_skip = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        spark_df = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows={len(spark_df)})")
            n_skip += 1
            continue
        try:
            ora_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        ok, msg = cmp_frames(spark_df, ora_df)
        if ok:
            print(f"PASS  {name} ({len(spark_df)} rows)")
            n_ok += 1
        else:
            print(f"FAIL  {name}: {msg}")
            n_bad += 1
    print(f"\n{n_ok} pass, {n_bad} fail, {n_skip} no-oracle")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
