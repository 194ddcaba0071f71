#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views named after the
tables in <sfDir>, sorts columns by name, sorts rows, and compares values.
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: dates/timestamps -> iso strings, decimals -> float
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(v) if not isinstance(v, (list,)) else json.dumps(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS mismatch: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            ok = (x == y)
            if not ok and isinstance(x, float) and isinstance(y, float):
                ok = (math.isnan(x) and math.isnan(y)) or x == y
            if not ok:
                return f"VALUE mismatch col={c} row={i}: spark={x!r} oracle={y!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(p)])
    # Optional 3rd arg: comma-separated subset — lets a wrapper run the
    # long sf0.1 soak one query at a time and resume after interruption
    # (the all-pairs dedup oracles dominate; a killed run otherwise loses
    # every completed compare).
    if len(sys.argv) > 3:
        want = set(sys.argv[3].split(","))
        names = [n for n in names if n in want]
    n_ok = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: rows={len(spark_df)}")
            n_ok += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            continue
        err = cmp(norm(spark_df), norm(duck_df))
        if err:
            print(f"  [FAIL] {name}: {err}")
        else:
            n_ok += 1
            print(f"  [ok] {name} ({len(spark_df)} rows)")
    print(f"{n_ok}/{len(names)} pass")

if __name__ == "__main__":
    main()
