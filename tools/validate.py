#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: python3 tools/validate.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the same
tables, and reports row-count / schema / value equality. This is builder-side
tooling only — not part of the shipped library.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(out_dir, name):
    files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
    if not files:
        return None
    con = duckdb.connect()
    df = con.execute(
        "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
    ).fetchdf()
    con.close()
    return df

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates come back as datetime.date from both engines; stringify
            df[c] = df[c].map(lambda x: str(x) if x is not None else None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)

def compare(name, spark_df, oracle_df):
    problems = []
    if spark_df.shape[0] != oracle_df.shape[0]:
        problems.append(f"rows {spark_df.shape[0]} vs {oracle_df.shape[0]}")
    s, o = norm(spark_df), norm(oracle_df)
    if list(s.columns) != list(o.columns):
        problems.append(f"cols {list(s.columns)} vs {list(o.columns)}")
        return problems
    if problems:
        return problems
    for c in s.columns:
        a, b = s[c], o[c]
        if pd.api.types.is_float_dtype(a):
            # BIT-exact compare (mirrors the driver's hash): -0.0 != +0.0.
            abits = a.to_numpy(dtype="float64").view("uint64")
            bbits = b.to_numpy(dtype="float64").view("uint64")
            eq = pd.Series((a.isna() & b.isna()).to_numpy() | (abits == bbits),
                           index=a.index)
            bad = ~eq
            if bad.any():
                diff = (a[bad] - b[bad]).abs()
                problems.append(
                    f"col {c}: {int(bad.sum())} bit-mismatches, max abs diff "
                    f"{diff.max() if len(diff) else 'nan-mismatch'} "
                    f"(first at row {bad.idxmax()}: {a[bad.idxmax()]} vs {b[bad.idxmax()]})")
        else:
            eq = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
            bad = ~eq
            if bad.any():
                i = bad.idxmax()
                problems.append(f"col {c}: {int(bad.sum())} mismatches (first at row {i}: {a[i]!r} vs {b[i]!r})")
    return problems

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_df = load_spark(out_dir, name)
        if spark_df is None:
            print(f"SKIP  {name}: no spark output")
            n_skip += 1
            continue
        try:
            oracle_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, oracle_df)
        # raw-dtype parity warning: the driver's compare may be stricter
        # than our normalized compare, so surface pre-normalization deltas
        s_dt = {c: str(spark_df[c].dtype) for c in spark_df.columns}
        o_dt = {c: str(oracle_df[c].dtype) for c in oracle_df.columns}
        dtype_delta = {c: (s_dt.get(c), o_dt.get(c))
                       for c in set(s_dt) | set(o_dt) if s_dt.get(c) != o_dt.get(c)}
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            suffix = f"  [dtype delta: {dtype_delta}]" if dtype_delta else ""
            print(f"PASS  {name} ({spark_df.shape[0]} rows){suffix}")
            n_pass += 1
    # queries with no oracle: report presence only
    for name in sorted(set(os.listdir(out_dir)) - set(oracle) - {"oracle_sql.json"}):
        df = load_spark(out_dir, name)
        print(f"INFO  {name}: no oracle, {0 if df is None else df.shape[0]} rows")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_skip} skip")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
