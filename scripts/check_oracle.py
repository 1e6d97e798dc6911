#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata tables, load the Spark parquet dump from Verify,
sort columns by name + rows by all values, and compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # pandas can't sort/compare ndarray cells — render array columns to a
    # canonical string (both sides arrive via duckdb, so rendering matches)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (np.ndarray, list))).any():
            df[c] = df[c].map(
                lambda v: str(list(v)) if isinstance(v, (np.ndarray, list))
                else str(v))
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = normalize(con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").df())
            want = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"cols spark={list(got.columns)} oracle={list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows spark={len(got)} oracle={len(want)}")
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                if str(a.dtype) != str(b.dtype):
                    problems.append(f"dtype[{c}] spark={a.dtype} oracle={b.dtype}")
                eq = (a.isna() & b.isna()) | (a == b)
                bad = (~eq.fillna(False)).to_numpy().nonzero()[0]
                if len(bad):
                    i = bad[0]
                    problems.append(
                        f"val[{c}] {len(bad)} diffs, first row {i}: "
                        f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3])); n_fail += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_pass += 1
    extra = [q for q in os.listdir(out_dir)
             if os.path.isdir(f"{out_dir}/{q}") and q not in oracle]
    for q in sorted(extra):
        files = glob.glob(f"{out_dir}/{q}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"rows-only {q}: {n} rows" + ("" if n > 0 else "  <-- EMPTY"))
    print(f"\n{n_pass} pass, {n_fail} fail, {len(extra)} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
