#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify output
against DuckDB oracles over the same testdata and diff.

Usage: python3 tools/check_oracle.py [verify_out_dir] [sf_dir]
(defaults: /tmp/verify_out /root/testdata/sf0.01)
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        # unify ints
        if str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = f"SPARK-MISSING ({e})"
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR ({e})"
            continue
        a, b = normalize(mine), normalize(want)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWS {len(a)} vs {len(b)}"
            continue
        diffs = []
        for c in a.columns:
            if str(a[c].dtype) == "float64" and str(b[c].dtype) == "float64":
                import numpy as np
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
                if not eq.all():
                    diffs.append(f"{c}: maxdiff={abs(av - bv).max():.3e} n={int((~eq).sum())}")
            else:
                if not a[c].astype(str).equals(b[c].astype(str)):
                    n = int((a[c].astype(str) != b[c].astype(str)).sum())
                    i = (a[c].astype(str) != b[c].astype(str)).idxmax()
                    diffs.append(f"{c}: {n} cells differ e.g. [{a[c][i]!r} vs {b[c][i]!r}]")
        results[name] = "OK rows=%d" % len(a) if not diffs else "VALUES " + "; ".join(diffs)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, res in sorted(results.items()):
        print(("PASS " if res.startswith("OK") else "FAIL ") + f"{name}: {res}")
    # queries without oracle: report row counts
    import os
    for name in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{name}") and name not in oracle:
            try:
                n = len(pd.read_parquet(f"{out_dir}/{name}"))
                print(f"ROWS-ONLY {name}: {n} rows")
            except Exception as e:
                print(f"ROWS-ONLY {name}: READ-ERROR {e}")
    print(f"== {n_ok}/{len(oracle)} oracle-checked queries pass ==")


if __name__ == "__main__":
    main()
