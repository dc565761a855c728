#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 scripts/compare.py [sfDir] [verifyOutDir]

Reads each SparkEntry query's parquet dump from verifyOutDir/<name>/,
runs the matching oracle SQL (verifyOutDir/oracle_sql.json) in DuckDB
against the same parquet tables, normalizes both sides (columns sorted
by name, rows sorted by all columns), and reports exact-match status.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable total order incl. NaN/None
    key = df.astype(str)
    order = key.sort_values(by=list(key.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            a = norm(pd.concat([pd.read_parquet(p) for p in files]))
            b = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        # The driver hashes byte-level values, so dtype drift (e.g. DuckDB's
        # HUGEINT windowed sum surfacing as float64 against Spark's int64)
        # fails there even when every value compares equal. Assert dtypes
        # match BEFORE the float-cast value compare below, which would mask
        # exactly that class.
        dbad = [f"{c}: spark={a[c].dtype} duck={b[c].dtype}"
                for c in a.columns if a[c].dtype != b[c].dtype]
        if dbad:
            n_fail += 1
            print(f"FAIL {name}: dtype mismatch [{'; '.join(dbad)}]")
            continue
        bad = []
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                ok = ((av.isna() & bv.isna()) | (av.astype(float).values == bv.astype(float).values)).all()
            elif pd.api.types.is_datetime64_any_dtype(av) or pd.api.types.is_datetime64_any_dtype(bv):
                ok = (pd.to_datetime(av).values == pd.to_datetime(bv).values).all()
            else:
                ok = (av.astype(str).values == bv.astype(str).values).all()
            if not ok:
                bad.append(c)
        if bad:
            n_fail += 1
            print(f"FAIL {name}: value mismatch in {bad} ({len(a)} rows)")
            for c in bad[:2]:
                m = a[c].astype(str).values != b[c].astype(str).values
                i = int(np.argmax(m))
                print(f"   first diff col={c} row={i}: spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(a)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
