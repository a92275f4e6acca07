#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB with views over
the sfDir parquet tables, canonicalize both sides (columns sorted by
name, rows sorted, floats rounded), and report match/mismatch.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            s = s.round(6)
        elif s.dtype == object:
            s = s.astype(str)
        elif str(s.dtype).startswith("datetime"):
            s = s.astype("datetime64[us]").astype(str)
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    import os
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in qdirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            status = "rows-only" if len(got) > 0 else "rows-only EMPTY!"
            print(f"{name:30s} {status} rows={len(got)}")
            if len(got) == 0:
                n_fail += 1
            else:
                n_pass += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:30s} ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"{name:30s} COLUMN MISMATCH spark={list(g.columns)} "
                  f"duckdb={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"{name:30s} ROWCOUNT MISMATCH spark={len(g)} duckdb={len(w)}")
            n_fail += 1
            continue
        if g.equals(w):
            print(f"{name:30s} OK rows={len(g)}")
            n_pass += 1
        else:
            diff = (g != w) & ~(g.isna() & w.isna())
            bad_cols = [c for c in g.columns if diff[c].any()]
            print(f"{name:30s} VALUE MISMATCH cols={bad_cols}")
            for c in bad_cols[:2]:
                idx = diff[c].idxmax()
                print(f"   {c}: spark={g[c][idx]!r} duckdb={w[c][idx]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
