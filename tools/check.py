#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Mimics the driver: for each query result parquet under outDir (written by
`sbt "runMain graft.Verify <sfDir> <outDir>"`), run the matching oracle SQL
from oracle_sql.json in DuckDB (tables = views over the sfDir parquet),
sort columns by name, sort rows, and compare cell-by-cell.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def cells_equal(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b  # driver hash-compares: require bit-exact
    return str(a) == str(b)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out}/*")):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        try:
            got = pd.concat([pd.read_parquet(f)
                             for f in glob.glob(f"{qdir}/*.parquet")],
                            ignore_index=True)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"no-oracle rows={len(got)}"
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e).splitlines()[0][:120]}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT spark={len(g)} duck={len(e)}"
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not cells_equal(x, y):
                    bad = f"VALUE col={c} row={i} spark={x!r} duck={y!r}"
                    break
            if bad:
                break
        results[name] = bad or f"OK rows={len(g)}"
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "no-oracle")))
    for k in sorted(results):
        flag = "  " if results[k].startswith(("OK", "no-oracle")) else "!!"
        print(f"{flag} {k:28s} {results[k]}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
