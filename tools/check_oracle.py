#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's
parquet dump against its DuckDB oracle SQL (sorted columns, sorted rows,
value hash). Usage: check_oracle.py <sfDir> <outDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        print(f"[rows-only] {name}: rows={len(got)}")
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as ex:  # e.g. k_config_history's sf0.01-scoped side dump
        print(f"[ERR-oracle] {name}: {str(ex).splitlines()[0][:120]}")
        continue
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"[FAIL-schema] {name}: spark={list(g.columns)} duck={list(e.columns)}")
        fails += 1
    elif len(g) != len(e):
        print(f"[FAIL-rows] {name}: spark={len(g)} duck={len(e)}")
        fails += 1
    elif not g.equals(e):
        diff = (g != e).any(axis=1)
        print(f"[FAIL-values] {name}: {diff.sum()} differing rows of {len(g)}")
        merged = pd.concat([g[diff].head(3).add_prefix("spark_"),
                            e[diff].head(3).add_prefix("duck_")], axis=1)
        print(merged.to_string())
        fails += 1
    else:
        print(f"[OK] {name}: {len(g)} rows")
sys.exit(1 if fails else 0)
