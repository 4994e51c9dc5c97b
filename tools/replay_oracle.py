#!/usr/bin/env python3
"""Dev-side replay of the driver's DuckDB correctness compare.

Usage: replay_oracle.py <sfdir> <voutdir> [query ...]
Runs each oracle SQL from <voutdir>/oracle_sql.json against the parquet
tables in <sfdir>, compares to the Spark dump in <voutdir>/<name>/ by
row count, column names, and a hash over rows with columns sorted by name
(mirrors the driver's CORRECTNESS gate)."""
import duckdb, json, sys, glob, hashlib
import pandas as pd

sf = sys.argv[1]
out = sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ['events','lineitem','orders','customer','supplier','part','nation',
          'region','documents','embeddings']:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    except Exception:
        pass
oracle = json.load(open(f"{out}/oracle_sql.json"))
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        rows.append("\x1f".join("\\N" if pd.isna(v) is True else (f"{v:.6f}" if isinstance(v, float) else str(v)) for v in tup))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()
bad = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        o = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        bad += 1
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark dump")
        bad += 1
        continue
    s = pd.concat([pd.read_parquet(f) for f in files])
    ok_rows = len(o) == len(s)
    ok_cols = sorted(o.columns) == sorted(s.columns)
    ok_hash = ok_rows and ok_cols and canon(o) == canon(s)
    if ok_rows and ok_cols and ok_hash:
        print(f"ok   {name} ({len(s)} rows)")
    else:
        bad += 1
        print(f"FAIL {name}: rows {len(s)} vs oracle {len(o)}, cols_match={ok_cols}, hash={ok_hash}")
        if not ok_cols:
            print(f"  spark-only: {sorted(set(s.columns)-set(o.columns))}")
            print(f"  oracle-only: {sorted(set(o.columns)-set(s.columns))}")
print("BAD =", bad)
sys.exit(1 if bad else 0)
