#!/usr/bin/env python3
"""Local oracle check (mirrors the driver): compare each Verify parquet
dump against the DuckDB result of its declared oracleSql over the same
parquet tables. Usage: oracle_check.py <verify_out_dir> <sf_dir>"""
import sys, os, json, hashlib
import duckdb, pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
con = duckdb.connect()
for t in ["documents", "embeddings", "lineitem", "orders", "events"]:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    return hashlib.md5(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()

fails = []
for name, sql in sorted(oracle.items()):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        fails.append((name, "missing spark output")); continue
    try:
        spark_df = pd.read_parquet(qdir)
        ora_df = con.execute(sql).df()
        s, o = canon(spark_df), canon(ora_df)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        match = rows and schema and h(s) == h(o)
        status = "OK " if match else "FAIL"
        if not match:
            fails.append((name, f"rows {len(s)}/{len(o)} schema {schema}"))
            if rows and schema:
                neq = (s.astype(str) != o.astype(str)).any(axis=1)
                print(f"  diff rows ({neq.sum()}):")
                print(pd.concat([s[neq].head(3), o[neq].head(3)]).to_string())
        print(f"{status} {name}: spark={len(s)} oracle={len(o)}")
    except Exception as e:
        fails.append((name, str(e)[:200]))
        print(f"ERR  {name}: {str(e)[:200]}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
