#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare: for each
query parquet in OUTDIR, run the oracle SQL from oracle_sql.json over
the SFDIR tables and compare rows/schema/hash after sorting columns by
name (mirrors CORRECTNESS_r01 semantics)."""
import json, sys, glob, os
import duckdb, pandas as pd
from pandas.util import hash_pandas_object

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for qdir in sorted(glob.glob(f"{outdir}/q*")):
    name = os.path.basename(qdir)
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              glob.glob(f"{qdir}/*.parquet")])
    except Exception as e:
        results[name] = f"ERR spark read: {e}"
        continue
    if name not in oracle:
        results[name] = f"no_oracle rows={len(spark_df)}"
        continue
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ERR oracle: {str(e)[:200]}"
        continue
    def norm(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    try:
        s, o = norm(spark_df), norm(odf)
        rows = len(s) == len(o)
        schema = list(s.dtypes.astype(str)) == list(o.dtypes.astype(str))
        h = False
        if rows:
            h = (hash_pandas_object(s.astype(str), index=False).sum() ==
                 hash_pandas_object(o.astype(str), index=False).sum())
        results[name] = (f"rows={rows}({len(s)}/{len(o)}) schema={schema}"
                         f"{list(zip(s.dtypes.astype(str), o.dtypes.astype(str))) if not schema else ''}"
                         f" hash={h}")
        if rows and not h:
            merged = s.astype(str).merge(o.astype(str), how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            results[name] += f" DIFF:{diff.head(4).to_dict('records')}"
    except Exception as e:
        results[name] = f"ERR compare: {str(e)[:200]}"

ok = sum(1 for v in results.values() if "hash=True" in v)
for k, v in results.items():
    print(("OK  " if "hash=True" in v else "FAIL"), k, v[:400])
print(f"\n{ok}/{len(results)} hash-match")
