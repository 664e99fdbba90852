#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run each oracle SQL in DuckDB
over the sf tables and compare (sorted canonical form) with the parquet
Verify wrote. Usage: check_oracle.py [sfdir] [outdir] [query...]"""
import duckdb, json, sys
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
only = set(sys.argv[3:])
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df[sorted(df.columns)].copy()
    key = df.astype(str)
    order = key.sort_values(by=list(key.columns), kind='mergesort').index
    return df.loc[order].reset_index(drop=True)

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    try:
        exp = con.sql(sql).arrow().to_pandas()
        got = pq.read_table(f'{outdir}/{name}').to_pandas()
    except Exception as e:
        print(f'{name}: ERROR {e}'); fails.append(name); continue
    exp, got = canon(exp), canon(got)
    if list(exp.columns) != list(got.columns):
        print(f'{name}: COLS exp={list(exp.columns)} got={list(got.columns)}')
        fails.append(name); continue
    if len(exp) != len(got):
        print(f'{name}: NROWS exp={len(exp)} got={len(got)}'); fails.append(name); continue
    bad = []
    for c in exp.columns:
        if not exp[c].equals(got[c]):
            try:
                import pandas as pd
                d = (pd.to_numeric(exp[c], errors='coerce') -
                     pd.to_numeric(got[c], errors='coerce')).abs().max()
            except Exception:
                d = '?'
            ne = (exp[c].astype(str) != got[c].astype(str)).sum()
            bad.append(f'{c}(n={ne},maxdiff={d})')
    if bad:
        print(f'{name}: MISMATCH {" ".join(bad)}'); fails.append(name)
    else:
        print(f'{name}: OK ({len(exp)} rows)')
n = len([k for k in oracle if not only or k in only])
print(f'--- {n-len(fails)}/{n} ok; fails: {fails}')
sys.exit(1 if fails else 0)
