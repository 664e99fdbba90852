#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run each oracle SQL in DuckDB
over the sf tables and compare with the parquet Verify wrote.

Mirrors the driver's pandas canonicalization (round-1 lesson): rows are
sorted with DataFrame.sort_values on the RAW cells (so unhashable
array/struct cells crash here exactly like they crash the driver), and
values are compared via their string form (so a Spark Decimal('1.4500000000')
vs a DuckDB 1.45 float mismatches here exactly like the driver's hash
does). Local OK is only meaningful if it predicts driver OK.

Usage: check_oracle.py [sfdir] [outdir] [query...]"""
import duckdb, json, re, sys
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
only = set(sys.argv[3:])
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

# Round-5 lesson (q_cume_distinct): DuckDB types a windowed sum(BIGINT) as
# HUGEINT while Spark emits int64; the driver's typed hash fails but the
# string-compare below normalizes it away. Two defenses:
#  1. lint: an oracle's windowed sum() must be wrapped in CAST(...) — the
#     repo's parity convention (cf. Coverage4.scala:29);
#  2. kind check: each column's python value *kind* (int/float/decimal/...)
#     must agree between engines, not just its str() form.
WIN_SUM = re.compile(r'\bsum\s*\([^()]*(?:\([^()]*\))*[^()]*\)\s+over\b', re.I)
def last_toplevel_select(sql):
    depth, pos = 0, 0
    for m in re.finditer(r'[()]|\bselect\b', sql, re.I):
        tok = m.group(0)
        if tok == '(': depth += 1
        elif tok == ')': depth -= 1
        elif depth == 0: pos = m.start()
    return pos
def lint_oracle(name, sql):
    errs, final_sel = [], last_toplevel_select(sql)
    for m in WIN_SUM.finditer(sql):
        # CTE-internal running sums never reach the driver's typed hash;
        # only the final SELECT's output columns do.
        if m.start() < final_sel: continue
        # r6 advice: a sum nested in parens after the final SELECT (a
        # derived table in FROM, or an expression the projection already
        # wraps) is not a bare output column — only depth-0 matches
        # relative to the final SELECT are lintable; the kind check
        # below still backstops any genuine type divergence.
        # Any wrapper (CAST most importantly) opens a paren, so a
        # depth-0 match here is by construction a BARE windowed sum in
        # the output list — flag it.
        depth = sql.count('(', final_sel, m.start()) - sql.count(')', final_sel, m.start())
        if depth > 0: continue
        errs.append(f'unwrapped windowed sum at char {m.start()} '
                    '(DuckDB types it HUGEINT; wrap in CAST(... AS BIGINT/DOUBLE))')
    return errs

def kind(series):
    s = series.dropna()
    if len(s) == 0: return None
    v = s.iloc[0]
    t = type(v).__name__
    if t in ('int', 'int8', 'int16', 'int32', 'int64'): return 'int'
    if t in ('float', 'float32', 'float64'): return 'float'
    if t == 'Decimal': return 'decimal'
    if t in ('str', 'str_'): return 'str'
    if t in ('bool', 'bool_'): return 'bool'
    if t == 'date': return 'date'
    if t in ('Timestamp', 'datetime', 'datetime64'): return 'ts'
    return t

def canon(df):
    # Driver-faithful: sort columns by name, then sort_values on the raw
    # frame (throws TypeError on unhashable ndarray/dict cells — a bug in
    # OUR output shape, not in this checker).
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind='mergesort')
    return df.reset_index(drop=True)

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    lint = lint_oracle(name, sql)
    if lint:
        print(f'{name}: LINT {"; ".join(lint)}'); fails.append(name); continue
    try:
        exp = canon(con.sql(sql).arrow().to_pandas())
        got = canon(pq.read_table(f'{outdir}/{name}').to_pandas())
    except Exception as e:
        print(f'{name}: ERROR {type(e).__name__} {e}'); fails.append(name); continue
    if list(exp.columns) != list(got.columns):
        print(f'{name}: COLS exp={list(exp.columns)} got={list(got.columns)}')
        fails.append(name); continue
    if len(exp) != len(got):
        print(f'{name}: NROWS exp={len(exp)} got={len(got)}'); fails.append(name); continue
    bad = []
    for c in exp.columns:
        ke, kg = kind(exp[c]), kind(got[c])
        if ke is not None and kg is not None and ke != kg:
            bad.append(f'{c}(TYPEKIND exp={ke} got={kg})'); continue
        # string-compare = a proxy for the driver's value hash
        if not exp[c].astype(str).equals(got[c].astype(str)):
            try:
                import pandas as pd
                d = (pd.to_numeric(exp[c], errors='coerce') -
                     pd.to_numeric(got[c], errors='coerce')).abs().max()
            except Exception:
                d = '?'
            ne = (exp[c].astype(str) != got[c].astype(str)).sum()
            ex = exp[c].astype(str)[(exp[c].astype(str) != got[c].astype(str))].head(1).to_list()
            gx = got[c].astype(str)[(exp[c].astype(str) != got[c].astype(str))].head(1).to_list()
            bad.append(f'{c}(n={ne},maxdiff={d},exp={ex},got={gx})')
    if bad:
        print(f'{name}: MISMATCH {" ".join(bad)}'); fails.append(name)
    else:
        print(f'{name}: OK ({len(exp)} rows)')
# Rows-only queries: the driver still loads + sort_values the parquet
# (round 1: q_agg_approx_percentile errored on array cells despite
# having no oracle) — so canon must not throw for ANY query output.
import os
rows_only_fails = []
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if name in oracle or not os.path.isdir(p): continue
    if only and name not in only: continue
    try:
        df = canon(pq.read_table(p).to_pandas())
        print(f'{name}: ROWS-ONLY OK ({len(df)} rows)')
    except Exception as e:
        print(f'{name}: ROWS-ONLY ERROR {type(e).__name__} {e}')
        rows_only_fails.append(name)

# rows-only failures are tracked separately so the oracle summary's
# denominator counts only oracle-backed queries (and can't go negative)
n = len([k for k in oracle if not only or k in only])
print(f'--- {n-len(fails)}/{n} oracle ok; fails: {fails}; '
      f'rows-only fails: {rows_only_fails}')
sys.exit(1 if fails or rows_only_fails else 0)
