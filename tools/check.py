#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sf_dir> <verify_out_dir>
Loads each <name> parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, sorts columns by name + rows, and diffs values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name in sorted(oracle):
    path = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output");  fails.append(name); continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails.append(name); continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        fails.append(name); continue
    g, e = canon(got), canon(exp)
    if len(g) != len(e):
        print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}"); fails.append(name); continue

    # typeclass check FIRST: the driver's hasher is type-aware, so a
    # value-equal column with a different type (the classic: DuckDB
    # SUM(BIGINT) -> HUGEINT, arriving as an object column of Python
    # ints, vs Spark's int64) is a driver-gate FAIL that a value-only
    # compare masks. Mirror that here so the local gate predicts the
    # driver gate.
    def typeclass(s: pd.Series, other: pd.Series):
        k = s.dtype.kind
        if k in 'iu':  return 'int'
        if k == 'f':   return 'float'
        if k == 'b':   return 'bool'
        if k in 'mM':  return 'datetime'
        if k == 'O':
            nn = s.dropna()
            if len(nn) == 0:  # all-null: adopt the other side's class
                return typeclass(other, s) if other.dtype.kind != 'O' or len(other.dropna()) else 'null'
            v = nn.iloc[0]
            if isinstance(v, bool):  return 'bool'
            if isinstance(v, int):   return 'hugeint'   # object-of-int = DuckDB HUGEINT
            if isinstance(v, float): return 'float'
            if isinstance(v, str):   return 'str'
            import datetime, decimal
            if isinstance(v, decimal.Decimal): return 'decimal'
            if isinstance(v, (datetime.date, datetime.datetime)): return 'datetime'
            if isinstance(v, (list, tuple)) or type(v).__name__ == 'ndarray': return 'list'
            return type(v).__name__
        return k
    bad = None
    for c in g.columns:
        tg, te = typeclass(g[c], e[c]), typeclass(e[c], g[c])
        if tg != te:
            print(f"FAIL {name}: col {c} typeclass spark={tg} duck={te}"
                  + (" (uncast integer SUM in the oracle? CAST(... AS BIGINT))"
                     if te == 'hugeint' else ""))
            bad = (c, tg, te, -1); break
    if bad:
        fails.append(name); continue
    bad = None
    for c in g.columns:
        gc, ec = g[c], e[c]
        if gc.dtype.kind == 'f' or ec.dtype.kind == 'f':
            import numpy as np
            ga, ea = gc.astype(float).values, ec.astype(float).values
            neq = ~((ga == ea) | (pd.isna(ga) & pd.isna(ea)))
            if neq.any():
                i = int(np.argmax(neq)); bad = (c, ga[i], ea[i], i); break
        else:
            gs, es = gc.astype(str), ec.astype(str)
            neq = gs != es
            if neq.any():
                i = int(neq.values.argmax()); bad = (c, gs.iloc[i], es.iloc[i], i); break
    if bad:
        print(f"FAIL {name}: col {bad[0]} row {bad[3]}: spark={bad[1]!r} duck={bad[2]!r}")
        fails.append(name)
    else:
        print(f"OK   {name} ({len(g)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} OK")
sys.exit(1 if fails else 0)
