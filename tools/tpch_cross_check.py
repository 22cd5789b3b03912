#!/usr/bin/env python3
"""TPC-H-breadth cross-dialect execution gate: for each tpch_qN golden, DuckDB
executes the duckdb-dialect text (which the driver's correctness gate already
hash-matches against Spark executing the source) as the reference frame, then
executes the postgres / trino / redshift renderings of the SAME optimized plan
and requires identical typed results. Transitively this proves those dialects'
TPC-H texts compute what Spark computes, without growing the driver suite.

Texts a dialect spells correctly for ITS engine but outside DuckDB's parser
(Trino's 3-arg date_add, bitwise_* functions, LISTAGG WITHIN GROUP) are
recorded EXPLICITLY under not_duckdb_expressible, never silently passed.

Run after `sbt "runMain graft.tools.GoldenGen"`:
    python3 tools/tpch_cross_check.py [sfdir]   -> TPCH_CROSS.json
"""
import datetime, glob, json, math, os, sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
GOLD = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/goldens"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            nonnull = df[c].dropna()
            if len(nonnull) and all(
                    isinstance(v, datetime.date) and not isinstance(v, datetime.datetime)
                    for v in nonnull.head(20)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
                continue
            df[c] = df[c].map(lambda v: str(v) if v is not None and not (
                isinstance(v, float) and math.isnan(v)) else None)
    return df.sort_values(by=list(df.columns), kind="mergesort",
                          na_position="last").reset_index(drop=True)


KIND_GROUP = {"i": "int", "u": "int", "f": "float", "b": "bool",
              "M": "datetime", "m": "timedelta"}

NOT_DUCKDB = ("WITHIN GROUP", "bitwise_", "date_add('day'",
              "date_add('month'", "date_add('year'")


def compare(a, b):
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} vs {len(b)}"
    for c in (a.columns if len(a) else []):
        ka = KIND_GROUP.get(a[c].dtype.kind, "object")
        kb = KIND_GROUP.get(b[c].dtype.kind, "object")
        if ka != kb:
            return f"col {c}: dtype group {a[c].dtype} vs {b[c].dtype}"
    for c in a.columns:
        x, y = a[c], b[c]
        if str(x.dtype).startswith("float"):
            xf, yf = x.astype(float), y.astype(float)
            bad = ~((xf.isna() & yf.isna()) |
                    ((xf - yf).abs() <= 1e-9 * (xf.abs() + yf.abs() + 1.0)))
            if bad.any():
                i = bad[bad].index[0]
                return f"col {c} row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}"
        elif not x.astype(str).fillna("\0").equals(y.astype(str).fillna("\0")):
            mism = x.astype(str) != y.astype(str)
            i = mism[mism].index[0]
            return f"col {c} row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}"
    return None


names = sorted(os.path.basename(f)[:-4]
               for f in glob.glob(f"{GOLD}/duckdb/tpch_q*.sql"))
DIALECTS = ("postgres", "trino", "redshift")
results = {d: {"pass": 0, "fail": 0, "not_duckdb_expressible": 0}
           for d in DIALECTS}
failures = []
for name in names:
    ref = norm(con.sql(open(f"{GOLD}/duckdb/{name}.sql").read()).df())
    for d in DIALECTS:
        path = f"{GOLD}/{d}/{name}.sql"
        if not os.path.exists(path):
            failures.append(f"{name} [{d}]: golden missing")
            results[d]["fail"] += 1
            continue
        sql = open(path).read()
        if any(tok in sql for tok in NOT_DUCKDB):
            results[d]["not_duckdb_expressible"] += 1
            continue
        try:
            bad = compare(ref, norm(con.sql(sql).df()))
        except Exception as e:
            bad = f"execution error: {str(e)[:160]}"
        if bad:
            results[d]["fail"] += 1
            failures.append(f"{name} [{d}]: {bad}")
            print(f"FAIL {name} [{d}]: {bad}")
        else:
            results[d]["pass"] += 1

summary = {"sf": SF_DIR, "queries": len(names), "results": results,
           "failures": failures}
print(json.dumps(summary))
with open("TPCH_CROSS.json", "w") as f:
    json.dump(summary, f, indent=1)
sys.exit(1 if failures else 0)
