#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run each oracle SQL in
DuckDB over the same sf dir and compare to the Verify parquet dumps (sorted columns,
sorted rows, exact values)."""
import datetime, glob, json, math, os, sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]") if df[c].dt.tz is None else df[c].dt.tz_localize(None).astype("datetime64[us]")
        elif df[c].dtype == object:
            nonnull = df[c].dropna()
            if len(nonnull) and all(
                    isinstance(v, datetime.date) and not isinstance(v, datetime.datetime)
                    for v in nonnull.head(20)):
                # Spark parquet DATE loads as object(datetime.date); DuckDB's
                # .df() yields datetime64 — same logical type, one dtype group
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].map(lambda v: str(v) if v is not None and not (isinstance(v, float) and math.isnan(v)) else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last").reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name in sorted(oracle):
    spark_dir = f"{OUT_DIR}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        sdf = norm(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        ddf = norm(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    if list(sdf.columns) != list(ddf.columns):
        print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}"); n_fail += 1; continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); n_fail += 1; continue
    bad = None
    # dtype GROUPS must agree before values are compared: the driver hashes
    # TYPED values, so an int64 Spark column vs a float64 DuckDB column
    # (e.g. an uncast HUGEINT sum) is a driver failure even when 254 == 254.0.
    KIND_GROUP = {"i": "int", "u": "int", "f": "float", "b": "bool",
                  "M": "datetime", "m": "timedelta"}
    for c in (sdf.columns if len(sdf) else []):  # empty: no dtype to infer
        ka = KIND_GROUP.get(sdf[c].dtype.kind, "object")
        kb = KIND_GROUP.get(ddf[c].dtype.kind, "object")
        if ka != kb:
            bad = f"col {c}: dtype group spark={sdf[c].dtype} duck={ddf[c].dtype}"
            break
    for c in (sdf.columns if bad is None else []):
        a, b = sdf[c], ddf[c]
        try:
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                eq = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                eq = a.astype(str).fillna("\0").equals(b.astype(str).fillna("\0"))
        except Exception:
            eq = a.astype(str).equals(b.astype(str))
        if not eq:
            mism = (a.astype(str) != b.astype(str))
            i = mism[mism].index[0] if mism.any() else 0
            bad = f"col {c} row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
            break
    if bad:
        print(f"FAIL {name}: {bad}"); n_fail += 1
    else:
        print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1

# queries without oracle: rows-only
for d in sorted(glob.glob(f"{OUT_DIR}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name in oracle: continue
    files = glob.glob(f"{d}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
    n_pass += n > 0; n_fail += n == 0

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
