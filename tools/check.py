#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run each oracle SQL in
DuckDB over the same sf dir and compare to the Verify parquet dumps (sorted
columns, sorted rows, exact values, EXACT arrow types).

Typed parity (round 15): the schema compare reads the Spark parquet footer and
DuckDB's arrow output and demands exact logical types — int32 vs int64 and
tz-aware vs naive timestamps are FAILURES even when every value matches.
Round 14's m39 trio read green here (dtype groups, tz-normalized) while the
driver's typed gate read red; this makes that class locally falsifiable.
Timestamp RESOLUTION (us vs ns) is not part of the signature — it's a loader
artifact, not a logical type."""
import datetime, glob, json, math, os, sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

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


def asig(t) -> str:
    """Exact logical-type signature of an arrow type (resolution-free)."""
    if pa.types.is_timestamp(t):
        return "timestamp[tz]" if t.tz is not None else "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{asig(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(
            f"{t.field(i).name}:{asig(t.field(i).type)}" for i in range(t.num_fields)) + ">"
    return str(t)  # int8..int64, uint*, float, double, bool


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Value-compare normalization (types are checked separately, via arrow)."""
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
                # .df() yields datetime64 — same logical type (the arrow-level
                # schema compare above already proved both sides are `date`)
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
        s_schema = pq.read_schema(files[0])
        sdf = norm(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        d_tbl = con.sql(oracle[name]).arrow()
        ddf = norm(d_tbl.to_pandas())
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    if list(sdf.columns) != list(ddf.columns):
        print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}"); n_fail += 1; continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); n_fail += 1; continue
    # exact typed-schema parity (driver-faithful): arrow logical types must
    # match per column — width, tz-ness, decimal(p,s), element types
    ssig = {f.name: asig(f.type) for f in s_schema}
    dsig = {f.name: asig(f.type) for f in d_tbl.schema}
    bad = None
    for c in sorted(ssig):
        if ssig[c] != dsig.get(c):
            bad = f"col {c}: type spark={ssig[c]} duck={dsig.get(c)}"
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
