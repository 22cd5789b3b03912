#!/usr/bin/env python3
"""Pre-flight for the tpch_qN_translit_<dialect> gate entries: executes each
dumped transliterated text in DuckDB over the sf views and compares the typed
frame against the duckdb-dialect rendering of the SAME optimized plan (which
the driver gate already hash-matches against Spark). A combo that parses and
matches here will pass the driver's DuckDB gate; a combo that cannot parse is
recorded so it can become a documented `translitSkip` entry, never a silent
omission.

Run after `sbt "Test/runMain graft.tools.TpchTranslitDump /tmp/tpch_translit"`:
    python3 tools/translit_preflight.py [dumpdir] [sfdir]
"""
import glob, json, os, sys

import duckdb
import pandas as pd

DUMP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpch_translit"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        else:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), kind="mergesort",
                          na_position="last").reset_index(drop=True)


results = {}
for f in sorted(glob.glob(f"{DUMP}/tpch_q*.duckdb.sql")):
    q = os.path.basename(f).split(".")[0]
    ref = norm(con.execute(open(f).read()).df())
    for d in ["mysql", "bigquery", "oracle", "clickhouse", "snowflake", "mssql"]:
        fd = f"{DUMP}/{q}.{d}.sql"
        key = f"{q}.{d}"
        if not os.path.exists(fd):
            results[key] = "REFUSED (render)"
            continue
        try:
            got = norm(con.execute(open(fd).read()).df())
        except Exception as e:
            results[key] = f"PARSE/EXEC: {str(e).splitlines()[0][:160]}"
            continue
        if list(got.columns) != list(ref.columns):
            results[key] = f"COLUMNS: {list(got.columns)} vs {list(ref.columns)}"
        elif len(got) != len(ref):
            results[key] = f"ROWS: {len(got)} vs {len(ref)}"
        elif not got.equals(ref):
            results[key] = "VALUES differ"
        else:
            results[key] = "OK"

bad = {k: v for k, v in results.items() if v != "OK"}
print(json.dumps(bad, indent=1) if bad else "ALL OK")
print(f"{sum(1 for v in results.values() if v == 'OK')}/{len(results)} OK")
