#!/usr/bin/env python3
"""Cross-engine execution gate for the unparse property sweep: DuckDB executes
the duckdb / postgres / trino / redshift dialect texts the 40-seed grammar
generated (all four stay inside DuckDB's ANSI surface), value-compared against
Spark executing the source query (parquet dumps from UnparseSweepDump).

Comparison: exact for non-float columns; floats compare at 1e-9 relative
tolerance — the grammar sums `c_acctbal` doubles, and a cross-engine
accumulation order difference in a SUM of doubles is not a dialect bug.
Writes UNPARSE_SWEEP.json next to the repo root."""
import datetime, glob, json, math, os, sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/unparse_sweep"

con = duckdb.connect()
for t in ["orders", "customer", "nation"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # Spark parquet DATE loads as object(datetime.date); DuckDB's .df()
            # yields datetime64 — same logical type, one canonical dtype
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


def compare(sdf, ddf):
    if list(sdf.columns) != list(ddf.columns):
        return f"columns spark={list(sdf.columns)} duck={list(ddf.columns)}"
    if len(sdf) != len(ddf):
        return f"rows spark={len(sdf)} duck={len(ddf)}"
    # dtype GROUPS must agree (type fidelity): an int64 Spark column vs a
    # float64 DuckDB one (uncast HUGEINT sum) is a dialect bug even when
    # every value compares equal
    for c in (sdf.columns if len(sdf) else []):  # empty: no dtype to infer
        ka = KIND_GROUP.get(sdf[c].dtype.kind, "object")
        kb = KIND_GROUP.get(ddf[c].dtype.kind, "object")
        if ka != kb:
            return f"col {c}: dtype group spark={sdf[c].dtype} duck={ddf[c].dtype}"
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            af, bf = a.astype(float), b.astype(float)
            bad = ~((af.isna() & bf.isna()) |
                    ((af - bf).abs() <= 1e-9 * (af.abs() + bf.abs() + 1.0)))
            if bad.any():
                i = bad[bad].index[0]
                return f"col {c} row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
        else:
            if not a.astype(str).fillna("\0").equals(b.astype(str).fillna("\0")):
                mism = a.astype(str) != b.astype(str)
                i = mism[mism].index[0]
                return f"col {c} row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
    return None


DIALECTS = ("duckdb", "postgres", "trino", "redshift",
            "mysql_translit", "bigquery_translit", "oracle_translit",
            "clickhouse_translit", "snowflake_translit", "mssql_translit")
results = {d: {"pass": 0, "fail": 0, "not_duckdb_expressible": 0,
               "refused": 0} for d in DIALECTS}
failures = []
SEEDS = len(glob.glob(f"{OUT_DIR}/seed_*.source.sql"))
for seed in range(SEEDS):
    files = glob.glob(f"{OUT_DIR}/seed_{seed}/*.parquet")
    sdf = norm(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
    for dialect in DIALECTS:
        path = f"{OUT_DIR}/seed_{seed}.{dialect}.sql"
        if dialect.endswith("_translit") and not os.path.exists(path):
            # the dialect REFUSED the seed (curated-subset contract: loud
            # refusal, golden/refusal-matrix pinned) — recorded, not hidden
            results[dialect]["refused"] += 1
            continue
        sql = open(path).read()
        # Trio spellings the fidelity-lossy map deliberately does NOT touch
        # (function grammar + literal escaping, not type/quote spellings):
        # correct or faithful for their engines, outside DuckDB's parser or
        # MISREAD by it. Recorded explicitly, never silently passed. The
        # misread classes mirror the live-dialect ones below: 3-arg
        # regexp_replace is global on mysql/bigquery/oracle but first-match
        # in DuckDB; doubled string-literal backslashes (their parsers eat
        # one) read as two chars here; MySQL's ESCAPE '\\' likewise.
        if dialect.endswith("_translit"):
            import re as _re
            low = sql.lower()
            TRIO_SKIP = {
                "mysql_translit": (r"\bdate_format\(", r"\bgroup_concat\(",
                    r" div ", r" regexp ", r"\bchar_length\(", r"<=>",
                    r"escape '\\\\'", r"\bregexp_replace\(", r"as datetime\)"),
                "bigquery_translit": (r"\bdatetime_trunc\(", r"\btimestamp_trunc\(",
                    r"\bformat_date\(", r"\bstring_agg\(", r"\bmod\(",
                    r"\bregexp_contains\(", r"\bregexp_replace\(", r"\bgenerate_date_array\(", r"\\\\"),
                "oracle_translit": (r"\btrunc\(", r"\bto_char\(", r"\blistagg\(",
                    r"\bsubstr\(", r"\bmod\(", r"\bregexp_like\(",
                    r"\bregexp_replace\("),
                # round-14: the graduated-subset trio at grammar breadth.
                # Same contract — function-grammar spellings the map
                # deliberately does not touch (the map covers type/quote/
                # constructor spellings only), each correct or faithful for
                # ITS engine, recorded explicitly:
                "clickhouse_translit": (
                    r"\bmatch\(",            # RE2 partial-match predicate
                    r"\breplaceregexpall\(", # global regex replace
                    r"\bstddevsamp\(",       # camelCase stat spellings
                    r"\bmodulo\(", r"\bintdiv\(",
                    r"\\\\_x",                # backslash-default LIKE escape:
                                             # DuckDB reads the backslash literally
                    r"\bsplitbystring\(", r"\btodayofweek\(",
                    r"\bhex\(md5\(",        # DuckDB md5() is already hex text
                    r"\bnullable\(",         # Nullable(T) cast targets
                    r"\bbitand\(", r"\bbitor\(", r"\bbitshift"),
                "snowflake_translit": (
                    r"\bregexp_instr\(",     # partial-match predicate spelling
                    r"\bregexp_replace\(",   # global there, first-match here
                    r"within group",         # ANSI listagg
                    r"\bdateadd\(",          # non-literal-day forms stay native
                    r"\bposition\(",         # needle-first argument order
                    r"\bbitand\(", r"\bbitor\(", r"\bbitshift",
                    r"escape '\\\\'"),        # doubled-backslash ESCAPE literal
                "mssql_translit": (
                    r"\bcharindex\(",        # non-literal-needle forms
                    r"\bdateadd\(",
                    r"\bstdev\(", r"\bstdevp\(",  # T-SQL stat spellings
                    r"\bstring_agg\(",       # WITHIN GROUP string agg
                    r"\blog\(",              # T-SQL LOG is ln; DuckDB log is log10
                    r"\bconvert\(", r"\bhashbytes\(",
                    r"\bdatetrunc\(",        # keyword-unit 2022 spelling
                    r"\bright_shift\(", r"\bleft_shift\(",  # SQL Server 2022 bit fns
                    r"\[\[\]",               # [ class-escape in LIKE patterns
                    r"escape '\\\\'"),
            }
            if any(_re.search(p, low) for p in TRIO_SKIP[dialect]):
                results[dialect]["not_duckdb_expressible"] += 1
                continue
        # Trino/Redshift spell ordered string aggregation as the ANSI
        # LISTAGG ... WITHIN GROUP, and Trino spells bit machinery as
        # bitwise_* functions -- correct THERE but outside DuckDB's parser;
        # recorded EXPLICITLY, never silently passed.
        if dialect in ("trino", "redshift") and "WITHIN GROUP" in sql:
            results[dialect]["not_duckdb_expressible"] += 1
            continue
        if dialect == "trino" and "bitwise_" in sql:
            results[dialect]["not_duckdb_expressible"] += 1
            continue
        # Regex spellings that are correct for their engine but would MISREAD
        # in DuckDB: postgres/redshift `~` is partial-match there, full-match
        # here; trino regexp_like doesn't exist here; trino/redshift 3-arg
        # regexp_replace is global there, first-match here. Recorded
        # explicitly, never silently passed.
        if dialect in ("postgres", "redshift") and " ~ " in sql:
            results[dialect]["not_duckdb_expressible"] += 1
            continue
        if dialect == "trino" and "regexp_like(" in sql:
            results[dialect]["not_duckdb_expressible"] += 1
            continue
        if dialect in ("trino", "redshift") and "regexp_replace(" in sql.lower():
            results[dialect]["not_duckdb_expressible"] += 1
            continue
        try:
            ddf = norm(con.sql(sql).df())
            bad = compare(sdf, ddf)
        except Exception as e:
            bad = f"execution error: {str(e)[:160]}"
        if bad:
            results[dialect]["fail"] += 1
            failures.append(f"seed {seed} [{dialect}]: {bad}")
            print(f"FAIL seed {seed} [{dialect}]: {bad}")
        else:
            results[dialect]["pass"] += 1

summary = {"sf": SF_DIR, "seeds": SEEDS, "results": results, "failures": failures}
print(json.dumps(summary))
with open("UNPARSE_SWEEP.json", "w") as f:
    json.dump(summary, f, indent=1)
sys.exit(1 if failures else 0)
