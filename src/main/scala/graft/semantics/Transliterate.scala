package graft.semantics

import scala.util.matching.Regex

/** Fidelity-LOSSY transliteration probes for the golden-only dialect trio
  * (mysql, bigquery, oracle).
  *
  * Those three dialects' rendered texts are semantically outside DuckDB's
  * grammar — MySQL/BigQuery identifiers MUST be backticked (default MySQL
  * reads `"x"` as a string; GoogleSQL only quotes with backticks) and
  * Oracle's native type spellings are NUMBER/VARCHAR2/BINARY_DOUBLE with
  * FROM-less SELECTs grounded on `dual` (reference per-dialect behavior:
  * `wren-core/core/src/mdl/dialect/inner_dialect.rs:127-470`). So their
  * renderings can only be golden-pinned, never executed — which would leave
  * a STRUCTURAL bug (join shape, subquery scoping, predicate logic) in those
  * renderers invisible to every executed gate.
  *
  * This object closes that hole: it mechanically rewrites a COPY of the
  * rendered text, replacing ONLY the adjudicated type/quote spellings with
  * their ANSI equivalents, so the copy executes in DuckDB against the Spark
  * rows. The probe claims NOTHING about type-spelling fidelity (that stays
  * with the goldens + DialectLint); it claims the *structure* — every join,
  * subquery scope, predicate, window frame, and VALUES expansion — produces
  * the same rows.
  *
  * The rewrite set is pinned falsifiable in TransliterateSpec: the original
  * must contain no occurrence of any replacement spelling (so removal of
  * LHS matches from the original and RHS matches from the copy leaves
  * byte-identical residuals — a proof the rewrite touched only the pinned
  * spellings), and the copy must pass a DuckDB-clean lint.
  */
object Transliterate {

  /** One spelling rewrite. `target` is the RHS as a regex used by the
    * residual proof; empty `replacement` (the dual strip) has no target.
    * `raw = true` passes `replacement` to the regex engine unquoted so it may
    * carry `$1` group references — used for constructor-spelling rewrites
    * (`toDate32('x')` → `DATE 'x'`) where the payload must ride along. The
    * residual proof is unchanged: source-deletion removes the whole LHS match
    * (payload included) and target-deletion the whole RHS match, so equality
    * still proves the rewrite touched nothing outside the pinned spellings
    * (payload integrity itself is guarded by the executed hash gate).
    */
  final case class Rule(label: String, source: Regex, replacement: String,
      target: Option[Regex], raw: Boolean = false)

  /** Ordered, adjudicated rewrites per dialect.
    *
    *  - mysql: backtick identifier quote → ANSI `"`; `CAST(x AS SIGNED)` is
    *    MySQL's only int64 cast spelling → BIGINT.
    *  - bigquery: backtick quote → `"`; GoogleSQL type names FLOAT64/INT64 →
    *    DOUBLE/BIGINT.
    *  - oracle: BINARY_DOUBLE → DOUBLE; NUMBER(19,0) is Oracle's int64
    *    spelling → BIGINT (NUMBER(19,0) would execute as DECIMAL(19,0) in
    *    DuckDB and break the typed-hash gate; the corpus never carries a
    *    true decimal(19,0) — a future one would fail the gate loudly);
    *    remaining NUMBER(p,s) → NUMERIC(p,s); VARCHAR2(n) → VARCHAR(n);
    *    ` FROM dual` stripped (DuckDB allows FROM-less SELECT).
    */
  val rules: Map[String, Seq[Rule]] = Map(
    "mysql" -> Seq(
      Rule("ident-quote", "`".r, "\"", Some("\"".r)),
      Rule("int64-cast", raw"\bAS SIGNED\b".r, "AS BIGINT",
        Some(raw"\bAS BIGINT\b".r)),
      // MySQL length() counts BYTES, so the renderer spells character length
      // as char_length — whose DuckDB spelling is length() (character
      // semantics). Closes the former tpch_q20×mysql skip (round-14 #6).
      Rule("char-length", raw"\bchar_length\(".r, "length(",
        Some(raw"\blength\(".r)),
      // MySQL's only null-safe-equality spelling is `<=>`; DuckDB parses the
      // ANSI `IS NOT DISTINCT FROM` (identical three-valued semantics). Needed
      // since r15's q2 window rewrite, whose equality filter Spark plans as
      // EqualNullSafe.
      Rule("null-safe-eq", raw"<=>".r, "IS NOT DISTINCT FROM",
        Some(raw"\bIS NOT DISTINCT FROM\b".r))),
    "bigquery" -> Seq(
      Rule("ident-quote", "`".r, "\"", Some("\"".r)),
      Rule("float64", raw"\bFLOAT64\b".r, "DOUBLE", Some(raw"\bDOUBLE\b".r)),
      Rule("int64", raw"\bINT64\b".r, "BIGINT", Some(raw"\bBIGINT\b".r))),
    "oracle" -> Seq(
      Rule("binary-double", raw"\bBINARY_DOUBLE\b".r, "DOUBLE",
        Some(raw"\bDOUBLE\b".r)),
      Rule("number-int64", raw"\bNUMBER\(19,0\)".r, "BIGINT",
        Some(raw"\bBIGINT\b".r)),
      Rule("number", raw"\bNUMBER\(".r, "NUMERIC(", Some(raw"\bNUMERIC\(".r)),
      Rule("varchar2", raw"\bVARCHAR2\(".r, "VARCHAR(",
        Some(raw"\bVARCHAR\(".r)),
      Rule("dual", raw" FROM dual\b".r, "", None)),
    // ---- round-14 #4: TPC-H breadth for the graduated-subset trio ----------
    // These three already EXECUTE directly on their second-parser-faithful
    // m-corpus subsets (m21–m23, m34–m36); the rewrites below cover only the
    // spellings their TPC-H renderings add beyond that subset.
    "clickhouse" -> Seq(
      // native date constructor → ANSI date literal (payload rides via $1)
      Rule("todate32", raw"toDate32\(('[^']*')\)".r, "DATE $1",
        Some(raw"\bDATE '[^']*'".r), raw = true),
      Rule("todatetime64", raw"toDateTime64\(('[^']*'), 6\)".r, "TIMESTAMP $1",
        Some(raw"\bTIMESTAMP '[^']*'".r), raw = true),
      // camelCase date accessors → DuckDB's bare accessor functions
      Rule("toyear", raw"\btoYear\(".r, "year(", Some(raw"\byear\(".r)),
      Rule("tomonth", raw"\btoMonth\(".r, "month(", Some(raw"\bmonth\(".r)),
      // NOTE (r16): a DISTINCT-aggregate q21 rewrite briefly needed a
      // `Nullable(Int64)` → BIGINT rule here (ClickHouse wraps nullable cast
      // targets; Spark's multi-distinct Expand emits CAST(NULL AS BIGINT)).
      // The adopted two-level-aggregate spelling emits no NULL casts, so the
      // rule was dropped — the exercised-rules pin below would rightly flag
      // it dead. If a future query plans through multi-distinct Expand, the
      // rule (and a probe) must come back.
      // ClickHouse type names → ANSI spellings (Int64 does NOT match inside
      // DateTime64/Decimal64 — \b requires a non-word char before the I)
      Rule("int64", raw"\bInt64\b".r, "BIGINT", Some(raw"\bBIGINT\b".r)),
      Rule("int32", raw"\bInt32\b".r, "INTEGER", Some(raw"\bINTEGER\b".r)),
      Rule("float64", raw"\bFloat64\b".r, "DOUBLE", Some(raw"\bDOUBLE\b".r)),
      Rule("string-type", raw"\bAS String\)".r, "AS VARCHAR)",
        Some(raw"\bAS VARCHAR\)".r)),
      Rule("date32-cast", raw"\bAS Date32\)".r, "AS DATE)",
        Some(raw"\bAS DATE\)".r)),
      Rule("datetime64-cast", raw"\bAS DateTime64\(6\)\)".r, "AS TIMESTAMP)",
        Some(raw"\bAS TIMESTAMP\)".r)),
      // ClickHouse's native semi/anti join kinds carry a LEFT prefix DuckDB's
      // grammar rejects (DuckDB spells them bare SEMI/ANTI JOIN, pre-flighted)
      Rule("semi-join", raw"\bLEFT SEMI JOIN\b".r, "SEMI JOIN",
        Some(raw"(?<!LEFT )\bSEMI JOIN\b".r)),
      Rule("anti-join", raw"\bLEFT ANTI JOIN\b".r, "ANTI JOIN",
        Some(raw"(?<!LEFT )\bANTI JOIN\b".r)),
      // ClickHouse position() is haystack-first — exactly DuckDB's strpos
      Rule("position", raw"\bposition\(".r, "strpos(",
        Some(raw"\bstrpos\(".r)),
      Rule("startswith", raw"\bstartsWith\(".r, "starts_with(",
        Some(raw"\bstarts_with\(".r)),
      Rule("lengthutf8", raw"\blengthUTF8\(".r, "length(",
        Some(raw"\blength\(".r))),
    "snowflake" -> Seq(
      // NUMBER(38,0) is Snowflake's one integral spelling → int64
      Rule("number-int", raw"\bNUMBER\(38,0\)".r, "BIGINT",
        Some(raw"\bBIGINT\b".r)),
      Rule("number", raw"\bNUMBER\(".r, "NUMERIC(", Some(raw"\bNUMERIC\(".r)),
      Rule("float", raw"\bAS FLOAT\)".r, "AS DOUBLE)",
        Some(raw"\bAS DOUBLE\)".r)),
      // cast-target form only: snowflake renderings ALSO carry plain
      // TIMESTAMP '...' literals, so a bare TIMESTAMP target would break the
      // residual proof's soundness precondition
      Rule("timestamp-ntz", raw"\bAS TIMESTAMP_NTZ\)".r, "AS TIMESTAMP)",
        Some(raw"\bAS TIMESTAMP\)".r)),
      Rule("startswith", raw"\bSTARTSWITH\(".r, "starts_with(",
        Some(raw"\bstarts_with\(".r)),
      // DATEADD(day, n, CAST(col AS DATE)) → date + int-days (DuckDB adds
      // days; pre-flighted). Scoped to the literal-day, cast-column form the
      // unparser emits — an unanticipated nesting stays un-rewritten and
      // fails the gate loudly rather than being half-rewritten.
      Rule("dateadd-day",
        raw"""DATEADD\(day, (\d+), (CAST\("c\d+" AS DATE\))\)""".r,
        "($2 + $1)",
        Some(raw"""\(CAST\("c\d+" AS DATE\) \+ \d+\)""".r), raw = true)),
    "mssql" -> Seq(
      // OFFSET-FETCH limit machinery → LIMIT (two spelling-only steps: the
      // combined clause first, then the trailing ROWS ONLY is dropped)
      Rule("fetch-limit", raw"OFFSET 0 ROWS FETCH NEXT ".r, "LIMIT ",
        Some(raw"\bLIMIT ".r)),
      Rule("rows-only", raw"(?<=\d) ROWS ONLY".r, "", None),
      Rule("len", raw"\bLEN\(".r, "length(", Some(raw"\blength\(".r)),
      Rule("nvarchar", raw"\bNVARCHAR\(MAX\)".r, "VARCHAR",
        Some(raw"\bVARCHAR\b".r)),
      Rule("datetime2", raw"\bDATETIME2\(6\)".r, "TIMESTAMP",
        Some(raw"\bTIMESTAMP\b".r)),
      Rule("bit", raw"\bAS BIT\)".r, "AS BOOLEAN)",
        Some(raw"\bAS BOOLEAN\)".r)),
      // DATEPART's bare keyword unit → DuckDB's quoted unit string
      Rule("datepart", raw"\bDATEPART\((\w+), ".r, "DATEPART('$1', ",
        Some(raw"\bDATEPART\('\w+', ".r), raw = true),
      // T-SQL CHARINDEX is needle-first; DuckDB strpos is haystack-first —
      // scoped to the literal-needle, column-haystack form the unparser emits
      Rule("charindex",
        raw"""\bCHARINDEX\(('[^']*'), ("c\d+")\)""".r,
        "strpos($2, $1)",
        Some(raw"""\bstrpos\("c\d+", '[^']*'\)""".r), raw = true),
      Rule("dateadd-day",
        raw"""DATEADD\(day, (\d+), (CAST\("c\d+" AS DATE\))\)""".r,
        "($2 + $1)",
        Some(raw"""\(CAST\("c\d+" AS DATE\) \+ \d+\)""".r), raw = true)))

  def supports(dialect: String): Boolean = rules.contains(dialect)

  /** The fidelity-lossy ANSI copy of `sql`. Only the pinned spellings change;
    * everything structural is byte-preserved (proved by [[residualSource]] /
    * [[residualTarget]] equality in TransliterateSpec).
    */
  def apply(dialect: String, sql: String): String =
    rules(dialect).foldLeft(sql) { (s, r) =>
      r.source.replaceAllIn(s,
        if (r.raw) r.replacement else Regex.quoteReplacement(r.replacement))
    }

  /** `sql` with every LHS spelling deleted — what the rewrite must leave
    * untouched.
    */
  def residualSource(dialect: String, sql: String): String =
    rules(dialect).foldLeft(sql) { (s, r) => r.source.replaceAllIn(s, "") }

  /** The transliterated text with every RHS spelling deleted. Equal to
    * [[residualSource]] of the original iff the rewrite touched only the
    * pinned spellings (given the original carries none of the RHS spellings,
    * asserted separately).
    */
  def residualTarget(dialect: String, sql: String): String =
    rules(dialect).foldLeft(sql) { (s, r) =>
      r.target.fold(s)(t => t.replaceAllIn(s, ""))
    }
}
