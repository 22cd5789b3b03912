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
    */
  final case class Rule(label: String, source: Regex, replacement: String,
      target: Option[Regex])

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
        Some(raw"\bAS BIGINT\b".r))),
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
      Rule("dual", raw" FROM dual\b".r, "", None)))

  def supports(dialect: String): Boolean = rules.contains(dialect)

  /** The fidelity-lossy ANSI copy of `sql`. Only the pinned spellings change;
    * everything structural is byte-preserved (proved by [[residualSource]] /
    * [[residualTarget]] equality in TransliterateSpec).
    */
  def apply(dialect: String, sql: String): String =
    rules(dialect).foldLeft(sql) { (s, r) =>
      r.source.replaceAllIn(s, Regex.quoteReplacement(r.replacement))
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
