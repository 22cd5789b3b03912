package graft.semantics

import scala.util.matching.Regex

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.{Semantic, TpcH}
import graft.tools.GoldenGen

/** Corpus-wide static lint over every live-rendered dialect text.
  *
  * Six of the eleven dialects have no engine in this sandbox, so their texts
  * can only be golden-pinned — and the failure mode that posture cannot catch
  * is a pinned text the real engine would reject (both advisor findings of
  * round 9 were exactly this class: MySQL's `VALUES (...)` constructor,
  * BigQuery's nonexistent `%` operator). This spec makes that class
  * falsifiable in-sandbox: for every dialect × (semantic m-corpus ∪ all 22
  * TPC-H queries), the live rendering must avoid each construct the TARGET
  * engine's published grammar rejects. String literals are stripped first so
  * format strings (`'%Y-%m-01'`) never false-positive.
  *
  * Universal rules (every dialect): balanced parentheses, an even count of
  * every quoting character, text starts with SELECT. Per-dialect rules cite
  * the grammar gap they pin; the reference curates the same gaps per
  * InnerDialect (wren-core/core/src/mdl/dialect/inner_dialect.rs:98-135).
  */
class DialectLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val semSession =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)
  private lazy val tpchSession =
    GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)

  /** Blank out single-quoted literals (with `''` escapes) so rules never match
    * inside strings; quoted identifiers stay visible.
    */
  private def stripLiterals(s: String): String =
    s.replaceAll("'(?:[^']|'')*'", "''")

  /** (label, pattern) pairs the stripped text must NOT match, per dialect.
    * Labels say what the target engine rejects — each is a real grammar gap,
    * not a style preference.
    */
  private val forbidden: Map[String, Seq[(String, Regex)]] = Map(
    "duckdb" -> Seq(
      "backtick identifier (DuckDB quotes with \")" -> "`".r),
    "postgres" -> Seq(
      "backtick identifier (Postgres quotes with \")" -> "`".r),
    "mysql" -> Seq(
      "double-quoted identifier (MySQL default parses \"...\" as a string)" -> "\"".r,
      "VALUES row without ROW() constructor" -> raw"VALUES \(".r,
      "FETCH FIRST (MySQL has LIMIT only)" -> raw"FETCH\s+(FIRST|NEXT)".r,
      "ILIKE (not a MySQL operator)" -> raw"\bILIKE\b".r,
      ":: cast operator (Postgres-only)" -> raw"::".r,
      "NULLS FIRST/LAST (no such MySQL syntax)" -> raw"NULLS\s+(FIRST|LAST)".r,
      "date_trunc (no native MySQL function)" -> raw"\bdate_trunc\s*\(".r,
      "FULL JOIN (MySQL has no full outer join)" -> raw"FULL\s+(OUTER\s+)?JOIN".r),
    "bigquery" -> Seq(
      "% operator (GoogleSQL has MOD() only)" -> raw"%".r,
      "double-quoted identifier (GoogleSQL quotes with `)" -> "\"".r,
      ":: cast operator" -> raw"::".r,
      "ILIKE (not a GoogleSQL operator)" -> raw"\bILIKE\b".r),
    "clickhouse" -> Seq(
      "FETCH FIRST/NEXT (ClickHouse has LIMIT only)" -> raw"FETCH\s+(FIRST|NEXT)".r),
    "snowflake" -> Seq(
      "backtick identifier (Snowflake quotes with \")" -> "`".r),
    "mssql" -> Seq(
      "|| concat (T-SQL concatenates with +/CONCAT)" -> raw"\|\|".r,
      "LIMIT (T-SQL uses TOP / OFFSET-FETCH)" -> raw"\bLIMIT\b".r,
      "backtick identifier" -> "`".r,
      "ILIKE (not a T-SQL operator)" -> raw"\bILIKE\b".r,
      ":: cast operator" -> raw"::".r,
      "NULLS FIRST/LAST (no such T-SQL syntax)" -> raw"NULLS\s+(FIRST|LAST)".r),
    "oracle" -> Seq(
      "LIMIT (Oracle uses FETCH FIRST)" -> raw"\bLIMIT\b".r,
      "AS before a table alias (Oracle rejects it)" -> raw"\) AS \"t(\d+|_out)\"".r,
      "backtick identifier" -> "`".r,
      "% operator (Oracle has MOD() only)" -> raw"%".r,
      ":: cast operator" -> raw"::".r,
      "ILIKE (not an Oracle operator)" -> raw"\bILIKE\b".r,
      "substring() (Oracle spells it SUBSTR)" -> raw"\bsubstring\s*\(".r),
    "trino" -> Seq(
      ":: cast operator (Trino requires CAST)" -> raw"::".r,
      "backtick identifier (Trino quotes with \")" -> "`".r),
    "redshift" -> Seq(
      "backtick identifier (Redshift quotes with \")" -> "`".r))

  private def lint(dialect: String, name: String, text: String): Unit = {
    val t = stripLiterals(text)
    assert(text.startsWith("SELECT"), s"$dialect/$name: text must start with SELECT")
    assert(t.count(_ == '(') == t.count(_ == ')'),
      s"$dialect/$name: unbalanced parentheses")
    assert(t.count(_ == '"') % 2 == 0, s"$dialect/$name: unbalanced \" quotes")
    assert(t.count(_ == '`') % 2 == 0, s"$dialect/$name: unbalanced backticks")
    for ((label, re) <- forbidden.getOrElse(dialect, Nil); m <- re.findFirstMatchIn(t)) {
      val at = m.start
      fail(s"$dialect/$name: $label near …${t.slice(math.max(0, at - 60), at + 40)}…")
    }
    // T-SQL's FETCH clause is only legal after an OFFSET clause
    if (dialect == "mssql" && t.contains("FETCH NEXT"))
      assert(t.contains("OFFSET"), s"$dialect/$name: FETCH NEXT without OFFSET")
  }

  for (d <- GoldenGen.dialects; (name, sql) <- GoldenGen.corpus) {
    test(s"lint $d/$name (semantic corpus)") {
      try lint(d, name, semSession.transformSql(sql, d))
      catch { case _: UnsupportedOperationException => /* loud refusal is fine */ }
    }
  }

  for (d <- GoldenGen.dialects; (name, sql) <- TpcH.oracles.toSeq.sortBy(_._1)) {
    test(s"lint $d/$name") {
      try lint(d, name, tpchSession.transformSql(sql, d))
      catch { case _: UnsupportedOperationException => /* loud refusal is fine */ }
    }
  }
}
