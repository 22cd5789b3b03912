package graft.semantics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Regex-family unparse: match predicate / replace-all / group extract route
  * through per-dialect spellings (the reference transpiles the same names via
  * sqlglot), and every inexpressible shape refuses loudly — T-SQL has no
  * regex at all, group extraction is unreachable on most engines, and
  * flavor-specific replacement strings (`$1`/`\1`) never translate.
  */
class SqlUnparserRegexpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def unparse(df: org.apache.spark.sql.DataFrame, d: String): String = {
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.dialectFor(d))
  }

  private lazy val matchDf = spark.read
    .parquet(s"${TestSpark.sfDir}/nation.parquet")
    .filter(col("n_name").rlike("^[A-C].*A$")).select("n_name")

  test("rlike: each engine's partial-match predicate spelling") {
    val expect = Map(
      "duckdb" -> "regexp_matches(",
      "postgres" -> " ~ ",
      "trino" -> "regexp_like(",
      "redshift" -> " ~ ",
      "mysql" -> " REGEXP ",
      "bigquery" -> "REGEXP_CONTAINS(",
      "clickhouse" -> "match(",
      // Snowflake's own REGEXP_LIKE is FULL-match — the partial predicate is
      // position-based; Oracle's REGEXP_LIKE is the partial-match condition
      "snowflake" -> "REGEXP_INSTR(",
      "oracle" -> "REGEXP_LIKE(")
    for ((d, frag) <- expect) {
      val text = unparse(matchDf, d)
      assert(text.contains(frag), s"$d: $text")
      DialectLint.lint(d, "rlike", text)
    }
    // T-SQL has no regex: loud refusal, never approximate text
    val e = intercept[UnsupportedOperationException](unparse(matchDf, "mssql"))
    assert(e.getMessage.contains("rlike"), e.getMessage)
  }

  test("regexp_replace: global-from-position-1 with a plain replacement") {
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(regexp_replace(col("n_name"), "[AEIOU]+", ".").as("r"))
    assert(unparse(df, "duckdb").contains("regexp_replace(\"c1\", '[AEIOU]+', '.', 'g')"),
      unparse(df, "duckdb"))
    assert(unparse(df, "postgres").contains(", 'g')"), unparse(df, "postgres"))
    assert(unparse(df, "trino").contains("regexp_replace("), unparse(df, "trino"))
    assert(unparse(df, "clickhouse").contains("replaceRegexpAll("), unparse(df, "clickhouse"))
    assert(unparse(df, "oracle").contains("REGEXP_REPLACE("), unparse(df, "oracle"))
    // a replacement with group references is flavor-specific: refuse
    val dollar = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(regexp_replace(col("n_name"), "([AEIOU])", "$1$1").as("r"))
    val e = intercept[UnsupportedOperationException](unparse(dollar, "duckdb"))
    assert(e.getMessage.contains("regexp_replace"), e.getMessage)
  }

  test("regexp_extract: ''-on-miss semantics carried per engine") {
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(regexp_extract(col("n_name"), "([A-Z]+)", 1).as("e"))
    // DuckDB's regexp_extract is ''-on-miss natively; Trino/Postgres wrap
    // NULL-on-miss in a NULL-input-preserving coalesce
    assert(unparse(df, "duckdb").contains("regexp_extract(\"c1\", '([A-Z]+)', 1)"),
      unparse(df, "duckdb"))
    assert(unparse(df, "trino").contains("coalesce(regexp_extract("), unparse(df, "trino"))
    val pg = unparse(df, "postgres")
    assert(pg.contains("(regexp_match(") && pg.contains("[1]") && pg.contains("coalesce("),
      pg)
    // whole-match index 0 is unreachable through Postgres's group array
    val whole = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(regexp_extract(col("n_name"), "[A-Z]+", 0).as("e"))
    val e = intercept[UnsupportedOperationException](unparse(whole, "postgres"))
    assert(e.getMessage.contains("regexp_extract"), e.getMessage)
    assert(unparse(whole, "duckdb").contains(", 0)"), unparse(whole, "duckdb"))
    // engines whose functions cannot reach an indexed group refuse
    for (d <- Seq("mysql", "bigquery", "clickhouse", "snowflake", "oracle", "redshift", "mssql"))
      intercept[UnsupportedOperationException](unparse(df, d))
  }

  test("spark round-trip: the regex family replays through spark.sql") {
    for (df <- Seq(
        matchDf,
        spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
          .select(regexp_replace(col("n_name"), "[AEIOU]+", ".").as("r")),
        spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
          .select(regexp_extract(col("n_name"), "([A-Z]+)", 1).as("e")))) {
      val text = unparse(df, "spark")
      assert(spark.sql(text).collect().map(_.toString).sorted.toSeq ==
        df.collect().map(_.toString).sorted.toSeq, text)
    }
  }
}
