package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Function-surface support matrix, pinned: for each expression and dialect,
  * either the engine has the spelling (and the unparser must render) or it
  * does not (and the unparser must refuse loudly). `.` = renders, `X` =
  * refuses. The matrix encodes engine-availability facts (DuckDB 1.0
  * live-checked; others per current function references), so a mapping
  * regression — silently refusing a supported function OR emitting text for
  * a missing one — fails this suite, not a user's warehouse.
  */
class RefusalSurveySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dialects = Seq("duckdb", "postgres", "mysql", "bigquery",
    "clickhouse", "snowflake", "mssql", "oracle", "trino", "redshift")

  //                                       du po my bi cl sn ms or tr re
  private val matrix: Seq[(String, String)] = Seq(
    "position('A' IN n_name)"          -> ".  .  .  .  .  .  .  .  .  .",
    "locate('A', n_name)"              -> ".  .  .  .  .  .  .  .  .  .",
    "split_part(n_name, 'A', 2)"       -> ".  .  X  X  X  .  X  X  .  .",
    "initcap(n_name)"                  -> "X  .  X  .  X  .  X  .  X  .",
    "translate(n_name, 'AB', 'ab')"    -> ".  .  X  .  .  .  .  .  .  .",
    "levenshtein(n_name, 'FRANCE')"    -> ".  X  X  .  .  .  X  X  .  X",
    "log10(n_nationkey + 1)"           -> ".  .  .  X  .  X  .  X  .  .",
    "log(2, n_nationkey + 1)"          -> ".  X  .  X  X  .  X  .  .  X",
    "degrees(n_nationkey)"             -> ".  .  .  X  .  .  .  X  .  .",
    "radians(n_nationkey)"             -> ".  .  .  X  .  .  .  X  .  .",
    "cot(n_nationkey + 1)"             -> ".  .  .  .  X  .  .  X  X  .",
    "sinh(n_nationkey)"                -> "X  .  X  X  .  .  X  .  .  X",
    "cbrt(n_nationkey)"                -> ".  .  X  X  X  .  X  X  .  .")

  for ((ex, row) <- matrix) {
    test(s"support matrix: $ex") {
      val expected = row.trim.split("\\s+").toSeq
      assert(expected.size == dialects.size, s"row shape: $row")
      val df = spark.sql(
        s"SELECT $ex AS v FROM parquet.`${TestSpark.sfDir}/nation.parquet`")
      val opt = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
      for ((d, want) <- dialects.zip(expected)) {
        val got =
          try { SqlUnparser.unparse(opt, df.columns.toIndexedSeq, SqlUnparser.dialectFor(d)); "." }
          catch { case _: UnsupportedOperationException => "X" }
        assert(got == want, s"$d: expected '$want' got '$got' for $ex")
      }
    }
  }

  test("locate reuses the audited instr mappings (reversed args included)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(expr("locate('AN', n_name)").as("p"))
    val opt = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    def text(d: String) =
      SqlUnparser.unparse(opt, df.columns.toIndexedSeq, SqlUnparser.dialectFor(d))
    assert(text("duckdb").contains("strpos(\"c1\", 'AN')"), text("duckdb"))
    // T-SQL and Snowflake take the needle FIRST
    assert(text("mssql").contains("CHARINDEX('AN',"), text("mssql"))
    assert(text("snowflake").contains("position('AN',"), text("snowflake"))
    // locate from a non-default start position stays refused (off-by-N
    // emulation differs per engine)
    val start = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(expr("locate('AN', n_name, 3)").as("p"))
    val optS = spark.sessionState.optimizer.execute(start.queryExecution.analyzed)
    intercept[UnsupportedOperationException] {
      SqlUnparser.unparse(optS, start.columns.toIndexedSeq, SqlUnparser.DuckDbDialect)
    }
  }

  test("split_part: native 1-based ''-on-overflow; Trino wraps NULL-on-overflow") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(expr("split_part(n_name, 'A', 2)").as("p"))
    val opt = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    def text(d: String) =
      SqlUnparser.unparse(opt, df.columns.toIndexedSeq, SqlUnparser.dialectFor(d))
    assert(text("duckdb").contains("split_part(\"c1\", 'A', 2)"), text("duckdb"))
    assert(text("trino").contains("coalesce(split_part("), text("trino"))
    // negative (from-the-end) indexes refuse everywhere
    val neg = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(expr("split_part(n_name, 'A', -1)").as("p"))
    val optN = spark.sessionState.optimizer.execute(neg.queryExecution.analyzed)
    intercept[UnsupportedOperationException] {
      SqlUnparser.unparse(optN, neg.columns.toIndexedSeq, SqlUnparser.DuckDbDialect)
    }
  }
}
