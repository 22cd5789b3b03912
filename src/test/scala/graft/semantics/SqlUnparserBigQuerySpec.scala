package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.{Semantic, TpcH}

/** BigQuery-dialect unparser gates — fifth dialect; the reference ships a
  * DEDICATED BigQueryDialect with its own function registries and column-name
  * encoding (`inner_dialect.rs:137-384`), snapshot-tested like every backend
  * (`mdl/mod.rs:648+`). Same proof posture here: pinned goldens + structural
  * assertions + generation breadth + the property sweep; the dialect's real
  * gaps (the Morton expansion's correlated-derived-table scoping) fail LOUDLY.
  */
class SqlUnparserBigQuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)

  private lazy val m21Bq: String = session.transformSql(Semantic.m21Sql, "bigquery")
  private lazy val m22Bq: String = session.transformSql(Semantic.m22Sql, "bigquery")
  private lazy val m24Bq: String = session.transformSql(Semantic.m24Sql, "bigquery")

  for (n <- Seq("m21", "m22", "m23", "m24")) {
    test(s"bigquery golden: $n renders to the pinned text") {
      val sql = n match {
        case "m21" => Semantic.m21Sql
        case "m22" => Semantic.m22Sql
        case "m23" => Semantic.m23Sql
        case "m24" => Semantic.m24Sql
      }
      Goldens.assertGolden("bigquery", n, session.transformSql(sql, "bigquery"))
    }
  }

  test("bigquery dialect: type spellings, EXISTS semi joins, TIMESTAMP_TRUNC arg order") {
    assert(m21Bq.contains("AS FLOAT64)") && m21Bq.contains("NUMERIC(18,2)"))
    assert(m22Bq.contains("WHERE EXISTS (SELECT 1 FROM"))
    assert(m24Bq.contains("TIMESTAMP_TRUNC(") && m24Bq.contains(", MONTH)"),
      "date_trunc must render with reversed args and a keyword unit")
    assert(!m24Bq.contains("date_trunc"))
  }

  test("bigquery dialect: the Morton expansion fails loudly") {
    val e = intercept[UnsupportedOperationException] {
      session.transformSql(Semantic.m25Sql, "bigquery")
    }
    assert(e.getMessage.contains("zorder_key"))
  }

  test("bigquery dialect: output aliases with special characters use the reference encoding") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .agg(count(lit(1))) // unaliased -> Spark names it "count(1)"
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val bq = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.BigQueryDialect)
    // '(' -> _40, ')' -> _41 per inner_dialect.rs:157-178's codepoint scheme
    assert(bq.contains("`count_401_41`"), bq)
    val duck = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.DuckDbDialect)
    assert(duck.contains("\"count(1)\""), "other dialects keep the literal name")
  }

  test("bigquery dialect: inline VALUES render as UNION ALL of SELECTs") {
    import spark.implicits._
    val local = Seq((1L, "a"), (2L, "b,c")).toDF("k", "v")
    val joined = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .join(local, org.apache.spark.sql.functions.col("n_nationkey") ===
        org.apache.spark.sql.functions.col("k"))
    val optimized = spark.sessionState.optimizer.execute(joined.queryExecution.analyzed)
    val bq = SqlUnparser.unparse(optimized, joined.columns.toIndexedSeq,
      SqlUnparser.BigQueryDialect)
    assert(!bq.contains("VALUES"), bq)
    assert(bq.contains("UNION ALL SELECT") && bq.contains("'b,c'"), bq)
  }

  test("bigquery dialect: string literals escape quotes as \\' (GoogleSQL has no '' doubling)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(concat(col("n_name"), lit("it's \\a")).as("c"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val bq = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.BigQueryDialect)
    // GoogleSQL: \' escapes the quote, \\ the backslash; '' inside a string
    // is NOT an escaped quote there (it closes + reopens — misparse)
    assert(bq.contains("'it\\'s \\\\a'"), bq)
    // the ANSI dialects keep '' doubling for the same literal
    val duck = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.DuckDbDialect)
    assert(duck.contains("'it''s \\a'"), duck)
  }

  test("bigquery dialect: DIV(a, b) and TO_HEX(MD5(x))") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select(expr("o_orderkey div 7").as("q"), md5(col("o_orderstatus")).as("h"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val bq = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.BigQueryDialect)
    assert(bq.contains("DIV(") && bq.contains("TO_HEX(MD5("), bq)
  }

  test("bigquery dialect: every TPC-H query unparses (breadth parity)") {
    val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
    val failures = TpcH.oracles.flatMap { case (n, sql) =>
      try { tpch.transformSql(sql, "bigquery"); None }
      catch { case e: Exception => Some(s"$n: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("property sweep: the grammar generates (or refuses loudly) for bigquery") {
    SqlUnparserPropertyGrammar.generationGate(
      spark, SqlUnparser.BigQueryDialect, TestSpark.sfDir)
  }
}
