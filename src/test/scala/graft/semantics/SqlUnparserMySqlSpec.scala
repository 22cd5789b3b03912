package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.{Semantic, TpcH}

/** MySQL-dialect unparser gates — fourth dialect, same proof posture as
  * Postgres (no MySQL server in this sandbox → pinned-text snapshot goldens +
  * structural assertions + generation-breadth gates, the reference's own
  * posture for its 20 backend dialects, `wren-core/core/src/mdl/mod.rs:648+`;
  * MySQL-specific overrides mirror `inner_dialect.rs:117-135`). The dialect's
  * real grammar gaps fail LOUDLY (date_trunc, FULL JOIN, the Morton
  * expansion's outer-reference scoping) rather than emitting text MySQL would
  * reject — the curated-subset contract every non-total dialect here keeps.
  */
class SqlUnparserMySqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)

  private lazy val m22My: String = session.transformSql(Semantic.m22Sql, "mysql")

  for (n <- Seq("m21", "m22", "m23")) {
    test(s"mysql golden: $n renders to the pinned text") {
      val sql = n match {
        case "m21" => Semantic.m21Sql
        case "m22" => Semantic.m22Sql
        case "m23" => Semantic.m23Sql
      }
      Goldens.assertGolden("mysql", n, session.transformSql(sql, "mysql"))
    }
  }

  test("doris routes through the mysql dialect (the reference's mapping)") {
    assert(session.transformSql(Semantic.m21Sql, "doris") ==
      session.transformSql(Semantic.m21Sql, "mysql"))
  }

  test("mysql dialect: backtick quoting, EXISTS semi joins, no NULLS keywords") {
    assert(m22My.contains("`orders`") && !m22My.contains("\"orders\""))
    assert(m22My.contains("WHERE EXISTS (SELECT 1 FROM"))
    assert(!m22My.contains("NULLS"), "MySQL has no NULLS FIRST/LAST syntax")
  }

  test("mysql dialect: non-native null placement emulates with an IS NULL prefix key") {
    val df = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select("o_orderkey", "o_orderstatus")
      .orderBy(org.apache.spark.sql.functions.col("o_orderkey").asc_nulls_last)
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val my = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.MySqlDialect)
    // ASC + NULLS LAST is non-native: emulated as `(x IS NULL) ASC, x ASC`
    assert(my.contains("IS NULL) ASC") && my.contains("ASC") && !my.contains("NULLS"), my)
    // the same ordering in the executable dialects keeps the explicit keyword
    val duck = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.DuckDbDialect)
    assert(duck.contains("ASC NULLS LAST"), duck)
  }

  test("mysql dialect: GROUP_CONCAT spelling, DIV integer division") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .groupBy("n_regionkey")
      .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("names"),
        expr("max(n_nationkey div 3)").as("q"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val my = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.MySqlDialect)
    assert(my.contains("GROUP_CONCAT(") && my.contains("SEPARATOR"), my)
    assert(my.contains(" DIV 3)"), my)
  }

  test("mysql dialect: date_trunc renders via DATE_FORMAT (no native date_trunc)") {
    val text = session.transformSql(Semantic.m24Sql, "mysql")
    assert(text.contains("DATE_FORMAT(") && text.contains("'%Y-%m-01 00:00:00'"),
      text)
    assert(!text.contains("date_trunc"), text)
    Goldens.assertGolden("mysql", "m24", text)
  }

  test("mysql dialect: FULL JOIN and the Morton expansion fail loudly") {
    val a = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet").select("n_nationkey")
    val b = spark.read.parquet(s"${TestSpark.sfDir}/region.parquet").select("r_regionkey")
    val fj = a.join(b, a("n_nationkey") === b("r_regionkey"), "full")
    val optimized = spark.sessionState.optimizer.execute(fj.queryExecution.analyzed)
    val e1 = intercept[UnsupportedOperationException] {
      SqlUnparser.unparse(optimized, fj.columns.toIndexedSeq, SqlUnparser.MySqlDialect)
    }
    assert(e1.getMessage.contains("FULL JOIN"))
    val e3 = intercept[UnsupportedOperationException] {
      session.transformSql(Semantic.m25Sql, "mysql") // zorder_key
    }
    assert(e3.getMessage.contains("zorder_key"))
  }

  test("mysql dialect: length maps to char_length (length() is bytes in MySQL)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(length(col("n_name")).as("l"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val my = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.MySqlDialect)
    assert(my.contains("char_length(") && !my.contains(" length("), my)
  }

  test("mysql dialect: every TPC-H query unparses (breadth parity with duckdb/postgres)") {
    val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
    val failures = TpcH.oracles.flatMap { case (n, sql) =>
      try { tpch.transformSql(sql, "mysql"); None }
      catch { case e: Exception => Some(s"$n: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("property sweep: the grammar generates (or refuses loudly) for mysql") {
    SqlUnparserPropertyGrammar.generationGate(
      spark, SqlUnparser.MySqlDialect, TestSpark.sfDir)
  }

  test("mysql dialect: null-safe equality spells <=> (no IS NOT DISTINCT FROM)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .filter(col("n_nationkey") <=> col("n_regionkey")).select("n_name")
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val my = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.MySqlDialect)
    assert(my.contains("<=>") && !my.contains("DISTINCT FROM"), my)
    val duck = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.DuckDbDialect)
    assert(duck.contains("IS NOT DISTINCT FROM"), duck)
  }
}
