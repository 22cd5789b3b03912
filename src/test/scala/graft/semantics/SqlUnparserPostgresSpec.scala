package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.{Semantic, TpcH}

/** Postgres-dialect unparser gates. No Postgres server exists in this sandbox,
  * so the proof posture is the reference's own for its 20 backend dialects —
  * pinned-text snapshot goldens (`wren-core/core/src/mdl/mod.rs:648+`) plus
  * structural assertions on the dialect-specific renderings
  * (`inner_dialect.rs:110-212`: quoting, function spellings, extract style):
  *
  *   - the m21-m25 cross-engine corpus (DuckDB-EXECUTED by the driver gate)
  *     renders to pinned Postgres texts — NUMERIC/DOUBLE PRECISION type
  *     spellings, EXISTS-style semi joins, extract(... FROM ...);
  *   - every TPC-H query unparses (breadth parity with the duckdb dialect);
  *   - the property grammar's 40 seeds generate for BOTH curated dialects —
  *     the combinatorial space between the pinned shapes stays covered.
  */
class SqlUnparserPostgresSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)

  // generated once per suite; pinned verbatim as resource goldens
  // (src/test/resources/goldens/postgres/*.sql — see Goldens.assertGolden)
  private lazy val m21Pg: String = session.transformSql(Semantic.m21Sql, "postgres")
  private lazy val m22Pg: String = session.transformSql(Semantic.m22Sql, "postgres")
  private lazy val m24Pg: String = session.transformSql(Semantic.m24Sql, "postgres")

  for (n <- Seq("m21", "m22", "m23", "m24", "m25")) {
    test(s"postgres golden: $n renders to the pinned text") {
      val sql = n match {
        case "m21" => Semantic.m21Sql
        case "m22" => Semantic.m22Sql
        case "m23" => Semantic.m23Sql
        case "m24" => Semantic.m24Sql
        case "m25" => Semantic.m25Sql
      }
      Goldens.assertGolden("postgres", n, session.transformSql(sql, "postgres"))
    }
  }

  test("postgres dialect: semi joins render as EXISTS, anti as NOT EXISTS") {
    assert(m22Pg.contains("WHERE EXISTS (SELECT 1 FROM"),
      "the IN-subquery semi join must render as a correlated EXISTS")
    assert(!m22Pg.toUpperCase.contains("SEMI JOIN"))
    val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
    val q16 = tpch.transformSql(TpcH.oracles("tpch_q16"), "postgres")
    assert(q16.contains("NOT EXISTS (SELECT 1 FROM"),
      s"NOT IN must render as NOT EXISTS:\n$q16")
    assert(!q16.toUpperCase.contains("ANTI JOIN"))
  }

  test("postgres dialect: type spellings (DOUBLE PRECISION / NUMERIC)") {
    // the inner NUMERIC cast is the aggregate type-fidelity repair: Postgres
    // widens decimal SUM, so the call is cast back to Spark's result type
    // before the user's double cast
    assert(m21Pg.contains("CAST(CAST(sum(\"c3\") AS NUMERIC(28,2)) AS DOUBLE PRECISION)"))
    assert(m21Pg.contains("NUMERIC(18,2)"))
    assert(!m21Pg.contains("AS DOUBLE)"))
  }

  test("postgres dialect: extract style and date arithmetic") {
    assert(m24Pg.contains("extract(year FROM"))
    val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
    // q4's folded date+interval lateness must render as DATE + INTEGER days
    val q4 = tpch.transformSql(TpcH.oracles("tpch_q4"), "postgres")
    assert(q4.contains("+ 60)"), s"date_add must render as date + days:\n$q4")
  }

  test("postgres dialect: every TPC-H query unparses (breadth parity with duckdb)") {
    val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
    val failures = TpcH.oracles.flatMap { case (n, sql) =>
      try { tpch.transformSql(sql, "postgres"); None }
      catch { case e: Exception => Some(s"$n: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("postgres dialect: string_agg spelling for ordered string aggregation") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .groupBy("n_regionkey")
      .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("names"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val pg = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.PostgresDialect)
    assert(pg.contains("string_agg(") && pg.contains("ORDER BY"), pg)
    assert(!pg.contains("WITHIN GROUP"), pg)
    // DuckDB's listagg is a bare string_agg alias with NO WITHIN GROUP parse
    // (checked on 1.0.0) — both executable dialects use the inline ORDER BY
    val duck = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.DuckDbDialect)
    assert(duck.contains("string_agg(") && duck.contains("ORDER BY") &&
      !duck.contains("WITHIN GROUP"), duck)
  }

  test("integral division renders per dialect (Spark's `div` keyword parses nowhere else)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select(expr("o_orderkey div 7").as("q"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val duck = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.DuckDbDialect)
    // DuckDB's `//` truncates toward zero like Spark's div (checked -7 // 2 = -3)
    assert(duck.contains(" // 7)") && !duck.contains(" div "), duck)
    val pg = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.PostgresDialect)
    assert(pg.contains("CAST(div(") && !pg.contains(" div 7"), pg)
    val sp = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.SparkDialect)
    assert(spark.sql(sp).collect().map(_.getLong(0)).sorted.toSeq ==
      df.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("property sweep: the grammar generates (or refuses loudly) for both curated dialects") {
    SqlUnparserPropertyGrammar.generationGate(
      spark, SqlUnparser.DuckDbDialect, TestSpark.sfDir)
    SqlUnparserPropertyGrammar.generationGate(
      spark, SqlUnparser.PostgresDialect, TestSpark.sfDir)
  }
}
