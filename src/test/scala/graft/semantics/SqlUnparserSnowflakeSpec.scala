package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.{Semantic, TpcH}

/** Snowflake-dialect unparser gates — seventh dialect (the reference's
  * SnowflakeDialect, `inner_dialect.rs:421-427`). Near-ANSI, so the curated
  * surface is broad; the real spelling differences (NUMBER types, DATEADD,
  * TRUNC-based integer division over exact NUMBER arithmetic, native
  * STARTSWITH/ENDSWITH/CONTAINS) are pinned here. Snapshot posture as for
  * every backend without a live server in this sandbox.
  */
class SqlUnparserSnowflakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)

  private lazy val m21Sf: String = session.transformSql(Semantic.m21Sql, "snowflake")
  private lazy val m22Sf: String = session.transformSql(Semantic.m22Sql, "snowflake")

  for (n <- Seq("m21", "m22", "m23", "m24")) {
    test(s"snowflake golden: $n renders to the pinned text") {
      val sql = n match {
        case "m21" => Semantic.m21Sql
        case "m22" => Semantic.m22Sql
        case "m23" => Semantic.m23Sql
        case "m24" => Semantic.m24Sql
      }
      Goldens.assertGolden("snowflake", n, session.transformSql(sql, "snowflake"))
    }
  }

  test("snowflake dialect: NUMBER types, EXISTS semi joins, WITHIN GROUP listagg") {
    assert(m21Sf.contains("NUMBER(18,2)") && m21Sf.contains("AS FLOAT)"))
    assert(m22Sf.contains("WHERE EXISTS (SELECT 1 FROM"))
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .groupBy("n_regionkey")
      .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("names"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val sf = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
      SqlUnparser.SnowflakeDialect)
    assert(sf.contains("listagg(") && sf.contains("WITHIN GROUP"), sf)
  }

  test("snowflake dialect: instr reverses into POSITION(needle, haystack)") {
    // Snowflake's POSITION takes the needle FIRST; the generic child-order
    // fallback would emit position(haystack, needle) and search swapped
    val sf = session.transformSql(
      "SELECT instr(o_orderstatus, 'O') AS p FROM m_orders WHERE o_orderkey <= 5",
      "snowflake")
    assert(sf.contains("position('O',"), sf)
    assert(!sf.contains("position(\"c"), sf)
  }

  test("snowflake dialect: DATEADD date arithmetic and TRUNC-based integer division") {
    import org.apache.spark.sql.functions._
    val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
    val q4 = tpch.transformSql(TpcH.oracles("tpch_q4"), "snowflake")
    assert(q4.contains("DATEADD(day, 60,"), s"date+interval must render as DATEADD:\n$q4")
    val df = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select(expr("o_orderkey div 7").as("q"), md5(col("o_orderstatus")).as("h"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val sf = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
      SqlUnparser.SnowflakeDialect)
    assert(sf.contains("CAST(TRUNC(") && sf.contains("/ 7)"), sf)
    // Snowflake MD5 already returns hex text like Spark's
    assert(sf.contains("md5(") && !sf.contains("TO_HEX"), sf)
  }

  test("snowflake dialect: Morton expansion fails loudly; every TPC-H query unparses") {
    val e = intercept[UnsupportedOperationException] {
      session.transformSql(Semantic.m25Sql, "snowflake")
    }
    assert(e.getMessage.contains("zorder_key"))
    val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
    val failures = TpcH.oracles.flatMap { case (n, sql) =>
      try { tpch.transformSql(sql, "snowflake"); None }
      catch { case ex: Exception => Some(s"$n: ${ex.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("property sweep: the grammar generates (or refuses loudly) for snowflake") {
    SqlUnparserPropertyGrammar.generationGate(
      spark, SqlUnparser.SnowflakeDialect, TestSpark.sfDir)
  }
}
