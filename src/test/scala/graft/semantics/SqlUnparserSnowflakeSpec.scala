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

  private val m21Sf: String =
    """SELECT "c1" AS "cust_segment", "c2" AS "n", "c4" AS "rev" FROM (SELECT * FROM (SELECT "c1" AS "c1", count(*) AS "c2", CAST(sum("c3") AS FLOAT) AS "c4" FROM (SELECT "c3" AS "c3", "c5" AS "c1" FROM (SELECT * FROM (SELECT "c6" AS "c6", CAST("c8" AS NUMBER(18,2)) AS "c3" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c9", "o_custkey" AS "c6", "o_orderstatus" AS "c10", "o_totalprice" AS "c8", "o_orderdate" AS "c11", "o_orderpriority" AS "c12" FROM "orders") "t2" WHERE (("c9" IS NOT NULL) AND ("c9" <= 5000))) "t3") "t1" LEFT JOIN (SELECT "c7" AS "c7", "c5" AS "c5" FROM (SELECT * FROM (SELECT "c_custkey" AS "c7", "c_name" AS "c13", "c_nationkey" AS "c14", "c_acctbal" AS "c15", "c_mktsegment" AS "c5" FROM "customer") "t4" WHERE ("c7" IS NOT NULL)) "t5") "t6" ON ("c6" = "c7")) "t7") "t8" GROUP BY "c1") "t9" ORDER BY "c1" ASC NULLS FIRST) "t_out"""".stripMargin

  private val m22Sf: String =
    """SELECT "c1" AS "o_orderkey", "c3" AS "rn" FROM (SELECT * FROM (SELECT "c1" AS "c1", CAST("c2" AS NUMBER(38,0)) AS "c3" FROM (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "c4" ORDER BY "c1" ASC NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS "c2" FROM (SELECT "c1" AS "c1", "c4" AS "c4" FROM (SELECT "t1".* FROM (SELECT "c1" AS "c1", "c5" AS "c5", "c4" AS "c4" FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c5", "o_orderstatus" AS "c4", "o_totalprice" AS "c7", "o_orderdate" AS "c8", "o_orderpriority" AS "c9" FROM "orders") "t2") "t1" WHERE EXISTS (SELECT 1 FROM (SELECT "c6" AS "c6" FROM (SELECT * FROM (SELECT "c_custkey" AS "c6", "c_name" AS "c10", "c_nationkey" AS "c11", "c_acctbal" AS "c12", "c_mktsegment" AS "c13" FROM "customer") "t3" WHERE (("c12" IS NOT NULL) AND ("c12" > 5000.0))) "t4") "t5" WHERE ("c5" = "c6"))) "t6") "t7") "t8" WHERE ("c2" <= 3)) "t9") "t10" ORDER BY "c1" ASC NULLS FIRST) "t_out"""".stripMargin

  private val m23Sf: String =
    """SELECT "c1" AS "o_orderkey", "c3" AS "run3" FROM (SELECT * FROM (SELECT "c1" AS "c1", CAST("c2" AS FLOAT) AS "c3" FROM (SELECT *, sum("c4") OVER (PARTITION BY "c5" ORDER BY "c1" ASC NULLS FIRST ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS "c2" FROM (SELECT "c1" AS "c1", CAST("c6" AS NUMBER(18,2)) AS "c4", "c5" AS "c5" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c7", "o_orderstatus" AS "c5", "o_totalprice" AS "c6", "o_orderdate" AS "c8", "o_orderpriority" AS "c9" FROM "orders") "t1" WHERE (("c6" IS NOT NULL) AND ("c6" > (2.0 * (SELECT (sum("c10") / CAST(count(*) AS FLOAT)) AS "c11" FROM (SELECT "c10" AS "c10" FROM (SELECT "c_custkey" AS "c12", "c_name" AS "c13", "c_nationkey" AS "c14", "c_acctbal" AS "c10", "c_mktsegment" AS "c15" FROM "customer") "t2") "t3"))))) "t4") "t5") "t6") "t7" ORDER BY "c1" ASC NULLS FIRST LIMIT 50) "t_out"""".stripMargin

  private val m24Sf: String =
    """SELECT "c2" AS "mon", "c3" AS "n", "c5" AS "yr" FROM (SELECT * FROM (SELECT "c1" AS "c2", count(*) AS "c3", CAST(max(extract(year FROM "c4")) AS NUMBER(38,0)) AS "c5" FROM (SELECT "c4" AS "c4", CAST(date_trunc('month', CAST("c4" AS TIMESTAMP_NTZ)) AS DATE) AS "c1" FROM (SELECT CAST("c6" AS DATE) AS "c4" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c7", "o_custkey" AS "c8", "o_orderstatus" AS "c9", "o_totalprice" AS "c10", "o_orderdate" AS "c6", "o_orderpriority" AS "c11" FROM "orders") "t1" WHERE (("c6" IS NOT NULL) AND ("c6" >= TIMESTAMP '1996-01-01 00:00:00'))) "t2") "t3") "t4" GROUP BY "c1") "t5" ORDER BY "c2" ASC NULLS FIRST) "t_out"""".stripMargin

  for (n <- Seq("m21", "m22", "m23", "m24")) {
    test(s"snowflake golden: $n renders to the pinned text") {
      val (sql, pinned) = n match {
        case "m21" => (Semantic.m21Sql, m21Sf)
        case "m22" => (Semantic.m22Sql, m22Sf)
        case "m23" => (Semantic.m23Sql, m23Sf)
        case "m24" => (Semantic.m24Sql, m24Sf)
      }
      val text = session.transformSql(sql, "snowflake")
      assert(text == pinned, s"generated:\n$text\npinned:\n$pinned")
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

  test("property sweep: the 40-seed grammar generates for snowflake") {
    Seq("orders", "customer", "nation").foreach { t =>
      spark.read.parquet(s"${TestSpark.sfDir}/$t.parquet").createOrReplaceTempView(t)
    }
    val gen = new SqlUnparserPropertyGrammar
    for (seed <- 0 until 40) {
      val sql = gen.genQuery(seed)
      try {
        val df = spark.sql(sql)
        val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
        assert(SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
          SqlUnparser.SnowflakeDialect).startsWith("SELECT"))
      } catch {
        case e: Exception => throw new AssertionError(s"seed=$seed failed\n$sql", e)
      }
    }
  }
}
