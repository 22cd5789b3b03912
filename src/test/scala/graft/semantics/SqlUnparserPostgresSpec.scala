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

  private val m21Pg: String =
    """SELECT "c1" AS "cust_segment", "c2" AS "n", "c4" AS "rev" FROM (SELECT * FROM (SELECT "c1" AS "c1", count(*) AS "c2", CAST(sum("c3") AS DOUBLE PRECISION) AS "c4" FROM (SELECT "c3" AS "c3", "c5" AS "c1" FROM (SELECT * FROM (SELECT "c6" AS "c6", CAST("c8" AS NUMERIC(18,2)) AS "c3" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c9", "o_custkey" AS "c6", "o_orderstatus" AS "c10", "o_totalprice" AS "c8", "o_orderdate" AS "c11", "o_orderpriority" AS "c12" FROM "orders") "t2" WHERE (("c9" IS NOT NULL) AND ("c9" <= 5000))) "t3") "t1" LEFT JOIN (SELECT "c7" AS "c7", "c5" AS "c5" FROM (SELECT * FROM (SELECT "c_custkey" AS "c7", "c_name" AS "c13", "c_nationkey" AS "c14", "c_acctbal" AS "c15", "c_mktsegment" AS "c5" FROM "customer") "t4" WHERE ("c7" IS NOT NULL)) "t5") "t6" ON ("c6" = "c7")) "t7") "t8" GROUP BY "c1") "t9" ORDER BY "c1" ASC NULLS FIRST) "t_out"""".stripMargin

  private val m22Pg: String =
    """SELECT "c1" AS "o_orderkey", "c3" AS "rn" FROM (SELECT * FROM (SELECT "c1" AS "c1", CAST("c2" AS BIGINT) AS "c3" FROM (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "c4" ORDER BY "c1" ASC NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS "c2" FROM (SELECT "c1" AS "c1", "c4" AS "c4" FROM (SELECT "t1".* FROM (SELECT "c1" AS "c1", "c5" AS "c5", "c4" AS "c4" FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c5", "o_orderstatus" AS "c4", "o_totalprice" AS "c7", "o_orderdate" AS "c8", "o_orderpriority" AS "c9" FROM "orders") "t2") "t1" WHERE EXISTS (SELECT 1 FROM (SELECT "c6" AS "c6" FROM (SELECT * FROM (SELECT "c_custkey" AS "c6", "c_name" AS "c10", "c_nationkey" AS "c11", "c_acctbal" AS "c12", "c_mktsegment" AS "c13" FROM "customer") "t3" WHERE (("c12" IS NOT NULL) AND ("c12" > 5000.0))) "t4") "t5" WHERE ("c5" = "c6"))) "t6") "t7") "t8" WHERE ("c2" <= 3)) "t9") "t10" ORDER BY "c1" ASC NULLS FIRST) "t_out"""".stripMargin

  private val m23Pg: String =
    """SELECT "c1" AS "o_orderkey", "c3" AS "run3" FROM (SELECT * FROM (SELECT "c1" AS "c1", CAST("c2" AS DOUBLE PRECISION) AS "c3" FROM (SELECT *, sum("c4") OVER (PARTITION BY "c5" ORDER BY "c1" ASC NULLS FIRST ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS "c2" FROM (SELECT "c1" AS "c1", CAST("c6" AS NUMERIC(18,2)) AS "c4", "c5" AS "c5" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c7", "o_orderstatus" AS "c5", "o_totalprice" AS "c6", "o_orderdate" AS "c8", "o_orderpriority" AS "c9" FROM "orders") "t1" WHERE (("c6" IS NOT NULL) AND ("c6" > (2.0 * (SELECT (sum("c10") / CAST(count(*) AS DOUBLE PRECISION)) AS "c11" FROM (SELECT "c10" AS "c10" FROM (SELECT "c_custkey" AS "c12", "c_name" AS "c13", "c_nationkey" AS "c14", "c_acctbal" AS "c10", "c_mktsegment" AS "c15" FROM "customer") "t2") "t3"))))) "t4") "t5") "t6") "t7" ORDER BY "c1" ASC NULLS FIRST LIMIT 50) "t_out"""".stripMargin

  private val m24Pg: String =
    """SELECT "c2" AS "mon", "c3" AS "n", "c5" AS "yr" FROM (SELECT * FROM (SELECT "c1" AS "c2", count(*) AS "c3", CAST(max(extract(year FROM "c4")) AS BIGINT) AS "c5" FROM (SELECT "c4" AS "c4", CAST(date_trunc('month', CAST("c4" AS TIMESTAMP)) AS DATE) AS "c1" FROM (SELECT CAST("c6" AS DATE) AS "c4" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c7", "o_custkey" AS "c8", "o_orderstatus" AS "c9", "o_totalprice" AS "c10", "o_orderdate" AS "c6", "o_orderpriority" AS "c11" FROM "orders") "t1" WHERE (("c6" IS NOT NULL) AND ("c6" >= TIMESTAMP '1996-01-01 00:00:00'))) "t2") "t3") "t4" GROUP BY "c1") "t5" ORDER BY "c2" ASC NULLS FIRST) "t_out"""".stripMargin

  private val m25Pg: String =
    """SELECT "c1" AS "o_orderkey", "c3" AS "z" FROM (SELECT * FROM (SELECT "c1" AS "c1", (SELECT CAST(((("zb_d0" >> 0) & 1) << 0) + ((("zb_d0" >> 1) & 1) << 2) + ((("zb_d0" >> 2) & 1) << 4) + ((("zb_d0" >> 3) & 1) << 6) + ((("zb_d0" >> 4) & 1) << 8) + ((("zb_d0" >> 5) & 1) << 10) + ((("zb_d0" >> 6) & 1) << 12) + ((("zb_d0" >> 7) & 1) << 14) + ((("zb_d1" >> 0) & 1) << 1) + ((("zb_d1" >> 1) & 1) << 3) + ((("zb_d1" >> 2) & 1) << 5) + ((("zb_d1" >> 3) & 1) << 7) + ((("zb_d1" >> 4) & 1) << 9) + ((("zb_d1" >> 5) & 1) << 11) + ((("zb_d1" >> 6) & 1) << 13) + ((("zb_d1" >> 7) & 1) << 15) AS BIGINT) FROM (SELECT ((("c1" % 256)) & 255) AS "zb_d0", ((("c2" % 256)) & 255) AS "zb_d1") "zb") AS "c3" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c2", "o_orderstatus" AS "c4", "o_totalprice" AS "c5", "o_orderdate" AS "c6", "o_orderpriority" AS "c7" FROM "orders") "t1" WHERE (("c1" IS NOT NULL) AND ("c1" <= 2000))) "t2") "t3" ORDER BY "c1" ASC NULLS FIRST) "t_out"""".stripMargin

  for (n <- Seq("m21", "m22", "m23", "m24", "m25")) {
    test(s"postgres golden: $n renders to the pinned text") {
      val sql = n match {
        case "m21" => Semantic.m21Sql
        case "m22" => Semantic.m22Sql
        case "m23" => Semantic.m23Sql
        case "m24" => Semantic.m24Sql
        case "m25" => Semantic.m25Sql
      }
      val pinned = n match {
        case "m21" => m21Pg
        case "m22" => m22Pg
        case "m23" => m23Pg
        case "m24" => m24Pg
        case "m25" => m25Pg
      }
      val text = session.transformSql(sql, "postgres")
      assert(text == pinned, s"generated:\n$text\npinned:\n$pinned")
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
    assert(m21Pg.contains("CAST(sum(\"c3\") AS DOUBLE PRECISION)"))
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
    val duck = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.DuckDbDialect)
    assert(duck.contains("listagg(") && duck.contains("WITHIN GROUP"), duck)
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

  test("property sweep: the 40-seed grammar generates for both curated dialects") {
    Seq("orders", "customer", "nation").foreach { t =>
      spark.read.parquet(s"${TestSpark.sfDir}/$t.parquet").createOrReplaceTempView(t)
    }
    val gen = new SqlUnparserPropertyGrammar
    for (seed <- 0 until 40; dialect <- Seq(
        SqlUnparser.DuckDbDialect, SqlUnparser.PostgresDialect)) {
      val sql = gen.genQuery(seed)
      try {
        val df = spark.sql(sql)
        val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
        val text = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, dialect)
        assert(text.startsWith("SELECT"))
      } catch {
        case e: Exception =>
          throw new AssertionError(s"seed=$seed dialect=$dialect failed\n$sql", e)
      }
    }
  }
}
