package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.{Semantic, TpcH}

/** SQL Server and Oracle unparser gates — eighth and ninth dialects, closing
  * the reference's named InnerDialect list (`inner_dialect.rs:383-418`).
  * Their grammar gaps exercise the renderer hooks the other dialects did not:
  * LIMIT spellings (OFFSET/FETCH with a mandatory ORDER BY on SQL Server,
  * FETCH FIRST on Oracle), FROM-less SELECTs (Oracle's dual), a modulo
  * GRAMMAR gap (Oracle has no `%`), reversed CHARINDEX argument order, and
  * CASE-based null-placement sort keys (T-SQL has no boolean-valued sort
  * expressions). Snapshot posture.
  */
class SqlUnparserMssqlOracleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)

  private val m21Ms: String =
    """SELECT "c1" AS "cust_segment", "c2" AS "n", "c4" AS "rev" FROM (SELECT * FROM (SELECT "c1" AS "c1", count(*) AS "c2", CAST(sum("c3") AS FLOAT) AS "c4" FROM (SELECT "c3" AS "c3", "c5" AS "c1" FROM (SELECT * FROM (SELECT "c6" AS "c6", CAST("c8" AS DECIMAL(18,2)) AS "c3" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c9", "o_custkey" AS "c6", "o_orderstatus" AS "c10", "o_totalprice" AS "c8", "o_orderdate" AS "c11", "o_orderpriority" AS "c12" FROM "orders") "t2" WHERE (("c9" IS NOT NULL) AND ("c9" <= 5000))) "t3") "t1" LEFT JOIN (SELECT "c7" AS "c7", "c5" AS "c5" FROM (SELECT * FROM (SELECT "c_custkey" AS "c7", "c_name" AS "c13", "c_nationkey" AS "c14", "c_acctbal" AS "c15", "c_mktsegment" AS "c5" FROM "customer") "t4" WHERE ("c7" IS NOT NULL)) "t5") "t6" ON ("c6" = "c7")) "t7") "t8" GROUP BY "c1") "t9" ORDER BY "c1" ASC) "t_out"""".stripMargin

  private val m22Ms: String =
    """SELECT "c1" AS "o_orderkey", "c3" AS "rn" FROM (SELECT * FROM (SELECT "c1" AS "c1", CAST("c2" AS BIGINT) AS "c3" FROM (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "c4" ORDER BY "c1" ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS "c2" FROM (SELECT "c1" AS "c1", "c4" AS "c4" FROM (SELECT "t1".* FROM (SELECT "c1" AS "c1", "c5" AS "c5", "c4" AS "c4" FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c5", "o_orderstatus" AS "c4", "o_totalprice" AS "c7", "o_orderdate" AS "c8", "o_orderpriority" AS "c9" FROM "orders") "t2") "t1" WHERE EXISTS (SELECT 1 FROM (SELECT "c6" AS "c6" FROM (SELECT * FROM (SELECT "c_custkey" AS "c6", "c_name" AS "c10", "c_nationkey" AS "c11", "c_acctbal" AS "c12", "c_mktsegment" AS "c13" FROM "customer") "t3" WHERE (("c12" IS NOT NULL) AND ("c12" > 5000.0))) "t4") "t5" WHERE ("c5" = "c6"))) "t6") "t7") "t8" WHERE ("c2" <= 3)) "t9") "t10" ORDER BY "c1" ASC) "t_out"""".stripMargin

  private val m23Ms: String =
    """SELECT "c1" AS "o_orderkey", "c3" AS "run3" FROM (SELECT * FROM (SELECT "c1" AS "c1", CAST("c2" AS FLOAT) AS "c3" FROM (SELECT *, sum("c4") OVER (PARTITION BY "c5" ORDER BY "c1" ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS "c2" FROM (SELECT "c1" AS "c1", CAST("c6" AS DECIMAL(18,2)) AS "c4", "c5" AS "c5" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c7", "o_orderstatus" AS "c5", "o_totalprice" AS "c6", "o_orderdate" AS "c8", "o_orderpriority" AS "c9" FROM "orders") "t1" WHERE (("c6" IS NOT NULL) AND ("c6" > (2.0 * (SELECT (sum("c10") / CAST(count(*) AS FLOAT)) AS "c11" FROM (SELECT "c10" AS "c10" FROM (SELECT "c_custkey" AS "c12", "c_name" AS "c13", "c_nationkey" AS "c14", "c_acctbal" AS "c10", "c_mktsegment" AS "c15" FROM "customer") "t2") "t3"))))) "t4") "t5") "t6") "t7" ORDER BY "c1" ASC OFFSET 0 ROWS FETCH NEXT 50 ROWS ONLY) "t_out"""".stripMargin

  private val m24Ms: String =
    """SELECT "c2" AS "mon", "c3" AS "n", "c5" AS "yr" FROM (SELECT * FROM (SELECT "c1" AS "c2", count(*) AS "c3", CAST(max(DATEPART(year, "c4")) AS BIGINT) AS "c5" FROM (SELECT "c4" AS "c4", CAST(DATETRUNC(month, CAST("c4" AS DATETIME2(6))) AS DATE) AS "c1" FROM (SELECT CAST("c6" AS DATE) AS "c4" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c7", "o_custkey" AS "c8", "o_orderstatus" AS "c9", "o_totalprice" AS "c10", "o_orderdate" AS "c6", "o_orderpriority" AS "c11" FROM "orders") "t1" WHERE (("c6" IS NOT NULL) AND ("c6" >= CAST('1996-01-01 00:00:00' AS DATETIME2(6))))) "t2") "t3") "t4" GROUP BY "c1") "t5" ORDER BY "c2" ASC) "t_out"""".stripMargin

  private val m21Or: String =
    """SELECT "c1" AS "cust_segment", "c2" AS "n", "c4" AS "rev" FROM (SELECT * FROM (SELECT "c1" AS "c1", count(*) AS "c2", CAST(sum("c3") AS BINARY_DOUBLE) AS "c4" FROM (SELECT "c3" AS "c3", "c5" AS "c1" FROM (SELECT * FROM (SELECT "c6" AS "c6", CAST("c8" AS NUMBER(18,2)) AS "c3" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c9", "o_custkey" AS "c6", "o_orderstatus" AS "c10", "o_totalprice" AS "c8", "o_orderdate" AS "c11", "o_orderpriority" AS "c12" FROM "orders") "t2" WHERE (("c9" IS NOT NULL) AND ("c9" <= 5000))) "t3") "t1" LEFT JOIN (SELECT "c7" AS "c7", "c5" AS "c5" FROM (SELECT * FROM (SELECT "c_custkey" AS "c7", "c_name" AS "c13", "c_nationkey" AS "c14", "c_acctbal" AS "c15", "c_mktsegment" AS "c5" FROM "customer") "t4" WHERE ("c7" IS NOT NULL)) "t5") "t6" ON ("c6" = "c7")) "t7") "t8" GROUP BY "c1") "t9" ORDER BY "c1" ASC NULLS FIRST) "t_out"""".stripMargin

  private val m22Or: String =
    """SELECT "c1" AS "o_orderkey", "c3" AS "rn" FROM (SELECT * FROM (SELECT "c1" AS "c1", CAST("c2" AS NUMBER(19,0)) AS "c3" FROM (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "c4" ORDER BY "c1" ASC NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS "c2" FROM (SELECT "c1" AS "c1", "c4" AS "c4" FROM (SELECT "t1".* FROM (SELECT "c1" AS "c1", "c5" AS "c5", "c4" AS "c4" FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c5", "o_orderstatus" AS "c4", "o_totalprice" AS "c7", "o_orderdate" AS "c8", "o_orderpriority" AS "c9" FROM "orders") "t2") "t1" WHERE EXISTS (SELECT 1 FROM (SELECT "c6" AS "c6" FROM (SELECT * FROM (SELECT "c_custkey" AS "c6", "c_name" AS "c10", "c_nationkey" AS "c11", "c_acctbal" AS "c12", "c_mktsegment" AS "c13" FROM "customer") "t3" WHERE (("c12" IS NOT NULL) AND ("c12" > 5000.0))) "t4") "t5" WHERE ("c5" = "c6"))) "t6") "t7") "t8" WHERE ("c2" <= 3)) "t9") "t10" ORDER BY "c1" ASC NULLS FIRST) "t_out"""".stripMargin

  private val m23Or: String =
    """SELECT "c1" AS "o_orderkey", "c3" AS "run3" FROM (SELECT * FROM (SELECT "c1" AS "c1", CAST("c2" AS BINARY_DOUBLE) AS "c3" FROM (SELECT *, sum("c4") OVER (PARTITION BY "c5" ORDER BY "c1" ASC NULLS FIRST ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS "c2" FROM (SELECT "c1" AS "c1", CAST("c6" AS NUMBER(18,2)) AS "c4", "c5" AS "c5" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c7", "o_orderstatus" AS "c5", "o_totalprice" AS "c6", "o_orderdate" AS "c8", "o_orderpriority" AS "c9" FROM "orders") "t1" WHERE (("c6" IS NOT NULL) AND ("c6" > (2.0 * (SELECT (sum("c10") / CAST(count(*) AS BINARY_DOUBLE)) AS "c11" FROM (SELECT "c10" AS "c10" FROM (SELECT "c_custkey" AS "c12", "c_name" AS "c13", "c_nationkey" AS "c14", "c_acctbal" AS "c10", "c_mktsegment" AS "c15" FROM "customer") "t2") "t3"))))) "t4") "t5") "t6") "t7" ORDER BY "c1" ASC NULLS FIRST FETCH FIRST 50 ROWS ONLY) "t_out"""".stripMargin

  private val m24Or: String =
    """SELECT "c2" AS "mon", "c3" AS "n", "c5" AS "yr" FROM (SELECT * FROM (SELECT "c1" AS "c2", count(*) AS "c3", CAST(max(extract(year FROM "c4")) AS NUMBER(19,0)) AS "c5" FROM (SELECT "c4" AS "c4", CAST(TRUNC(CAST("c4" AS TIMESTAMP), 'MM') AS DATE) AS "c1" FROM (SELECT CAST("c6" AS DATE) AS "c4" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c7", "o_custkey" AS "c8", "o_orderstatus" AS "c9", "o_totalprice" AS "c10", "o_orderdate" AS "c6", "o_orderpriority" AS "c11" FROM "orders") "t1" WHERE (("c6" IS NOT NULL) AND ("c6" >= TIMESTAMP '1996-01-01 00:00:00'))) "t2") "t3") "t4" GROUP BY "c1") "t5" ORDER BY "c2" ASC NULLS FIRST) "t_out"""".stripMargin

  for ((d, pins) <- Seq(
      "mssql" -> Map("m21" -> m21Ms, "m22" -> m22Ms, "m23" -> m23Ms, "m24" -> m24Ms),
      "oracle" -> Map("m21" -> m21Or, "m22" -> m22Or, "m23" -> m23Or, "m24" -> m24Or));
      n <- Seq("m21", "m22", "m23", "m24")) {
    test(s"$d golden: $n renders to the pinned text") {
      val sql = n match {
        case "m21" => Semantic.m21Sql
        case "m22" => Semantic.m22Sql
        case "m23" => Semantic.m23Sql
        case "m24" => Semantic.m24Sql
      }
      val text = session.transformSql(sql, d)
      assert(text == pins(n), s"generated:\n$text\npinned:\n${pins(n)}")
    }
  }

  test("mssql dialect: OFFSET/FETCH limits with the mandatory ORDER BY stub") {
    assert(m23Ms.contains("OFFSET 0 ROWS FETCH NEXT 50 ROWS ONLY"), m23Ms)
    assert(!m23Ms.contains("LIMIT"))
    // a limit with NO order must synthesize the (SELECT NULL) stub
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet").limit(3)
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val ms = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.MsSqlDialect)
    assert(ms.contains("ORDER BY (SELECT NULL) OFFSET 0 ROWS FETCH NEXT 3 ROWS ONLY"), ms)
  }

  test("mssql dialect: DATEPART accessors, CHARINDEX reversed args, typed literals") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select(year(col("o_orderdate").cast("date")).as("y"),
        expr("instr(o_orderstatus, 'F')").as("i"))
      .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val ms = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.MsSqlDialect)
    assert(ms.contains("DATEPART(year,"), ms)
    assert(ms.contains("CHARINDEX('F',"), "instr must reverse into CHARINDEX(needle, haystack)")
    // the filter folds to a timestamp comparison; either typed-cast form is
    // the point — T-SQL has no DATE/TIMESTAMP literal introducers
    assert(ms.contains("CAST('1996-01-01 00:00:00' AS DATETIME2(6))") ||
      ms.contains("CAST('1996-01-01' AS DATE)"), ms)
    assert(!ms.contains("TIMESTAMP '") && !ms.contains("DATE '"), ms)
  }

  test("mssql dialect: non-native null placement uses a CASE sort key (no boolean sorts in T-SQL)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select("o_orderkey").orderBy(col("o_orderkey").asc_nulls_last)
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val ms = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.MsSqlDialect)
    assert(ms.contains("CASE WHEN") && ms.contains("IS NULL THEN 1 ELSE 0 END) ASC"), ms)
    assert(!ms.contains("NULLS"))
  }

  test("oracle dialect: FROM dual, FETCH FIRST, no modulo operator") {
    assert(m23Or.contains("FETCH FIRST 50 ROWS ONLY") && !m23Or.contains("LIMIT"), m23Or)
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select((lit(7) % lit(3)).as("m"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    // constant folding may collapse the literal %; use a column instead
    val df2 = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select((col("o_orderkey") % 5).as("m")).limit(4)
    val opt2 = spark.sessionState.optimizer.execute(df2.queryExecution.analyzed)
    val or2 = SqlUnparser.unparse(opt2, df2.columns.toIndexedSeq, SqlUnparser.OracleDialect)
    assert(or2.contains("MOD(") && !or2.contains("%"), or2)
    val one = spark.sql("SELECT 1 AS x")
    val opt3 = spark.sessionState.optimizer.execute(one.queryExecution.analyzed)
    val or3 = SqlUnparser.unparse(opt3, one.columns.toIndexedSeq, SqlUnparser.OracleDialect)
    assert(or3.contains("FROM dual"), or3)
  }

  test("oracle dialect: n-ary concat folds to ||, TRUNC format models, hex MD5") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(concat(col("n_name"), lit("_"), col("n_name")).as("c"),
        md5(col("n_name")).as("h"),
        date_trunc("month", lit("2024-03-15").cast("timestamp")).as("t"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val or = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.OracleDialect)
    assert(or.contains(" || "), or)
    assert(or.contains("LOWER(RAWTOHEX(STANDARD_HASH(") && or.contains("'MD5'"), or)
  }

  for (d <- Seq("mssql", "oracle")) {
    test(s"$d dialect: every TPC-H query unparses (breadth parity)") {
      val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
      val failures = TpcH.oracles.flatMap { case (n, sql) =>
        try { tpch.transformSql(sql, d); None }
        catch { case e: Exception => Some(s"$n: ${e.getMessage}") }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    }

    test(s"property sweep: the 40-seed grammar generates for $d") {
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
            SqlUnparser.dialectFor(d)).startsWith("SELECT"))
        } catch {
          case e: Exception => throw new AssertionError(s"seed=$seed failed\n$sql", e)
        }
      }
    }
  }
}
