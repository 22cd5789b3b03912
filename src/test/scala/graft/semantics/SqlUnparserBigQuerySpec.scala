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

  private val m21Bq: String =
    """SELECT `c1` AS `cust_segment`, `c2` AS `n`, `c4` AS `rev` FROM (SELECT * FROM (SELECT `c1` AS `c1`, count(*) AS `c2`, CAST(sum(`c3`) AS FLOAT64) AS `c4` FROM (SELECT `c3` AS `c3`, `c5` AS `c1` FROM (SELECT * FROM (SELECT `c6` AS `c6`, CAST(`c8` AS NUMERIC(18,2)) AS `c3` FROM (SELECT * FROM (SELECT `o_orderkey` AS `c9`, `o_custkey` AS `c6`, `o_orderstatus` AS `c10`, `o_totalprice` AS `c8`, `o_orderdate` AS `c11`, `o_orderpriority` AS `c12` FROM `orders`) `t2` WHERE ((`c9` IS NOT NULL) AND (`c9` <= 5000))) `t3`) `t1` LEFT JOIN (SELECT `c7` AS `c7`, `c5` AS `c5` FROM (SELECT * FROM (SELECT `c_custkey` AS `c7`, `c_name` AS `c13`, `c_nationkey` AS `c14`, `c_acctbal` AS `c15`, `c_mktsegment` AS `c5` FROM `customer`) `t4` WHERE (`c7` IS NOT NULL)) `t5`) `t6` ON (`c6` = `c7`)) `t7`) `t8` GROUP BY `c1`) `t9` ORDER BY `c1` ASC NULLS FIRST) `t_out`""".stripMargin

  private val m22Bq: String =
    """SELECT `c1` AS `o_orderkey`, `c3` AS `rn` FROM (SELECT * FROM (SELECT `c1` AS `c1`, CAST(`c2` AS INT64) AS `c3` FROM (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY `c4` ORDER BY `c1` ASC NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS `c2` FROM (SELECT `c1` AS `c1`, `c4` AS `c4` FROM (SELECT `t1`.* FROM (SELECT `c1` AS `c1`, `c5` AS `c5`, `c4` AS `c4` FROM (SELECT `o_orderkey` AS `c1`, `o_custkey` AS `c5`, `o_orderstatus` AS `c4`, `o_totalprice` AS `c7`, `o_orderdate` AS `c8`, `o_orderpriority` AS `c9` FROM `orders`) `t2`) `t1` WHERE EXISTS (SELECT 1 FROM (SELECT `c6` AS `c6` FROM (SELECT * FROM (SELECT `c_custkey` AS `c6`, `c_name` AS `c10`, `c_nationkey` AS `c11`, `c_acctbal` AS `c12`, `c_mktsegment` AS `c13` FROM `customer`) `t3` WHERE ((`c12` IS NOT NULL) AND (`c12` > 5000.0))) `t4`) `t5` WHERE (`c5` = `c6`))) `t6`) `t7`) `t8` WHERE (`c2` <= 3)) `t9`) `t10` ORDER BY `c1` ASC NULLS FIRST) `t_out`""".stripMargin

  private val m23Bq: String =
    """SELECT `c1` AS `o_orderkey`, `c3` AS `run3` FROM (SELECT * FROM (SELECT `c1` AS `c1`, CAST(`c2` AS FLOAT64) AS `c3` FROM (SELECT *, sum(`c4`) OVER (PARTITION BY `c5` ORDER BY `c1` ASC NULLS FIRST ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS `c2` FROM (SELECT `c1` AS `c1`, CAST(`c6` AS NUMERIC(18,2)) AS `c4`, `c5` AS `c5` FROM (SELECT * FROM (SELECT `o_orderkey` AS `c1`, `o_custkey` AS `c7`, `o_orderstatus` AS `c5`, `o_totalprice` AS `c6`, `o_orderdate` AS `c8`, `o_orderpriority` AS `c9` FROM `orders`) `t1` WHERE ((`c6` IS NOT NULL) AND (`c6` > (2.0 * (SELECT (sum(`c10`) / CAST(count(*) AS FLOAT64)) AS `c11` FROM (SELECT `c10` AS `c10` FROM (SELECT `c_custkey` AS `c12`, `c_name` AS `c13`, `c_nationkey` AS `c14`, `c_acctbal` AS `c10`, `c_mktsegment` AS `c15` FROM `customer`) `t2`) `t3`))))) `t4`) `t5`) `t6`) `t7` ORDER BY `c1` ASC NULLS FIRST LIMIT 50) `t_out`""".stripMargin

  private val m24Bq: String =
    """SELECT `c2` AS `mon`, `c3` AS `n`, `c5` AS `yr` FROM (SELECT * FROM (SELECT `c1` AS `c2`, count(*) AS `c3`, CAST(max(extract(year FROM `c4`)) AS INT64) AS `c5` FROM (SELECT `c4` AS `c4`, CAST(TIMESTAMP_TRUNC(CAST(`c4` AS TIMESTAMP), MONTH) AS DATE) AS `c1` FROM (SELECT CAST(`c6` AS DATE) AS `c4` FROM (SELECT * FROM (SELECT `o_orderkey` AS `c7`, `o_custkey` AS `c8`, `o_orderstatus` AS `c9`, `o_totalprice` AS `c10`, `o_orderdate` AS `c6`, `o_orderpriority` AS `c11` FROM `orders`) `t1` WHERE ((`c6` IS NOT NULL) AND (`c6` >= TIMESTAMP '1996-01-01 00:00:00'))) `t2`) `t3`) `t4` GROUP BY `c1`) `t5` ORDER BY `c2` ASC NULLS FIRST) `t_out`""".stripMargin

  for (n <- Seq("m21", "m22", "m23", "m24")) {
    test(s"bigquery golden: $n renders to the pinned text") {
      val (sql, pinned) = n match {
        case "m21" => (Semantic.m21Sql, m21Bq)
        case "m22" => (Semantic.m22Sql, m22Bq)
        case "m23" => (Semantic.m23Sql, m23Bq)
        case "m24" => (Semantic.m24Sql, m24Bq)
      }
      val text = session.transformSql(sql, "bigquery")
      assert(text == pinned, s"generated:\n$text\npinned:\n$pinned")
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

  test("property sweep: the 40-seed grammar generates for bigquery") {
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
          SqlUnparser.BigQueryDialect).startsWith("SELECT"))
      } catch {
        case e: Exception => throw new AssertionError(s"seed=$seed failed\n$sql", e)
      }
    }
  }
}
