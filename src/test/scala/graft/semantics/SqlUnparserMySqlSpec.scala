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

  private val m21My: String =
    """SELECT `c1` AS `cust_segment`, `c2` AS `n`, `c4` AS `rev` FROM (SELECT * FROM (SELECT `c1` AS `c1`, count(*) AS `c2`, CAST(sum(`c3`) AS DOUBLE) AS `c4` FROM (SELECT `c3` AS `c3`, `c5` AS `c1` FROM (SELECT * FROM (SELECT `c6` AS `c6`, CAST(`c8` AS DECIMAL(18,2)) AS `c3` FROM (SELECT * FROM (SELECT `o_orderkey` AS `c9`, `o_custkey` AS `c6`, `o_orderstatus` AS `c10`, `o_totalprice` AS `c8`, `o_orderdate` AS `c11`, `o_orderpriority` AS `c12` FROM `orders`) `t2` WHERE ((`c9` IS NOT NULL) AND (`c9` <= 5000))) `t3`) `t1` LEFT JOIN (SELECT `c7` AS `c7`, `c5` AS `c5` FROM (SELECT * FROM (SELECT `c_custkey` AS `c7`, `c_name` AS `c13`, `c_nationkey` AS `c14`, `c_acctbal` AS `c15`, `c_mktsegment` AS `c5` FROM `customer`) `t4` WHERE (`c7` IS NOT NULL)) `t5`) `t6` ON (`c6` = `c7`)) `t7`) `t8` GROUP BY `c1`) `t9` ORDER BY `c1` ASC) `t_out`""".stripMargin

  private val m22My: String =
    """SELECT `c1` AS `o_orderkey`, `c3` AS `rn` FROM (SELECT * FROM (SELECT `c1` AS `c1`, CAST(`c2` AS SIGNED) AS `c3` FROM (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY `c4` ORDER BY `c1` ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS `c2` FROM (SELECT `c1` AS `c1`, `c4` AS `c4` FROM (SELECT `t1`.* FROM (SELECT `c1` AS `c1`, `c5` AS `c5`, `c4` AS `c4` FROM (SELECT `o_orderkey` AS `c1`, `o_custkey` AS `c5`, `o_orderstatus` AS `c4`, `o_totalprice` AS `c7`, `o_orderdate` AS `c8`, `o_orderpriority` AS `c9` FROM `orders`) `t2`) `t1` WHERE EXISTS (SELECT 1 FROM (SELECT `c6` AS `c6` FROM (SELECT * FROM (SELECT `c_custkey` AS `c6`, `c_name` AS `c10`, `c_nationkey` AS `c11`, `c_acctbal` AS `c12`, `c_mktsegment` AS `c13` FROM `customer`) `t3` WHERE ((`c12` IS NOT NULL) AND (`c12` > 5000.0))) `t4`) `t5` WHERE (`c5` = `c6`))) `t6`) `t7`) `t8` WHERE (`c2` <= 3)) `t9`) `t10` ORDER BY `c1` ASC) `t_out`""".stripMargin

  private val m23My: String =
    """SELECT `c1` AS `o_orderkey`, `c3` AS `run3` FROM (SELECT * FROM (SELECT `c1` AS `c1`, CAST(`c2` AS DOUBLE) AS `c3` FROM (SELECT *, sum(`c4`) OVER (PARTITION BY `c5` ORDER BY `c1` ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS `c2` FROM (SELECT `c1` AS `c1`, CAST(`c6` AS DECIMAL(18,2)) AS `c4`, `c5` AS `c5` FROM (SELECT * FROM (SELECT `o_orderkey` AS `c1`, `o_custkey` AS `c7`, `o_orderstatus` AS `c5`, `o_totalprice` AS `c6`, `o_orderdate` AS `c8`, `o_orderpriority` AS `c9` FROM `orders`) `t1` WHERE ((`c6` IS NOT NULL) AND (`c6` > (2.0 * (SELECT (sum(`c10`) / CAST(count(*) AS DOUBLE)) AS `c11` FROM (SELECT `c10` AS `c10` FROM (SELECT `c_custkey` AS `c12`, `c_name` AS `c13`, `c_nationkey` AS `c14`, `c_acctbal` AS `c10`, `c_mktsegment` AS `c15` FROM `customer`) `t2`) `t3`))))) `t4`) `t5`) `t6`) `t7` ORDER BY `c1` ASC LIMIT 50) `t_out`""".stripMargin

  for (n <- Seq("m21", "m22", "m23")) {
    test(s"mysql golden: $n renders to the pinned text") {
      val (sql, pinned) = n match {
        case "m21" => (Semantic.m21Sql, m21My)
        case "m22" => (Semantic.m22Sql, m22My)
        case "m23" => (Semantic.m23Sql, m23My)
      }
      val text = session.transformSql(sql, "mysql")
      assert(text == pinned, s"generated:\n$text\npinned:\n$pinned")
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

  test("mysql dialect: FULL JOIN, date_trunc, and the Morton expansion fail loudly") {
    val a = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet").select("n_nationkey")
    val b = spark.read.parquet(s"${TestSpark.sfDir}/region.parquet").select("r_regionkey")
    val fj = a.join(b, a("n_nationkey") === b("r_regionkey"), "full")
    val optimized = spark.sessionState.optimizer.execute(fj.queryExecution.analyzed)
    val e1 = intercept[UnsupportedOperationException] {
      SqlUnparser.unparse(optimized, fj.columns.toIndexedSeq, SqlUnparser.MySqlDialect)
    }
    assert(e1.getMessage.contains("FULL JOIN"))
    val e2 = intercept[UnsupportedOperationException] {
      session.transformSql(Semantic.m24Sql, "mysql") // date_trunc
    }
    assert(e2.getMessage.contains("date_trunc"))
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

  test("property sweep: the 40-seed grammar generates for mysql") {
    Seq("orders", "customer", "nation").foreach { t =>
      spark.read.parquet(s"${TestSpark.sfDir}/$t.parquet").createOrReplaceTempView(t)
    }
    val gen = new SqlUnparserPropertyGrammar
    for (seed <- 0 until 40) {
      val sql = gen.genQuery(seed)
      try {
        val df = spark.sql(sql)
        val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
        val text = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
          SqlUnparser.MySqlDialect)
        assert(text.startsWith("SELECT"))
      } catch {
        case e: Exception => throw new AssertionError(s"seed=$seed failed\n$sql", e)
      }
    }
  }
}
