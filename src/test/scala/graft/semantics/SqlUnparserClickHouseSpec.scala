package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.{Semantic, TpcH}

/** ClickHouse-dialect unparser gates — sixth dialect; the reference's
  * ClickHouseDialect is its most override-heavy backend (native camelCase
  * date functions with the day-of-week modulo adjustment,
  * `inner_dialect.rs:452-540`). Pinned goldens + structural assertions +
  * generation breadth + the property sweep, the snapshot posture every
  * backend gets.
  */
class SqlUnparserClickHouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)

  private val m21Ch: String =
    """SELECT `c1` AS `cust_segment`, `c2` AS `n`, `c4` AS `rev` FROM (SELECT * FROM (SELECT `c1` AS `c1`, count(*) AS `c2`, CAST(sum(`c3`) AS Float64) AS `c4` FROM (SELECT `c3` AS `c3`, `c5` AS `c1` FROM (SELECT * FROM (SELECT `c6` AS `c6`, CAST(`c8` AS Decimal(18,2)) AS `c3` FROM (SELECT * FROM (SELECT `o_orderkey` AS `c9`, `o_custkey` AS `c6`, `o_orderstatus` AS `c10`, `o_totalprice` AS `c8`, `o_orderdate` AS `c11`, `o_orderpriority` AS `c12` FROM `orders`) `t2` WHERE ((`c9` IS NOT NULL) AND (`c9` <= 5000))) `t3`) `t1` LEFT JOIN (SELECT `c7` AS `c7`, `c5` AS `c5` FROM (SELECT * FROM (SELECT `c_custkey` AS `c7`, `c_name` AS `c13`, `c_nationkey` AS `c14`, `c_acctbal` AS `c15`, `c_mktsegment` AS `c5` FROM `customer`) `t4` WHERE (`c7` IS NOT NULL)) `t5`) `t6` ON (`c6` = `c7`)) `t7`) `t8` GROUP BY `c1`) `t9` ORDER BY `c1` ASC NULLS FIRST) `t_out`""".stripMargin

  private val m22Ch: String =
    """SELECT `c1` AS `o_orderkey`, `c3` AS `rn` FROM (SELECT * FROM (SELECT `c1` AS `c1`, CAST(`c2` AS Int64) AS `c3` FROM (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY `c4` ORDER BY `c1` ASC NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS `c2` FROM (SELECT `c1` AS `c1`, `c4` AS `c4` FROM (SELECT `t1`.* FROM (SELECT `c1` AS `c1`, `c5` AS `c5`, `c4` AS `c4` FROM (SELECT `o_orderkey` AS `c1`, `o_custkey` AS `c5`, `o_orderstatus` AS `c4`, `o_totalprice` AS `c7`, `o_orderdate` AS `c8`, `o_orderpriority` AS `c9` FROM `orders`) `t2`) `t1` LEFT SEMI JOIN (SELECT `c6` AS `c6` FROM (SELECT * FROM (SELECT `c_custkey` AS `c6`, `c_name` AS `c10`, `c_nationkey` AS `c11`, `c_acctbal` AS `c12`, `c_mktsegment` AS `c13` FROM `customer`) `t3` WHERE ((`c12` IS NOT NULL) AND (`c12` > 5000.0))) `t4`) `t5` ON (`c5` = `c6`)) `t6`) `t7`) `t8` WHERE (`c2` <= 3)) `t9`) `t10` ORDER BY `c1` ASC NULLS FIRST) `t_out`""".stripMargin

  private val m23Ch: String =
    """SELECT `c1` AS `o_orderkey`, `c3` AS `run3` FROM (SELECT * FROM (SELECT `c1` AS `c1`, CAST(`c2` AS Float64) AS `c3` FROM (SELECT *, sum(`c4`) OVER (PARTITION BY `c5` ORDER BY `c1` ASC NULLS FIRST ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS `c2` FROM (SELECT `c1` AS `c1`, CAST(`c6` AS Decimal(18,2)) AS `c4`, `c5` AS `c5` FROM (SELECT * FROM (SELECT `o_orderkey` AS `c1`, `o_custkey` AS `c7`, `o_orderstatus` AS `c5`, `o_totalprice` AS `c6`, `o_orderdate` AS `c8`, `o_orderpriority` AS `c9` FROM `orders`) `t1` WHERE ((`c6` IS NOT NULL) AND (`c6` > (2.0 * (SELECT (sum(`c10`) / CAST(count(*) AS Float64)) AS `c11` FROM (SELECT `c10` AS `c10` FROM (SELECT `c_custkey` AS `c12`, `c_name` AS `c13`, `c_nationkey` AS `c14`, `c_acctbal` AS `c10`, `c_mktsegment` AS `c15` FROM `customer`) `t2`) `t3`))))) `t4`) `t5`) `t6`) `t7` ORDER BY `c1` ASC NULLS FIRST LIMIT 50) `t_out`""".stripMargin

  private val m24Ch: String =
    """SELECT `c2` AS `mon`, `c3` AS `n`, `c5` AS `yr` FROM (SELECT * FROM (SELECT `c1` AS `c2`, count(*) AS `c3`, CAST(max(toYear(`c4`)) AS Int64) AS `c5` FROM (SELECT `c4` AS `c4`, CAST(date_trunc('month', CAST(`c4` AS DateTime64(6))) AS Date32) AS `c1` FROM (SELECT CAST(`c6` AS Date32) AS `c4` FROM (SELECT * FROM (SELECT `o_orderkey` AS `c7`, `o_custkey` AS `c8`, `o_orderstatus` AS `c9`, `o_totalprice` AS `c10`, `o_orderdate` AS `c6`, `o_orderpriority` AS `c11` FROM `orders`) `t1` WHERE ((`c6` IS NOT NULL) AND (`c6` >= toDateTime64('1996-01-01 00:00:00', 6)))) `t2`) `t3`) `t4` GROUP BY `c1`) `t5` ORDER BY `c2` ASC NULLS FIRST) `t_out`""".stripMargin

  for (n <- Seq("m21", "m22", "m23", "m24")) {
    test(s"clickhouse golden: $n renders to the pinned text") {
      val (sql, pinned) = n match {
        case "m21" => (Semantic.m21Sql, m21Ch)
        case "m22" => (Semantic.m22Sql, m22Ch)
        case "m23" => (Semantic.m23Sql, m23Ch)
        case "m24" => (Semantic.m24Sql, m24Ch)
      }
      val text = session.transformSql(sql, "clickhouse")
      assert(text == pinned, s"generated:\n$text\npinned:\n$pinned")
    }
  }

  test("clickhouse dialect: native SEMI JOIN keyword, camelCase date functions, typed literals") {
    assert(m22Ch.contains("LEFT SEMI JOIN"), "ClickHouse has native semi join kinds")
    assert(!m22Ch.contains("EXISTS"))
    assert(m24Ch.contains("toYear(") && !m24Ch.contains("extract("))
    assert(m24Ch.contains("toDateTime64('1996-01-01 00:00:00', 6)"),
      "no ANSI TIMESTAMP literal introducer in ClickHouse")
    assert(m24Ch.contains("Date32") && m24Ch.contains("DateTime64(6)"))
  }

  test("clickhouse dialect: null literals cast to Nullable(T)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(lit(null).cast("string").as("maybe"), col("n_nationkey"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val ch = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
      SqlUnparser.ClickHouseDialect)
    assert(ch.contains("CAST(NULL AS Nullable(String))"), ch)
  }

  test("clickhouse dialect: dayofweek carries the reference's modulo adjustment") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select(dayofweek(col("o_orderdate").cast("date")).as("dow"),
        expr("o_orderkey div 9").as("q"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val ch = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
      SqlUnparser.ClickHouseDialect)
    // Spark dayofweek is 1-7 Sunday-first; toDayOfWeek 1-7 Monday-first
    assert(ch.contains("(toDayOfWeek(") && ch.contains("% 7) + 1)"), ch)
    assert(ch.contains("intDiv("), ch)
  }

  test("clickhouse dialect: character-semantics spellings and loud gaps") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select(length(col("n_name")).as("l"), reverse(col("n_name")).as("r"),
        md5(col("n_name")).as("h"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val ch = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
      SqlUnparser.ClickHouseDialect)
    assert(ch.contains("lengthUTF8(") && ch.contains("reverseUTF8("), ch)
    assert(ch.contains("lower(hex(MD5("), ch)
    val e = intercept[UnsupportedOperationException] {
      session.transformSql(Semantic.m25Sql, "clickhouse")
    }
    assert(e.getMessage.contains("zorder_key"))
  }

  test("clickhouse dialect: every TPC-H query unparses (breadth parity)") {
    val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
    val failures = TpcH.oracles.flatMap { case (n, sql) =>
      try { tpch.transformSql(sql, "clickhouse"); None }
      catch { case e: Exception => Some(s"$n: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("property sweep: the 40-seed grammar generates for clickhouse") {
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
          SqlUnparser.ClickHouseDialect).startsWith("SELECT"))
      } catch {
        case e: Exception => throw new AssertionError(s"seed=$seed failed\n$sql", e)
      }
    }
  }
}
