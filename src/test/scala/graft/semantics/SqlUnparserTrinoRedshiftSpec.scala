package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.{Semantic, TpcH}

/** Trino + Redshift dialect gates — dialects ten and eleven, closing the
  * reference's data-source list name-for-name (`app/model/data_source.py:
  * 69-87`; every remaining name is an alias: athena/canner ride Trino —
  * `rewriter.py:93-94` — databricks rides Spark, doris rides MySQL). Trino is
  * the reference's lingua franca: its server PARSES all planned SQL as Trino
  * (`rewriter.py:89`). No live server for either here, so the posture is the
  * reference's snapshot tests (`wren-core/core/src/mdl/mod.rs:648+`): pinned
  * m-corpus goldens, structural assertions on each dialect's real
  * divergences, an all-22-TPC-H generation gate, the 40-seed sweep — and
  * both dialects' sweep texts are additionally EXECUTED in DuckDB by
  * `tools/unparse_sweep.py` (shared ANSI core), like duckdb/postgres.
  */
class SqlUnparserTrinoRedshiftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)
  private lazy val tpch =
    GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)

  private val mSql = Map("m21" -> Semantic.m21Sql, "m22" -> Semantic.m22Sql,
    "m23" -> Semantic.m23Sql, "m24" -> Semantic.m24Sql)

  private val trinoGoldens = Map(
    "m21" ->
      """SELECT "c1" AS "cust_segment", "c2" AS "n", "c4" AS "rev" FROM (SELECT * FROM (SELECT "c1" AS "c1", count(*) AS "c2", CAST(sum("c3") AS DOUBLE) AS "c4" FROM (SELECT "c3" AS "c3", "c5" AS "c1" FROM (SELECT * FROM (SELECT "c6" AS "c6", CAST("c8" AS DECIMAL(18,2)) AS "c3" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c9", "o_custkey" AS "c6", "o_orderstatus" AS "c10", "o_totalprice" AS "c8", "o_orderdate" AS "c11", "o_orderpriority" AS "c12" FROM "orders") "t2" WHERE (("c9" IS NOT NULL) AND ("c9" <= 5000))) "t3") "t1" LEFT JOIN (SELECT "c7" AS "c7", "c5" AS "c5" FROM (SELECT * FROM (SELECT "c_custkey" AS "c7", "c_name" AS "c13", "c_nationkey" AS "c14", "c_acctbal" AS "c15", "c_mktsegment" AS "c5" FROM "customer") "t4" WHERE ("c7" IS NOT NULL)) "t5") "t6" ON ("c6" = "c7")) "t7") "t8" GROUP BY "c1") "t9" ORDER BY "c1" ASC NULLS FIRST) "t_out"""",
    "m22" ->
      """SELECT "c1" AS "o_orderkey", "c3" AS "rn" FROM (SELECT * FROM (SELECT "c1" AS "c1", CAST("c2" AS BIGINT) AS "c3" FROM (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "c4" ORDER BY "c1" ASC NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS "c2" FROM (SELECT "c1" AS "c1", "c4" AS "c4" FROM (SELECT "t1".* FROM (SELECT "c1" AS "c1", "c5" AS "c5", "c4" AS "c4" FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c5", "o_orderstatus" AS "c4", "o_totalprice" AS "c7", "o_orderdate" AS "c8", "o_orderpriority" AS "c9" FROM "orders") "t2") "t1" WHERE EXISTS (SELECT 1 FROM (SELECT "c6" AS "c6" FROM (SELECT * FROM (SELECT "c_custkey" AS "c6", "c_name" AS "c10", "c_nationkey" AS "c11", "c_acctbal" AS "c12", "c_mktsegment" AS "c13" FROM "customer") "t3" WHERE (("c12" IS NOT NULL) AND ("c12" > 5000.0))) "t4") "t5" WHERE ("c5" = "c6"))) "t6") "t7") "t8" WHERE ("c2" <= 3)) "t9") "t10" ORDER BY "c1" ASC NULLS FIRST) "t_out"""",
    "m23" ->
      """SELECT "c1" AS "o_orderkey", "c3" AS "run3" FROM (SELECT * FROM (SELECT "c1" AS "c1", CAST("c2" AS DOUBLE) AS "c3" FROM (SELECT *, sum("c4") OVER (PARTITION BY "c5" ORDER BY "c1" ASC NULLS FIRST ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS "c2" FROM (SELECT "c1" AS "c1", CAST("c6" AS DECIMAL(18,2)) AS "c4", "c5" AS "c5" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c1", "o_custkey" AS "c7", "o_orderstatus" AS "c5", "o_totalprice" AS "c6", "o_orderdate" AS "c8", "o_orderpriority" AS "c9" FROM "orders") "t1" WHERE (("c6" IS NOT NULL) AND ("c6" > (2.0 * (SELECT (sum("c10") / CAST(count(*) AS DOUBLE)) AS "c11" FROM (SELECT "c10" AS "c10" FROM (SELECT "c_custkey" AS "c12", "c_name" AS "c13", "c_nationkey" AS "c14", "c_acctbal" AS "c10", "c_mktsegment" AS "c15" FROM "customer") "t2") "t3"))))) "t4") "t5") "t6") "t7" ORDER BY "c1" ASC NULLS FIRST LIMIT 50) "t_out"""",
    "m24" ->
      """SELECT "c2" AS "mon", "c3" AS "n", "c5" AS "yr" FROM (SELECT * FROM (SELECT "c1" AS "c2", count(*) AS "c3", CAST(max(extract(year FROM "c4")) AS BIGINT) AS "c5" FROM (SELECT "c4" AS "c4", CAST(date_trunc('month', CAST("c4" AS TIMESTAMP)) AS DATE) AS "c1" FROM (SELECT CAST("c6" AS DATE) AS "c4" FROM (SELECT * FROM (SELECT "o_orderkey" AS "c7", "o_custkey" AS "c8", "o_orderstatus" AS "c9", "o_totalprice" AS "c10", "o_orderdate" AS "c6", "o_orderpriority" AS "c11" FROM "orders") "t1" WHERE (("c6" IS NOT NULL) AND ("c6" >= TIMESTAMP '1996-01-01 00:00:00'))) "t2") "t3") "t4" GROUP BY "c1") "t5" ORDER BY "c2" ASC NULLS FIRST) "t_out"""")

  // Redshift's m-corpus texts coincide with Postgres's (same NUMERIC /
  // DOUBLE PRECISION spellings; the divergences — ||-folded concat, UNION
  // ALL VALUES, LISTAGG, TRUNC division — lie outside this corpus) EXCEPT
  // m25, where Postgres emits the Morton expansion and Redshift refuses.
  private val redshiftGoldens = trinoGoldens.map { case (n, t) =>
    n -> t.replace(" AS DOUBLE)", " AS DOUBLE PRECISION)")
      .replace("DECIMAL(18,2)", "NUMERIC(18,2)")
  }

  for (n <- Seq("m21", "m22", "m23", "m24")) {
    test(s"trino golden: $n renders to the pinned text") {
      val text = session.transformSql(mSql(n), "trino")
      assert(text == trinoGoldens(n), s"generated:\n$text")
    }
    test(s"redshift golden: $n renders to the pinned text") {
      val text = session.transformSql(mSql(n), "redshift")
      assert(text == redshiftGoldens(n), s"generated:\n$text")
    }
  }

  test("m25: both dialects refuse the Morton expansion loudly") {
    for (d <- Seq("trino", "redshift")) {
      val e = intercept[UnsupportedOperationException] {
        session.transformSql(Semantic.m25Sql, d)
      }
      assert(e.getMessage.contains("Morton"), s"$d: ${e.getMessage}")
    }
  }

  test("alias routing: athena/canner/presto ride Trino, databricks rides Spark") {
    val trino = session.transformSql(Semantic.m21Sql, "trino")
    for (alias <- Seq("athena", "canner", "presto")) {
      assert(session.transformSql(Semantic.m21Sql, alias) == trino, alias)
    }
    assert(session.transformSql(Semantic.m21Sql, "databricks") ==
      session.transformSql(Semantic.m21Sql, "spark"))
  }

  test("trino dialect: date_add('day', n, d) unit-string form") {
    val q4 = tpch.transformSql(TpcH.oracles("tpch_q4"), "trino")
    assert(q4.contains("date_add('day', 60,"), q4)
  }

  test("trino dialect: md5 over VARBINARY and remainder-identity division") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select(expr("o_orderkey div 7").as("q"), md5(col("o_orderstatus")).as("h"))
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val t = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
      SqlUnparser.TrinoDialect)
    assert(t.contains("lower(to_hex(md5(to_utf8("), t)
    // (l - l % r) / r: exact toward-zero quotient without a double detour
    assert(t.contains("% 7)) / 7) AS BIGINT)") && !t.contains(" div "), t)
    val r = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
      SqlUnparser.RedshiftDialect)
    assert(r.contains("CAST(TRUNC(") && !r.contains(" div "), r)
    assert(r.contains("md5("), r)
  }

  test("trino dialect: LISTAGG requires WITHIN GROUP; unordered renders array_join") {
    import org.apache.spark.sql.functions._
    val nation = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
    val ordered = nation.groupBy("n_regionkey")
      .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("names"))
    val oOpt = spark.sessionState.optimizer.execute(ordered.queryExecution.analyzed)
    val oTxt = SqlUnparser.unparse(oOpt, ordered.columns.toIndexedSeq,
      SqlUnparser.TrinoDialect)
    assert(oTxt.contains("listagg(") && oTxt.contains("WITHIN GROUP"), oTxt)
    val bare = nation.groupBy("n_regionkey")
      .agg(expr("listagg(n_name, ',')").as("names"))
    val bOpt = spark.sessionState.optimizer.execute(bare.queryExecution.analyzed)
    val bTxt = SqlUnparser.unparse(bOpt, bare.columns.toIndexedSeq,
      SqlUnparser.TrinoDialect)
    assert(bTxt.contains("array_join(array_agg(") && !bTxt.contains("listagg("), bTxt)
    // Redshift keeps the ANSI LISTAGG WITHIN GROUP (no string_agg there)
    val rTxt = SqlUnparser.unparse(oOpt, ordered.columns.toIndexedSeq,
      SqlUnparser.RedshiftDialect)
    assert(rTxt.contains("listagg(") && rTxt.contains("WITHIN GROUP"), rTxt)
  }

  test("redshift dialect: n-ary concat folds to ||, inline VALUES to UNION ALL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val local = Seq((1L, "a"), (2L, "b,c")).toDF("k", "v")
    val joined = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .join(local, col("n_nationkey") === col("k"))
      .select(concat(col("n_name"), lit("_"), col("v")).as("tag"))
    val optimized = spark.sessionState.optimizer.execute(joined.queryExecution.analyzed)
    val r = SqlUnparser.unparse(optimized, joined.columns.toIndexedSeq,
      SqlUnparser.RedshiftDialect)
    assert(!r.contains("VALUES"), r)
    assert(r.contains("UNION ALL SELECT") && r.contains("'b,c'"), r)
    assert(r.contains(" || ") && !r.contains("concat("), r)
    // Trino keeps both the VALUES constructor and n-ary concat
    val t = SqlUnparser.unparse(optimized, joined.columns.toIndexedSeq,
      SqlUnparser.TrinoDialect)
    assert(t.contains("(VALUES ") && t.contains("concat("), t)
  }

  test("redshift dialect: starts_with renders structurally over left/length") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .filter(col("n_name").startsWith("A")).select("n_name")
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    val r = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
      SqlUnparser.RedshiftDialect)
    assert(r.contains("(left(") && r.contains("length('A')"), r)
    val t = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
      SqlUnparser.TrinoDialect)
    assert(t.contains("starts_with("), t)
  }

  for (d <- Seq("trino", "redshift")) {
    test(s"$d dialect: every TPC-H query unparses (breadth parity)") {
      val failures = TpcH.oracles.flatMap { case (n, sql) =>
        try { tpch.transformSql(sql, d); None }
        catch { case e: Exception => Some(s"$n: ${e.getMessage}") }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    }
  }

  test("property sweep: the 40-seed grammar generates for trino and redshift") {
    Seq("orders", "customer", "nation").foreach { t =>
      spark.read.parquet(s"${TestSpark.sfDir}/$t.parquet").createOrReplaceTempView(t)
    }
    val gen = new SqlUnparserPropertyGrammar
    for (seed <- 0 until 40; dialect <- Seq(
        SqlUnparser.TrinoDialect, SqlUnparser.RedshiftDialect)) {
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
