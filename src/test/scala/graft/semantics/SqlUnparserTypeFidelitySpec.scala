package graft.semantics

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Aggregate type-fidelity gates (round-9 verdict #1: DuckDB's HUGEINT
  * integral SUM failed `tpch_q12_unparse`'s typed hash with identical
  * values). Every engine types some aggregates differently from Spark —
  * DuckDB/Snowflake/Oracle widen integral SUM, Postgres returns NUMERIC for
  * avg/stddev of exact types, SQL Server keeps the ARGUMENT type (int SUM
  * overflows, int AVG truncates), MySQL/Redshift round integer AVG — so the
  * renderer casts the call (or the argument, where the VALUE would drift)
  * back to Spark's result type. This spec pins the rendered repair per
  * (dialect, aggregate, child type); the EXECUTED proof is the driver's
  * DuckDB gate (duckdb/postgres/trino/redshift entries) plus the dtype-strict
  * `tools/unparse_sweep.py`. Reference analogue: the unparser's type-aware
  * rendering, `wren-core/core/src/mdl/dialect/wren_dialect.rs:141-235`.
  */
class SqlUnparserTypeFidelitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def render(df: DataFrame, dialect: String): String = {
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
      SqlUnparser.dialectFor(dialect))
  }

  private def lineitem: DataFrame =
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")

  // l_linenumber is INT32, l_orderkey INT64, l_quantity DOUBLE — the three
  // native child types; decimals enter through an explicit cast
  private def aggs: DataFrame = lineitem.selectExpr(
    "l_returnflag", "l_linenumber", "l_orderkey", "l_quantity",
    "cast(l_quantity as decimal(18,2)) AS q_dec")
    .groupBy("l_returnflag")
    .agg(
      org.apache.spark.sql.functions.expr("sum(l_linenumber)").as("sum_int"),
      org.apache.spark.sql.functions.expr("sum(l_orderkey)").as("sum_big"),
      org.apache.spark.sql.functions.expr("sum(l_quantity)").as("sum_dbl"),
      org.apache.spark.sql.functions.expr("sum(q_dec)").as("sum_dec"),
      org.apache.spark.sql.functions.expr("avg(l_linenumber)").as("avg_int"),
      org.apache.spark.sql.functions.expr("avg(q_dec)").as("avg_dec"),
      org.apache.spark.sql.functions.expr("count(*)").as("n"),
      org.apache.spark.sql.functions.expr("stddev_samp(l_linenumber)").as("sd_int"))

  test("spark dialect renders aggregates bare (engine == Spark, no repair)") {
    val t = render(aggs, "spark")
    assert(!t.contains("CAST(sum("), t)
    assert(!t.contains("CAST(count("), t)
  }

  test("duckdb: integral/decimal SUM cast back (HUGEINT / DECIMAL(38,s) widening)") {
    val t = render(aggs, "duckdb")
    assert(t.contains("CAST(sum(") && t.contains(" AS BIGINT)"), t)
    assert(t.contains(" AS DECIMAL(28,2))"), t) // sum(decimal(18,2)) → Spark (28,2)
    assert(t.contains(" AS DECIMAL(22,6))"), t) // avg(decimal(18,2)) → Spark (22,6)
    // double sums and count() already agree with Spark — no repair
    assert(!t.replace("count(*)", "").contains("CAST(count"), t)
    // avg of int: DuckDB returns DOUBLE like Spark — repair is a no-op cast
    // only where ansiAggResultCast says the engine may disagree
  }

  test("postgres: bigint SUM → NUMERIC repair, int AVG/stddev → DOUBLE PRECISION") {
    val t = render(aggs, "postgres")
    assert(t.contains("CAST(sum(") && t.contains(" AS BIGINT)"), t)
    assert(t.contains("CAST(avg(") && t.contains(" AS DOUBLE PRECISION)"), t)
    // the stat family needs no RESULT repair from Spark plans: Catalyst
    // coerces the child to double, and PG stddev(double precision) is double.
    // The Spark-inserted child cast must travel through the rendering.
    assert(t.contains("stddev_samp(CAST(") &&
      t.contains(" AS DOUBLE PRECISION))"), t)
    assert(t.contains(" AS NUMERIC(28,2))"), t)
  }

  test("mysql: SIGNED sums; integer AVG averages the DOUBLE-cast child (value fidelity)") {
    val t = render(aggs, "mysql")
    assert(t.contains("CAST(sum(") && t.contains(" AS SIGNED)"), t)
    // MySQL's int AVG rounds at scale 4 — the CHILD is cast, not the result
    assert(t.contains("avg(CAST(") && t.contains(" AS DOUBLE))"), t)
  }

  test("mssql: int SUM accumulates as BIGINT, int AVG as FLOAT(53), COUNT cast from INT") {
    val t = render(aggs, "mssql")
    assert(t.contains("sum(CAST(") && t.contains(" AS BIGINT))"), t)
    // the explicit FLOAT(53) spelling (T-SQL's own default width) — bare
    // FLOAT is float32 on other parsers, which broke the DuckDB-executed
    // m21/m23 gate on the 8th significant digit
    assert(t.contains("avg(CAST(") && t.contains(" AS FLOAT(53)))"), t)
    assert(t.contains("CAST(count(*) AS BIGINT)"), t)
  }

  test("oracle/clickhouse: COUNT repaired (NUMBER / UInt64 vs Spark's BIGINT)") {
    val or = render(aggs, "oracle")
    assert(or.contains("CAST(count(*) AS NUMBER(19,0))"), or)
    val ch = render(aggs, "clickhouse")
    assert(ch.contains("CAST(count(*) AS Int64)"), ch)
  }

  test("trino/redshift: integral SUM casts are no-ops there and make the " +
      "sandbox's DuckDB execution type-exact") {
    for (d <- Seq("trino", "redshift")) {
      val t = render(aggs, d)
      assert(t.contains("CAST(sum(") && t.contains(" AS BIGINT)"), s"$d:\n$t")
    }
    // Redshift's integer AVG truncates — child averaged as DOUBLE PRECISION
    val r = render(aggs, "redshift")
    assert(r.contains("avg(CAST(") && r.contains(" AS DOUBLE PRECISION))"), r)
  }

  test("ranking functions repair INT (Spark) vs BIGINT (engines) outside OVER") {
    val df = lineitem.selectExpr("l_orderkey", "l_linenumber").limit(100)
      .selectExpr("l_orderkey",
        "row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn")
    // engines with a 32-bit integer type cast back to Spark's INT
    for ((d, ty) <- Seq("duckdb" -> "INTEGER", "postgres" -> "INTEGER",
        "trino" -> "INTEGER", "redshift" -> "INTEGER",
        "clickhouse" -> "Int32", "mssql" -> "INT")) {
      val t = render(df, d)
      assert(t.contains(s"CAST(row_number() OVER (") && t.contains(s") AS $ty)"),
        s"$d:\n$t")
    }
    // engines with no 32-bit type keep the bare call (documented: BigQuery
    // INT64, Snowflake/Oracle NUMBER, MySQL's CAST sublanguage)
    for (d <- Seq("bigquery", "snowflake", "oracle", "mysql")) {
      val t = render(df, d)
      assert(!t.contains("CAST(row_number"), s"$d:\n$t")
    }
  }

  test("window aggregates carry the repair OUTSIDE the OVER clause") {
    val df = lineitem.selectExpr("l_orderkey", "l_linenumber").limit(100)
      .selectExpr("l_orderkey",
        "sum(l_linenumber) OVER (PARTITION BY l_orderkey) AS wsum")
    val t = render(df, "duckdb")
    assert(t.contains("CAST(sum(") && t.contains(") OVER (") &&
      t.contains(") AS BIGINT)"), t)
    // the cast must wrap `fn OVER (spec)`, never sit between fn and OVER
    assert(!t.contains("AS BIGINT) OVER"), t)
  }

  test("executed semantics: the duckdb repair text round-trips through Spark " +
      "with Spark's exact result schema") {
    // the duckdb text is DuckDB-executed by the driver gate; here the SPARK
    // dialect re-execution pins that the repaired plan's schema survived
    val src = aggs
    val t = render(src, "spark")
    val replayed = spark.sql(t)
    assert(replayed.schema == src.schema,
      s"schema drift through unparse:\n${replayed.schema}\nvs\n${src.schema}")
  }
}
