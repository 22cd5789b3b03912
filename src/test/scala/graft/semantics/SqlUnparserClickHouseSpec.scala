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

  private lazy val m22Ch: String = session.transformSql(Semantic.m22Sql, "clickhouse")
  private lazy val m24Ch: String = session.transformSql(Semantic.m24Sql, "clickhouse")

  for (n <- Seq("m21", "m22", "m23", "m24")) {
    test(s"clickhouse golden: $n renders to the pinned text") {
      val sql = n match {
        case "m21" => Semantic.m21Sql
        case "m22" => Semantic.m22Sql
        case "m23" => Semantic.m23Sql
        case "m24" => Semantic.m24Sql
      }
      Goldens.assertGolden("clickhouse", n, session.transformSql(sql, "clickhouse"))
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

  test("clickhouse ANSI-expressible subset is exactly the promoted set — falsifiably") {
    // Identifiers now quote ANSI-style (ClickHouse accepts both `x` and "x"),
    // so the only thing keeping ClickHouse texts out of the DuckDB-executed
    // sweep is CH-native SPELLINGS — types (Float64/Date32/DateTime64/
    // String/Nullable), camelCase functions, native SEMI JOIN. This test IS
    // the record: every corpus entry must either carry a native spelling OR
    // be in the PROMOTED set (a driver-executed `*_unparse_clickhouse`
    // entry). The guard fired once already — m36's repeat/concat_ws text is
    // fully-ANSI and is now executed by the driver's DuckDB gate, the first
    // live-executed ClickHouse text.
    val promoted = Set("m36")
    val native = Seq("Float64", "Float32", "Date32", "DateTime64", "Int64",
      "Int32", "Nullable(", "AS String", "toYear(", "toMonth(",
      "toDayOfMonth(", "toDayOfWeek(", "toDate(", "LEFT SEMI JOIN",
      "replaceRegexpAll(", "match(", "intDiv(", "lengthUTF8(")
    for ((name, sql) <- graft.tools.GoldenGen.corpus) {
      try {
        val text = session.transformSql(sql, "clickhouse")
        if (promoted(name))
          assert(!native.exists(text.contains),
            s"$name is promoted (driver-executed) but renders CH-native spellings")
        else assert(native.exists(text.contains),
          s"$name renders fully-ANSI ClickHouse — promote it to the executed sweep")
      } catch { case _: UnsupportedOperationException => () /* refusal: fine */ }
    }
  }

  test("clickhouse dialect: every TPC-H query unparses (breadth parity)") {
    val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
    val failures = TpcH.oracles.flatMap { case (n, sql) =>
      try { tpch.transformSql(sql, "clickhouse"); None }
      catch { case e: Exception => Some(s"$n: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("property sweep: the grammar generates (or refuses loudly) for clickhouse") {
    SqlUnparserPropertyGrammar.generationGate(
      spark, SqlUnparser.ClickHouseDialect, TestSpark.sfDir)
  }
}
