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

  private lazy val m23Ms: String = session.transformSql(Semantic.m23Sql, "mssql")
  private lazy val m23Or: String = session.transformSql(Semantic.m23Sql, "oracle")

  for (d <- Seq("mssql", "oracle"); n <- Seq("m21", "m22", "m23", "m24")) {
    test(s"$d golden: $n renders to the pinned text") {
      val sql = n match {
        case "m21" => Semantic.m21Sql
        case "m22" => Semantic.m22Sql
        case "m23" => Semantic.m23Sql
        case "m24" => Semantic.m24Sql
      }
      Goldens.assertGolden(d, n, session.transformSql(sql, d))
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
    // a LIMIT-less Sort nests inside the output wrapper, where T-SQL rejects
    // bare ORDER BY (error 1033) — the dialect legalizes it with OFFSET 0 ROWS
    val sorted = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .select("n_name").orderBy("n_name")
    val optSorted = spark.sessionState.optimizer.execute(sorted.queryExecution.analyzed)
    val msSorted =
      SqlUnparser.unparse(optSorted, sorted.columns.toIndexedSeq, SqlUnparser.MsSqlDialect)
    assert(msSorted.contains("ASC OFFSET 0 ROWS)"), msSorted)
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
    test(s"$d dialect: booleans bridge between value and predicate position") {
      import org.apache.spark.sql.functions._
      val dialect = SqlUnparser.dialectFor(d)
      // a projected comparison is not a T-SQL/pre-23ai-Oracle value: it must
      // render CASE WHEN 1/0, and an aggregate over it converts the CHILD
      // (max over the raw predicate parses on neither engine)
      val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
        .groupBy("n_regionkey").agg(max(col("n_nationkey") > 10).as("anybig"))
        .filter(col("anybig"))
        .orderBy(col("anybig"))
      val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
      val text = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, dialect)
      // three-valued: UNKNOWN must stay NULL (count/min/max skip it exactly
      // as Spark does) — `WHEN NOT (pred) THEN 0 ELSE NULL` keeps the NULL arm
      assert(text.contains("max((CASE WHEN (") &&
        text.contains("THEN 1 WHEN NOT (") && text.contains("THEN 0 ELSE NULL END))"),
        text)
      // the 0/1 column used as a predicate compares = 1 (NULL propagates the
      // same three-valued way the boolean did)
      assert(text.contains("= 1)"), text)
      // no bare boolean leaks into any value or predicate slot
      assert(!text.contains("max((\""), text)
    }

    test(s"$d dialect: every TPC-H query unparses (breadth parity)") {
      val tpch = GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
      val failures = TpcH.oracles.flatMap { case (n, sql) =>
        try { tpch.transformSql(sql, d); None }
        catch { case e: Exception => Some(s"$n: ${e.getMessage}") }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    }

    test(s"property sweep: the grammar generates (or refuses loudly) for $d") {
      SqlUnparserPropertyGrammar.generationGate(
        spark, SqlUnparser.dialectFor(d), TestSpark.sfDir)
    }
  }

  test("LIKE escape semantics travel with the text per engine") {
    import org.apache.spark.sql.functions._
    // pattern value contains a backslash-escaped underscore (Spark semantics:
    // matches a literal underscore)
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .filter(col("n_name").like("%\\_x%")).select("n_name")
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    def text(d: String): String =
      SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.dialectFor(d))
    // every clause-bearing grammar gets the explicit ESCAPE '\' — required on
    // the standard engines (bare backslash is a literal there), a no-op on
    // the backslash-default ones (Postgres, Redshift, MySQL)
    for (d <- Seq("duckdb", "postgres", "redshift", "trino", "snowflake",
        "oracle", "mssql", "mysql"))
      assert(text(d).contains(raw"ESCAPE '\'") || text(d).contains(raw"ESCAPE '\\'"),
        s"$d: ${text(d)}")
    // clause-less grammars (GoogleSQL, ClickHouse): backslash is already the
    // engine's escape, but their escape-introducer STRING parsers need the
    // backslash doubled to carry the pattern value through
    for (d <- Seq("bigquery", "clickhouse"))
      assert(text(d).contains(raw"%\\_x%") && !text(d).contains("ESCAPE"),
        s"$d: ${text(d)}")
    // T-SQL's bracket character class neutralizes in literal patterns (the
    // multi-wildcard shape survives LikeSimplification; the single-infix
    // `%[x]%` shape becomes Contains → CHARINDEX, which is already literal)
    val br = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .filter(col("n_name").like("%[x]%y%")).select("n_name")
    val optBr = spark.sessionState.optimizer.execute(br.queryExecution.analyzed)
    val ms = SqlUnparser.unparse(optBr, br.columns.toIndexedSeq, SqlUnparser.MsSqlDialect)
    assert(ms.contains("%[[]x]%y%"), ms)
    // a custom ESCAPE char refuses loudly where the grammar has no clause
    val custom = spark.sql(
      s"SELECT n_name FROM parquet.`${TestSpark.sfDir}/nation.parquet` " +
        "WHERE n_name LIKE '%!_%' ESCAPE '!'")
    val optCustom = spark.sessionState.optimizer.execute(custom.queryExecution.analyzed)
    for (d <- Seq("bigquery", "clickhouse")) {
      val e = intercept[UnsupportedOperationException] {
        SqlUnparser.unparse(optCustom, custom.columns.toIndexedSeq,
          SqlUnparser.dialectFor(d))
      }
      assert(e.getMessage.contains("ESCAPE"), e.getMessage)
    }
    // ... and renders where it does
    val tr = SqlUnparser.unparse(optCustom, custom.columns.toIndexedSeq,
      SqlUnparser.TrinoDialect)
    assert(tr.contains("ESCAPE '!'"), tr)
  }

  test("oracle/clickhouse: null-safe equality emulates never-NULL (no IS NOT " +
      "DISTINCT FROM in either grammar); mssql keeps the ANSI form (2022+)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .filter(col("n_nationkey") <=> col("n_regionkey")).select("n_name")
    val optimized = spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    for (d <- Seq("oracle", "clickhouse")) {
      val text = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq,
        SqlUnparser.dialectFor(d))
      // the emulation is exact even under NOT: NULL AND FALSE is FALSE, so
      // the composed predicate never yields NULL
      assert(text.contains("IS NOT NULL)") && text.contains("IS NULL) AND") &&
        !text.contains("DISTINCT FROM"), text)
    }
    val ms = SqlUnparser.unparse(optimized, df.columns.toIndexedSeq, SqlUnparser.MsSqlDialect)
    assert(ms.contains("IS NOT DISTINCT FROM"), ms)
  }
}
