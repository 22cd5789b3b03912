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

  for (d <- Seq("trino", "redshift"); n <- Seq("m21", "m22", "m23", "m24")) {
    test(s"$d golden: $n renders to the pinned text") {
      Goldens.assertGolden(d, n, session.transformSql(mSql(n), d))
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

  test("alias routing: file sources and datafusion ride DuckDB (rewriter.py:94-101)") {
    val duck = session.transformSql(Semantic.m21Sql, "duckdb")
    for (alias <- Seq("local_file", "s3_file", "minio_file", "gcs_file",
        "datafusion")) {
      assert(session.transformSql(Semantic.m21Sql, alias) == duck, alias)
    }
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

  test("property sweep: the grammar generates (or refuses loudly) for trino and redshift") {
    SqlUnparserPropertyGrammar.generationGate(
      spark, SqlUnparser.TrinoDialect, TestSpark.sfDir)
    SqlUnparserPropertyGrammar.generationGate(
      spark, SqlUnparser.RedshiftDialect, TestSpark.sfDir)
  }
}
