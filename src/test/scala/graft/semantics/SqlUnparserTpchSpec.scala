package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.TpcH

/** The unparser must be able to express EVERY TPC-H optimized plan: for each of
  * the 22 queries, `transformSql(sql, "spark")` is executed on a bare session
  * (no deploy, no temp views) and must return exactly the rows and column names
  * of the engine running the original semantic-layer SQL. This is the breadth
  * guarantee behind the `/dry-plan?dialect=` surface — the reference unparses
  * its whole benchmark corpus the same way (`Mode::Unparse`,
  * wren-core/core/src/mdl/dialect/wren_dialect.rs:41-110).
  */
class SqlUnparserTpchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)

  test("unparse is cache-independent: a cached overlapping scan must not leak InMemoryRelation") {
    val cached = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet").persist()
    cached.count() // materialize so CacheManager substitutes matching subplans
    try {
      val sql = TpcH.oracles("tpch_q6")
      val text = session.transformSql(sql, "spark")
      assert(text.contains("parquet."), s"expected a source scan, got:\n$text")
      assert(spark.sql(text).collect().map(_.toString).sorted.toSeq ==
        session.query(sql).collect().map(_.toString).sorted.toSeq)
    } finally { cached.unpersist(); () }
  }

  test("duckdb dialect: every TPC-H query unparses (cross-engine breadth gate)") {
    // The driver's correctness gate EXECUTES these texts in DuckDB and
    // hash-compares against Spark running the source (tpch_qN_unparse entries);
    // this test pins the coverage so a dialect regression fails the build
    // instead of silently downgrading 22 entries to rows-only checks.
    val generated = TpcH.unparseOracles
    val missing = TpcH.oracles.keySet.map(_ + "_unparse") -- generated.keySet
    assert(missing.isEmpty, s"duckdb unparse lost coverage for: $missing")
    generated.foreach { case (n, text) =>
      assert(text.startsWith("SELECT"), s"$n: unexpected text shape:\n$text")
    }
  }

  test("duckdb/postgres/trino/redshift TPC-H texts match their pinned resource goldens") {
    // full-breadth snapshot pins (regenerate: `sbt "runMain graft.tools
    // .GoldenGen"`): a rendering change at TPC-H scale shows up as a reviewed
    // golden diff, not a silent driver-gate surprise. These four dialects'
    // texts are additionally EXECUTED in DuckDB by tools/tpch_cross_check.py,
    // which requires each to compute the duckdb text's exact typed results
    // (and the duckdb text is driver-hash-matched against Spark) —
    // TPCH_CROSS.json
    for ((name, sql) <- TpcH.oracles.toSeq.sortBy(_._1);
         d <- Seq("duckdb", "postgres", "trino", "redshift")) {
      Goldens.assertGolden(d, name, session.transformSql(sql, d))
    }
  }

  for ((name, sql) <- TpcH.oracles.toSeq.sortBy(_._1)) {
    test(s"spark round-trip: $name") {
      val engine = session.query(sql)
      val expected = engine.collect().map(_.toString).sorted.toSeq
      val text = session.transformSql(sql, "spark")
      val replayed = spark.sql(text)
      assert(replayed.columns.toSeq == engine.columns.toSeq, s"\n$text")
      assert(replayed.collect().map(_.toString).sorted.toSeq == expected, s"\n$text")
    }
  }
}
