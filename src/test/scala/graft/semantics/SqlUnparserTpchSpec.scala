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
