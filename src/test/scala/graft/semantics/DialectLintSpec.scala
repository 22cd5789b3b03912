package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.{Semantic, TpcH}
import graft.tools.GoldenGen

/** Corpus-wide static lint over every live-rendered dialect text.
  *
  * Six of the eleven dialects have no engine in this sandbox, so their texts
  * can only be golden-pinned — and the failure mode that posture cannot catch
  * is a pinned text the real engine would reject (both advisor findings of
  * round 9 were exactly this class: MySQL's `VALUES (...)` constructor,
  * BigQuery's nonexistent `%` operator). This spec makes that class
  * falsifiable in-sandbox: for every dialect × (semantic m-corpus ∪ all 22
  * TPC-H queries), the live rendering must pass [[DialectLint]]'s rules —
  * constructs the TARGET engine's published grammar rejects, checked on
  * literal-stripped text. The property grammar's generation gates run the
  * same lint over 100 random seeds per dialect.
  */
class DialectLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val semSession =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)
  private lazy val tpchSession =
    GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)

  for (d <- GoldenGen.dialects; (name, sql) <- GoldenGen.corpus) {
    test(s"lint $d/$name (semantic corpus)") {
      try DialectLint.lint(d, name, semSession.transformSql(sql, d))
      catch { case _: UnsupportedOperationException => /* loud refusal is fine */ }
    }
  }

  for (d <- GoldenGen.dialects; (name, sql) <- TpcH.oracles.toSeq.sortBy(_._1)) {
    test(s"lint $d/$name") {
      try DialectLint.lint(d, name, tpchSession.transformSql(sql, d))
      catch { case _: UnsupportedOperationException => /* loud refusal is fine */ }
    }
  }
}
