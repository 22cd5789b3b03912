package graft.semantics

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.tools.GoldenGen

/** One gate over the WHOLE golden corpus: every (dialect × corpus query)
  * either renders to its pinned resource file or refuses loudly — and a
  * refusal must have NO stale pin on disk. New corpus entries (m26's folded
  * spine, m27's correlated spine, …) are covered the moment they land in
  * `GoldenGen.corpus`, so a golden file can never again exist without a spec
  * asserting it.
  */
class GoldenCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, graft.queries.Semantic.manifest, TestSpark.sfDir)

  private val root = Paths.get(
    sys.props.getOrElse("graft.golden.dir", "src/test/resources/goldens"))

  for (d <- GoldenGen.dialects; (name, sql) <- GoldenGen.corpus) {
    test(s"$d/$name: renders to its pin, or refuses with no stale pin") {
      val pin = root.resolve(d).resolve(s"$name.sql")
      try {
        val text = session.transformSql(sql, d)
        Goldens.assertGolden(d, name, text)
      } catch {
        case _: UnsupportedOperationException =>
          assert(!Files.exists(pin),
            s"$d/$name refuses to render but a stale golden exists at $pin — " +
              "delete it or fix the rendering")
      }
    }
  }
}
