package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** The config-driven injection path (`spark.sql.extensions=graft.GraftExtensions`)
  * must make the pipeline kernels callable from plain SQL with no Scala setup.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    val base = TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions=graft.GraftExtensions` is read from the context's
      // STATIC conf, which the suite-shared SparkContext already pinned — so the
      // spec drives the same injection through the public withExtensions builder
      // hook (what applyExtensions calls after instantiating the class by name).
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("extensions make the kernels SQL-callable application-wide") {
    withExtendedSession { s =>
      val r = s.sql(
        """SELECT stopword_langid('the of and to a in is it') AS lang,
          |  bpe_count(array('lowest', 'window')) AS n_bpe,
          |  simhash_words(array('a','b','c','d','e'), 3, 60) AS sig,
          |  size(minhash_words(array('a','b','c','d','e'), 3, 16)) AS n_mh,
          |  size(shingle_hashes(array('a','b','c','d'), 3)) AS n_sh,
          |  size(window_hashes(array('a','b','c','d','e'), 2)) AS n_wh
          |""".stripMargin).head()
      assert(r.getAs[String]("lang") == "en")
      val ranks = Bpe.ranksOf(Bpe.pretrainedMerges)
      val expected = Seq("lowest", "window").map(Bpe.encodeWord(_, ranks).length).sum
      assert(r.getAs[Long]("n_bpe") == expected)
      assert(r.getAs[Long]("sig") != 0L)
      assert(r.getAs[Int]("n_mh") == 16)
      assert(r.getAs[Int]("n_sh") == 2) // 4 words -> 2 distinct trigram shingles
      assert(r.getAs[Int]("n_wh") == 4) // 5 words, window 2 -> 4 rolling hashes
    }
  }

  test("kernel tuning arguments must be literals") {
    withExtendedSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT minhash_words(array('a'), 1 + length('xx'), 8)").head()
      }
      assert(e.getMessage.contains("integer literal"),
        s"expected a literal-argument error, got: ${e.getMessage}")
    }
  }

  test("the class honors the spark.sql.extensions loader contract by name") {
    // applyExtensions instantiates the configured class reflectively with a
    // zero-arg constructor and calls it as SparkSessionExtensions => Unit — pin
    // that contract so a constructor/package refactor can't silently break
    // --conf spark.sql.extensions=graft.GraftExtensions
    val f = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val ext = new org.apache.spark.sql.SparkSessionExtensions()
    f(ext) // must inject without throwing
  }

  test("session-level register() exposes the same kernels without extensions") {
    val s = TestSpark.spark
    graft.functions.GraftFunctions.register(s)
    val n = s.sql("SELECT bpe_count(array('query')) AS n").head().getAs[Long]("n")
    val ranks = Bpe.ranksOf(Bpe.pretrainedMerges)
    assert(n == Bpe.encodeWord("query", ranks).length)
  }
}
