package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.queries.Semantic

/** Pins the fidelity-lossy transliteration probes for the golden-only trio
  * (mysql/bigquery/oracle) — the round-13 structural-execution ask.
  *
  * Three proofs per probe entry, making the rewrite set falsifiable:
  *  1. soundness precondition — the ORIGINAL rendering carries none of the
  *     replacement spellings, so the residual proof below cannot be fooled
  *     by pre-existing RHS text;
  *  2. residual equality — deleting the pinned LHS spellings from the
  *     original and the pinned RHS spellings from the copy leaves
  *     byte-identical strings: the rewrite touched ONLY the adjudicated
  *     spellings (join shape, subquery scoping, predicates, frames all
  *     byte-preserved);
  *  3. DuckDB-clean lint — no dialect-native spelling survives in the copy
  *     (the copy is then executed by the driver's DuckDB gate as
  *     `m2x_translit_<dialect>` entries).
  *
  * Plus coverage pins: every rule in the adjudicated set actually FIRES on
  * at least one probe (m37 exists precisely to execute the dual-strip and
  * VARCHAR2 rewrites), and mysql/bigquery rewrites invert exactly.
  */
class TransliterateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val session =
    GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)

  private lazy val rendered: Seq[(String, String, String)] =
    Semantic.translitCorpus.map { case (n, d, sql) =>
      (n, d, session.transformSql(sql, d))
    }

  /** Spellings that must NOT survive transliteration (literal-stripped). */
  private val duckForbidden: Seq[(String, scala.util.matching.Regex)] = Seq(
    "backtick quote" -> "`".r,
    "oracle NUMBER type" -> raw"\bNUMBER\(".r,
    "oracle VARCHAR2 type" -> raw"\bVARCHAR2\b".r,
    "oracle BINARY_DOUBLE type" -> raw"\bBINARY_DOUBLE\b".r,
    "oracle dual table" -> raw"\bFROM dual\b".r,
    "mysql SIGNED cast" -> raw"\bSIGNED\b".r,
    "googlesql FLOAT64" -> raw"\bFLOAT64\b".r,
    "googlesql INT64" -> raw"\bINT64\b".r)

  test("every probe: soundness precondition + residual equality + clean copy") {
    rendered.foreach { case (n, d, orig) =>
      val copy = Transliterate(d, orig)
      // 1. no RHS spelling pre-exists in the original
      for (r <- Transliterate.rules(d); t <- r.target)
        assert(t.findFirstIn(orig).isEmpty,
          s"$n: original already contains RHS spelling '${r.label}' — residual proof unsound")
      // 2. the rewrite touched ONLY the pinned spellings
      assert(Transliterate.residualSource(d, orig) ==
        Transliterate.residualTarget(d, copy),
        s"$n: transliteration changed more than the pinned spellings")
      // 3. nothing dialect-native survives (outside string literals)
      val t = DialectLint.stripLiterals(copy)
      for ((label, re) <- duckForbidden; m <- re.findFirstMatchIn(t))
        fail(s"$n: transliterated copy still carries $label at …${t.slice(
          math.max(0, m.start - 30), m.end + 30)}…")
    }
  }

  test("mysql and bigquery transliterations invert exactly") {
    rendered.filter(e => e._2 == "mysql" || e._2 == "bigquery").foreach {
      case (n, d, orig) =>
        val copy = Transliterate(d, orig)
        val back = d match {
          case "mysql" =>
            copy.replace("AS BIGINT", "AS SIGNED").replace('"', '`')
          case "bigquery" =>
            copy.replaceAll(raw"\bDOUBLE\b", "FLOAT64")
              .replaceAll(raw"\bBIGINT\b", "INT64").replace('"', '`')
        }
        assert(back == orig, s"$n: inverse round-trip drifted")
    }
  }

  test("the adjudicated rewrite set is fully exercised across the probes") {
    val fired = scala.collection.mutable.Set.empty[(String, String)]
    rendered.foreach { case (_, d, orig) =>
      Transliterate.rules(d).foreach { r =>
        if (r.source.findFirstIn(orig).isDefined) fired += ((d, r.label))
      }
    }
    val all = for ((d, rs) <- Transliterate.rules.toSeq; r <- rs) yield (d, r.label)
    val unfired = all.toSet -- fired
    assert(unfired.isEmpty,
      s"rewrites defined but never exercised by any probe: $unfired — " +
        "either drop the rule or add a probe (m37 exists for dual/VARCHAR2)")
  }

  test("m37's oracle rendering carries the VALUES-over-dual expansion") {
    val m37 = rendered.find(_._1 == "m37_translit_oracle").get._3
    assert(m37.contains("FROM dual") && m37.contains("UNION ALL"),
      "m37 no longer renders an inline-VALUES dual expansion — the dual-strip " +
        "rewrite would go unexercised")
    assert(m37.contains("VARCHAR2("),
      "m37 no longer renders a VARCHAR2 cast — the varchar2 rewrite would go unexercised")
  }

  test("tpch translit breadth pin: 65 combos entried, each renders clean") {
    import graft.queries.TpcH
    val keys = TpcH.translitQueries.keySet
    assert(keys.size == 65, s"expected 65 tpch translit entries, got ${keys.size}")
    assert(!keys.contains("tpch_q20_translit_mysql"),
      "q20/mysql is the documented char_length skip")
    assert(TpcH.translitSkip == Set(("tpch_q20", "mysql")),
      "skip set drifted — re-run the TpchTranslitDump pre-flight before widening it")
    // every entried combo must render, transliterate, and survive the
    // DuckDB-clean lint (a rendering change that leaks a trio spelling the
    // map doesn't cover fails HERE, before the driver gate sees it)
    val tpchSession =
      graft.GraftEngine.deployOnDir(spark, TpcH.manifest, TestSpark.sfDir)
    for ((n, (_, sql)) <- TpcH.defs; d <- Seq("mysql", "bigquery", "oracle")
         if !TpcH.translitSkip((n, d))) {
      val copy = Transliterate(d, tpchSession.transformSql(sql, d))
      val t = DialectLint.stripLiterals(copy)
      for ((label, re) <- duckForbidden; m <- re.findFirstMatchIn(t))
        fail(s"${n}_translit_$d: copy carries $label at …${t.slice(
          math.max(0, m.start - 30), m.end + 30)}…")
    }
    // redeploy the semantic fixture so suites sharing the session are unaffected
    graft.GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)
  }

  test("unsupported dialects are refused, not silently passed through") {
    assert(!Transliterate.supports("postgres") && !Transliterate.supports("duckdb"))
    intercept[NoSuchElementException] { Transliterate("postgres", "SELECT 1") }
  }
}
