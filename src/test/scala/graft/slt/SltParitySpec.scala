package graft.slt

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tools.{Slt, SltRunner}

/** The reference's own sqllogictest suites replayed through this engine
  * (see [[graft.tools.SltRunner]]): queries AND expected outputs come verbatim
  * from `wren-core/sqllogictest/test_files/`, the outputs having been produced
  * by the reference's DataFusion runtime on its own fixtures. Every mismatch
  * must be a documented engine-semantics divergence in `SltRunner.KnownDiffs`.
  */
class SltParitySpec extends AnyFunSuite {

  // ------------------------------------------------------------ parser laws

  test("parser splits statements, queries, expected blocks, and comments") {
    val recs = Slt.parse(
      """# a comment
        |statement ok
        |SELECT 1
        |
        |query IT rowsort
        |select a, b
        |from t;
        |----
        |1 x
        |2 y
        |
        |include ./other.slt
        |
        |query R
        |select 1.5
        |----
        |1.5
        |""".stripMargin)
    assert(recs.size == 3)
    val s = recs.head.asInstanceOf[Slt.Statement]
    assert(s.sql == "SELECT 1" && !s.expectError)
    val q = recs(1).asInstanceOf[Slt.Query]
    assert(q.types == "IT" && q.rowsort)
    assert(q.sql == "select a, b\nfrom t")
    assert(q.expected == Seq("1 x", "2 y"))
    val q2 = recs(2).asInstanceOf[Slt.Query]
    assert(!q2.rowsort && q2.expected == Seq("1.5"))
  }

  test("cell formatting matches the reference's conversion rules") {
    assert(Slt.cell(null) == "NULL")
    assert(Slt.cell(true) == "true" && Slt.cell(false) == "false")
    assert(Slt.cell("") == "(empty)")
    assert(Slt.cell("a b") == "a b")
    assert(Slt.cell(240.0) == "240") // f64 trailing .0 stripped
    assert(Slt.cell(287.4) == "287.4")
    assert(Slt.cell(Double.NaN) == "NaN")
    assert(Slt.cell(new java.math.BigDecimal("380456.00")) == "380456")
    assert(Slt.cell(new java.math.BigDecimal("505822441.4861")) == "505822441.4861")
    // round to 12 decimal places, strip zeros, no scientific notation
    assert(Slt.cell(new java.math.BigDecimal("0.1234567890123999")) == "0.123456789012")
    assert(Slt.cell(new java.math.BigDecimal("0.00")) == "0")
    assert(Slt.cell(java.time.LocalDateTime.of(2000, 1, 1, 10, 0, 0)) ==
      "2000-01-01T10:00:00")
    assert(Slt.cell(java.time.LocalDateTime.of(2000, 1, 1, 10, 0, 0, 123000000)) ==
      "2000-01-01T10:00:00.123")
    assert(Slt.cell(java.sql.Date.valueOf("1998-09-02")) == "1998-09-02")
  }

  // ------------------------------------------------------- full parity run

  test("reference sqllogictest suites pass (unexpected mismatches = 0)") {
    assume(Files.isDirectory(Paths.get(SltRunner.DefaultRoot)),
      "reference sqllogictest dir not present")
    val (outcomes, skips) = SltRunner.runAll(TestSpark.spark)

    val unexpected = outcomes.filter(o =>
      !o.ok && !SltRunner.KnownDiffs.contains((o.file, o.line)))
    assert(unexpected.isEmpty, unexpected.map(o =>
      s"\n${o.file}:${o.line}\n${o.sql}\n${o.detail}").mkString("\n"))

    // every KnownDiffs entry must still be failing for its stated reason — a
    // stale entry would silently mask a future regression at that line
    val failedKeys = outcomes.filterNot(_.ok).map(o => (o.file, o.line)).toSet
    assert(SltRunner.KnownDiffs.keySet == failedKeys,
      s"KnownDiffs out of sync: declared ${SltRunner.KnownDiffs.keySet}, actual $failedKeys")

    // guard against vacuous passes: the suites contain 45 runnable records
    // (18 model + 6 view + 3 type + 18 tpch, incl. q16 on the synthesized
    // partsupp keys) and skip exactly the 4 RNG-dependent partsupp files
    assert(outcomes.size >= 45, s"only ${outcomes.size} records ran")
    assert(outcomes.count(_.ok) >= 42, s"only ${outcomes.count(_.ok)} records passed")
    assert(skips.map(_.file).toSet == SltRunner.PartsuppFiles)
  }
}
