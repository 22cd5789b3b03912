package graft.planner

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.mdl._

/** v2 macros (SQL temp functions, Catalyst-inlined) and enums (Enum.Value → string
  * literal rewrite), per Macro.java / EnumRewrite.java.
  */
class MacroEnumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def manifest = Manifest(
    catalog = "g", schema = "me",
    models = List(Model(
      "eo", tableReference = Some(TableReference(table = "orders")),
      primaryKey = Some("o_orderkey"),
      columns = List(
        Column("o_orderkey", "bigint"), Column("o_orderstatus", "varchar"),
        Column("o_totalprice", "double")))),
    macros = List(
      Macro("taxed", "(price: double, rate: double) => price * (1 + rate)"),
      Macro("shout", "(s: varchar) => upper(concat(s, '!'))")),
    enums = List(
      EnumDefinition("Status", List(
        EnumValue("Open", Some("O")),
        EnumValue("Filled", Some("F")),
        EnumValue("Pending"))))) // no value -> the name itself

  private lazy val session = GraftEngine.deployOnDir(spark, manifest, TestSpark.sfDir)

  test("macros expand as inlined SQL functions") {
    val r = session.query(
      "SELECT taxed(o_totalprice, 0.1) AS t, shout(o_orderstatus) AS s FROM eo LIMIT 1").head
    assert(r.getDouble(0) > 0 && r.getString(1).endsWith("!"))
  }

  test("Enum.Value dereferences rewrite to the declared literal") {
    val filled = session.query(
      "SELECT count(*) FROM eo WHERE o_orderstatus = Status.Filled").head.getLong(0)
    val direct = session.query(
      "SELECT count(*) FROM eo WHERE o_orderstatus = 'F'").head.getLong(0)
    assert(filled == direct && filled > 0)
    // value defaults to the name when omitted
    val pending = session.query("SELECT Status.Pending AS p").head.getString(0)
    assert(pending == "Pending")
  }

  test("enum rewrite reaches inside subqueries") {
    val n = session.query(
      """SELECT count(*) FROM eo
        |WHERE o_orderkey IN (SELECT o_orderkey FROM eo WHERE o_orderstatus = Status.Open)
        |""".stripMargin).head.getLong(0)
    val direct = session.query(
      "SELECT count(*) FROM eo WHERE o_orderstatus = 'O'").head.getLong(0)
    assert(n == direct && n > 0)
  }

  test("missing enum values fail loud; unrelated two-part names still resolve") {
    val e = intercept[Exception](session.query("SELECT Status.Nope FROM eo"))
    assert(e.getMessage.contains("not found in enum"))
    // table-qualified column references are untouched by the rewrite
    assert(session.query("SELECT eo.o_orderkey FROM eo ORDER BY eo.o_orderkey LIMIT 1")
      .count() == 1)
  }
}
