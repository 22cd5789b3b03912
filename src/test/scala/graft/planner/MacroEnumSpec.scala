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

  test("pruner never narrows a DISTINCT's key set") {
    // SELECT a FROM (SELECT DISTINCT a, b ...) must count distinct (a, b) pairs
    val viaEngine = session.query(
      """SELECT count(*) FROM (
        |  SELECT o_orderstatus FROM (SELECT DISTINCT o_orderstatus, o_orderkey FROM eo))
        |""".stripMargin).head.getLong(0)
    val direct = session.query("SELECT count(*) FROM eo").head.getLong(0)
    assert(viaEngine == direct, "distinct pairs collapsed — pruning leaked through DISTINCT")
  }

  test("count(*) over a model still prunes the calc join chains (literal fallback)") {
    import graft.queries.Semantic
    val sess = graft.GraftEngine.deployOnDir(spark, Semantic.manifest, TestSpark.sfDir)
    val df = sess.query("SELECT count(*) AS n FROM m_orders")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("customer.parquet"), plan.take(1500))
    assert(df.head.getLong(0) > 0)
  }

  test("macros with parameterized types and redeploy-clobbered functions recover") {
    val m2 = manifest.copy(
      catalog = "g2",
      macros = List(Macro("money", "(x: decimal(18,2)) => cast(x * 2 as double)")))
    val s2 = graft.GraftEngine.deployOnDir(spark, m2, TestSpark.sfDir)
    assert(s2.query("SELECT money(cast(1.5 as decimal(18,2))) AS m").head.getDouble(0) == 3.0)
    // s2's deploy replaced the session-global `shout`? our session restores on use
    assert(session.query("SELECT shout('hi') AS s").head.getString(0) == "HI!")
  }

  test("enum rewrite applies through model substitution too") {
    val n = session.querySubstituted(
      "SELECT count(*) AS n FROM orders WHERE o_orderstatus = Status.Filled").head.getLong(0)
    val direct = session.query(
      "SELECT count(*) FROM eo WHERE o_orderstatus = 'F'").head.getLong(0)
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
