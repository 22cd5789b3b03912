package graft.planner

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.mdl._
import graft.tools.SltRunner.BareNameResolver

/** COVERAGE.md documents that deployments wanting the reference's
  * case-sensitive identifier behavior set `spark.sql.caseSensitive=true` on
  * the session and the engine is agnostic — this spec substantiates the
  * claim: deploy, expression columns over lower-case source names, calc
  * expressions with quoted identifiers, qualified references, and
  * distinctly-cased model columns all work under the flag.
  */
class CaseSensitiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("deploy + query work under spark.sql.caseSensitive=true") {
    import spark.implicits._
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      Seq((1, "LA", "CA"), (2, "SF", "CA")).toDF("id", "city", "state")
        .createOrReplaceTempView("cs_src")
      val m = Manifest(
        catalog = "wrenai", schema = "public",
        models = List(Model("Customers",
          tableReference = Some(TableReference(table = "cs_src")),
          primaryKey = Some("Id"),
          columns = List(
            Column("Id", "int", expression = Some("id")),
            Column("City", "varchar", expression = Some("city")),
            Column("City_state", "varchar",
              expression = Some("\"city\" || ' ' || \"state\""))))))
      val s = GraftEngine.deploy(spark, m, BareNameResolver)
      val rows = s.query("SELECT Id, City, City_state FROM Customers ORDER BY Id")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      assert(rows == Seq((1, "LA", "LA CA"), (2, "SF", "SF CA")))
      // catalog-qualified reference resolves case-sensitively too
      assert(s.query("SELECT `City` FROM wrenai.public.`Customers`")
        .collect().length == 2)
      // under the flag the differently-cased name is a real miss, like the
      // reference's case-sensitive resolution
      intercept[Exception](s.query("SELECT CITY FROM Customers").collect())
    } finally spark.conf.set("spark.sql.caseSensitive", "false")
  }
}
