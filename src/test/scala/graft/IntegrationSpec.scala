package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.planner.PathResolver

/** End-to-end: the public API contract from a *serialized* manifest (the form a
  * reference user migrates with — JSON over HTTP/base64), through deploy, query,
  * dry-run, substitution, JSON response, and the extractor path.
  */
class IntegrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private val manifestJson =
    """{
      |  "catalog": "it", "schema": "demo",
      |  "models": [
      |    {"name": "it_orders",
      |     "tableReference": {"table": "orders"},
      |     "primaryKey": "o_orderkey",
      |     "columns": [
      |       {"name": "o_orderkey", "type": "bigint"},
      |       {"name": "o_custkey", "type": "bigint"},
      |       {"name": "o_totalprice", "type": "double"},
      |       {"name": "order_day", "type": "date", "expression": "cast(o_orderdate as date)"},
      |       {"name": "customer", "type": "it_customer", "relationship": "it_oc"},
      |       {"name": "segment", "type": "varchar", "isCalculated": 1,
      |        "expression": "\"customer\".\"c_mktsegment\""}
      |     ]},
      |    {"name": "it_customer",
      |     "tableReference": {"table": "customer"},
      |     "primaryKey": "c_custkey",
      |     "columns": [
      |       {"name": "c_custkey", "type": "bigint"},
      |       {"name": "c_mktsegment", "type": "varchar"}
      |     ]}
      |  ],
      |  "relationships": [
      |    {"name": "it_oc", "models": ["it_orders", "it_customer"],
      |     "joinType": "MANY_TO_ONE",
      |     "condition": "\"it_orders\".\"o_custkey\" = \"it_customer\".\"c_custkey\""}
      |  ],
      |  "views": [
      |    {"name": "it_daily",
      |     "statement": "SELECT order_day, count(*) AS n FROM it.demo.it_orders GROUP BY order_day"}
      |  ]
      |}""".stripMargin

  test("json manifest -> deploy -> query/dryRun/substitute/jsonResponse") {
    val session = GraftEngine.deployJson(spark, manifestJson, new PathResolver(dir))

    // model with expression + calculated column
    val rows = session.query(
      "SELECT o_orderkey, order_day, segment FROM it_orders ORDER BY o_orderkey LIMIT 5").collect()
    assert(rows.length == 5 && rows.forall(_.getString(2) != null))

    // MDL view with namespace-qualified model reference
    assert(session.query("SELECT sum(n) FROM it_daily").head.getLong(0) > 0)

    // dryRun passes for valid SQL, throws for invalid
    session.dryRun("SELECT segment FROM it_orders")
    intercept[Exception] { session.dryRun("SELECT nope FROM it_orders") }

    // substitution: physical name "orders" routes to the model
    val sub = session.querySubstituted(
      "SELECT o_orderkey, segment FROM orders WHERE o_orderkey < 10")
    assert(sub.columns.contains("segment"))

    // JSON response shape
    val json = session.queryJson("SELECT o_orderkey FROM it_orders ORDER BY 1", 1)
    assert(json.startsWith("""{"columns":["o_orderkey"]"""))

    // base64 round trip + extractor pruning to one model
    val b64 = java.util.Base64.getEncoder.encodeToString(manifestJson.getBytes("UTF-8"))
    val pruned = GraftEngine.deployJson(spark, b64, new PathResolver(dir),
      forSql = Some("SELECT c_custkey FROM it_customer"))
    assert(pruned.manifest.models.map(_.name) == List("it_customer"))
  }
}
