package graft.mdl

import org.scalatest.funsuite.AnyFunSuite

class ManifestJsonSpec extends AnyFunSuite {

  private val json =
    """{
      |  "catalog": "wren", "schema": "public",
      |  "models": [
      |    {"name": "orders",
      |     "tableReference": {"schema": "main", "table": "orders"},
      |     "primaryKey": "o_orderkey", "cached": 1,
      |     "columns": [
      |       {"name": "o_orderkey", "type": "int8"},
      |       {"name": "o_total", "type": "double", "expression": "cast(o_totalprice as double)", "isHidden": 0},
      |       {"name": "customer", "type": "customer", "relationship": "orders_customer"},
      |       {"name": "cust_name", "type": "varchar", "isCalculated": true,
      |        "expression": "\"customer\".\"c_name\""}
      |     ],
      |     "rowLevelAccessControls": [
      |       {"name": "rls1", "condition": "\"o_orderkey\" > @min_key",
      |        "requiredProperties": [{"name": "min_key", "required": true}]}
      |     ]},
      |    {"name": "customer", "tableReference": "main.customer",
      |     "columns": [
      |       {"name": "c_custkey", "type": "int8"},
      |       {"name": "c_name", "type": "varchar",
      |        "columnLevelAccessControl": {"name": "clac1", "operator": "EQUALS",
      |          "threshold": "1", "requiredProperties": [{"name": "lvl"}]}}
      |     ]}
      |  ],
      |  "relationships": [
      |    {"name": "orders_customer", "models": ["orders", "customer"],
      |     "joinType": "MANY_TO_ONE", "condition": "orders.o_custkey = customer.c_custkey"}
      |  ],
      |  "views": [{"name": "v1", "statement": "select * from orders"}]
      |}""".stripMargin

  test("parses the full manifest shape") {
    val m = ManifestJson.parse(json)
    assert(m.catalog == "wren" && m.schema == "public")
    assert(m.models.size == 2 && m.views.size == 1 && m.relationships.size == 1)
  }

  test("int-as-bool tolerance (manifest.rs:295-318)") {
    val m = ManifestJson.parse(json)
    assert(m.models.head.cached)
    assert(!m.models.head.columns(1).isHidden)
  }

  test("tableReference accepts object and dotted-string forms (manifest.rs:215-293)") {
    val m = ManifestJson.parse(json)
    assert(m.models.head.tableReference.contains(TableReference(None, Some("main"), "orders")))
    assert(m.models(1).tableReference.contains(TableReference(None, Some("main"), "customer")))
  }

  test("relationship direction: MANY_TO_ONE is to-one from the many side") {
    val r = ManifestJson.parse(json).relationships.head
    assert(r.isToOneFrom("orders"))
    assert(!r.isToOneFrom("customer"))
    assert(r.other("orders") == "customer")
  }

  test("access-control payloads decode") {
    val m = ManifestJson.parse(json)
    val rlac = m.models.head.rowLevelAccessControls.head
    assert(rlac.requiredProperties.head.required)
    val clac = m.models(1).columns(1).columnLevelAccessControl.get
    assert(clac.operator == "EQUALS" && clac.threshold == "1")
  }

  test("base64 manifests decode (ibis-server/app/model/__init__.py:14)") {
    val b64 = java.util.Base64.getEncoder.encodeToString(json.getBytes("UTF-8"))
    assert(ManifestJson.parseBase64(b64).models.size == 2)
  }

  test("refSql and tableReference are mutually exclusive (manifest.rs:396-407)") {
    intercept[IllegalArgumentException] {
      Model("bad", refSql = Some("select 1"),
        tableReference = Some(TableReference(table = "t")))
    }
  }
}
