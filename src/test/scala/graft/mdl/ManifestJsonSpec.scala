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

  test("layoutVersion defaults to 1, validates against max 2 (manifest.rs:96-109)") {
    assert(ManifestJson.parse(json).layoutVersion == 1)
    ManifestJson.parse(json).validateLayoutVersion() // current versions pass
    val v9 = ManifestJson.parse("""{"catalog":"c","schema":"s","layoutVersion":9}""")
    assert(v9.layoutVersion == 9)
    val e = intercept[IllegalArgumentException](v9.validateLayoutVersion())
    assert(e.getMessage.contains("layout version 9") && e.getMessage.contains("up to 2"))
  }

  test("model/view dialect fields are tolerated and surfaced (manifest-macro lib.rs:164,410)") {
    val m = ManifestJson.parse(
      """{"catalog":"c","schema":"s",
        |"models":[{"name":"m","tableReference":"t","dialect":"bigquery",
        |  "columns":[{"name":"x","type":"int"}]}],
        |"views":[{"name":"v","statement":"select 1","dialect":"postgres"}]}""".stripMargin)
    assert(m.models.head.dialect.contains("bigquery"))
    assert(m.views.head.dialect.contains("postgres"))
  }

  test("v2 concepts parse: metrics, cumulative metrics, macros, enums, dateSpine") {
    val m = ManifestJson.parse(
      """{"catalog":"c","schema":"s",
        |"metrics":[{"name":"mt","baseObject":"mo",
        |  "dimension":[{"name":"d","type":"varchar"}],
        |  "measure":[{"name":"n","type":"bigint","expression":"count(*)"}],
        |  "timeGrain":[{"name":"g","refColumn":"dt","dateParts":["MONTH","YEAR"]}]}],
        |"cumulativeMetrics":[{"name":"cm","baseObject":"mo",
        |  "measure":{"name":"x","operator":"SUM","refColumn":"v"},
        |  "window":{"name":"w","refColumn":"dt","timeUnit":"month",
        |            "start":"1995-01-01","end":"1995-12-01"}}],
        |"macros":[{"name":"f","definition":"(x: int) => x + 1"}],
        |"enumDefinitions":[{"name":"E","values":[{"name":"A","value":"a"},{"name":"B"}]}],
        |"dateSpine":{"unit":"month","start":"1990-01-01","end":"2020-01-01"}}""".stripMargin)
    assert(m.metrics.head.timeGrain.head.dateParts == List("MONTH", "YEAR"))
    assert(m.cumulativeMetrics.head.measure.operator == "sum")
    assert(m.macros.head.parameters == List(("x", "int")) && m.macros.head.body == "x + 1")
    assert(m.enumDef("e").flatMap(_.valueOf("b")).contains("B")) // value defaults to name
    assert(m.dateSpine == DateSpine("MONTH", "1990-01-01", "2020-01-01"))
    intercept[IllegalArgumentException](Macro("bad", "no arrow here"))
    intercept[RuntimeException](ManifestJson.parse(
      """{"catalog":"c","schema":"s","metrics":[{"name":"m","baseObject":"b"}]}"""))
  }

  test("cube hierarchies parse sorted and validate drill paths (lib.rs:356-369)") {
    val m = ManifestJson.parse(
      """{"catalog":"c","schema":"s",
        |"cubes":[{"name":"sales","baseObject":"orders",
        |  "dimensions":["region","nation","city"],
        |  "hierarchies":{"geo":["region","nation","city"],"alpha":["region"]}}]}""".stripMargin)
    val cube = m.cubes.head
    assert(cube.hierarchies.map(_._1) == List("alpha", "geo")) // deterministic BTreeMap order
    assert(cube.hierarchy("GEO").contains(List("region", "nation", "city")))
    assert(graft.semantics.Validator.cubeHierarchyIsValid(cube).valid)
    val bad = cube.copy(hierarchies = List("geo" -> List("region", "galaxy")))
    val res = graft.semantics.Validator.cubeHierarchyIsValid(bad)
    assert(!res.valid && res.message.contains("galaxy"))
  }

  test("canonical JSON is a lossless fixed point over every manifest section") {
    // exercises every serialized field at a NON-default value, so any field
    // toJValue forgot (layoutVersion and metric `cached` were once dropped)
    // breaks the fixed-point assertion instead of hiding in a default
    val full = ManifestJson.parse(
      """{"catalog":"c","schema":"s","dataSource":"duckdb","layoutVersion":2,
        |"models":[
        |  {"name":"orders","tableReference":{"catalog":"g","schema":"main","table":"orders"},
        |   "primaryKey":"o_orderkey","cached":true,"refreshTime":"1h","dialect":"ansi",
        |   "properties":{"description":"the orders"},
        |   "columns":[
        |     {"name":"o_orderkey","type":"int8","notNull":true},
        |     {"name":"o_total","type":"double","expression":"o_totalprice + 0",
        |      "isHidden":true,"properties":{"description":"price"}},
        |     {"name":"customer","type":"customer","relationship":"oc"},
        |     {"name":"cn","type":"varchar","isCalculated":true,
        |      "expression":"\"customer\".\"c_name\""},
        |     {"name":"gated","type":"varchar",
        |      "columnLevelAccessControl":{"name":"clac1","operator":"EQUALS","threshold":"1",
        |        "requiredProperties":[{"name":"lvl","required":true,"defaultExpr":"0"}]}}],
        |   "rowLevelAccessControls":[
        |     {"name":"rls1","condition":"o_orderkey > @min_key",
        |      "requiredProperties":[{"name":"min_key","required":true}]}]},
        |  {"name":"cust_sql","refSql":"SELECT 1 AS c_custkey",
        |   "columns":[{"name":"c_custkey","type":"int8"}]}],
        |"relationships":[{"name":"oc","models":["orders","cust_sql"],
        |  "joinType":"MANY_TO_ONE","condition":"a = b"}],
        |"views":[{"name":"v1","statement":"select 1","dialect":"duckdb"}],
        |"cubes":[{"name":"cb","baseObject":"orders","dimensions":["d1","d2"],
        |  "hierarchies":{"h":["d1","d2"]},
        |  "measures":[{"name":"n","expression":"count(*)"}],"timeDimensions":["d2"]}],
        |"metrics":[{"name":"mt","baseObject":"orders","cached":true,
        |  "dimension":[{"name":"d","type":"varchar"}],
        |  "measure":[{"name":"n","type":"bigint","expression":"count(*)"}],
        |  "timeGrain":[{"name":"tg","refColumn":"d2","dateParts":["month","year"]}]}],
        |"cumulativeMetrics":[{"name":"cm","baseObject":"orders","cached":true,
        |  "measure":{"name":"cr","type":"double","operator":"sum","refColumn":"o_total"},
        |  "window":{"name":"w","refColumn":"d2","timeUnit":"month",
        |    "start":"2024-01-01","end":"2024-12-01"}}],
        |"macros":[{"name":"mc","definition":"(x: double) => x + 1"}],
        |"enumDefinitions":[{"name":"E","values":[{"name":"A","value":"a"},{"name":"B"}]}],
        |"dateSpine":{"unit":"day","start":"2024-01-01","end":"2024-12-31"}}""".stripMargin)
    assert(full.layoutVersion == 2 && full.models.head.cached)
    assert(full.metrics.head.cached && full.cumulativeMetrics.head.cached)
    val canon = ManifestJson.canonical(full)
    val reparsed = ManifestJson.parse(canon)
    assert(reparsed.layoutVersion == 2, "layoutVersion must survive serialization")
    assert(reparsed.metrics.head.cached && reparsed.cumulativeMetrics.head.cached,
      "metric cached flags must survive serialization")
    assert(reparsed == full, "parse(canonical(m)) must be lossless")
    assert(ManifestJson.canonical(reparsed) == canon, "canonical is a fixed point")
    // the hash is blind to NOTHING it parses: flipping each once-dropped
    // field changes the fingerprint
    import graft.memory.SchemaIndexer.manifestHash
    assert(manifestHash(full.copy(layoutVersion = 1)) != manifestHash(full))
    assert(manifestHash(full.copy(metrics = full.metrics.map(_.copy(cached = false))))
      != manifestHash(full))
  }
}
