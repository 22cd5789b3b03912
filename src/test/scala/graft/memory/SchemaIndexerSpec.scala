package graft.memory

import org.scalatest.funsuite.AnyFunSuite

import graft.mdl._
import graft.queries.Semantic

/** Extraction + description parity with the reference's schema_indexer
  * (`wren/src/wren/memory/schema_indexer.py`): record-per-element walk, the
  * synthesized text templates, the deterministic manifest hash, and the
  * describe threshold behavior.
  */
class SchemaIndexerSpec extends AnyFunSuite {

  private val manifest = Semantic.manifest

  test("extract walks models, columns, relationships and views") {
    val items = SchemaIndexer.extractSchemaItems(manifest)
    val byType = items.groupBy(_.itemType).view.mapValues(_.size).toMap
    assert(byType("model") == manifest.models.size)
    assert(byType("column") == manifest.models.map(_.columns.size).sum)
    assert(byType("relationship") == manifest.relationships.size)
    assert(byType("view") == manifest.views.size)
  }

  test("model record text carries columns and primary key") {
    val rec = SchemaIndexer.extractSchemaItems(manifest)
      .find(i => i.itemType == "model" && i.itemName == "m_orders").get
    assert(rec.text.startsWith("Model 'm_orders'. Columns: o_orderkey (bigint)"))
    assert(rec.text.endsWith(". Primary key: o_orderkey."))
    assert(rec.modelName == "m_orders")
  }

  test("column records carry type, expression, relationship and calc flags") {
    val items = SchemaIndexer.extractSchemaItems(manifest)
    val calc = items.find(i => i.itemType == "column" && i.itemName == "cust_segment" &&
      i.modelName == "m_orders").get
    assert(calc.isCalculated)
    assert(calc.text ==
      "Column 'cust_segment' (varchar) in model 'm_orders'. Calculated: \"customer\".\"c_mktsegment\".")
    val rel = items.find(i => i.itemType == "column" && i.itemName == "customer").get
    assert(rel.text.contains("Relationship: orders_customer"))
    val plain = items.find(i => i.itemType == "column" && i.itemName == "o_orderkey").get
    assert(plain.text == "Column 'o_orderkey' (bigint) in model 'm_orders'.")
    assert(plain.dataType.contains("bigint") && !plain.isCalculated)
  }

  test("relationship and view records match the reference templates") {
    val items = SchemaIndexer.extractSchemaItems(manifest)
    val rel = items.find(_.itemName == "orders_customer").get
    assert(rel.text ==
      "Relationship 'orders_customer': m_orders → m_customer (MANY_TO_ONE). " +
        "Condition: \"m_orders\".\"o_custkey\" = \"m_customer\".\"c_custkey\".")
    val view = items.find(_.itemType == "view").get
    assert(view.text.startsWith("View 'v_big_orders'. SQL: SELECT o_orderkey"))
  }

  test("view statements over 200 chars truncate with an ellipsis") {
    val long = Manifest("c", "s", views = List(View("v", "SELECT " + "x" * 300)))
    val rec = SchemaIndexer.extractSchemaItems(long).find(_.itemType == "view").get
    assert(rec.text.endsWith("…") && rec.text.length < 230)
  }

  test("descriptions from properties surface in records and describe text") {
    val m = Manifest("c", "s", models = List(Model(
      name = "t", tableReference = Some(TableReference(table = "orders")),
      columns = List(Column("k", "bigint", properties = Map("description" -> "the key"))),
      properties = Map("description" -> "a documented model"))))
    val items = SchemaIndexer.extractSchemaItems(m)
    assert(items.find(_.itemType == "model").get.text.contains(": a documented model"))
    assert(items.find(_.itemType == "column").get.text.contains(": the key"))
    val desc = SchemaIndexer.describeSchema(m)
    assert(desc.contains("### Model: t — a documented model"))
    assert(desc.contains("- k (bigint) — the key"))
  }

  test("manifest hash is stable, 16 hex chars, and schema-sensitive") {
    val h1 = SchemaIndexer.manifestHash(manifest)
    val h2 = SchemaIndexer.manifestHash(manifest)
    assert(h1 == h2 && h1.length == 16 && h1.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    val changed = manifest.copy(models = manifest.models.map(m =>
      if (m.name == "m_orders") m.copy(primaryKey = Some("o_custkey")) else m))
    assert(SchemaIndexer.manifestHash(changed) != h1)
    // JSON round-trip preserves the hash (canonicalization is order-free)
    val roundTrip = ManifestJson.parse(ManifestJson.canonical(manifest))
    assert(SchemaIndexer.manifestHash(roundTrip) == h1)
  }

  test("describeSchema renders catalog header, models, relationships, views") {
    val text = SchemaIndexer.describeSchema(manifest)
    assert(text.startsWith("Catalog: graft, Schema: amalgam"))
    assert(text.contains("### Model: m_customer"))
    assert(text.contains("  Primary key: c_custkey"))
    assert(text.contains("[calculated: \"nation\".\"n_name\"]"))
    assert(text.contains("[relationship: customer_nation]"))
    assert(text.contains("### Relationship: lineitem_orders"))
    assert(text.contains("m_lineitem → m_orders (MANY_TO_ONE)"))
    assert(text.contains("### View: v_big_orders"))
    // the fixture manifest is small enough for the full-text strategy
    assert(text.length <= SchemaIndexer.SchemaDescribeThreshold)
  }
}
