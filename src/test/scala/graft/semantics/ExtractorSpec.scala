package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Semantic

class ExtractorSpec extends AnyFunSuite {

  test("extraction keeps only transitively needed models (extractor.rs)") {
    val m = ManifestExtractor.extract(Semantic.manifest, "SELECT * FROM m_lineitem")
    val names = m.models.map(_.name).toSet
    // m_lineitem's calcs traverse lineitem->orders->customer->(nation->region via customer calcs)
    assert(names.contains("m_lineitem") && names.contains("m_orders") && names.contains("m_customer"))
    assert(m.relationships.forall(r => r.models.forall(x => names.exists(_.equalsIgnoreCase(x)))))
  }

  test("unrelated models are pruned") {
    val solo = Semantic.manifest.copy(models = Semantic.manifest.models,
      relationships = Semantic.manifest.relationships)
    val m = ManifestExtractor.extract(solo, "SELECT r_name FROM m_region")
    assert(m.models.map(_.name) == List("m_region"))
  }

  test("views pull in their underlying models") {
    val m = ManifestExtractor.extract(Semantic.manifest, "SELECT * FROM v_big_orders")
    assert(m.views.map(_.name) == List("v_big_orders"))
    assert(m.models.exists(_.name == "m_orders"))
  }
}
