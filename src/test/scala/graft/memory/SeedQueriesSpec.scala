package graft.memory

import org.scalatest.funsuite.AnyFunSuite

import graft.mdl._
import graft.queries.Semantic

/** Seed NL→SQL template parity with `wren/src/wren/memory/seed_queries.py`. */
class SeedQueriesSpec extends AnyFunSuite {

  test("every model gets a listing; numeric/group columns add aggregations") {
    val pairs = SeedQueries.generateSeedQueries(Semantic.manifest)
    assert(pairs.contains(SeedPair("List all m_orders", "SELECT * FROM m_orders LIMIT 100")))
    // m_orders: first non-pk non-calc numeric is o_custkey; first groupable
    // non-numeric non-calc non-pk is o_orderstatus
    assert(pairs.contains(SeedPair(
      "Total o_custkey in m_orders", "SELECT SUM(o_custkey) FROM m_orders")))
    assert(pairs.contains(SeedPair(
      "o_custkey by o_orderstatus in m_orders",
      "SELECT o_orderstatus, SUM(o_custkey) FROM m_orders GROUP BY 1")))
  }

  test("relationships seed join templates with the declared condition") {
    val pairs = SeedQueries.generateSeedQueries(Semantic.manifest)
    assert(pairs.contains(SeedPair(
      "m_orders with m_customer details",
      "SELECT * FROM m_orders JOIN m_customer ON \"m_orders\".\"o_custkey\" = " +
        "\"m_customer\".\"c_custkey\" LIMIT 100")))
  }

  test("calculated and pk columns never seed; missing numerics skip aggregation") {
    val m = Manifest("c", "s", models = List(Model(
      name = "t", tableReference = Some(TableReference(table = "x")),
      primaryKey = Some("id"),
      columns = List(
        Column("id", "bigint"),
        Column("score", "double", isCalculated = true, expression = Some("1")),
        Column("label", "varchar")))))
    val pairs = SeedQueries.generateSeedQueries(m)
    // pk numeric and calculated numeric are both ineligible → listing only
    assert(pairs == Seq(SeedPair("List all t", "SELECT * FROM t LIMIT 100")))
  }

  test("parameterized numeric types count as numeric (decimal(18,2))") {
    val m = Manifest("c", "s", models = List(Model(
      name = "t", tableReference = Some(TableReference(table = "x")),
      columns = List(Column("amt", "decimal(18,2)"), Column("seg", "varchar")))))
    val pairs = SeedQueries.generateSeedQueries(m)
    assert(pairs.exists(_.sql == "SELECT SUM(amt) FROM t"))
    assert(pairs.exists(_.sql == "SELECT seg, SUM(amt) FROM t GROUP BY 1"))
  }
}
