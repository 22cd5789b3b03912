package graft.semantics

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Decision-point analysis shapes (DecisionPointAnalyzer parity): select items
  * with function/arithmetic flags, relation trees with join types and criteria,
  * AND/OR filter trees, group-by keys, sortings, and per-expression source
  * attribution through alias scopes.
  */
class QueryAnalyzerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def analyze(sql: String): JValue = QueryAnalyzer.analyze(spark, sql)

  test("aggregate query: select items, group keys, sortings, filter tree") {
    val a = analyze(
      """SELECT o_custkey, sum(o_totalprice) AS total, o_custkey * 2
        |FROM orders
        |WHERE o_orderstatus = 'F' AND (o_totalprice > 10 OR o_custkey = 1)
        |GROUP BY o_custkey, o_custkey * 2
        |ORDER BY total DESC""".stripMargin)
    val items = (a \ "selectItems").children
    assert(items.size == 3)
    assert((items(1) \ "aliasName") == JString("total"))
    assert((items(1) \ "properties" \ "includeFunctionCall") == JString("true"))
    assert((items(2) \ "properties" \ "includeMathematicalOperation") == JString("true"))
    assert((items(0) \ "exprSources")(0) \ "sourceDataset" == JString("orders"))
    assert((a \ "relation" \ "type") == JString("TABLE"))
    assert((a \ "relation" \ "tableName") == JString("orders"))
    assert((a \ "filter" \ "type") == JString("AND"))
    assert((a \ "filter" \ "right" \ "type") == JString("OR"))
    assert((a \ "filter" \ "left" \ "type") == JString("EXPR"))
    val keys = ((a \ "groupByKeys")(0)).children
    assert(keys.size == 2)
    assert((a \ "sortings")(0) \ "ordering" == JString("DESCENDING"))
  }

  test("join tree: types, criteria, alias-scoped source attribution") {
    val a = analyze(
      """SELECT c.c_name, o.o_totalprice
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey""".stripMargin)
    val rel = a \ "relation"
    assert((rel \ "type") == JString("LEFT_JOIN"))
    assert((rel \ "left" \ "tableName") == JString("customer"))
    assert((rel \ "left" \ "alias") == JString("c"))
    assert((rel \ "right" \ "tableName") == JString("orders"))
    assert(jstr(rel \ "criteria").exists(_.startsWith("ON ")))
    // qualified refs resolve through the alias scope
    val items = (a \ "selectItems").children
    assert((items(0) \ "exprSources")(0) \ "sourceDataset" == JString("customer"))
    assert((items(1) \ "exprSources")(0) \ "sourceDataset" == JString("orders"))
    val joinSources = (rel \ "exprSources").children
      .map(s => jstr(s \ "sourceDataset").getOrElse("")).toSet
    assert(joinSources == Set("customer", "orders"))
  }

  test("CTE and subquery relations are flagged and nested") {
    val cte = analyze("WITH t AS (SELECT 1 AS x) SELECT x FROM t")
    assert((cte \ "isSubqueryOrCte") == JBool(true))
    val sub = analyze("SELECT s.n FROM (SELECT count(*) AS n FROM orders) s")
    assert((sub \ "relation" \ "type") == JString("SUBQUERY"))
    assert((sub \ "relation" \ "alias") == JString("s"))
    val body = (sub \ "relation" \ "body")(0)
    assert(((body \ "selectItems")(0) \ "aliasName") == JString("n"))
  }

  private def jstr(v: JValue): Option[String] =
    v match { case JString(s) => Some(s); case _ => None }
}
