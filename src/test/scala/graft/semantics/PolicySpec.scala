package graft.semantics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.semantics.Policy.PolicyViolation

/** Strict-mode SQL policy (policy.py parity): model-only table references with
  * reference-faithful CTE scoping, table-valued function rejection, denied
  * functions anywhere in the tree.
  */
class PolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val models = Set("orders", "customer")

  private def ok(sql: String, denied: Set[String] = Set.empty): Unit =
    Policy.validate(spark, sql, models, strictMode = true, denied)
  private def bad(sql: String, denied: Set[String] = Set.empty): String =
    intercept[PolicyViolation](
      Policy.validate(spark, sql, models, strictMode = true, denied)).getMessage

  test("strict mode allows model tables and in-scope CTEs") {
    ok("SELECT * FROM orders o JOIN customer c ON o.k = c.k")
    ok("WITH t AS (SELECT * FROM orders) SELECT * FROM t")
    // a later CTE sees an earlier one
    ok("WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a) SELECT * FROM b")
    // subquery inside an expression still resolves against models
    ok("SELECT * FROM orders WHERE k IN (SELECT k FROM customer)")
  }

  test("strict mode rejects unknown tables, including inside subqueries") {
    assert(bad("SELECT * FROM secrets").contains("'secrets'"))
    assert(bad("SELECT * FROM orders WHERE k IN (SELECT k FROM secrets)")
      .contains("'secrets'"))
    // a CTE name is NOT visible to a sibling defined before it
    assert(bad("WITH b AS (SELECT x FROM later), later AS (SELECT 1 AS x) SELECT * FROM b")
      .contains("'later'"))
  }

  test("strict mode rejects table-valued functions") {
    assert(bad("SELECT * FROM range(10)").contains("Table-valued function"))
  }

  test("denied functions are rejected anywhere; others pass") {
    ok("SELECT reflect('java.lang.String', 'valueOf', 1)", denied = Set("other"))
    assert(bad("SELECT reflect('a', 'b') FROM orders", denied = Set("reflect"))
      .contains("'reflect'"))
    assert(bad("SELECT * FROM orders WHERE k = (SELECT max(java_method('x','y')) FROM customer)",
      denied = Set("java_method")).contains("'java_method'"))
  }

  test("non-strict mode with a deny list checks functions only") {
    Policy.validate(spark, "SELECT * FROM anything_goes", models, strictMode = false,
      Set("reflect"))
    intercept[PolicyViolation](Policy.validate(spark,
      "SELECT reflect('a','b') FROM anything_goes", models, strictMode = false,
      Set("reflect")))
  }

  test("queryStrict gates a deployed session") {
    val session = graft.GraftEngine.deployOnDir(
      spark, graft.queries.TpcH.manifest, TestSpark.sfDir)
    assert(session.queryStrict("SELECT count(*) AS n FROM nation").collect()
      .head.getLong(0) == 25)
    intercept[PolicyViolation](session.queryStrict("SELECT * FROM not_a_model"))
    intercept[PolicyViolation](
      session.queryStrict("SELECT count(*) FROM nation", Set("count")))
  }
}
