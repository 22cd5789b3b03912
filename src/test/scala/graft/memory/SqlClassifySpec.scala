package graft.memory

import org.scalatest.funsuite.AnyFunSuite

/** The store-tip classifier's decision table — the reference's parametrized
  * cases verbatim (`wren/tests/unit/test_sql_classify.py:12-48`): exploratory
  * = one bare SELECT (LIMIT/ORDER BY/DISTINCT neutral, even from a limited
  * subquery); WHERE / GROUP BY / HAVING / any aggregate / CTE / set op /
  * non-SELECT / unparseable → analytical (never suppress the tip).
  */
class SqlClassifySpec extends AnyFunSuite {

  private val cases: Seq[(String, Boolean)] = Seq(
    // exploratory: bare SELECT, no WHERE/GROUP/HAVING/agg (LIMIT optional)
    ("SELECT * FROM orders LIMIT 5", true),
    ("SELECT DISTINCT status FROM orders LIMIT 10", true),
    ("SELECT * FROM orders", true),
    ("SELECT * FROM orders ORDER BY total LIMIT 3", true),
    // aggregate present
    ("SELECT status, COUNT(*) FROM orders GROUP BY 1", false),
    // WHERE present
    ("SELECT * FROM orders WHERE total > 100 LIMIT 10", false),
    // UNION — not a bare SELECT
    ("SELECT a FROM x UNION SELECT b FROM y", false),
    // CTE — not exploratory
    ("WITH cte AS (SELECT 1) SELECT * FROM cte LIMIT 1", false),
    // GROUP BY without aggregate
    ("SELECT status FROM orders GROUP BY status LIMIT 5", false),
    // HAVING
    ("SELECT status, COUNT(*) FROM orders GROUP BY status HAVING COUNT(*) > 1", false),
    // aggregate without GROUP BY (scalar aggregate)
    ("SELECT COUNT(*) FROM orders", false),
    ("SELECT SUM(total) FROM orders", false),
    // inner LIMIT only — outer SELECT has no conditions, still exploratory
    ("SELECT * FROM (SELECT * FROM orders LIMIT 5) t", true),
    // inner WHERE only — top-level clauses decide (reference checks stmt.args)
    ("SELECT * FROM (SELECT * FROM orders WHERE total > 1) t", true),
    // but an aggregate ANYWHERE disqualifies (reference uses find(AggFunc))
    ("SELECT * FROM (SELECT count(*) AS n FROM orders) t", false),
    // the engine's own registered aggregates count as aggregates too
    ("SELECT approx_distinct(status) FROM orders", false),
    ("SELECT string_agg(status, ',') FROM orders", false),
    // non-SELECT statements
    ("INSERT INTO t VALUES (1)", false),
    ("DROP TABLE orders", false))

  test("reference decision table") {
    cases.foreach { case (sql, expected) =>
      assert(SqlClassify.isExploratory(sql) == expected, s"sql: $sql")
    }
  }

  test("unparseable, empty, and multi-statement SQL keep the tip") {
    assert(!SqlClassify.isExploratory("NOT VALID SQL $$$$"))
    assert(!SqlClassify.isExploratory(""))
    assert(!SqlClassify.isExploratory("SELECT 1; SELECT 2"))
  }

  test("the CLI surfaces the tip exactly when analytical (cli.py:269-286)") {
    import graft.api.Cli
    assert(Cli.storeTip("SELECT * FROM m_orders LIMIT 5").isEmpty)
    val tip = Cli.storeTip("SELECT sum(o_totalprice) FROM m_orders WHERE o_orderstatus = 'F'")
    assert(tip.isDefined)
    assert(tip.get.contains("# graft memory store --nl"))
    // single quotes escape shell-style, like the reference's _print_store_tip
    assert(tip.get.contains("""o_orderstatus = '\''F'\''"""), tip.get)
  }
}
