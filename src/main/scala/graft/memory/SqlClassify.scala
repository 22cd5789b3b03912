package graft.memory

import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, UnresolvedFunction, UnresolvedHaving}
import org.apache.spark.sql.catalyst.parser.{CatalystSqlParser, ParseException}
import org.apache.spark.sql.catalyst.plans.logical._

/** Lightweight SQL classification for store-tip heuristics — the reference's
  * `wren/src/wren/sql_classify.py:7-41` on Catalyst's parser instead of
  * sqlglot, with the same decision table:
  *
  *  - exploratory = a single bare SELECT: no top-level WHERE / GROUP BY /
  *    HAVING, no aggregate anywhere in the tree; LIMIT, ORDER BY and
  *    DISTINCT neither required nor disqualifying;
  *  - a CTE, a set operation, a non-SELECT statement, a multi-statement
  *    text, or an unparseable text is NOT exploratory (never suppress the
  *    "store this query" tip on anything non-trivial).
  */
object SqlClassify {

  /** Lowercased names of aggregate functions: Spark's builtin registry
    * (group `agg_funcs`) plus the engine's own registered aggregates
    * ([[graft.functions.GraftFunctions]] listing, kind `aggregate`).
    */
  lazy val aggregateNames: Set[String] = {
    val builtin = FunctionRegistry.builtin.listFunction().flatMap { fi =>
      FunctionRegistry.builtin.lookupFunction(fi).toSeq
        .filter(_.getGroup == "agg_funcs")
        .map(_ => fi.funcName.toLowerCase)
    }.toSet
    val registered = graft.functions.GraftFunctions.listing
      .filter(_.kind == "aggregate").map(_.name.toLowerCase).toSet
    builtin ++ registered
  }

  def isExploratory(sql: String): Boolean = {
    val plan =
      try CatalystSqlParser.parsePlan(sql)
      catch { case _: ParseException => return false } // can't parse → keep the tip

    // CTE-backed SELECT → analytical (sql_classify.py:26-28)
    val hasCte = plan.exists {
      case _: UnresolvedWith | _: WithCTE => true
      case _ => false
    }
    if (hasCte) return false

    // any aggregate ANYWHERE (subqueries included) → analytical; Catalyst
    // leaves functions unresolved at parse time, so classify by name
    val everyPlan = plan.collectWithSubqueries { case p => p }
    val hasAgg = everyPlan.exists(_.expressions.exists(_.exists {
      case f: UnresolvedFunction =>
        aggregateNames.contains(f.nameParts.last.toLowerCase)
      case _ => false
    }))
    if (hasAgg) return false

    // strip the clauses that do NOT disqualify: LIMIT / OFFSET / ORDER BY /
    // DISTINCT wrap the Project without changing its exploratory nature
    var top = plan
    var stripped = true
    while (stripped) top match {
      case l: GlobalLimit => top = l.child
      case l: LocalLimit => top = l.child
      case o: Offset => top = o.child
      case s: Sort => top = s.child
      case d: Distinct => top = d.child
      case _ => stripped = false
    }

    top match {
      // top-level WHERE (Filter directly under the outer SELECT) or a
      // grouped/HAVING query → analytical; anything else under the Project
      // (relation, join, aliased subquery) keeps it a peek
      case p: Project => p.child match {
        case _: Filter | _: Aggregate | _: UnresolvedHaving => false
        case _ => true
      }
      case _ => false // Aggregate, set ops, DML/DDL, …
    }
  }
}
