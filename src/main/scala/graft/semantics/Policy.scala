package graft.semantics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedRelation, UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}

/** Strict-mode SQL policy validation — the engine-side analogue of the reference
  * SDK's policy layer (`wren/src/wren/policy.py:15-110` `validate_sql_policy`):
  *
  *   - strict mode: every table reference must be an MDL model/view name or a CTE
  *     visible at that point in the query (CTE scoping follows the reference — a
  *     WITH clause is visible to its own body and everything beneath it, and each
  *     CTE sees the CTEs defined before it); table-valued functions
  *     (`range()`, `read_csv(...)`, …) are rejected outright, since they bypass
  *     the governed model surface;
  *   - denied functions: any function whose bare name is on the deny list is
  *     rejected wherever it appears (projections, filters, subqueries).
  *
  * Validation runs on the PARSED (unresolved) Catalyst plan, before any view
  * expansion — the same phase the reference checks its sqlglot AST — so policy
  * errors surface without touching data or the model views.
  */
object Policy {

  final class PolicyViolation(message: String) extends RuntimeException(message)

  def validate(
      spark: SparkSession, sql: String, allowedTables: Set[String],
      strictMode: Boolean = true, deniedFunctions: Set[String] = Set.empty): Unit = {
    if (!strictMode && deniedFunctions.isEmpty) return
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val allowed = allowedTables.map(_.toLowerCase)
    val denied = deniedFunctions.map(_.toLowerCase)

    def checkExpressions(p: LogicalPlan, visible: Set[String]): Unit =
      p.expressions.foreach(_.foreach {
        case f: UnresolvedFunction
            if denied.contains(f.nameParts.last.toLowerCase) =>
          throw new PolicyViolation(
            s"Function '${f.nameParts.mkString(".")}' is denied by policy")
        case sq: SubqueryExpression => check(sq.plan, visible)
        case _ =>
      })

    def check(p: LogicalPlan, visible: Set[String]): Unit = p match {
      case w: UnresolvedWith =>
        // each CTE sees the ones defined before it; the body sees them all
        var vis = visible
        w.cteRelations.foreach { rel =>
          check(rel._2, vis)
          vis += rel._1.toLowerCase
        }
        check(w.child, vis)
      case r: UnresolvedRelation if strictMode =>
        val bare = r.multipartIdentifier.last.toLowerCase
        val full = r.multipartIdentifier.map(_.toLowerCase).mkString(".")
        if (!allowed.contains(bare) && !allowed.contains(full) &&
          !visible.contains(bare))
          throw new PolicyViolation(
            s"Table '${r.multipartIdentifier.mkString(".")}' is not defined in the " +
              "MDL manifest. In strict mode, all table references must correspond " +
              "to MDL models")
      case tvf: UnresolvedTableValuedFunction if strictMode =>
        throw new PolicyViolation(
          s"Table-valued function '${tvf.name.mkString(".")}' is not allowed. " +
            "In strict mode, all table references must correspond to MDL models")
      case other =>
        checkExpressions(other, visible)
        other.children.foreach(check(_, visible))
    }
    check(plan, Set.empty)
  }
}
