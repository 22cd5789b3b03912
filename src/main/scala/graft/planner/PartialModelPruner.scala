package graft.planner

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._

/** The engine-side PartialModelPlanNode (reference A6): model views project every
  * declared column, so their calc-field join chains sit in EVERY query's analyzed
  * plan — even `SELECT o_orderkey FROM m_orders` drags the customer→nation→region
  * joins. Spark cannot eliminate them (join elimination needs uniqueness knowledge
  * it doesn't have), but the planner can: every to-one join side it generates is
  * unique on its join key BY CONSTRUCTION (relationship declared *_TO_ONE on the
  * related model's primary key, or a groupBy(pk) aggregate join-back), so a marked
  * left-outer join whose right side is never referenced can be dropped without
  * changing cardinality or results.
  *
  * The pass is deliberately scoped: only joins whose right side carries the
  * [[PartialModelPruner.Marker]] subquery alias (added in `SemanticPlanner`'s model
  * build) are candidates — user-written joins are never touched — and requirement
  * tracking descends conservatively (unknown operators require all child outputs).
  */
object PartialModelPruner {

  val Marker = "__graft_prunable"

  private def isMarked(p: LogicalPlan): Boolean = p match {
    case SubqueryAlias(id, child) =>
      id.name == Marker || (child match {
        case SubqueryAlias(id2, _) => id2.name == Marker
        case _ => false
      })
    case _ => false
  }

  def prune(plan: LogicalPlan): LogicalPlan = go(plan, plan.outputSet)

  private def go(plan0: LogicalPlan, required: AttributeSet): LogicalPlan = {
    // Subquery expressions (IN/EXISTS/scalar) carry their own plans, invisible
    // to child recursion — a model referenced only inside `WHERE x IN (SELECT
    // pk FROM m_...)` kept its whole calc-join chain. Pruning them is safe for
    // every subquery kind: the dropped joins are to-one by construction, so the
    // subquery's row multiplicity (IN/EXISTS semantics) and single-row contract
    // (scalar) are untouched.
    val plan = plan0.transformExpressions {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        s.withNewPlan(go(s.plan, s.plan.outputSet))
    }
    plan match {
    case Join(left, right, LeftOuter, _, _)
        if isMarked(right) && required.intersect(right.outputSet).isEmpty =>
      go(left, required)

    // Prune project lists so a model view's blanket projection doesn't keep dead
    // join outputs alive; the top-level call passes plan.outputSet, so the result
    // schema can never change.
    case Project(list, child) =>
      val kept = list.filter(ne => required.contains(ne.toAttribute))
      // nothing required at all (e.g. under count(*)): a literal keeps the node
      // valid without pinning an arbitrary first column (which could be a calc
      // field whose join chain this pass exists to drop)
      val keptList =
        if (kept.nonEmpty) kept
        else Seq(org.apache.spark.sql.catalyst.expressions.Alias(
          org.apache.spark.sql.catalyst.expressions.Literal(1), "__graft_one")())
      val childReq = AttributeSet(keptList.flatMap(_.references))
      Project(keptList, go(child, childReq))

    case j @ Join(left, right, _, _, _) =>
      val lr = j.references ++ required.intersect(left.outputSet)
      val rr = j.references ++ required.intersect(right.outputSet)
      j.copy(left = go(left, lr), right = go(right, rr))

    // DISTINCT semantics depend on EVERY child column, referenced upstream or not —
    // pruning beneath would change the distinct key set.
    case d: Distinct =>
      d.withNewChildren(Seq(go(d.child, d.child.outputSet)))
    case d: Deduplicate =>
      d.withNewChildren(Seq(go(d.child, d.child.outputSet)))

    // Filter/Sort/Limit/Window/Aggregate/SubqueryAlias/...: the child must supply
    // this node's own references plus whatever of its outputs flow upward.
    case u: UnaryNode =>
      u.withNewChildren(Seq(go(u.child, u.references ++ required.intersect(u.child.outputSet))))

    case other =>
      other.withNewChildren(other.children.map(c => go(c, c.outputSet)))
    }
  }
}
