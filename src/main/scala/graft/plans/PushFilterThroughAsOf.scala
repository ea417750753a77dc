package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: push left-side-only predicates below AsOfJoinNode.
  *
  * Catalyst can't see through a custom BinaryNode, so without this rule a
  * `Filter` above the as-of join runs AFTER the merge — the whole left
  * side shuffles and merges only to be discarded. Pushing it down lets
  * the predicate reach the parquet scan (PushedFilters), which at 100 TB
  * is the difference between scanning a partition and scanning the table.
  * Sound because the operator emits exactly one output row per left row:
  * dropping left rows early never changes surviving rows' matches.
  * (Right-side predicates are NOT pushable: removing right rows can
  * change which row is "latest at or before".)
  */
object PushFilterThroughAsOf extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinNode) =>
      val leftOut = a.left.outputSet
      // deterministic-only, like Catalyst's own pushdown rules: a pushed
      // rand() would re-flip on partial recomputation after executor loss
      val (pushable, kept) = splitConjuncts(cond)
        .partition(c => c.deterministic && c.references.subsetOf(leftOut))
      if (pushable.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(pushable.reduce(And), a.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
