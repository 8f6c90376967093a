package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Equality, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Shared bail-out for this package's join-rewrite rules.
  *
  * Both rewrites target joins that would otherwise plan as
  * BroadcastNestedLoopJoin — i.e. joins with NO equality conjunct
  * between the children. The guard below makes that precondition
  * explicit, and it is also what makes the rules safe inside Spark's
  * fixed-point "Operator Optimization" batch (the
  * `SparkSessionExtensions.injectOptimizerRule` path): after a rewrite,
  * `PushDownPredicates` pushes the exact residual predicate (the
  * levenshtein / BETWEEN conjuncts) back INTO the new join's condition
  * on the next iteration, so without the guard the rule would re-match
  * its own output every iteration — a non-converging optimizer and an
  * exponentially nesting Generate plan. The rewritten join always
  * carries a `graft_*_var = graft_*_var` equality between the children,
  * so "condition already has an equi-conjunct" is exactly the marker
  * that the work is done (or was never needed: Catalyst plans such a
  * join as a hash/sort-merge join with the theta conjunct as a
  * post-join filter, which is already the scalable plan).
  */
trait JoinRewriteGuard extends PredicateHelper {

  /** True when some conjunct of `cond` is an equality (`=` or `<=>`)
    * whose two sides' references split across `left` and `right`. */
  protected def hasEquiConjunct(
      cond: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case Equality(a, b) =>
        a.references.nonEmpty && b.references.nonEmpty &&
          ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))
      case _ => false
    }
}
