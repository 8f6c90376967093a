package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Catalyst optimizer rule: rewrite a raw edit-distance theta join
  * (`levenshtein(l, r) <= k`, k ∈ {1, 2}, no equi-key) into the
  * symmetric-delete variant equi-join of [[graft.ops.Fuzzy]] —
  * automatically, so users who write the natural similarity join get a
  * shuffle equi-join instead of BroadcastNestedLoopJoin evaluating
  * levenshtein |L|·|R| times.
  *
  * Rewrite (deletion-variant array V(s, k), which is complete for edit
  * distance ≤ k — proof in [[graft.ops.Fuzzy]]):
  * {{{
  *   Join_inner(L, R, levenshtein(l, r) <= k && extras)
  *   ==>
  *   Project(original output,
  *     Filter(lvar = array_min(array_intersect(lvars, rvars))  // dedup
  *            && levenshtein(l, r) <= k && extras,             // exact residual
  *       Join_inner(
  *         Generate(explode(lvars), Project(L.*, V(l, k) AS lvars)),
  *         Generate(explode(rvars), Project(R.*, V(r, k) AS rvars)),
  *         lvar = rvar)))
  * }}}
  * Unlike the binned range join, a pair CAN meet under several shared
  * variants, so multiplicity needs explicit care: both sides carry
  * their full variant array through the join, and the filter keeps
  * exactly the row whose joined variant is the MINIMUM of the two
  * arrays' intersection — one surviving row per qualifying input pair,
  * preserving input multiplicity exactly (duplicate input rows stay
  * duplicated, as the nested-loop plan would). The levenshtein
  * residual restores precision; the variant join cannot lose a
  * qualifying pair, so the rewrite is semantics-preserving.
  *
  * Fires only on inner joins whose conjuncts contain `levenshtein(l,
  * r) <= k` (either spelled direction, k a 1-or-2 literal, no
  * three-arg threshold form) with l's references confined to one child
  * and r's to the other, and — critically — no existing equality
  * conjunct between the children ([[JoinRewriteGuard]]): a join that
  * already has an equi-key plans as a hash join with the levenshtein
  * conjunct as a residual filter (already scalable), and the rewritten
  * join itself carries `graft_l_var = graft_r_var`, which is what stops
  * the rule re-matching its own output after `PushDownPredicates`
  * pushes the levenshtein residual back into the join condition inside
  * the fixed-point Operator Optimization batch (the
  * `injectOptimizerRule` path). NULL inputs: the variant expression of a NULL
  * string is NULL, Generate(explode) drops the row — the same rows the
  * nested-loop join would drop (levenshtein(NULL, _) <= k is NULL).
  */
case class FuzzyJoinRule() extends Rule[LogicalPlan] with JoinRewriteGuard {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      fuzzyPred(cond, left, right) match {
        case Some((l, r, k)) =>
          val lVars = Alias(variantsExpr(l, k), "graft_l_vars")()
          val rVars = Alias(variantsExpr(r, k), "graft_r_vars")()
          val lVar = AttributeReference("graft_l_var", StringType)()
          val rVar = AttributeReference("graft_r_var", StringType)()
          val newLeft = Generate(
            Explode(lVars.toAttribute), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(lVar),
            child = Project(left.output :+ lVars, left))
          val newRight = Generate(
            Explode(rVars.toAttribute), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(rVar),
            child = Project(right.output :+ rVars, right))
          val varJoin = Join(newLeft, newRight, Inner,
            Some(EqualTo(lVar, rVar)), hint)
          val dedup = EqualTo(lVar,
            ArrayMin(ArrayIntersect(lVars.toAttribute, rVars.toAttribute)))
          Project(j.output, Filter(And(dedup, cond), varJoin))
        case None => j
      }
  }

  /** Extract (l, r, k) when the conjuncts contain `levenshtein(l, r)
    * <= k` with k ∈ {1, 2} and the string sides split across the join
    * children (in either order — l is normalized to any side; the
    * variant construction is symmetric). */
  private def fuzzyPred(
      cond: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Int)] = {
    if (hasEquiConjunct(cond, left, right)) return None
    val ks = splitConjunctivePredicates(cond).collect {
      case LessThanOrEqual(Levenshtein(l, r, None), IntLit(k)) => (l, r, k)
      case GreaterThanOrEqual(IntLit(k), Levenshtein(l, r, None)) => (l, r, k)
    }
    ks.collectFirst {
      case (l, r, k) if (k == 1 || k == 2) &&
        l.dataType == StringType && r.dataType == StringType &&
        l.references.nonEmpty && r.references.nonEmpty &&
        ((l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
          (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet))) =>
        (l, r, k.toInt)
    }
  }

  private object IntLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  /** `s` with the character at 1-based position `i` removed — built
    * from resolved nodes only (the optimizer runs post-analysis, so no
    * unresolved lambda sugar). */
  private def deleteAt(s: Expression, i: Expression): Expression =
    Concat(Seq(
      Substring(s, Literal(1), Subtract(i, Literal(1))),
      Substring(s, Add(i, Literal(1)), Length(s))))

  /** The ≤1-deletion neighborhood (s plus every single-char deletion),
    * guarded for the empty string: sequence(1, 0) would count DOWN. */
  private def variants1(s: Expression): Expression = {
    val i = NamedLambdaVariable("graft_i", IntegerType, nullable = false)
    If(
      EqualTo(Length(s), Literal(0)),
      CreateArray(Seq(s)),
      ArrayDistinct(Concat(Seq(
        CreateArray(Seq(s)),
        ArrayTransform(
          // Sequence is TimeZoneAwareExpression: without an explicit
          // timeZoneId it reports unresolved post-analysis (see
          // BinnedRangeJoinRule)
          new Sequence(Literal(1), Length(s))
            .withTimeZone(conf.sessionLocalTimeZone),
          LambdaFunction(deleteAt(s, i), Seq(i)))))))
  }

  private def variantsExpr(s: Expression, k: Int): Expression = k match {
    case 1 => variants1(s)
    case 2 =>
      val v = NamedLambdaVariable("graft_v", StringType, nullable = true)
      ArrayDistinct(Flatten(ArrayTransform(
        variants1(s), LambdaFunction(variants1(v), Seq(v)))))
  }
}
