package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule for bounded-edit-distance predicates, the hot path of
  * fuzzy matching (q60): any top-level conjunct `levenshtein(a, b) <= k`
  * (or `< k`, or the literal-first mirror) is rewritten two ways, both
  * semantics-preserving:
  *
  *  1. **Banded DP**: the comparison becomes
  *     `levenshtein(a, b, k) >= 0` — Spark's threshold form abandons the
  *     dynamic program as soon as the distance provably exceeds k and
  *     returns -1, turning O(|a|·|b|) per pair into O(k·max(|a|,|b|)).
  *  2. **Length prefilter**: `abs(length(a) - length(b)) <= k` is
  *     prepended. Edit distance is bounded below by the length
  *     difference, so the conjunct is implied — but it costs O(1) per
  *     pair and short-circuits the DP entirely for most non-matches.
  *
  * Soundness notes: bounds are derived ONLY from top-level conjuncts —
  * deriving from inside an OR would wrongly constrain the other branch.
  * Rows where either side is NULL fail the predicate before and after
  * (every rewritten form is null-propagating). `k < 0` is left alone
  * (the original predicate is vacuously false; the threshold form's
  * behavior on negative k is not part of its contract). The rewritten
  * shapes no longer match the patterns, so the rule is idempotent under
  * the optimizer's fix-point loop.
  *
  * Registered via [[graft.GraftExtensions]] (config path) or
  * `spark.experimental.extraOptimizations` (running session).
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** (length prefilter, banded-DP comparison) for one conjunct. */
  private def rewrite(conjunct: Expression): Option[(Expression, Expression)] =
    conjunct match {
      case LessThanOrEqual(lev @ Levenshtein(_, _, None), k) => bounded(lev, k, 0)
      case GreaterThanOrEqual(k, lev @ Levenshtein(_, _, None)) => bounded(lev, k, 0)
      case LessThan(lev @ Levenshtein(_, _, None), k) => bounded(lev, k, -1)
      case GreaterThan(k, lev @ Levenshtein(_, _, None)) => bounded(lev, k, -1)
      case _ => None
    }

  private def bounded(
      lev: Levenshtein, k: Expression, slack: Int): Option[(Expression, Expression)] =
    k match {
      // Long arithmetic: kv + slack on Int wraps for kv = Int.MinValue,
      // which would rewrite an always-false predicate into always-true
      case Literal(kv: Int, IntegerType) if kv.toLong + slack >= 0 =>
        val bound = Literal(kv + slack, IntegerType)
        val prefilter = LessThanOrEqual(
          Abs(Subtract(Length(lev.left), Length(lev.right))), bound)
        val banded = GreaterThanOrEqual(
          Levenshtein(lev.left, lev.right, Some(bound)), Literal(0, IntegerType))
        Some((prefilter, banded))
      case _ => None
    }

  private def augment(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (!conjuncts.exists(c => rewrite(c).isDefined)) cond
    else conjuncts.flatMap { c =>
      rewrite(c) match {
        case Some((prefilter, banded)) => Seq(prefilter, banded) // cheap first
        case None => Seq(c)
      }
    }.reduce(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val next = augment(cond)
      if (next.fastEquals(cond)) f else f.copy(condition = next)
    case j @ Join(_, _, _, Some(cond), _) =>
      val next = augment(cond)
      if (next.fastEquals(cond)) j else j.copy(condition = Some(next))
  }
}
