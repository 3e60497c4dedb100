package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule for bounded edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` with literal k is rewritten inside Filter
  * conditions to
  * `abs(length(a) - length(b)) <= k AND 0 <= levenshtein(a, b, k) <= k`:
  *
  *  - the length prefilter is O(1) and short-circuits most rows (a length
  *    gap > k already implies distance > k);
  *  - the threshold form is Spark's banded DP — O(len·k) work and O(k)
  *    state instead of the full O(len²) matrix; it returns -1 past the
  *    threshold, hence the `>= 0` guard.
  *
  * All four comparison orientations (`<=`, `<`, and their flipped forms)
  * and equality are matched. The rewrite only fires on the bare 2-arg
  * `levenshtein`, and only produces the 3-arg form — so the rule is
  * idempotent by construction and safe under the optimizer's fixpoint
  * loop. Null semantics are preserved: whenever the original predicate is
  * null for a row (null input), every conjunct of the rewrite is null too.
  */
object BoundedEditDistanceRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) => f.copy(condition = rewrite(cond))
    // predicate pushdown may have folded the filter into a join condition
    case j: Join if j.condition.isDefined =>
      j.copy(condition = j.condition.map(rewrite))
  }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(Levenshtein(a, b, None), k) if fires(a, b, k) =>
      atMost(a, b, k)
    case GreaterThanOrEqual(k, Levenshtein(a, b, None)) if fires(a, b, k) =>
      atMost(a, b, k)
    case LessThan(Levenshtein(a, b, None), k) if fires(a, b, k) =>
      lessThan(a, b, k)
    case GreaterThan(k, Levenshtein(a, b, None)) if fires(a, b, k) =>
      lessThan(a, b, k)
    case EqualTo(Levenshtein(a, b, None), k) if fires(a, b, k) =>
      And(lengthGuard(a, b, k), EqualTo(banded(a, b, k), k))
    case EqualTo(k, Levenshtein(a, b, None)) if fires(a, b, k) =>
      And(lengthGuard(a, b, k), EqualTo(banded(a, b, k), k))
  }

  /** Literal non-negative int bound, deterministic (cheaply re-evaluable)
    * string sides. */
  private def fires(a: Expression, b: Expression, k: Expression): Boolean =
    k.foldable && k.dataType == IntegerType &&
      a.deterministic && b.deterministic && {
        val v = k.eval()
        v != null && v.asInstanceOf[Int] >= 0
      }

  private def banded(a: Expression, b: Expression, k: Expression) =
    Levenshtein(a, b, Some(k))

  private def lengthGuard(a: Expression, b: Expression, k: Expression) =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  private def atMost(a: Expression, b: Expression, k: Expression) =
    And(lengthGuard(a, b, k),
      And(GreaterThanOrEqual(banded(a, b, k), Literal(0)),
        LessThanOrEqual(banded(a, b, k), k)))

  private def lessThan(a: Expression, b: Expression, k: Expression) =
    And(lengthGuard(a, b, k),
      And(GreaterThanOrEqual(banded(a, b, k), Literal(0)),
        LessThan(banded(a, b, k), k)))
}
