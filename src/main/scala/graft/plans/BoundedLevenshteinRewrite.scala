package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound threshold comparisons of unbounded Levenshtein.
  *
  * `levenshtein(a, b) <= k`  ⇒  `|len(a) − len(b)| <= k  AND
  *                               0 <= levenshtein(a, b, k) <= k`
  * (and the `<` / mirrored literal-on-the-left forms).
  *
  * Why: the unbounded distance runs the full O(|a|·|b|) DP for every pair
  * even when the answer is "way above k"; the 3-arg form caps DP work at
  * O(k·n) and bails out early, and the length-difference pigeonhole
  * (distance ≥ |len diff|) skips the DP entirely for length-distant pairs.
  * The rewrite is a pure boolean equivalence — `levenshtein(a,b,k)` returns
  * the exact distance when ≤ k and −1 otherwise — so it is safe anywhere
  * the comparison appears, not just in Filter predicates.
  */
object BoundedLevenshteinRewrite extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Expression,
                      strict: Boolean): Expression = {
    val lev = Levenshtein(a, b, Some(k))
    val upper: Expression =
      if (strict) LessThan(lev, k) else LessThanOrEqual(lev, k)
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k),
      And(GreaterThanOrEqual(lev, Literal(0)), upper))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
        bounded(a, b, k, strict = false)
      case LessThan(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
        bounded(a, b, k, strict = true)
      case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(a, b, None)) =>
        bounded(a, b, k, strict = false)
      case GreaterThan(k @ Literal(_, IntegerType), Levenshtein(a, b, None)) =>
        bounded(a, b, k, strict = true)
    }
}
