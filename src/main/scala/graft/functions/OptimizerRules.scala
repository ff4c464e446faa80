package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound levenshtein-threshold predicates.
  *
  * `levenshtein(a, b) <= k` evaluates the full O(|a|·|b|) dynamic program
  * for every row — even for pairs whose lengths already rule them out.
  * This rule rewrites the predicate to
  *
  *   abs(length(a) − length(b)) <= k  AND  levenshtein(a, b, k) >= 0
  *
  * which is value-identical (edit distance is at least the length
  * difference, and Spark's threshold-form levenshtein returns −1 iff the
  * distance exceeds k, computing only a 2k+1-wide band of the DP matrix —
  * O(k·min|a|,|b|) instead of O(|a|·|b|)). In a blocked fuzzy join the
  * guard short-circuits most candidate pairs at the cost of two length
  * reads — exactly the predicate-tightening a 100 TB record-linkage pass
  * needs, applied automatically to every user query.
  *
  * The rewrite only fires on the threshold-free form, so it is idempotent
  * by construction; null semantics are preserved (both conjuncts are null
  * exactly when either input is null, same as the original predicate).
  * Registered by [[GraftExtensions]] (`injectOptimizerRule`) and available
  * at runtime via `spark.experimental.extraOptimizations`.
  */
object LevenshteinLengthGuard extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), k @ Literal(kv: Int, IntegerType))
        if kv >= 0 =>
      And(
        LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k),
        GreaterThanOrEqual(Levenshtein(l, r, Some(k)), Literal(0)))
    case GreaterThanOrEqual(k @ Literal(kv: Int, IntegerType), Levenshtein(l, r, None))
        if kv >= 0 => // the mirrored spelling k >= levenshtein(a, b)
      And(
        LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k),
        GreaterThanOrEqual(Levenshtein(l, r, Some(k)), Literal(0)))
  }
}
