package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import graft.functions.{NGrams, Shingles3}

/** Injected optimizer rewrite (the third Catalyst extension tier next
  * to the custom Expressions and the TokenChunkSlices Generator):
  * fuses `array_distinct(ngrams(t, 3))` into the single-pass
  * `Shingles3` kernel and drops a redundant `array_distinct` over an
  * already-distinct `shingles3`. Users writing the composable form in
  * SQL (`array_distinct(ngrams(toks, 3))`) get the fused kernel
  * without knowing it exists — the optimizer, not the query author,
  * owns the fusion, which is exactly how this library stays
  * declarative at 100 TB.
  *
  * Semantics-preserving by construction: NGrams and Shingles3 render
  * null tokens identically ("") and Shingles3 emits first-occurrence
  * order, the same order array_distinct preserves.
  */
object ShingleFusion extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayDistinct(NGrams(t, 3)) => Shingles3(t)
      case ArrayDistinct(s: Shingles3) => s
    }
}

/** Rewrites thresholded edit-distance predicates to Spark's BOUNDED
  * Levenshtein: `levenshtein(a, b) <= k` becomes
  * `levenshtein(a, b, k) >= 0`. The unbounded form fills the full
  * O(|a|·|b|) DP matrix before the comparison ever runs; the bounded
  * form walks only a 2k+1-wide band and bails out immediately when the
  * length difference alone exceeds k — O(k·min(|a|,|b|)) per pair. On
  * a 100 TB record-linkage join the predicate is evaluated once per
  * candidate pair, so this is the difference between the fuzzy verify
  * step costing |s|² and costing k·|s| per pair. Same trick as
  * ShingleFusion: the user writes the natural declarative predicate
  * and the optimizer owns the kernel choice.
  *
  * Semantics-preserving: the bounded form returns the exact distance
  * when it is ≤ k and -1 otherwise, so `bounded >= 0 ⇔ distance <= k`;
  * null inputs yield null under both forms (filter drops the row
  * either way). Only non-negative integer literal thresholds rewrite —
  * a negative k means `bounded` never returns ≥ 0, matching the
  * always-false original.
  */
object LevenshteinBounding extends Rule[LogicalPlan] {
  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
        bounded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 1 =>
        bounded(a, b, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
        bounded(a, b, k)
      // k > lev ⇔ lev <= k-1 (the reversed-literal strict phrasing)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 1 =>
        bounded(a, b, k - 1)
    }
}
