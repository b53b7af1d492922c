package graft.plans

import org.apache.spark.sql.catalyst.expressions.ArrayDistinct
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
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
