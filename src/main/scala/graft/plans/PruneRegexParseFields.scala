package graft.plans

import org.apache.spark.sql.catalyst.expressions.GetStructField
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{RegexParse, RegexParseField}

/** Optimizer rule: a `GetStructField` DIRECTLY over an inlined
  * [[RegexParse]] narrows to the single-field [[RegexParseField]] — the
  * same one regex match per row, none of the unused groups extracted,
  * cast, or copied into UTF8Strings, and no struct row allocated.
  *
  * Why the direct shape exists at all: `PushPredicateThroughProject`
  * substitutes a parse alias into the predicate that consumes it, so a
  * grep-style filter on one parsed field (`parsed.code rlike '^5'`)
  * reaches the optimizer's end as `GetStructField(RegexParse(line), i)`
  * inside the Filter — the hot shape of the headline pipeline, where the
  * full 7-field apache parse was paying 6 dead field extractions per row.
  *
  * Safety: each direct `GetStructField(RegexParse)` site already implies
  * a full per-site parse evaluation (expression trees are copies after
  * alias substitution), so the rewrite never increases the number of
  * regex matches — it only strips dead per-match work. Parses shared
  * through an alias that survives to the physical plan are referenced as
  * attributes, not inline children, and are left untouched.
  *
  * Registered via `GraftExtensions` (`injectOptimizerRule`) and via
  * `spark.experimental.extraOptimizations` on the repo's own sessions —
  * both run after the main operator-optimization batches, i.e. after the
  * pushdown that creates the shape.
  */
object PruneRegexParseFields extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.EXTRACT_VALUE)) {
      case GetStructField(rp: RegexParse, ordinal, _) =>
        RegexParseField(rp.child, rp.pattern, rp.fields(ordinal))
    }
}
