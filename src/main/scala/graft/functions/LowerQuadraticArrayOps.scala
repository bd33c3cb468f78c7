package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Cast, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule: lower `size(array_distinct(x))` over string arrays
  * to the native [[DistinctCount]] expression.
  *
  * `array_distinct` on non-primitive element types is a per-element
  * linear scan (O(n²) per row) that also materializes the deduplicated
  * array just to take its length. [[DistinctCount]] is one hash pass
  * with no intermediate array and identical semantics (null counts as
  * one distinct member — asserted in the parity tests). Users writing
  * the idiomatic Spark formulation get the native speed without
  * knowing graft's function exists — the same contract Catalyst's own
  * rewrite rules follow: observable results unchanged, plan cost
  * reduced.
  *
  * Scoped deliberately narrowly: only string-element arrays (what
  * [[DistinctCount]] implements) and only the exact Size(ArrayDistinct)
  * shape. `legacySizeOfNull` returns -1 for null input in legacy mode —
  * `Size(null)` is null in both modes only when `legacySizeOfNull` is
  * false, so the rule keeps the legacy flag's semantics by matching
  * only non-legacy Size (DistinctCount is null-on-null).
  *
  * The rule is active in any session that went through
  * `GraftFunctions.register` (via `experimental.extraOptimizations`) or
  * the `spark.sql.extensions=graft.functions.GraftExtensions` conf.
  * Gate: set `spark.graft.lowerArrayOps=false` to disable per-session —
  * REQUIRED when comparing a `size(array_distinct(...))` "executable
  * spec" formulation (e.g. [[graft.ext.TextAnalysis.dupNgramFracHof]])
  * against the native expression: with the rule active both sides lower
  * to [[DistinctCount]] and the parity check is vacuous.
  */
object LowerQuadraticArrayOps extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.lowerArrayOps"

  private def isStringArray(dt: org.apache.spark.sql.types.DataType) =
    dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(EnabledConf, "true") != "true") plan
    else plan.transformAllExpressions {
      case s @ Size(ArrayDistinct(child), false)
        if isStringArray(child.dataType) =>
        // Size is IntegerType; DistinctCount is LongType — cast back so
        // downstream resolution is unchanged
        Cast(DistinctCount(child), s.dataType)
    }
}
