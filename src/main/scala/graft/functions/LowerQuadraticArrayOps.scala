package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Size}
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
  */
object LowerQuadraticArrayOps extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(ArrayDistinct(child), false)
        if child.dataType == ArrayType(StringType, true) ||
          child.dataType == ArrayType(StringType, false) =>
        // Size is IntegerType; DistinctCount is LongType — cast back so
        // downstream resolution is unchanged
        org.apache.spark.sql.catalyst.expressions.Cast(
          DistinctCount(child), s.dataType)
    }
}
