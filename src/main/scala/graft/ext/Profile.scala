package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the quick single-scan statistics pass a validator
  * runs before (or instead of) full checks at 100 TB: row/null/distinct
  * counts and value ranges per column.
  *
  * Distinct counts default to `approx_count_distinct` (HyperLogLog++):
  * one scan, partial aggregation map-side, one tiny exchange — matching
  * the operator's quick-screen purpose. EXACT `count_distinct` over N
  * columns in one `agg` makes Catalyst plan an Expand that multiplies
  * every input row ×(N+1) before the shuffle — at 100 TB that is N+1
  * scans' worth of shuffle input, so exact mode is an explicit opt-in
  * (`exact = true`) for when the precise cardinality is the deliverable.
  *
  * The wide one-row result is then unpivoted driver-free with `stack`
  * into the long (column, measure…) shape. Apart from the approx
  * distinct estimate, only exact order-independent measures are emitted
  * (counts, min/max) — no float averages whose partition order could
  * wobble the result.
  */
object Profile {

  /** Per-column stats: (column, n_rows, n_nulls, n_distinct, min_value,
    * max_value) with min/max rendered as strings (heterogeneous column
    * types in one output). `n_distinct` is an HLL++ estimate at `rsd`
    * relative error unless `exact = true`.
    */
  def columnProfile(df: DataFrame, cols: Seq[String],
      exact: Boolean = false, rsd: Double = 0.05): DataFrame = {
    def distinctAgg(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c, rsd)
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
        distinctAgg(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__distinct`, " +
        s"`${c}__min`, `${c}__max`").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)")
  }

  /** Numeric quantile profile: one row per column with its interpolated
    * quantiles at `probabilities` (linear interpolation — the
    * `quantile_cont` convention), computed in ONE scan across all
    * columns.
    *
    * Default is `percentile_approx` (a bounded-size quantile sketch per
    * partial — the only shape that survives unbounded cardinality at
    * 100 TB). `exact = true` opts into Spark's exact percentile, whose
    * partial state is a value→count map: partial-aggregable and cheap
    * while the column's cardinality is bounded (enums, small-domain
    * measures), NOT for high-cardinality columns. Inputs are cast to
    * double so decimal columns profile under the same interpolation
    * arithmetic on every engine.
    */
  def numericProfile(df: DataFrame, cols: Seq[String],
      probabilities: Seq[Double] = Seq(0.25, 0.5, 0.75),
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    val probs = array(probabilities.map(lit): _*)
    def qAgg(c: Column): Column =
      if (exact) percentile(c.cast("double"), probs)
      else percentile_approx(c.cast("double"), probs, lit(accuracy))
    val aggs = cols.map(c => qAgg(col(c)).as(s"${c}__q"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', `${c}__q`").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, quantiles)")
  }
}
