package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the quick single-scan statistics pass a validator
  * runs before (or instead of) full checks at 100 TB: row/null/distinct
  * counts and value ranges per column.
  *
  * One `agg()` over one scan computes every measure for every column
  * (partial aggregation map-side, one tiny exchange); the wide result
  * row is then unpivoted driver-free with `stack` into the long
  * (column, measure…) shape. Only exact, order-independent measures are
  * emitted (counts, min/max) — no float averages whose partition order
  * could wobble the result.
  */
object Profile {

  /** Per-column stats: (column, n_rows, n_nulls, n_distinct, min_value,
    * max_value) with min/max rendered as strings (heterogeneous column
    * types in one output).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
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
}
