package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key rolling-window feature engineering — the "trailing 1-hour
  * activity per user" family that event-stream ML features are built
  * from.
  *
  * Scale shape: ONE window, PARTITIONED by the key and RANGE-framed on
  * the event time — each partition holds one key's history (the same
  * per-key contract as sessionization), never the corpus; the frame is
  * value-based, so tied timestamps resolve identically regardless of
  * physical row order. Hot keys are the known tradeoff — cap or salt
  * upstream (see Sampling.capPerKey) if one key's history exceeds a
  * task.
  *
  * Determinism: aggregate only COUNTs and INTEGER sums inside the frame
  * (callers pass values pre-scaled to integer units, e.g. cents) —
  * sliding-frame double addition is evaluation-order-sensitive and
  * engine-specific, integer addition is exact everywhere.
  */
object Features {

  /** Append trailing-window features: for every row, `n_trail` = count
    * and `sum_trail` = exact integer sum of `intValue` over the
    * trailing `windowMicros` of this key's events (inclusive of the
    * current row and its time-ties).
    */
  def trailing(df: DataFrame, keyCol: String, tsMicros: Column,
      intValue: Column, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    require(!df.columns.exists(
      Seq("__ts", "__c", "n_trail", "sum_trail").contains),
      "input columns collide with trailing's working/output columns " +
        "(__ts/__c/n_trail/sum_trail)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__ts"))
      .rangeBetween(-windowMicros, 0)
    df.withColumn("__ts", tsMicros)
      .withColumn("__c", intValue)
      .withColumn("n_trail", count(lit(1)).over(w))
      .withColumn("sum_trail", sum(col("__c")).over(w))
      .drop("__ts", "__c")
  }
}
