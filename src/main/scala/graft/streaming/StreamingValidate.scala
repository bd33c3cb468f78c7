package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.check.Checks
import graft.schema.TableSchema

/** Streaming validation (SURVEY.md §7.6): the reference's batch checks
  * re-expressed over Structured Streaming — watermarks, windowed
  * violation aggregation, stateful dedup.
  *
  * Every function here takes a DataFrame that may be a streaming source
  * (`spark.readStream...`) or a batch one — the plan is identical; only
  * the sink differs. Tests drive them through a file source + memory
  * sink; production would use Kafka → parquet/Delta.
  */
object StreamingValidate {

  /** Per-row constraint-violation flags for a schema — one boolean
    * column per declared check, usable in a streaming select (stateless,
    * so no watermark needed).
    */
  def violationFlags(df: DataFrame, schema: TableSchema): DataFrame = {
    val flags: Seq[Column] = schema.fields.flatMap { f =>
      val c = col(f.name)
      val k = f.constraints
      Seq(
        k.required.filter(identity).map(_ =>
          c.isNull.as(s"${f.name}__required")),
        k.minimum.map(m =>
          (c.isNotNull && c < Checks.typedBound(f, m))
            .as(s"${f.name}__minimum")),
        k.maximum.map(m =>
          (c.isNotNull && c > Checks.typedBound(f, m))
            .as(s"${f.name}__maximum")),
        k.pattern.map(p =>
          (c.isNotNull && !Checks.fullMatch(c, p))
            .as(s"${f.name}__pattern")),
        k.enum.map(vs =>
          (c.isNotNull && !c.isin(vs: _*)).as(s"${f.name}__enum"))
      ).flatten
    }
    df.select(col("*") +: flags: _*)
  }

  /** Tumbling-window event aggregation with a watermark: counts + sum
    * per (window, event_type). `sum` is rounded so results are stable
    * across aggregation orders.
    */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value")), 6).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Sliding-window variant (windowLen every slide). */
  def slidingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"))

  /** Windowed violation-rate monitoring: flag rows violating `bad`,
    * aggregate the violation share per window — streaming quality gate.
    */
  def violationRate(
      events: DataFrame,
      bad: Column,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("total"),
        count(when(bad, lit(1))).as("violations"))
      .select(col("window.start").as("window_start"), col("total"),
        col("violations"))

  /** Stateful exact dedup within the watermark horizon: Structured
    * Streaming keeps the seen-key state and drops late duplicates.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      keyCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")
}
