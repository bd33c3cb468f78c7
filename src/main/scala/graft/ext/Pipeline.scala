package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composition helper for end-to-end cleaning pipelines: apply stages
  * cumulatively and report the surviving row count after each — the
  * funnel report every production data pipeline ships with its output.
  *
  * The result is a tiny (|stages|+1)-row frame regardless of input
  * scale. Each stage's count is a separate aggregation branch over the
  * cumulative plan, unioned lazily — Spark runs them as one job, and
  * shared scan prefixes are the optimizer's to reuse. At 100 TB the
  * counts ride the same partial-aggregation machinery as everything
  * else; nothing is collected driver-side beyond |stages| longs.
  */
object Pipeline {

  def funnel(
      base: DataFrame,
      stages: Seq[(String, DataFrame => DataFrame)]): DataFrame = {
    val cumulative = stages.scanLeft(("s0_raw", base)) {
      case ((_, df), (name, f)) => (name, f(df))
    }
    cumulative.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(i).cast("long").as("stage_idx"),
          lit(name).as("stage"), col("n_rows"))
    }.reduce(_ unionByName _)
  }
}
