package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling — event streams onto a regular bucket grid
  * WITH the empty buckets materialized (gap filling). Downstream
  * consumers (anomaly scans, rate monitors, chart layers) need "0
  * events between 03:10 and 03:15" to be a ROW, not an absence — a
  * silent gap is indistinguishable from a healthy quiet period in the
  * aggregated frame alone.
  *
  * Scale design (100 TB lens):
  *  - bucketing is the exact subtract-mod long arithmetic of
  *    [[Behavior.weekIndex]] (portable, no floats), aggregated by one
  *    map-side-combinable hash agg — output is bounded by the CALENDAR
  *    SPAN / bucket width, not the event count;
  *  - the grid comes from `sequence(min_bucket, max_bucket)` off a
  *    1-row bounds aggregate — one array of (span/width) elements on
  *    one executor row, exploded and left-joined against the bucket
  *    aggregate. A decade of minute buckets is a 5.3M-element array:
  *    acceptable as a single row, but choose the bucket width for the
  *    span being resampled (the require below refuses > 10M buckets);
  *  - the grid join keys are dense integers on both sides — a
  *    broadcast-friendly dimension at any corpus size.
  */
object TimeSeries {

  /** Per-bucket event counts over the full observed range, empty
    * buckets included as explicit zero rows. `tsMicros` must be a LONG
    * microsecond column. Output: (bucket, bucket_start, n_events),
    * one row per grid bucket.
    */
  def resampleCounts(df: DataFrame, tsMicros: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "need bucketUs > 0")
    val bk = ((tsMicros - pmod(tsMicros, lit(bucketUs))) / lit(bucketUs))
      .cast("long")
    // scoped cache: the bucket aggregate feeds both the grid bounds
    // and the join — without it the corpus scan+agg runs twice
    CacheScope.withCached(
      df.select(bk.as("__graft_bk"))
        .groupBy("__graft_bk").agg(count(lit(1)).as("__graft_n"))) {
      perBucket =>
        val bounds = perBucket.agg(
          min("__graft_bk").as("__graft_lo"),
          max("__graft_bk").as("__graft_hi"))
        // grid-size guard: evaluated from the SAME bounds frame the grid
        // uses, inside the plan (assert_true), so no extra driver action.
        // coalesce(…, true): an EMPTY input has null bounds — sequence()
        // then yields no rows, which is the right answer, not an assertion
        val grid = bounds
          .select(explode(sequence(
            col("__graft_lo"),
            when(assert_true(
                coalesce(col("__graft_hi") - col("__graft_lo") < 10000000L,
                  lit(true)),
                lit("resample grid exceeds 10M buckets — widen bucketUs"))
              .isNull, col("__graft_hi"))))
            .as("bucket"))
        grid.join(perBucket, col("bucket") === col("__graft_bk"),
            "left_outer")
          .select(col("bucket"),
            timestamp_micros(col("bucket") * lit(bucketUs))
              .as("bucket_start"),
            coalesce(col("__graft_n"), lit(0L)).as("n_events"))
    }
  }
}
