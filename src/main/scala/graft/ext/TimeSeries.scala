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

  /** Exponentially-weighted moving average with EXACT integer
    * arithmetic: per key, in (tsUs, tie) order, each row gets the
    * half-life-one-step EWMA of its trailing `window` integer values
    * (`cents` — scale floats to longs first, the [[Features]]
    * convention). A value `k` steps old weighs 2^−k of the newest,
    * normalized over the observed frame:
    *
    *   num = Σ_{p=1..n} cents_p · 2^(p−1)   (p = 1 oldest in frame)
    *   den = 2^n − 1,   ewma = num / den
    *
    * Both sums are EXACT longs (order-free — no float accumulation
    * drift, engine-portable bit-for-bit), so the only float op is one
    * final IEEE division of two exactly-representable integers —
    * deterministic on any engine. Overflow headroom: |cents| ≤ C
    * requires C · 2^window < 2⁶² (the require below); the default
    * window 30 allows |cents| up to ~4·10⁹.
    *
    * Scale design (100 TB lens): one per-key window exchange (the
    * bounded-partition exception shared with [[Features.trailing]] —
    * a partition holds one key's history, never the corpus); the
    * trailing frame is materialized as a ≤`window`-element array per
    * row and folded inside codegen — no self-join, no explode, state
    * bounded by the window length.
    */
  def ewmaExact(df: DataFrame, keyCol: String, tsUs: Column,
      tieCol: Column, cents: Column, window: Int = 30): DataFrame = {
    require(window >= 1 && window <= 60,
      s"window must be in [1, 60], got $window")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(tsUs, tieCol)
      .rowsBetween(-(window - 1), 0)
    val arr = collect_list(cents.cast("long")).over(w)
    df.withColumn("__graft_arr", arr)
      .withColumn("ewma_n", size(col("__graft_arr")).cast("long"))
      .withColumn("ewma_num",
        aggregate(
          zip_with(col("__graft_arr"),
            sequence(lit(1), col("ewma_n").cast("int")),
            (c, p) => c * call_function("shiftleft", lit(1L),
              (p - 1).cast("int"))),
          lit(0L), (acc, x) => acc + x))
      .withColumn("ewma_den",
        call_function("shiftleft", lit(1L),
          col("ewma_n").cast("int")) - 1L)
      .withColumn("ewma",
        col("ewma_num").cast("double") / col("ewma_den").cast("double"))
      .drop("__graft_arr")
  }
}
