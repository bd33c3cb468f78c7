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

  /** Interval union per key (sweep-line): overlapping/adjacent
    * [start, end) intervals merge into maximal "islands"; output is
    * one row per island — (key, island, island_start, island_end,
    * n_intervals, covered) — from which time-in-state, coverage
    * ratio, and gap questions all fall out.
    *
    * The sweep is two window passes over the SAME (key, start order)
    * exchange (Catalyst reuses the sort): island boundary = start
    * strictly after the running max end of all earlier intervals;
    * island id = running count of boundaries. Within equal starts the
    * tie order provably cannot change the segmentation (any row tied
    * at start s sees a prefix max ≥ s from its tie group, so only the
    * group's FIRST row can open an island and the prefix max the next
    * start compares against is the whole group's either way) — the
    * output is deterministic without a tie-break column. Integer
    * [start, end) arithmetic: covered = island_end − island_start,
    * exact, no floats anywhere.
    *
    * Scale: one shuffle on key, per-key linear windows; output
    * bounded by island count ≤ interval count.
    */
  def intervalUnion(df: DataFrame, keyCol: String, start: Column,
      end: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol), start.cast("long").as("__s"),
        end.cast("long").as("__e"))
      .where(col("__s").isNotNull && col("__e").isNotNull &&
        col("__e") >= col("__s"))
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("__s"))
    val prevMax = max(col("__e"))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevMax.isNull || col("__s") > prevMax, 1L)
      .otherwise(0L)
    base
      .withColumn("__island", sum(isNew)
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island").as("island"))
      .agg(min(col("__s")).as("island_start"),
        max(col("__e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered", col("island_end") - col("island_start"))
  }

  /** One-sided CUSUM change-point scan (Page 1954), exact-integer and
    * window-only. The textbook recursion S_i = max(0, S_{i−1} + (x_i −
    * target)) looks inherently sequential, but the classic identity
    *   S_i = P_i − min(0, min_{j ≤ i} P_j),  P_i = Σ_{k ≤ i}(x_k − target)
    * turns it into a prefix sum plus a running min — two frames over
    * ONE (key, ts) sort, linear per key, no fold, no collect, exact
    * longs end to end. `flagged` marks S_i > threshold: the sustained
    * upward drift alarm (negate the value column for the downward
    * side).
    *
    * Ties on `tsUs` are ordered by `tieCol` (the CUSUM prefix IS
    * order-sensitive, unlike [[intervalUnion]]'s sweep — a total
    * order is part of the semantics here).
    */
  /** Kaplan–Meier survival estimator (Kaplan & Meier, JASA 1958) with
    * right censoring: S(t) = Π_{s ≤ t} (1 − d_s/n_s) over the ordered
    * distinct event times, one curve per `keys` group (empty `keys` =
    * one global curve). Output per (keys, duration):
    * (duration, n_risk, n_events, n_censored, survival).
    *
    * Determinism: the product is computed in log space with each
    * ln(1 − d/n) term — a correctly-rounded-input libm call, the PSI
    * hazard — snapped to 10⁻¹² fixed point and cumulated as EXACT
    * LONGS in one window; only the final exp runs per output row. A
    * time where everyone at risk dies (d = n) sends the curve to an
    * exact 0 from then on via an integer flag, never a −∞ log.
    *
    * Scale: one hash agg collapses the subject table to its distinct
    * (keys, duration) rows — the windows then run over death-table
    * CARDINALITY, not subjects; with empty `keys` that is a single
    * partition of (distinct durations) rows, which is the
    * metadata-sized frame the estimator inherently produces.
    */
  def kaplanMeier(df: DataFrame, keys: Seq[String], duration: Column,
      observed: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(keys.map(col) :+
        duration.cast("long").as("__t") :+
        observed.cast("boolean").as("__e"): _*)
      .where(col("__t").isNotNull && col("__t") >= 0 &&
        col("__e").isNotNull)
    val g = base.groupBy(keys.map(col) :+ col("__t"): _*)
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("n_events"),
        sum(when(!col("__e"), 1L).otherwise(0L)).as("n_censored"))
    val part = Window.partitionBy(keys.map(col): _*)
    val ord = part.orderBy(col("__t"))
    val removed = coalesce(
      sum(col("n_events") + col("n_censored"))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val total = sum(col("n_events") + col("n_censored"))
      .over(part.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing))
    def d(c: Column) = c.cast("double")
    val withRisk = g.withColumn("n_risk", total - removed)
    val term12 = when(
      col("n_events") > 0 && col("n_events") < col("n_risk"),
      round(log(lit(1.0) - d(col("n_events")) / d(col("n_risk")))
        * 1e12).cast("long")).otherwise(0L)
    val zeroFlag = max(
      when(col("n_events") === col("n_risk"), 1L).otherwise(0L))
      .over(ord.rowsBetween(Window.unboundedPreceding, 0))
    val cum12 = sum(term12)
      .over(ord.rowsBetween(Window.unboundedPreceding, 0))
    withRisk.select(keys.map(col) :+ col("__t").as("duration") :+
      col("n_risk") :+ col("n_events") :+ col("n_censored") :+
      when(zeroFlag === 1, 0.0)
        .otherwise(exp(cum12.cast("double") / 1e12))
        .as("survival"): _*)
  }

  def cusum(df: DataFrame, keyCol: String, tsUs: Column, tieCol: Column,
      cents: Column, targetCents: Long, threshold: Long): DataFrame = {
    require(threshold >= 0, s"need threshold >= 0, got $threshold")
    import org.apache.spark.sql.expressions.Window
    // ordering keys materialized as ATTRIBUTES before the windows:
    // expression-valued sort keys (unix_micros(ts)) defeat ordering
    // propagation between the two window nodes and buy a second
    // SortExec; over plain columns the running-min window reuses the
    // prefix-sum window's sort (asserted in PlanSpec)
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col("__graft_ord"), col("__graft_tie"))
    val p = sum(col("__graft_d"))
      .over(ord.rowsBetween(Window.unboundedPreceding, 0))
    df.withColumn("__graft_ord", tsUs)
      .withColumn("__graft_tie", tieCol)
      .withColumn("__graft_d", cents.cast("long") - lit(targetCents))
      .withColumn("__graft_p", p)
      .withColumn("cusum",
        col("__graft_p") - least(lit(0L), min(col("__graft_p"))
          .over(ord.rowsBetween(Window.unboundedPreceding, 0))))
      .withColumn("flagged", col("cusum") > threshold)
      .drop("__graft_ord", "__graft_tie", "__graft_d", "__graft_p")
  }

  /** Lag-`lag` autocorrelation of a bucketed series: the series is
    * first aggregated to one exact long per integer time bucket
    * (decimal sum, ANSI-loud cast back), then Pearson-correlated
    * against itself shifted by `lag` buckets via
    * [[Profile.corrMatrix]]'s exact-moment machinery — one
    * self-equi-join on (bucket + lag), one hash aggregate of decimal
    * moments, a fixed chain of correctly-rounded double ops. The
    * seasonality/trend screen ("does yesterday predict today?") a
    * freshness monitor runs per partition. Output: one row
    * (n_pairs, autocorr); fewer than 2 pairs or a constant series →
    * NULL autocorr.
    *
    * Scale: the bucket frame is bounded by the TIME RANGE over the
    * bucket width, not by rows; everything downstream runs at bucket
    * grain.
    */
  def autocorrelation(df: DataFrame, bucket: Column, value: Column,
      lag: Int): DataFrame = {
    require(lag >= 1 && lag <= 1000000, s"bad lag $lag")
    val s = df
      .select(bucket.cast("long").as("__t"),
        value.cast("long").as("__v"))
      .where(col("__t").isNotNull && col("__v").isNotNull)
      .groupBy("__t")
      .agg(sum(col("__v").cast("decimal(38,0)")).cast("long")
        .as("__v"))
    val pairs = s.select(col("__t"), col("__v").as("__x"))
      .join(s.select((col("__t") - lag).as("__t"),
        col("__v").as("__y")), "__t")
    Profile.corrMatrix(pairs, Seq("x" -> col("__x"), "y" -> col("__y")))
      .select(col("n").as("n_pairs"), col("corr").as("autocorr"))
  }

  /** Seasonality profile over an integer cycle (hour-of-day,
    * day-of-week): per phase — row count, exact value total, and the
    * share of rows matching `flag` — one hash aggregate, output
    * bounded by the cycle length. `phase = (µs div bucketUs) mod
    * cycle`.
    */
  def seasonalityProfile(df: DataFrame, tsCol: Column, value: Column,
      flag: Column, bucketUs: Long, cycle: Int): DataFrame = {
    require(bucketUs > 0 && cycle >= 2 && cycle <= 100000,
      s"bad bucketUs $bucketUs / cycle $cycle")
    df.select(
        pmod(call_function("div", unix_micros(tsCol), lit(bucketUs)),
          lit(cycle.toLong)).as("phase"),
        value.cast("long").as("__v"), flag.as("__f"))
      .where(col("phase").isNotNull)
      .groupBy("phase")
      .agg(count(lit(1)).as("n"),
        sum(col("__v").cast("decimal(38,0)")).cast("long")
          .as("v_total"),
        round(sum(when(col("__f"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 12).as("flag_rate"))
  }
}
