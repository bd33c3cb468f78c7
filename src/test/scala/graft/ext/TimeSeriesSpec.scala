package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resampleCounts fills interior gaps with explicit zeros") {
    // buckets of 10µs: events in buckets 1, 1, 3, 6 → grid 1..6
    val df = Seq(10L, 15L, 30L, 60L).toDF("us")
    val out = TimeSeries.resampleCounts(df, col("us"), 10L)
      .select("bucket", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L), (2L, 0L), (3L, 1L), (4L, 0L),
      (5L, 0L), (6L, 1L)))
  }

  test("resampleCounts on an empty frame is empty, not an error") {
    val df = Seq.empty[Long].toDF("us")
    assert(TimeSeries.resampleCounts(df, col("us"), 10L).count() === 0L)
  }

  test("bucket_start reconstructs the grid timestamp") {
    val df = Seq(3600L * 1000000L + 5L).toDF("us")
    val r = TimeSeries.resampleCounts(df, col("us"), 3600L * 1000000L)
      .collect().head
    assert(r.getLong(0) === 1L)
    assert(r.getTimestamp(1).toInstant.toString === "1970-01-01T01:00:00Z")
  }

  test("grid guard refuses a pathological bucket width") {
    val df = Seq(0L, 20000000000000L).toDF("us") // 2·10¹³ µs apart
    val e = intercept[Exception] {
      TimeSeries.resampleCounts(df, col("us"), 1L).count()
    }
    assert(e.getMessage.contains("10M buckets"))
  }

  private def ewmaRows(rows: Seq[(Long, Long, Long)], window: Int = 30) =
    TimeSeries.ewmaExact(rows.toDF("k", "ts", "cents"), "k", col("ts"),
        col("ts"), col("cents"), window)
      .select("k", "ts", "ewma_n", "ewma_num", "ewma_den", "ewma")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap

  test("ewmaExact matches the hand-computed fixed-point recursion") {
    // key 1: values 100, 300, 500 at t = 1, 2, 3
    val out = ewmaRows(Seq((1L, 1L, 100L), (1L, 2L, 300L), (1L, 3L, 500L)))
    // n=1: num=100·1, den=1 → 100
    assert(out((1L, 1L)) === ((1L, 100L, 1L, 100.0)))
    // n=2: num=100·1+300·2=700, den=3
    assert(out((1L, 2L)) === ((2L, 700L, 3L, 700.0 / 3.0)))
    // n=3: num=100+300·2+500·4=2700, den=7
    assert(out((1L, 3L)) === ((3L, 2700L, 7L, 2700.0 / 7.0)))
  }

  test("ewmaExact truncates to the trailing window and keys separately") {
    val rows = (1L to 5L).map(t => (1L, t, 100L * t)) :+ (2L, 1L, 42L)
    val out = ewmaRows(rows, window = 2)
    // at t=5 the frame is [400, 500]: num = 400 + 500·2 = 1400, den = 3
    assert(out((1L, 5L)) === ((2L, 1400L, 3L, 1400.0 / 3.0)))
    assert(out((2L, 1L)) === ((1L, 42L, 1L, 42.0)))
  }

  test("ewmaExact equals the plain value on constant series") {
    val out = ewmaRows((1L to 40L).map(t => (7L, t, 250L)))
    // num = 250·(2^n − 1), den = 2^n − 1 → exactly 250 at every row
    assert(out.values.forall { case (_, num, den, e) =>
      num === 250L * den && e === 250.0 })
    // the frame never exceeds the window
    assert(out.values.map(_._1).max === 30L)
  }

  test("ewmaExact refuses out-of-range windows") {
    val df = Seq((1L, 1L, 1L)).toDF("k", "ts", "cents")
    intercept[IllegalArgumentException] {
      TimeSeries.ewmaExact(df, "k", col("ts"), col("ts"), col("cents"), 0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.ewmaExact(df, "k", col("ts"), col("ts"), col("cents"), 61)
    }
  }

  private def islandRows(rows: Seq[(Long, Long, Long)]) =
    TimeSeries.intervalUnion(rows.toDF("k", "s", "e"), "k",
        col("s"), col("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("intervalUnion merges overlapping AND touching half-open spans") {
    val out = islandRows(Seq((1L, 0L, 10L), (1L, 5L, 20L),
      (1L, 20L, 30L), (1L, 40L, 50L), (2L, 3L, 3L)))
    assert(out === Map(
      // [0,10) ∪ [5,20) ∪ [20,30): touching at 20 merges (half-open)
      (1L, 1L) -> ((0L, 30L, 3L, 30L)),
      (1L, 2L) -> ((40L, 50L, 1L, 10L)),
      // zero-length interval is a legal degenerate island
      (2L, 1L) -> ((3L, 3L, 1L, 0L))))
  }

  test("intervalUnion: a contained interval never splits its island") {
    val out = islandRows(Seq((1L, 0L, 100L), (1L, 10L, 20L),
      (1L, 30L, 40L)))
    assert(out === Map((1L, 1L) -> ((0L, 100L, 3L, 100L))))
  }

  test("intervalUnion is partitioning- and arrival-order-invariant") {
    val rows = (1L to 200L).map(i =>
      (i % 3, (i * 7) % 50, (i * 7) % 50 + i % 11))
    val a = islandRows(rows)
    val b = TimeSeries.intervalUnion(
        rows.reverse.toDF("k", "s", "e").repartition(13), "k",
        col("s"), col("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(a === b)
  }

  /** Reference CUSUM recursion S_i = max(0, S_{i−1} + (x_i − t)). */
  private def refCusum(xs: Seq[Long], target: Long): Seq[Long] =
    xs.scanLeft(0L)((s, x) => math.max(0L, s + (x - target))).tail

  test("cusum equals the sequential recursion and flags drift") {
    // deterministic pseudo-series with a planted upward shift
    val xs = (1L to 80L).map(i =>
      if (i <= 40) (i * 37) % 20 else 25L + (i * 37) % 20)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
      .toDF("k", "ts", "cents")
    val out = TimeSeries.cusum(df, "k", col("ts"), col("ts"),
        col("cents"), targetCents = 10L, threshold = 100L)
      .select("ts", "cusum", "flagged")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    val ref = refCusum(xs, 10L)
    assert(out.map(_._2).toSeq === ref)
    assert(out.map(_._3).toSeq === ref.map(_ > 100L))
    // the planted shift must actually alarm, and not before it
    assert(!out.take(40).exists(_._3) && out.drop(60).forall(_._3))
  }

  test("cusum resets after a sub-target run (max-with-zero floor)") {
    val xs = Seq(30L, 30L, 0L, 0L, 0L, 0L, 0L, 30L)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
      .toDF("k", "ts", "cents")
    val out = TimeSeries.cusum(df, "k", col("ts"), col("ts"),
        col("cents"), targetCents = 10L, threshold = 1000L)
      .select("ts", "cusum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).map(_._2)
    assert(out.toSeq === refCusum(xs, 10L))
    assert(out(6) === 0L) // fully drained back to the floor
  }

  test("kaplanMeier matches the textbook small-sample curve") {
    // subjects: death@1, censored@2, death@3, death@5, censored@5
    val df = Seq((1L, true), (2L, false), (3L, true), (5L, true),
      (5L, false)).toDF("dur", "ev")
    val out = TimeSeries.kaplanMeier(df, Seq.empty, col("dur"),
        col("ev"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out(1L)._1 === 5L && math.abs(out(1L)._4 - 0.8) < 1e-9)
    // censored-only time: at-risk drops, survival unchanged
    assert(out(2L) === ((4L, 0L, 1L, out(1L)._4)))
    assert(math.abs(out(3L)._4 - 0.8 * 2 / 3) < 1e-9)
    assert(out(5L)._1 === 2L)
    assert(math.abs(out(5L)._4 - 0.8 * 2 / 3 * 0.5) < 1e-9)
  }

  test("kaplanMeier: total extinction pins the curve to exact zero") {
    val df = Seq((1L, true), (2L, true)).toDF("dur", "ev")
    val out = TimeSeries.kaplanMeier(df, Seq.empty, col("dur"),
        col("ev"))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(math.abs(out(1L) - 0.5) < 1e-12)
    assert(out(2L) === 0.0) // d == n — integer flag, not exp(-inf)
  }

  test("kaplanMeier computes independent curves per key group") {
    val df = Seq(("a", 1L, true), ("a", 2L, true), ("b", 1L, false),
      ("b", 3L, true)).toDF("g", "dur", "ev")
    val out = TimeSeries.kaplanMeier(df, Seq("g"), col("dur"),
        col("ev"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5))
      .toMap
    assert(math.abs(out(("a", 1L)) - 0.5) < 1e-12)
    assert(out(("a", 2L)) === 0.0)
    assert(out(("b", 1L)) === 1.0) // censoring only — no drop
    assert(out(("b", 3L)) === 0.0)
  }

  test("autocorrelation: alternating → −1 at lag 1, +1 at lag 2") {
    val alt = (0L to 9L).map(t => (t, if (t % 2 == 0) 10L else -10L))
      .toDF("t", "v")
    def ac(df: org.apache.spark.sql.DataFrame, lag: Int) = {
      val r = TimeSeries.autocorrelation(df, col("t"), col("v"), lag)
        .collect().head
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }
    // corrMatrix leaves corr unrounded (the x_profile_corr
    // convention), so compare within an ulp-scale tolerance
    val a1 = ac(alt, 1); val a2 = ac(alt, 2)
    assert(a1._1 === 9L && math.abs(a1._2.get - (-1.0)) < 1e-12)
    assert(a2._1 === 8L && math.abs(a2._2.get - 1.0) < 1e-12)
    // linear trend → +1; constant series → NULL (zero variance)
    val lin = (0L to 9L).map(t => (t, t * 5L)).toDF("t", "v")
    assert(math.abs(ac(lin, 1)._2.get - 1.0) < 1e-12)
    val const = (0L to 9L).map(t => (t, 7L)).toDF("t", "v")
    assert(ac(const, 1) === ((9L, None)))
    // duplicate buckets aggregate before correlating
    val dup = alt.union(alt)
    val ad = ac(dup, 1)
    assert(ad._1 === 9L && math.abs(ad._2.get - (-1.0)) < 1e-12)
  }

  test("seasonalityProfile: phases wrap the cycle, flags rate per phase") {
    // hours 1 and 3 across two days: phase counts merge across days
    val us = 3600000000L
    val rows = Seq(
      (1L * us, 10.0, "ok"), (3L * us, 20.0, "error"),
      (25L * us, 30.0, "error"), (27L * us, 40.0, "ok"))
      .map { case (t, v, e) => (new java.sql.Timestamp(t / 1000), v, e) }
    val out = TimeSeries.seasonalityProfile(
        rows.toDF("ts", "v", "e"), col("ts"),
        round(col("v") * 100).cast("long"), col("e") === "error",
        us, 24)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out === Map(
      1L -> ((2L, 4000L, 0.5)), // 10.00 + 30.00, one error of two
      3L -> ((2L, 6000L, 0.5))))
  }
}