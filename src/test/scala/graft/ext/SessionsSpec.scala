package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingValidate

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  // user 1: three events, gaps 10 and 100 (split at gap=50)
  // user 2: one event; user 3: gap EXACTLY 50 — must extend
  private def events = Seq(
    (1L, 1L, 1000L), (2L, 1L, 1010L), (3L, 1L, 1110L),
    (4L, 2L, 500L),
    (5L, 3L, 2000L), (6L, 3L, 2050L)
  ).toDF("event_id", "user_id", "ts_us")

  test("assign splits on gap > g, extends on gap == g") {
    val out = Sessions.assign(events, "user_id", col("ts_us"),
        col("event_id"), 50L)
      .select("event_id", "session_idx")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L,
      4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("stats aggregates per session with exact bounds") {
    val out = Sessions.stats(events, "user_id", col("ts_us"),
        col("event_id"), 50L)
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 1000L, 1010L, 10L),
      (1L, 2L, 1L, 1110L, 1110L, 0L),
      (2L, 1L, 1L, 500L, 500L, 0L),
      (3L, 1L, 2L, 2000L, 2050L, 50L)))
  }

  test("batch window sessions == session_window == stateful sessionize") {
    // real data shape: events table at sf0.001, 30-minute gap
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val win = key(Sessions.stats(ev, "user_id", unix_micros(col("ts")),
        col("event_id"), 30L * 60L * 1000000L)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events")))
    def norm(df: org.apache.spark.sql.DataFrame) = key(df.select(
      col("user_id"), unix_micros(col("session_start")).as("start_us"),
      unix_micros(col("session_end")).as("end_us"),
      col("n_events").cast("long").as("n_events")))
    val native = norm(StreamingValidate.sessionizeNative(ev, 30))
    val stateful = norm(StreamingValidate.sessionize(ev, 30))
    assert(win === native)
    assert(win === stateful)
    assert(win.nonEmpty)
  }

  test("stats reuses the window exchange: exactly one shuffle") {
    val plan = Sessions.stats(events, "user_id", col("ts_us"),
        col("event_id"), 50L)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(shuffles === 1, s"expected 1 exchange, got $shuffles:\n$plan")
  }
}
