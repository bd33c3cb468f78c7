package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the backfill twin of
  * [[graft.streaming.StreamingValidate.sessionize]]: group a key's
  * time-ordered events into sessions separated by more than `gapUs`
  * microseconds, as a plain window computation (lag → gap flag →
  * running sum). A 100 TB event archive is sessionized with this path;
  * the streaming path owns the live tail; `sessionizeNative`
  * (session_window) is the engine-managed middle. All three share one
  * semantic — gap-EQUAL ties extend the session (`next ≤ last + gap`),
  * matching the streaming interval-merge — and are cross-asserted in
  * SessionsSpec / StreamingSpec.
  *
  * Scale design (100 TB lens):
  *  - ONE shuffle: the window's `partition by key` exchange; the
  *    per-event assignment and the per-session stats both reuse it (the
  *    stats agg keys (key, session_idx) are a prefix-extension of the
  *    window partitioning, so no second exchange is needed);
  *  - per-key total order is inherent to sessionization (same bounded-
  *    partition exception as [[Features.trailing]]): a partition holds
  *    ONE USER's events, never the corpus — user event counts are
  *    bounded in practice, and a pathological hot key is a data-quality
  *    finding ([[Profile.keySkew]]) before it is a plan problem;
  *  - arithmetic is integer microseconds end-to-end — no float drift,
  *    so assignments are engine-exact and oracle-checkable.
  */
object Sessions {

  /** Per-event session assignment: input columns plus `session_idx`
    * (1-based, per key, in time order). Ties on `tsUs` are broken by
    * `tieCol` so the order — and therefore the running sum — is
    * deterministic.
    */
  def assign(
      events: DataFrame, keyCol: String, tsUs: Column, tieCol: Column,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(tsUs, tieCol)
    // strictly-greater comparison ⇒ gap-equal arrivals extend the
    // session, agreeing with the streaming interval merge (`startUs <=
    // lastUs + gapUs`) and session_window (end = last + gap, half-open)
    val newSession =
      lag(tsUs, 1).over(w).isNull || (tsUs - lag(tsUs, 1).over(w)) > gapUs
    events.withColumn("session_idx",
      sum(newSession.cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session stats off [[assign]]: (key, session_idx, n_events,
    * start_us, end_us, duration_us). Same shuffle as the assignment —
    * the groupBy keys extend the window partition key.
    */
  def stats(
      events: DataFrame, keyCol: String, tsUs: Column, tieCol: Column,
      gapUs: Long): DataFrame =
    assign(events.withColumn("__ts_us", tsUs), keyCol, col("__ts_us"),
        tieCol, gapUs)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min("__ts_us").as("start_us"),
        max("__ts_us").as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
}
