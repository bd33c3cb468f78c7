package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  // key 1: upsert v1 → upsert v2 (winner)
  // key 2: upsert → delete (tombstoned out)
  // key 3: delete → upsert (resurrected)
  // key 4: ts tie broken by change id (id 41 wins)
  private def changes = Seq(
    (1L, 10L, 100L, "a", false),
    (1L, 11L, 200L, "b", false),
    (2L, 20L, 100L, "c", false),
    (2L, 21L, 200L, "x", true),
    (3L, 30L, 100L, "x", true),
    (3L, 31L, 200L, "d", false),
    (4L, 40L, 100L, "e", false),
    (4L, 41L, 100L, "f", false)
  ).toDF("k", "cid", "ts", "payload", "del")

  test("lastWriterWins keeps the latest non-tombstone per key") {
    val out = Cdc.lastWriterWins(changes, Seq("k"),
        Seq(col("ts"), col("cid")), Seq("cid", "payload"), col("del"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(out === Set((1L, 11L, "b"), (3L, 31L, "d"), (4L, 41L, "f")))
  }

  test("applyChanges: upsert replaces, tombstone removes, insert adds") {
    val base = Seq(
      (1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")
    ).toDF("k", "cid", "payload")
    val delta = Seq(
      (1L, 11L, 500L, "a2", false),  // upsert existing
      (2L, 21L, 500L, "x", true),    // delete existing
      (4L, 40L, 500L, "d", false)    // insert new key
    ).toDF("k", "cid", "ts", "payload", "del")
    val out = Cdc.applyChanges(base, delta, Seq("k"),
        Seq(col("ts"), col("cid")), Seq("cid", "payload"), col("del"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(out === Set((1L, 11L, "a2"), (3L, 30L, "c"), (4L, 40L, "d")))
  }

  test("applyChanges incremental == batch lastWriterWins on a clean cut") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val ord = Seq(unix_micros(col("ts")), col("event_id"))
    val pay = Seq("event_id", "event_type", "value")
    val del = col("event_type") === "error"
    val cut = to_timestamp(lit("2024-01-20 00:00:00"))
    val batch = Cdc.lastWriterWins(ev, Seq("user_id"), ord, pay, del)
      .collect().map(_.toSeq).toSet
    val base = Cdc.lastWriterWins(ev.where(col("ts") < cut),
      Seq("user_id"), ord, pay, del)
    val inc = Cdc.applyChanges(base, ev.where(col("ts") >= cut),
        Seq("user_id"), ord, pay, del)
      .collect().map(_.toSeq).toSet
    assert(inc === batch)
  }

  test("pointInTime resolves each fact to the one valid interval") {
    val hist = Cdc.scd2(changes.select(col("k").as("hk"),
          col("cid").as("state_cid"), col("ts")),
        Seq("hk"), col("ts"), col("state_cid"))
      .select("hk", "state_cid", "valid_from", "valid_to")
    // facts: before first version (null state), mid-interval, at a
    // boundary (second interval wins — half-open), after last version
    val facts = Seq(
      (100L, 1L, 50L), (101L, 1L, 150L), (102L, 1L, 200L),
      (103L, 1L, 999L)
    ).toDF("fid", "k", "fts")
    val out = Cdc.pointInTime(facts, hist, "k", "hk", col("fts"))
      .select(col("fid"), col("state_cid"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out === Map(100L -> -1L, 101L -> 10L, 102L -> 11L,
      103L -> 11L))
  }

  test("scd2 builds half-open intervals with one current row per key") {
    val out = Cdc.scd2(changes, Seq("k"), col("ts"), col("cid"))
      .select(col("cid"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(out === Set(
      (10L, 100L, 200L, false), (11L, 200L, -1L, true),
      (20L, 100L, 200L, false), (21L, 200L, -1L, true),
      (30L, 100L, 200L, false), (31L, 200L, -1L, true),
      (40L, 100L, 100L, false), (41L, 100L, -1L, true)))
    // exactly one current version per key
    val currents = Cdc.scd2(changes, Seq("k"), col("ts"), col("cid"))
      .where(col("is_current")).groupBy("k").count()
      .collect().map(r => r.getLong(1)).toSet
    assert(currents === Set(1L))
  }

  test("null delete flag is not-a-delete (coalesced at ingestion)") {
    // key 1's winner has a NULL del evaluation — the key must survive,
    // not be silently dropped as tombstoned
    val log = Seq(
      (1L, 10L, 100L, "a", Some(false)),
      (1L, 11L, 200L, "b", None),
      (2L, 20L, 100L, "c", Some(true))
    ).toDF("k", "cid", "ts", "payload", "del")
    val out = Cdc.lastWriterWins(log, Seq("k"),
        Seq(col("ts"), col("cid")), Seq("cid", "payload"), col("del"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 11L)))
    val applied = Cdc.applyChanges(
        Seq((3L, 30L, "z")).toDF("k", "cid", "payload"),
        log, Seq("k"), Seq(col("ts"), col("cid")),
        Seq("cid", "payload"), col("del"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(applied === Set((1L, 11L), (3L, 30L)))
  }

  test("applyChanges: change with all-minimal versions still beats base") {
    // the old all-Long.MinValue base sentinel would TIE here and leave
    // the winner partitioning-dependent; the leading origin element
    // makes the change win structurally
    val base = Seq((1L, 10L, "old")).toDF("k", "cid", "payload")
    val delta = Seq((1L, 11L, "new", false))
      .toDF("k", "cid", "payload", "del")
    val out = Cdc.applyChanges(base, delta, Seq("k"),
        Seq(lit(Long.MinValue), lit(Long.MinValue)),
        Seq("cid", "payload"), col("del"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(out === Set((1L, 11L, "new")))
  }

  test("uniqueVersions flags duplicate (key, version) groups") {
    val log = Seq(
      (1L, 10L, 100L), (1L, 11L, 100L), (1L, 12L, 100L), // 3-way tie
      (2L, 20L, 100L), (2L, 21L, 200L),                  // clean
      (3L, 30L, 50L), (3L, 31L, 50L)                     // 2-way tie
    ).toDF("k", "cid", "ts")
    val out = Cdc.uniqueVersions(log, Seq("k"), Seq(col("ts")))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).head,
        r.getLong(2))).toSet
    assert(out === Set((1L, 100L, 3L), (3L, 50L, 2L)))
    // a totally-ordered log is clean: (ts, cid) disambiguates
    assert(Cdc.uniqueVersions(log, Seq("k"),
      Seq(col("ts"), col("cid"))).isEmpty)
  }

  test("snapshotDiff: added/removed/changed, null-safe, unchanged dropped") {
    val old = Seq(
      (1L, Some("a"), Some(10L)),  // unchanged
      (2L, Some("b"), Some(20L)),  // changed (payload)
      (3L, None, Some(30L)),       // unchanged with a NULL payload
      (4L, Some("d"), None),       // changed: NULL -> value
      (5L, Some("e"), Some(50L))   // removed
    ).toDF("k", "s", "v")
    val neu = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("B"), Some(20L)),
      (3L, None, Some(30L)),
      (4L, Some("d"), Some(40L)),
      (6L, Some("f"), Some(60L))   // added
    ).toDF("k", "s", "v")
    val out = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("s", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((2L, "changed"), (4L, "changed"),
      (5L, "removed"), (6L, "added")))
  }
}
