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
}
