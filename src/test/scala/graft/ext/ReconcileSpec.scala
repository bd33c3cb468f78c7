package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def v1 = Seq(
    (1L, "alpha", 10L), (2L, "beta", 20L), (3L, "gamma", 30L),
    (4L, "delta", 40L), (5L, null.asInstanceOf[String], 50L)
  ).toDF("id", "name", "score")

  private def v2 = Seq(
    (1L, "alpha", 10L),          // unchanged
    (2L, "beta2", 20L),          // changed (name)
    (3L, "gamma", 35L),          // changed (score)
    (5L, "epsilon", 50L),        // changed (null -> value)
    (6L, "zeta", 60L)            // added   (4 removed)
  ).toDF("id", "name", "score")

  private val pk = Seq("id")
  private val cmp = Seq("name", "score")

  test("tableDiff classifies added/removed/changed/unchanged") {
    val m = Reconcile.tableDiff(v1, v2, pk, cmp)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "changed", 6L -> "added"))
  }

  test("diffCounts aggregates statuses") {
    val m = Reconcile.diffCounts(v1, v2, pk, cmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("unchanged" -> 1L, "changed" -> 3L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("columnDrift counts per-column changes over changed rows only") {
    val m = Reconcile.columnDrift(v1, v2, pk, cmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // name changed on 2 and 5 (null -> value), score changed on 3
    assert(m === Map("name" -> 2L, "score" -> 1L))
  }

  test("columnDrift is all-zero when versions are identical") {
    val m = Reconcile.columnDrift(v1, v1, pk, cmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("name" -> 0L, "score" -> 0L))
  }

  test("rowHash distinguishes adjacent-field ambiguity and nulls") {
    val df = Seq(("ab", "c"), ("a", "bc"), (null, "bc"))
      .toDF("x", "y")
      .select(Reconcile.rowHash(Seq(col("x"), col("y"))).as("h"))
    val hs = df.collect().map(_.getString(0))
    assert(hs.distinct.length === 3)
  }

  test("composite primary keys work") {
    val a = Seq((1L, "x", "v1"), (1L, "y", "v2")).toDF("k1", "k2", "v")
    val b = Seq((1L, "x", "v1"), (1L, "y", "v9")).toDF("k1", "k2", "v")
    val m = Reconcile.tableDiff(a, b, Seq("k1", "k2"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2))
      .toMap
    assert(m === Map((1L, "x") -> "unchanged", (1L, "y") -> "changed"))
  }
}
