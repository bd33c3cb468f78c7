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

  test("psi: identical distributions score zero, a shifted bin is penalized") {
    val a = ((1 to 40).map(_ => 1.0) ++ (1 to 60).map(_ => 3.0)).toDF("v")
    val same = Reconcile.psi(a, a, "v", 0.0, 4.0, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(same.map(_._1).toSeq === Seq(1L, 3L))
    assert(same.forall(_._4 === 0.0)) // p == q → (p-q)·ln(p/q) = 0
    // all mass moves from bin 1 to bin 3: both terms positive
    val b = (1 to 100).map(_ => 3.0).toDF("v")
    val moved = Reconcile.psi(a, b, "v", 0.0, 4.0, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(moved.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((1L, 40L, 0L), (3L, 60L, 100L)))
    assert(moved.forall(_._4 > 0.0))
    assert(moved.map(_._4).sum > 0.2) // the conventional alarm level
  }

  test("composite primary keys work") {
    val a = Seq((1L, "x", "v1"), (1L, "y", "v2")).toDF("k1", "k2", "v")
    val b = Seq((1L, "x", "v1"), (1L, "y", "v9")).toDF("k1", "k2", "v")
    val m = Reconcile.tableDiff(a, b, Seq("k1", "k2"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2))
      .toMap
    assert(m === Map((1L, "x") -> "unchanged", (1L, "y") -> "changed"))
  }

  test("embeddingDrift: identical corpora → cos ~1, shift exactly 0") {
    val vecs = Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(0.5f, 0.5f, 4.0f)))
      .toDF("id", "embedding")
    val r = Reconcile.embeddingDrift(vecs, vecs, "embedding")
      .collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L &&
      r.getLong(2) === 3L)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    assert(r.getDouble(4) === 0.0) // exact integer zero under the hood
  }

  test("embeddingDrift: orthogonal unit centroids → cos 0, shift √2") {
    val ref = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)))
      .toDF("id", "embedding")
    val cur = Seq((3L, Seq(0.0f, 1.0f))).toDF("id", "embedding")
    val r = Reconcile.embeddingDrift(ref, cur, "embedding")
      .collect().head
    assert(r.getDouble(3) === 0.0)
    assert(math.abs(r.getDouble(4) - math.sqrt(2)) < 1e-6)
  }
}