package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  // user 1: full path a→b→c in order
  // user 2: a then b, no c
  // user 3: b BEFORE a — reaches a, not b (strictly-after semantics)
  // user 4: a and b at the SAME ts — b not counted (strict >)
  private def events = Seq(
    (1L, "a", 100L), (1L, "b", 200L), (1L, "c", 300L),
    (2L, "a", 100L), (2L, "b", 150L),
    (3L, "b", 50L), (3L, "a", 100L),
    (4L, "a", 100L), (4L, "b", 100L)
  ).toDF("user_id", "etype", "ts")

  test("funnel counts strictly-after transitions") {
    val out = Behavior.funnel(events, "user_id", col("ts"), col("etype"),
        Seq("a", "b", "c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq === Seq((0, "a", 4L), (1, "b", 2L), (2, "c", 1L)))
  }

  test("funnelTimes reports exact transition latency sums") {
    val out = Behavior.funnelTimes(events, "user_id", col("ts"),
        col("etype"), Seq("a", "b", "c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
      .sortBy(_._1)
    // a→b: users 1 (delta 100) and 2 (delta 50) → sum 150, avg 75
    // b→c: user 1 (delta 100)
    assert(out.toSeq === Seq(
      (1, "b", 2L, 150L, 75.0), (2, "c", 1L, 100L, 100.0)))
  }

  test("funnelTimes reports (0, 0, null) for an unreached step") {
    val out = Behavior.funnelTimes(events, "user_id", col("ts"),
        col("etype"), Seq("a", "c", "b"))
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.isNullAt(4)))
      .sortBy(_._1)
    // a→c reached by user 1 only (delta 200); c→b never
    assert(out.toSeq === Seq((1, 1L, 200L, false), (2, 0L, 0L, true)))
  }

  test("quantileBuckets assigns by fitted bounds with exact edges") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Profile.quantileBuckets(df, "v", Seq(0.25, 0.5, 0.75), exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
      .sortBy(_._1)
    // bounds: 25.75, 50.5, 75.25 → bucket sizes 25, 25, 25, 25
    assert(out.map(_._2).toSeq === Seq(25L, 25L, 25L, 25L))
    assert(out(1)._3 === 26.0 && out(1)._4 === 50.0)
  }

  test("weekIndex is exact long bucket arithmetic") {
    val wk = 7L * 86400L * 1000000L
    val out = Seq(0L, wk - 1, wk, wk + 1, 53L * wk)
      .toDF("us")
      .select(Behavior.weekIndex(col("us")))
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(0L, 0L, 1L, 1L, 53L))
  }

  test("cohortRetention cells count distinct cohort members") {
    val wk = 7L * 86400L * 1000000L
    // users 1,2 start week 0 (1 returns week 1, twice — still one user);
    // user 3 starts week 1
    val ev = Seq(
      (1L, 10L), (1L, wk + 5L), (1L, wk + 6L),
      (2L, 20L),
      (3L, wk + 30L)
    ).toDF("user_id", "us")
    val out = Behavior.cohortRetention(ev, "user_id", col("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out === Set((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L)))
  }

  test("pairLift computes exact counts and independence lift") {
    // 4 ids: {x,y} ×2, {x} ×1, {y} ×1 → n_x=3, n_y=3, n_xy=2, N=4
    val df = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (4L, "y"), (1L, "x") // duplicate observation ignored
    ).toDF("id", "item")
    val out = Behavior.pairLift(df, "id", "item").collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) === (("x", "y")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((2L, 3L, 3L)))
    assert(r.getDouble(5) === 2.0 * 4.0 / 9.0)
  }

  test("winsorize clips into fitted bounds, summary counts the tails") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val sum = Profile.winsorizeSummary(df, "v", 0.05, 0.95).collect().head
    // quantile_cont on 1..100: p05 = 5.95, p95 = 95.05
    assert(sum.getString(0) === "v")
    assert(math.abs(sum.getDouble(1) - 5.95) < 1e-9)
    assert(math.abs(sum.getDouble(2) - 95.05) < 1e-9)
    assert((sum.getLong(3), sum.getLong(4), sum.getLong(5)) ===
      ((5L, 5L, 100L)))
    val clipped = Profile.winsorize(df, "v", 0.05, 0.95)
      .agg(min("v"), max("v")).collect().head
    assert(math.abs(clipped.getDouble(0) - 5.95) < 1e-9)
    assert(math.abs(clipped.getDouble(1) - 95.05) < 1e-9)
  }

  test("transitionMatrix counts successors and row-normalizes exactly") {
    // user 1: a→b→a→b ; user 2: a→b ⇒ a→b ×3; b→a ×1
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (1L, 4L, "b"), (2L, 1L, "a"), (2L, 2L, "b"))
      .toDF("u", "ts", "et")
    val out = Behavior.transitionMatrix(ev, "u", col("ts"), col("ts"),
        col("et"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out === Map(("a", "b") -> ((3L, 1.0)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("transitionMatrix breaks timestamp ties with tieCol") {
    val ev = Seq((1L, 5L, 1L, "x"), (1L, 5L, 2L, "y"), (1L, 5L, 3L, "z"))
      .toDF("u", "ts", "id", "et")
    val out = Behavior.transitionMatrix(ev, "u", col("ts"), col("id"),
        col("et"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("x", "y"), ("y", "z")))
  }

  test("topPaths splits on the gap and orders the cut deterministically") {
    // user 1: two sessions a>b then a>b ; user 2: one session a>b ;
    // user 3: lone c
    val ev = Seq((1L, 0L, "a"), (1L, 5L, "b"), (1L, 100L, "a"),
      (1L, 103L, "b"), (2L, 0L, "a"), (2L, 9L, "b"), (3L, 0L, "c"))
      .toDF("u", "ts", "et")
    val out = Behavior.topPaths(ev, "u", col("ts"), col("ts"), col("et"),
        gapUs = 10L, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a>b", 3L), ("c", 1L)))
    // gap-EQUAL arrivals extend the session (Sessions.assign contract)
    val merged = Behavior.topPaths(
        Seq((1L, 0L, "a"), (1L, 10L, "b")).toDF("u", "ts", "et"),
        "u", col("ts"), col("ts"), col("et"), gapUs = 10L, k = 5)
      .collect().map(_.getString(0))
    assert(merged.toSeq === Seq("a>b"))
  }

  test("winsorize passes nulls through instead of clipping to the bound") {
    // least/greatest SKIP nulls (greatest(null, lo) = lo), so without
    // the null guard a missing value would be rewritten to p_lo
    val df = ((1 to 100).map(i => Some(i.toDouble)) :+
      (None: Option[Double])).toDF("v")
    val out = Profile.winsorize(df, "v", 0.05, 0.95)
    assert(out.where(col("v").isNull).count() === 1L)
    assert(out.where(col("v") < 5.0).count() === 0L)
  }

  test("rfmSegments: extremes land in (1,1,1) and (5,5,5), users conserved") {
    // user i (1..5): i events, last event at day i, value i·10 each —
    // strictly ordered on all three metrics, user 5 best everywhere
    val events = for {
      u <- 1 to 5; e <- 1 to u
    } yield (u.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-0$u%d 12:00:00"),
      u * 10.0)
    val df = events.toDF("user_id", "ts", "value")
    val out = Behavior.rfmSegments(df, col("user_id"), col("ts"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(out.keys.forall { case (a, b, c) =>
      Seq(a, b, c).forall(s => s >= 1 && s <= 5) })
    assert(out.values.map(_._1).sum === 5L) // every user in one cell
    assert(out.contains((5L, 5L, 5L)) && out((5L, 5L, 5L))._1 === 1L)
    // user 5: 5 events × 50.00 → 25000 cents
    assert(out((5L, 5L, 5L))._2 === 25000L)
    assert(out.contains((1L, 1L, 1L)))
  }
}
