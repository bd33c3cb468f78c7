package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // Deliberately out of input order: as-of must not depend on row order.
  private val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:30")),
    (2L, "A", ts("2024-01-01 10:02:00")),
    (3L, "B", ts("2024-01-01 10:00:10")),
    (4L, "C", ts("2024-01-01 10:00:00"))
  ).toDF("trade_id", "sym", "t")

  private val quotes = Seq(
    (10L, "A", ts("2024-01-01 10:00:00"), 1.0),
    (11L, "A", ts("2024-01-01 10:00:30"), 2.0), // exact-time match
    (12L, "A", ts("2024-01-01 10:00:30"), 3.0), // same instant: max id wins
    (13L, "A", ts("2024-01-01 10:05:00"), 4.0), // after both trades
    (14L, "B", ts("2024-01-01 10:00:05"), 5.0)
  ).toDF("quote_id", "q_sym", "q_t", "px")

  private def asof: DataFrame =
    Joins.asOfJoin(trades, quotes, "sym", "t", "q_sym", "q_t",
      "quote_id", Seq("quote_id", "px"))

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec        => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def nodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    flatten(df.queryExecution.executedPlan)
  }

  test("asOfJoin: exact-time match, tiebreak, outer nulls, order-free") {
    val got = asof.collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    // trade 1 at 10:00:30: quotes 11 and 12 are at the same instant
    // (<= matches), greatest quote_id wins
    assert(got(1L) == (Some(12L), Some(3.0)))
    // trade 2 at 10:02: latest prior is still quote 12 (13 is later)
    assert(got(2L) == (Some(12L), Some(3.0)))
    // trade 3 on B: only quote 14 at 10:00:05 precedes 10:00:10
    assert(got(3L) == (Some(14L), Some(5.0)))
    // trade 4 on C: no quotes at all → left-outer nulls
    assert(got(4L) == (None, None))
  }

  test("asOfJoin keeps every left row exactly once") {
    assert(asof.count() == trades.count())
    assert(asof.select("trade_id").distinct().count() == trades.count())
  }

  test("asOfJoin plan: no join node, keyed window, single shuffle") {
    val all = nodes(asof)
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "as-of must not plan a nested-loop join")
    assert(!all.exists(_.nodeName.toLowerCase.contains("mergejoin")),
      "as-of must not plan a sort-merge join")
    val wins = all.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "the as-of window must be keyed — a global window is the " +
        "single-reducer scale-killer")
    val shuffles = all.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size == 1,
      s"as-of is ONE shuffle on the key, found ${shuffles.size}")
  }

  test("asOfJoin: null keys never match (SQL join semantics)") {
    val l = Seq((1L, Option("A"), ts("2024-01-01 10:00:30")),
      (2L, Option.empty[String], ts("2024-01-01 10:00:30")))
      .toDF("trade_id", "sym", "t")
    val r = Seq((10L, Option("A"), ts("2024-01-01 10:00:00"), 1.0),
      (11L, Option.empty[String], ts("2024-01-01 10:00:00"), 9.9))
      .toDF("quote_id", "q_sym", "q_t", "px")
    val got = Joins.asOfJoin(l, r, "sym", "t", "q_sym", "q_t",
        "quote_id", Seq("quote_id", "px"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(got(1L) == Some(10L)) // normal match
    // the null-key trade must NOT pick up the null-key quote
    assert(got(2L).isEmpty)
    assert(got.size == 2) // both left rows survive (outer semantics)
  }

  test("rangeJoinBinned: sub-second interval ends cover the right bins") {
    val points = Seq((1L, "2024-01-01 05:59:59.5"),
      (2L, "2024-01-01 06:00:00.2"), (3L, "2024-01-01 06:00:00.9"))
      .toDF("pid", "pts")
      .select(col("pid"), col("pts").cast("timestamp").as("pt"))
    // ends at 06:00:00.5 — past the 6h bin boundary by half a second;
    // second-truncating bin math would stop the span one bin short
    val iv = Seq(("w", "2024-01-01 05:00:00", "2024-01-01 06:00:00.5"))
      .toDF("w", "wss", "wes")
      .select(col("w"), col("wss").cast("timestamp").as("ws"),
        col("wes").cast("timestamp").as("we"))
    val got = Joins.rangeJoinBinned(points, "pt", iv, "ws", "we", 21600L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // 3 is past the exclusive end
  }

  test("rangeJoinKeyed matches a filtered cross join; no nested loop") {
    val joined = Joins.rangeJoinKeyed(trades, quotes, "sym", "q_sym",
      col("q_t"), col("t") - expr("INTERVAL 30 SECONDS"),
      col("t") + expr("INTERVAL 30 SECONDS"))
      .groupBy("trade_id").agg(count(col("quote_id")).as("n"))
    val got = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // trade 1 [10:00:00, 10:01:00): quotes 10 (>= start), 11, 12
    assert(got(1L) == 3L)
    // trade 2 [10:01:30, 10:02:30): nothing
    assert(got(2L) == 0L)
    // trade 3 [09:59:40, 10:00:40) on B: quote 14
    assert(got(3L) == 1L)
    assert(got(4L) == 0L)
    assert(!nodes(joined).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "equality key present — must not degrade to a nested loop")
  }

  test("rangeJoinBinned: half-open bounds, multi-bin spans, no nested loop") {
    val points = (0 until 48).map(h =>
      (h.toLong, ts(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:00:00")))
      .toDF("pid", "pt")
    val iv = Seq(
      // one-bin interval; [start, end) excludes the 06:00 point
      ("a", ts("2024-01-01 02:00:00"), ts("2024-01-01 06:00:00")),
      // spans multiple 6h bins across midnight
      ("b", ts("2024-01-01 22:00:00"), ts("2024-01-02 03:00:00")),
      // zero-length window matches nothing
      ("c", ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"))
    ).toDF("w", "ws", "we")
    val got = Joins.rangeJoinBinned(points, "pt", iv, "ws", "we", 21600L)
    val naive = points.crossJoin(iv)
      .where(col("pt") >= col("ws") && col("pt") < col("we"))
    assert(got.select("pid", "w").collect().toSet ==
      naive.select("pid", "w").collect().toSet)
    // a: hours 2,3,4,5 (6 excluded by half-open end)
    assert(got.where(col("w") === "a").count() == 4)
    // b: hours 22,23 of day 1 + 0,1,2 of day 2
    assert(got.where(col("w") === "b").count() == 5)
    assert(!nodes(got).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "binned range join must plan as an equi-join on the bin")
  }

  test("asOfJoin rejects input columns named like its internal columns") {
    val badLeft = trades.withColumnRenamed("t", "__t")
    val e = intercept[IllegalArgumentException] {
      Joins.asOfJoin(badLeft, quotes, "sym", "__t", "q_sym", "q_t",
        "quote_id", Seq("quote_id", "px"))
    }
    assert(e.getMessage.contains("reserved"))
    val badPayload = quotes.withColumnRenamed("px", "__m")
    assert(intercept[IllegalArgumentException] {
      Joins.asOfJoin(trades, badPayload, "sym", "t", "q_sym", "q_t",
        "quote_id", Seq("quote_id", "__m"))
    }.getMessage.contains("reserved"))
  }

  test("rangeJoinBinned: inverted interval emits no bins (no fan-out)") {
    val points = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("pid", "pt")
    // end TEN YEARS before start with 1-second bins: the unguarded
    // sequence(startBin, endBin) would generate a ~315M-element
    // DESCENDING bin list per interval row (OOM-scale fan-out); the
    // guard must emit zero bins instead
    val iv = Seq(("bad", ts("2034-01-01 00:00:00"), ts("2024-01-01 00:00:00")),
      ("ok", ts("2023-12-31 23:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("w", "ws", "we")
    val got = Joins.rangeJoinBinned(points, "pt", iv, "ws", "we", 1L)
    assert(got.select("w").collect().map(_.getString(0)).toSeq == Seq("ok"))
  }

  test("intervalOverlapJoin: exact half-open overlaps, one row per pair") {
    val l = Seq(("a", 0L, 10L), ("b", 10L, 20L), ("c", 5L, 6L),
      ("inv", 30L, 30L)).toDF("lid", "ls", "le")
    val r = Seq(("x", 8L, 12L), ("y", 20L, 25L), ("z", 0L, 100L))
      .toDF("rid", "rs", "re")
    // half-open: b [10,20) meets x [8,12) and z; y [20,25) touches b
    // only at the excluded endpoint 20; the empty interval matches
    // nothing; z [0,100) spans many bins but each pair appears ONCE
    val got = Joins.intervalOverlapJoin(l, col("ls"), col("le"),
        r, col("rs"), col("re"), binSize = 3L)
      .select("lid", "rid").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(got === Set(("a", "x"), ("a", "z"), ("b", "x"), ("b", "z"),
      ("c", "z")))
    val n = Joins.intervalOverlapJoin(l, col("ls"), col("le"),
        r, col("rs"), col("re"), binSize = 3L).count()
    assert(n === 5L) // set equality alone would hide bin-duplicates
  }

  test("intervalOverlapJoin matches a naive cross filter at many bin sizes") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 60).map(i =>
      (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .map { case (i, a, b) => (i, math.min(a, b), math.max(a, b) + 1) }
      .toDF("lid", "ls", "le")
    val r = (1 to 40).map(i =>
      (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .map { case (i, a, b) => (i, math.min(a, b), math.max(a, b) + 1) }
      .toDF("rid", "rs", "re")
    val naive = l.crossJoin(r)
      .where(greatest(col("ls"), col("rs")) < least(col("le"), col("re")))
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    for (bin <- Seq(1L, 4L, 7L, 64L)) {
      val got = Joins.intervalOverlapJoin(l, col("ls"), col("le"),
          r, col("rs"), col("re"), bin)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got === naive, s"binSize $bin")
    }
  }

  test("intervalOverlapJoin ≡ naive past 2^53 and at negative bounds " +
      "(exact integral floor division)") {
    // bounds where double floor(x / b) is unreliable: |x| > 2^53
    // (sub-integer resolution is gone) and x < 0 (double floor and
    // integer div disagree on truncation direction). The overlap
    // answer must be exactly the cross filter's either way.
    val big = 1L << 60
    val rnd = new scala.util.Random(11)
    def iv(n: Int, base: Long) = (1 to n).map { i =>
      val s = base + rnd.nextInt(50).toLong - 25
      (base + i, s, s + 1 + rnd.nextInt(10))
    }
    for (base <- Seq(big, -big, -25L)) {
      val l = iv(30, base).toDF("lid", "ls", "le")
      val r = iv(20, base).toDF("rid", "rs", "re")
      val naive = l.crossJoin(r)
        .where(greatest(col("ls"), col("rs")) < least(col("le"), col("re")))
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(naive.nonEmpty, s"fixture at $base must overlap")
      for (bin <- Seq(3L, 7L, 64L)) {
        val got = Joins.intervalOverlapJoin(l, col("ls"), col("le"),
            r, col("rs"), col("re"), bin)
          .select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
        assert(got === naive, s"base $base binSize $bin")
      }
    }
  }

  test("intervalOverlapJoin rejects clashing and reserved column names") {
    val l = Seq((1L, 0L, 1L)).toDF("id", "s", "e")
    val r = Seq((2L, 0L, 1L)).toDF("id", "rs", "re")
    assert(intercept[IllegalArgumentException] {
      Joins.intervalOverlapJoin(l, col("s"), col("e"),
        r, col("rs"), col("re"), 1L)
    }.getMessage.contains("ambiguous"))
    val bad = Seq((1L, 0L, 1L)).toDF("__bin", "s", "e")
    assert(intercept[IllegalArgumentException] {
      Joins.intervalOverlapJoin(bad, col("s"), col("e"),
        r, col("rs"), col("re"), 1L)
    }.getMessage.contains("internal"))
  }
}
