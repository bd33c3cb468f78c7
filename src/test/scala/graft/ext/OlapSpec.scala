package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class OlapSpec extends SparkSpec {
  import spark.implicits._

  test("rollupAgg: gid disambiguates subtotal NULLs from genuine NULLs") {
    val df = Seq((Some("a"), "x", 1L), (Some("a"), "y", 2L),
      (None, "x", 4L)).toDF("d1", "d2", "v")
    val out = Olap.rollupAgg(df, Seq("d1", "d2"),
        Seq(sum(col("v")).as("s")))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3)))
      .toSet
    // gid bits MSB-first over dims: 0 = fully grouped, 1 = d2 rolled,
    // 3 = grand total. The genuine-NULL d1 group keeps gid 0/1.
    assert(out === Set(
      (Some("a"), Some("x"), 0L, 1L), (Some("a"), Some("y"), 0L, 2L),
      (None, Some("x"), 0L, 4L),
      (Some("a"), None, 1L, 3L), (None, None, 1L, 4L),
      (None, None, 3L, 7L)))
  }

  test("cubeAgg emits all 2^d grouping sets in one plan") {
    val df = Seq(("a", "x", 1L), ("b", "y", 2L)).toDF("d1", "d2", "v")
    val out = Olap.cubeAgg(df, Seq("d1", "d2"),
        Seq(sum(col("v")).as("s")))
      .collect().map(r => r.getLong(2)).groupBy(identity)
      .view.mapValues(_.length).toMap
    // gids 0 (both), 1 (d2 rolled), 2 (d1 rolled), 3 (grand total)
    assert(out === Map(0L -> 2, 1L -> 2, 2L -> 2, 3L -> 1))
    val plan = Olap.cubeAgg(df, Seq("d1", "d2"),
        Seq(sum(col("v")).as("s")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    // the map-side Expand feeds ONE exchange — never 2^d jobs
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("pivotAgg: explicit values, prefixed columns, NULL when absent") {
    val df = Seq(("p1", "O", 10L), ("p1", "F", 20L), ("p2", "O", 5L))
      .toDF("k", "st", "v")
    val out = Olap.pivotAgg(df, Seq("k"), "st", Seq("O", "F", "P"),
      sum(col("v")), "status_")
    assert(out.columns.toSeq ===
      Seq("k", "status_o", "status_f", "status_p"))
    val rows = out.collect().map(r => r.getString(0) ->
      (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows("p1") === ((Some(10L), Some(20L), None)))
    assert(rows("p2") === ((Some(5L), None, None)))
  }

  test("mergeAdditive(rollup(parts)) equals rollup(whole), NULLs incl.") {
    val df = Seq((Some("a"), "x", 1L), (Some("a"), "y", 2L),
      (None, "x", 4L), (Some("b"), "x", 8L), (None, "y", 16L))
      .toDF("d1", "d2", "v")
    val dims = Seq("d1", "d2")
    def aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val whole = Olap.rollupAgg(df, dims, aggs)
      .collect().map(_.toSeq).toSet
    val merged = Olap.mergeAdditive(
        Seq(Olap.rollupAgg(df.where(col("v") < 4), dims, aggs),
          Olap.rollupAgg(df.where(col("v") >= 4), dims, aggs)),
        dims :+ "gid", Seq("n", "s"))
      .collect().map(_.toSeq).toSet
    assert(merged === whole)
  }

  private def refSkyline(pts: Seq[(Long, Long)]): Seq[(Long, Long)] =
    pts.filter(p => !pts.exists(q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2)))

  test("law: skyline equals brute force at any sample size") {
    val gen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(gen, Gen.oneOf(1, 4, 512)) { (pts, ss) =>
        val df = pts.zipWithIndex.map { case ((a, b), i) =>
          (i.toLong, a, b) }.toDF("id", "a", "b")
        val got = Olap.skyline(df,
            Seq("a" -> col("a"), "b" -> col("b")), sampleSize = ss)
          .select("a", "b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted
        got.toSeq == refSkyline(pts).sorted
      })
    assert(res.passed, res.status.toString)
  }

  test("skyline enforces the survivor bound on anti-correlated data") {
    // a perfect anti-correlated diagonal: EVERY row is on the frontier,
    // so phase 1 can prune nothing and all 50 rows survive to the
    // quadratic phase — exactly the distribution the cap is for
    val diag = (1L to 50L).map(i => (i, i, 51L - i)).toDF("id", "a", "b")
    val ex = intercept[IllegalArgumentException] {
      Olap.skyline(diag, Seq("a" -> col("a"), "b" -> col("b")),
        maxSurvivors = 20L).collect()
    }
    assert(ex.getMessage.contains("maxSurvivors"))
    // at the cap it still runs and returns the full frontier
    val ok = Olap.skyline(diag, Seq("a" -> col("a"), "b" -> col("b")),
      maxSurvivors = 50L).collect()
    assert(ok.length === 50)
  }

  test("skyline keeps all rows of a tied frontier point") {
    val df = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 1L, 1L))
      .toDF("id", "a", "b")
    val ids = Olap.skyline(df, Seq("a" -> col("a"), "b" -> col("b")))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L))
  }

  test("skyline plan: corpus joins are broadcast nested-loop, no SMJ") {
    // the result is checkpoint-materialized inside the operator, so
    // capture the EXECUTED plans via a listener instead of inspecting
    // the (post-checkpoint) returned frame
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = (1L to 200L).map(i => (i, i % 17, i % 13))
        .toDF("id", "a", "b")
      Olap.skyline(df, Seq("a" -> col("a"), "b" -> col("b"))).count()
      // listener delivery is async — poll for the join-bearing plan
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var joined = Seq.empty[String]
      while (joined.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(50)
        joined = plans.toArray(Array.empty[String]).toSeq
          .filter(_.contains("BroadcastNestedLoopJoin"))
      }
      assert(joined.nonEmpty, "no broadcast nested-loop plan captured")
      assert(!joined.exists(_.contains("SortMergeJoin")), joined.head)
    } finally spark.listenerManager.unregister(listener)
  }
}
