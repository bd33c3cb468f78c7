package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "red widgett"),   // 1 edit from "red widget"
    (2L, "blue bolt"),     // exact match
    (3L, "green gizmo")    // no block-mate within 2
  ).toDF("id", "name")

  private def right = Seq(
    (10L, "red widget"), (11L, "red wadget"), (12L, "blue bolt"),
    (13L, "blue boat"), (14L, "green gadget")
  ).toDF("id", "name")

  test("fuzzyJoinBlocked finds within-distance pairs, block-restricted") {
    val pairs = Linkage.fuzzyJoinBlocked(left, right, "id", "name",
        "id", "name", Linkage.firstTokenKey, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(pairs === Map(
      (1L, 10L) -> 1, (1L, 11L) -> 2,          // widgett vs widget/wadget
      (2L, 12L) -> 0, (2L, 13L) -> 1))         // bolt exact, boat 1 edit
  }

  test("blocking prevents cross-block matches even at small distance") {
    val a = Seq((1L, "red cat")).toDF("id", "name")
    val b = Seq((2L, "ted cat")).toDF("id", "name") // dist 1, block differs
    assert(Linkage.fuzzyJoinBlocked(a, b, "id", "name", "id", "name",
      Linkage.firstTokenKey, 2).count() === 0)
  }

  test("bestMatchBlocked picks smallest distance, id ascending on ties") {
    val best = Linkage.bestMatchBlocked(left, right, "id", "name",
        "id", "name", Linkage.firstTokenKey, maxDist = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2)))
      .toMap
    assert(best === Map(1L -> (10L, 1), 2L -> (12L, 0)))
    // tie case: two rights at equal distance → smaller id wins
    val l2 = Seq((9L, "red wodget")).toDF("id", "name")
    val tie = Linkage.bestMatchBlocked(l2, right, "id", "name",
        "id", "name", Linkage.firstTokenKey, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2)))
      .toMap
    // "red wodget": dist 1 to both widget(10) and wadget(11) → 10
    assert(tie === Map(9L -> (10L, 1)))
  }

  test("goldenRecords keeps the argmax payload with group stats") {
    val dupes = Seq(
      // group "a": 30-char member 3 beats the rest; two sources
      (1L, "a", 10L, "s1"), (2L, "a", 20L, "s2"), (3L, "a", 30L, "s1"),
      // group "b": tie on chars → smallest id wins (ord = (chars, -id))
      (7L, "b", 5L, "s3"), (4L, "b", 5L, "s3"),
      (9L, "c", 1L, "s4")).toDF("id", "grp", "chars", "src")
    val out = Linkage.goldenRecords(dupes, Seq("grp"),
        Seq(col("chars"), -col("id")), Seq("id", "src"),
        Seq(countDistinct(col("src")).as("n_src")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(out === Map(
      "a" -> ((3L, 2L, 3L, "s1")),
      "b" -> ((2L, 1L, 4L, "s3")),
      "c" -> ((1L, 1L, 9L, "s4"))))
  }

  test("goldenRecords stays ONE hash aggregate — no window, no sort") {
    val df = Seq((1L, "a", 2L)).toDF("id", "grp", "chars")
    val plan = Linkage.goldenRecords(df, Seq("grp"),
        Seq(col("chars"), -col("id")), Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("SortAggregate"))
    assert(plan.contains("ObjectHashAggregate"))
  }

  test("maxBlockSize drops oversize blocks like the LSH bucket cap") {
    val manyRed = (0 until 20).map(i => (100L + i, s"red thing$i")).toDF("id", "name")
    val q = Seq((1L, "red thing1")).toDF("id", "name")
    assert(Linkage.fuzzyJoinBlocked(q, manyRed, "id", "name", "id", "name",
      Linkage.firstTokenKey, 2, maxBlockSize = 10).count() === 0)
    assert(Linkage.fuzzyJoinBlocked(q, manyRed, "id", "name", "id", "name",
      Linkage.firstTokenKey, 2, maxBlockSize = 0).count() > 0)
  }
}
