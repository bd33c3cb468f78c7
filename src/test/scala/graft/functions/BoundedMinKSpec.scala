package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BoundedMinKSpec extends SparkSpec {
  import spark.implicits._

  test("k smallest longs, ascending, multiset semantics") {
    val got = Seq(5L, 1L, 3L, 1L, 9L, 2L).toDF("x")
      .agg(BoundedMinK.minK(col("x"), 4).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(1L, 1L, 2L, 3L)) // duplicate keeps both ranks
  }

  test("struct values order like orderBy on the same columns") {
    val df = Seq((2L, "b"), (1L, "z"), (1L, "a"), (3L, "a"), (1L, "a"))
      .toDF("k1", "k2")
    val got = df.agg(
        BoundedMinK.minK(struct(col("k1"), col("k2")), 3).as("s"))
      .collect()(0).getSeq[Row](0)
      .map(r => (r.getLong(0), r.getString(1)))
    val want = df.orderBy("k1", "k2").limit(3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want)
    assert(got == Seq((1L, "a"), (1L, "a"), (1L, "z")))
  }

  test("bounded across partitions (merge + serialize path)") {
    val got = spark.range(0, 20000, 1, 16)
      .select(format_string("v%06d", col("id")).as("x"))
      .agg(BoundedMinK.minK(col("x"), 5).as("s"))
      .collect()(0).getSeq[String](0)
    assert(got == (0 to 4).map(i => f"v$i%06d"))
  }

  test("empty input yields an empty sample; nulls are skipped") {
    val empty = Seq.empty[Long].toDF("x")
      .agg(BoundedMinK.minK(col("x"), 3).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(empty.isEmpty)
    val withNulls = Seq(Some(2L), None, Some(1L)).toDF("x")
      .agg(BoundedMinK.minK(col("x"), 3).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(withNulls == Seq(1L, 2L))
  }

  test("works in SQL after registration") {
    GraftFunctions.register(spark)
    Seq(30, 10, 20).toDF("c").createOrReplaceTempView("bmk_t")
    val got = spark.sql("SELECT bounded_min_k(c, 2) FROM bmk_t")
      .collect()(0).getSeq[Int](0)
    assert(got == Seq(10, 20))
  }
}
