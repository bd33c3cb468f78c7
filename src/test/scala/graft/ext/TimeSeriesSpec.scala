package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resampleCounts fills interior gaps with explicit zeros") {
    // buckets of 10µs: events in buckets 1, 1, 3, 6 → grid 1..6
    val df = Seq(10L, 15L, 30L, 60L).toDF("us")
    val out = TimeSeries.resampleCounts(df, col("us"), 10L)
      .select("bucket", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L), (2L, 0L), (3L, 1L), (4L, 0L),
      (5L, 0L), (6L, 1L)))
  }

  test("resampleCounts on an empty frame is empty, not an error") {
    val df = Seq.empty[Long].toDF("us")
    assert(TimeSeries.resampleCounts(df, col("us"), 10L).count() === 0L)
  }

  test("bucket_start reconstructs the grid timestamp") {
    val df = Seq(3600L * 1000000L + 5L).toDF("us")
    val r = TimeSeries.resampleCounts(df, col("us"), 3600L * 1000000L)
      .collect().head
    assert(r.getLong(0) === 1L)
    assert(r.getTimestamp(1).toInstant.toString === "1970-01-01T01:00:00Z")
  }

  test("grid guard refuses a pathological bucket width") {
    val df = Seq(0L, 20000000000000L).toDF("us") // 2·10¹³ µs apart
    val e = intercept[Exception] {
      TimeSeries.resampleCounts(df, col("us"), 1L).count()
    }
    assert(e.getMessage.contains("10M buckets"))
  }
}
