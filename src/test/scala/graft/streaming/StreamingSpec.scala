package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.schema.{Constraints, Field, TableSchema}

/** Structured Streaming driven through a real file source + memory sink:
  * the events parquet is replayed as a stream and the streaming plans
  * must produce the same results as the batch equivalents.
  */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The file stream source needs a *directory*; stage the single
    * events.parquet file into one.
    */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  /** Stream the events table through a transform and collect via the
    * memory sink (processAllAvailable drains the file source).
    */
  private def runStream(
      name: String,
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    // schema of the *raw* parquet (ts = nanos long via nanosAsLong);
    // the stream then applies the same µs conversion Tables.load does
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream
      .schema(rawSchema)
      .parquet(streamDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = f(stream).writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  // the raw parquet read (pre-Tables conversion) leaves ts as long nanos;
  // the stream converts inline exactly as Tables.load does
  private def batchEvents = Tables.load(spark, dir, "events")

  test("windowed counts: streaming result equals batch result") {
    val streamed = runStream("win_counts",
      df => StreamingValidate.windowedCounts(df, "1 hour", "10 minutes"),
      mode = "append")
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value")), 6).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
    // append mode emits only windows below the watermark; every emitted
    // row must match the batch computation exactly
    val b = batch.collect().map(r => r.toSeq).toSet
    val s = streamed.collect().map(r => r.toSeq).toSet
    assert(s.nonEmpty, "stream emitted no closed windows")
    assert(s.subsetOf(b))
  }

  test("violation rate over stream") {
    val out = runStream("viol_rate",
      df => StreamingValidate.violationRate(df,
        col("value") > 90.0, "6 hours", "1 minute"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("violations") <= r.getAs[Long]("total"))
    }
  }

  test("stateful dedup within watermark") {
    val out = runStream("dedup",
      df => StreamingValidate.dedupWithinWatermark(
        df.withColumn("user_mod", col("user_id") % 10),
        Seq("user_mod")))
    // dedup on (user_mod, ts) can only shrink the stream
    assert(out.count() <= batchEvents.count())
    assert(out.count() > 0)
  }

  test("sessionize runs as a real stream with state across batches") {
    val out = runStream("sessions",
      df => StreamingValidate.sessionize(df, 30),
      mode = "append")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("session_end")
        .before(r.getAs[java.sql.Timestamp]("session_start")))
      assert(r.getAs[Long]("n_events") >= 1)
    }
  }

  test("violation flags are streaming-safe (stateless projection)") {
    val schema = TableSchema(Seq(
      Field("event_type", constraints = Constraints(
        enum = Some(Seq("click", "view", "purchase", "signup", "error")))),
      Field("value", "number",
        constraints = Constraints(minimum = Some("0")))))
    val out = runStream("flags",
      df => StreamingValidate.violationFlags(df, schema)
        .select(col("event_id"), col("event_type__enum"),
          col("value__minimum")))
    assert(out.count() == batchEvents.count())
    // clean data: no violations
    assert(out.filter(col("event_type__enum") ||
      col("value__minimum")).count() == 0)
  }
}
