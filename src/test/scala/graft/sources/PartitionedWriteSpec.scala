package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class PartitionedWriteSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[String] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq

  test("write: one partition dir per value, per-file row cap, lossless") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val out = Files.createTempDirectory("graft_pw").toString
    PartitionedWrite.write(ev, out, Seq("event_type"),
      maxRecordsPerFile = 150L, sortCols = Seq("ts"))
    // one directory per event_type value
    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("event_type="))
      .toSet
    val types = ev.select("event_type").distinct()
      .collect().map(r => s"event_type=${r.getString(0)}").toSet
    assert(dirs === types)
    // every file respects the row cap, and each value's file count is
    // the minimum ⌈rows/cap⌉ (single writer task per value)
    val perType = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, n) <- perType) {
      val files = parquetFiles(s"$out/event_type=$t")
      assert(files.nonEmpty)
      assert(files.size == ((n + 149) / 150).toInt,
        s"$t: expected minimal file count, got ${files.size} for $n rows")
      files.foreach { f =>
        val c = spark.read.parquet(f).count()
        assert(c <= 150, s"$f has $c rows > cap")
      }
    }
    // lossless round-trip (partition column comes back typed as string)
    val back = spark.read.parquet(out)
    assert(back.count() === ev.count())
    val a = ev.select(col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = back.select(col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }

  test("writeSalted fans a value over multiple tasks, still capped") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val out = Files.createTempDirectory("graft_pws").toString
    PartitionedWrite.writeSalted(ev, out, Seq("event_type"),
      maxRecordsPerFile = 1000L, saltOn = col("event_id"),
      saltBuckets = 4)
    val someType = ev.select("event_type").distinct()
      .collect().head.getString(0)
    val files = parquetFiles(s"$out/event_type=$someType")
    // 4 salt buckets → up to 4 writer tasks → >1 file despite the
    // value fitting the cap in one file
    assert(files.size > 1 && files.size <= 4,
      s"expected 2..4 salted files, got ${files.size}")
    assert(spark.read.parquet(out).count() === ev.count())
    // salt column must not leak into the layout
    assert(!spark.read.parquet(out).columns.contains("__graft_salt"))
  }
}
