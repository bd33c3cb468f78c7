package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table support — the co-located-join scale path (SURVEY.md
  * §4.3 / builder mandate "co-locate joins via bucketing").
  *
  * A validation package is checked repeatedly (every ingest batch), and
  * its fk/key checks all shuffle on the same key columns. Writing the
  * tables bucketed (+ sorted) by those keys once moves that shuffle to
  * write time: every subsequent key-equi join or aggregation between
  * tables bucketed the same way runs with NO Exchange — at 100 TB the
  * difference between re-shuffling the fact table per check and reading
  * co-located splits. Verified by BucketingSpec: the bucketed fk join
  * plan contains zero shuffles.
  */
object Bucketing {

  /** Write `df` as a parquet managed table bucketed (and sorted) by
    * `keys` into `numBuckets` buckets.
    */
  def writeBucketed(
      df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, enabling shuffle-free joins on the bucket keys).
    */
  def readBucketed(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame =
    spark.table(table)
}
