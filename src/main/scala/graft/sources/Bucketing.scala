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

  /** Append rows into an EXISTING bucketed table, preserving its
    * layout: only the delta shuffles to the declared bucketing (the
    * spec must match the catalog's — Spark rejects a mismatch, which
    * is the guarantee that an append can never silently break the
    * exchange-free join contract). Each append lands one new file per
    * non-empty bucket; bucketed reads union a bucket's files, so the
    * contract survives any number of appends — at the usual LSM-shaped
    * price of file-count growth until a periodic compaction rewrite.
    */
  def appendBucketed(
      df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("append")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket count of an existing table, from the catalog. */
  def numBucketsOf(spark: org.apache.spark.sql.SparkSession,
      table: String): Int = {
    val spec = spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec
    require(spec.isDefined, s"table $table is not bucketed")
    spec.get.numBuckets
  }
}
