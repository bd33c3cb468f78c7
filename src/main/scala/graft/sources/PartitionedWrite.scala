package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Size-governed partitioned parquet layout — the write side of a
  * 100 TB pipeline. Three failure modes govern the design:
  *
  *  1. **Small files.** A naive `df.write.partitionBy(cols)` emits one
  *     file per (task × partition-value) — 10⁴ tasks × 10³ values is
  *     10⁷ tiny files, which kills the next job's scan planning and the
  *     metastore. Routing every partition value to ONE task first
  *     (`repartition(partCols)`) makes it one file per value…
  *  2. **…except hot partitions.** One task then writes ALL of a hot
  *     value's rows. `maxRecordsPerFile` caps the file SIZE (the writer
  *     rolls to a new file) but not the task's wall-clock; for skewed
  *     layouts [[writeSalted]] spreads each value over `saltBuckets`
  *     tasks at the cost of that many files per value — the standard
  *     files-vs-parallelism dial, chosen from [[graft.ext.Profile.keySkew]].
  *  3. **Unsorted row groups.** Sorting rows inside each task by the
  *     caller's scan predicate columns tightens parquet min/max stats,
  *     so later scans prune row groups, not just partitions.
  *
  * Layout properties (files per partition dir, per-file row caps,
  * lossless read-back) are asserted in PartitionedWriteSpec.
  */
object PartitionedWrite {

  /** One writer task per partition value: fewest files (⌈rows/cap⌉ per
    * value), best for layouts whose values are roughly even.
    */
  def write(df: DataFrame, path: String, partCols: Seq[String],
      maxRecordsPerFile: Long, sortCols: Seq[String] = Nil): Unit = {
    require(partCols.nonEmpty, "need at least one partition column")
    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** Hot-partition variant: each partition value fans out over
    * `saltBuckets` writer tasks (deterministic salt from `saltOn`, e.g.
    * the row's id), bounding any one task's share of a hot value to
    * ~1/saltBuckets at the cost of up to `saltBuckets` files per value.
    *
    * The exchange is sized EXPLICITLY (`writerTasks`, default
    * 4×saltBuckets to keep salt→task collisions rare): an un-sized
    * repartition is fair game for AQE partition coalescing, which at
    * low volume would merge the salted splits back into one writer
    * task — exactly the serialization the salt exists to prevent.
    */
  def writeSalted(df: DataFrame, path: String, partCols: Seq[String],
      maxRecordsPerFile: Long, saltOn: Column, saltBuckets: Int,
      sortCols: Seq[String] = Nil, writerTasks: Int = 0): Unit = {
    require(partCols.nonEmpty, "need at least one partition column")
    require(saltBuckets > 0, "need saltBuckets > 0")
    val tasks = if (writerTasks > 0) writerTasks else saltBuckets * 4
    val salted = df.withColumn("__graft_salt",
      pmod(abs(hash(saltOn)), lit(saltBuckets)))
    salted
      .repartition(tasks, (partCols :+ "__graft_salt").map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .drop("__graft_salt")
      .write
      .partitionBy(partCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}
