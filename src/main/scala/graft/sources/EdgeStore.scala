package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared write-once edge artifacts for the graph family (round-11
  * directive #3). The 13 x_graph_* harness rows each re-derived their
  * edge frame — the orders⋈lineitem purchase projection or the
  * basket-array co-purchase fan-out — before iterating, making the
  * edge build the largest repeated cost of the suite's biggest family.
  * These builds are identical within a process, so the first row
  * persists the edge list as a BUCKETED table (bucketed on `src`, the
  * key every iterative rank join and degree aggregation shuffles on)
  * and every later row reads the splits in place: one derive per suite
  * instead of one per row, and src-keyed work starts from co-located
  * splits (asserted in BucketingSpec).
  *
  * At 100 TB this is the same contract as IndexStore's dedup index:
  * the graph projection of a fact table is scanned/derived once at
  * build time and served to every downstream centrality/community/
  * structure job from the artifact — never re-joined per job. Same
  * scratch lifecycle too: per-(sfDir, pid) table names, rebuilt per
  * process, landing in the gitignored spark-warehouse.
  */
object EdgeStore {

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Return the bucketed edge table `table`, building it from `build`
    * exactly once per process (double-checked under a per-table lock;
    * harness queries run sequentially, but nothing here requires it).
    * The artifact content is the build frame AS-IS — a multiset, no
    * dedup: consumers own their set semantics (pageRank distincts,
    * triangle counting orients, …), so a served row is byte-identical
    * to the in-memory one; only the derive work moves to build time.
    */
  def ensure(spark: SparkSession, table: String, keys: Seq[String],
      numBuckets: Int)(build: => DataFrame): DataFrame = {
    val lock = locks.computeIfAbsent(table, _ => new Object)
    lock.synchronized {
      if (!spark.catalog.tableExists(table))
        Bucketing.writeBucketed(build, table, keys, numBuckets)
    }
    spark.table(table)
  }
}
