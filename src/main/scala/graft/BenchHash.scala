package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies the portable-hash tax: the full near-dup pipeline under
  * md5-prefix `hash48` (oracle-portable) vs `hash48Fast` (xxhash64,
  * engine-local) on the documents table. Alternates the two paths after
  * a warmup pass so JIT state is shared; prints one line per timed run.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.BenchHash
  */
object BenchHash {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"),
        graft.ext.TextAnalysis.tokens(col("text")).as("toks"))
    def run(fast: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = graft.ext.Dedup.nearDuplicatesFromTokens(docs,
        threshold = 0.5, k = 5, fast = fast).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      (n, dt)
    }
    run(fast = false); run(fast = true) // warmup both code paths
    for (i <- 1 to 3; fast <- Seq(false, true)) {
      val (n, dt) = run(fast)
      println(f"[hashbench] run=$i fast=$fast pairs=$n sec=$dt%.2f")
    }
    spark.stop()
  }
}
