package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis}

/** Scratch stage profiler for the near-dup pipeline (not part of the
  * harness contract; safe to remove).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val d = Tables.load(spark, dir, "documents")
    val toks = TextAnalysis.tokens(col("text"))
    val twins = d.select((col("doc_id") + 1000000).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), floor(size(toks) * 0.8).cast("int"))).as("text"))
    val both = d.select(col("doc_id"), col("text")).unionByName(twins)

    time("scan+union")(both.count())
    time("tokens")(
      both.select(sum(size(TextAnalysis.tokens(col("text"))))).count())
    val sh = both.select(col("doc_id"), Dedup.shingleHashes(col("text"), 5).as("sh"))
    time("shingleHashes")(sh.select(sum(size(col("sh")))).count())
    val sig = sh.select(col("doc_id"), Dedup.minhashFromHashes(col("sh"), 32).as("sig"))
    time("minhash sig 32")(sig.select(sum(size(col("sig")))).count())
    val cands = Dedup.minhashCandidates(both, "doc_id", "text", 32, 8, 5)
    println("[prof] ===== candidates plan =====")
    println(cands.queryExecution.executedPlan.treeString.linesIterator
      .map("[prof] " + _).mkString("\n"))
    time("candidates (band join)")(cands.count())
    time("full nearDuplicates")(
      Dedup.nearDuplicates(both, "doc_id", "text", 0.5, 32, 8, 5).count())
    spark.stop()
  }
}
