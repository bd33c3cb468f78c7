package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch in-JVM A/B (not part of the harness contract): the three
  * BPE merge learners — full-reaggregation distributed, DELTA
  * distributed (round-14: only winner-containing words re-counted,
  * folded into a standing pair histogram), and the single-task
  * indexed trainer — on a generated histogram of ≥1M DISTINCT words
  * (the scale the round-12 verdict flagged the single-task
  * `repartition(1)` for). Sequences asserted IDENTICAL each rep. The
  * round-13 expectation was honest: the single-task trainer wins
  * anything that fits one task; the delta path's job is to close most
  * of that 5× gap while keeping the no-single-task-heap property. The
  * numbers land in PLANS.md with that framing.
  */
object BpeDistAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nMerges = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    // injective id → word over a 10-letter alphabet (1M distinct words,
    // ~7 symbols each); counts cycle 1..97 so argmaxes are nontrivial
    val hist = spark.range(1, n + 1L).select(
      translate(col("id").cast("string"), "0123456789", "abcdefghij")
        .as("w"),
      (pmod(col("id"), lit(97L)) + 1L).as("cnt")).cache()
    println(s"histogram: ${hist.count()} distinct words")

    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toList.sortBy(_._1)
    def run(tag: String,
        f: () => org.apache.spark.sql.DataFrame)
        : List[(Long, String, String, String, Long)] = {
      val t0 = System.nanoTime()
      val got = rows(f())
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-18s wall=$dt%7.2f s merges=${got.size}")
      got
    }
    for (rep <- 1 to 2) {
      val dist = run(s"rep$rep distributed", () =>
        graft.ext.TextAnalysis.learnBpeMergesDistributed(hist, nMerges,
          minCount = 2L))
      val delta = run(s"rep$rep dist-delta", () =>
        graft.ext.TextAnalysis.learnBpeMergesDistributedDelta(hist,
          nMerges, minCount = 2L))
      val single = run(s"rep$rep single-task", () =>
        graft.ext.TextAnalysis.learnBpeMergesFromHistogram(hist, nMerges,
          minCount = 2L))
      require(dist == single,
        s"merge sequences must be identical:\n$dist\nvs\n$single")
      require(delta == single,
        s"delta merge sequence must be identical:\n$delta\nvs\n$single")
    }
    spark.stop()
  }
}
