package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis

/** Scratch A/B for the round-12 BPE-apply scale directive (not part of
  * the harness contract): literal-array segmentation ([[TextAnalysis
  * .bpePieces]] riding the plan as per-length literal arrays) vs the
  * join-based matcher ([[TextAnalysis.bpePieceCounts]]) across vocab
  * sizes, on the sf documents table with a vocabulary learned from its
  * own substring frequencies (realistic piece hit-rates, deterministic).
  */
object BpeAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the driver documents fixture has a ~50-word vocabulary (235
    // distinct substrings total) — use the heavy-tailed Zipf corpus so
    // a 10k-piece vocabulary actually exists to learn
    val docs = ZipfDocs.frame(spark, 20000L, 50000)
      .select(col("doc_id"), col("text")).cache()
    docs.count()
    val dir = "ZipfDocs(20000, 50000)"

    // vocab: most frequent 2..6-char substrings of corpus words,
    // deterministic tie-break (count desc, piece asc)
    val words = docs.select(
      explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
    val grams = words
      .select(explode(sequence(lit(1), length(col("w")))).as("pos"),
        col("w"))
      .select(explode(array_distinct(array(
        (2 to 6).map(l => col("w").substr(col("pos"), lit(l))): _*)))
        .as("piece"))
      .filter(length(col("piece")) >= 2)
      .groupBy("piece").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(args.headOption.map(_.toInt).getOrElse(10000))
      .select("piece")
    val vocabAll = grams.collect().map(_.getString(0)).toSeq
    println(s"[bpeab] vocab pool: ${vocabAll.size} pieces from $dir")

    def timeIt(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[bpeab] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val sizes = Seq(250, 1000, 4000, 10000, 50000)
      .filter(_ <= vocabAll.size)
    for (n <- sizes) {
      val vocab = vocabAll.take(n)
      timeIt(s"join   n=$n") {
        TextAnalysis.bpeTokenCounts(docs, "doc_id", lower(col("text")),
          vocab).count()
      }
      timeIt(s"literal n=$n") {
        // the pre-round-12 apply: per-length literal arrays on the
        // distinct-word frame, counts joined back
        val ws = docs.select(col("doc_id").as("id"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
        val seg = ws.select("w").distinct()
          .select(col("w"),
            size(TextAnalysis.bpePieces(col("w"), vocab)).cast("long")
              .as("n_pieces"))
        ws.join(seg, "w").groupBy("id")
          .agg(count(lit(1)).as("n_words"),
            sum("n_pieces").as("n_bpe_tokens"))
          .count()
      }
    }
    spark.stop()
  }
}
