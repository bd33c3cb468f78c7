package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch in-JVM A/B (not part of the harness contract): the
  * round-13 grouped-diagonal substring extension vs the pre-round-13
  * direct per-candidate extension, on the adversarial shape the
  * rewrite targets — a corpus-wide SAME-POSITION template. Every
  * document opens with the same 60-token boilerplate, so all ~n²/2
  * document pairs share one diagonal (diag 0): the direct extension
  * replicates each document's gram frame once per PARTNER
  * (Σ |grams| × |partners| ≈ n²·|grams| intermediate rows before the
  * b-side join prunes), while the grouped extension keys on the
  * distinct (id_a, diag) set — ≈ ONE diagonal per document here — and
  * pays Σ |grams| × |diags| ≈ n·|grams|. Outputs asserted EQUAL each
  * rep (order-independent multiset hash — runs are ~n²/2 rows, too
  * many to collect), interleaved reps per the house A/B protocol.
  */
object SubstrAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toInt).getOrElse(800)
    val minRunLen = 30; val k = 8
    // 60-token boilerplate prefix + 20-token unique tail per doc: the
    // boilerplate sits at the SAME position corpus-wide, so every pair
    // shares exactly the diag-0 60-token run and nothing else
    val boiler = (1 to 60).map(i => s"boiler$i")
    def tailToks(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(20)),
        i => concat(lit("t"),
          pmod(id * i * 2654435761L, lit(9999999967L)).cast("string")))
    val docs = spark.range(1, n + 1).select(col("id"),
      concat(array(boiler.map(lit): _*), tailToks(col("id")))
        .as("toks")).cache()
    docs.count()

    def run(tag: String,
        f: () => org.apache.spark.sql.DataFrame): (Long, Long) = {
      val t0 = System.nanoTime()
      val agg = f().select(
          xxhash64(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
            col("run_len")).as("h"))
        .agg(count(lit(1)).as("n"),
          expr("bit_xor(h)").as("s")) // order-independent, ANSI-safe
        .head
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-16s wall=$dt%7.2f s rows=${agg.getLong(0)}%d")
      (agg.getLong(0), agg.getLong(1))
    }
    for (rep <- 1 to 3) {
      val grouped = run(s"rep$rep grouped", () =>
        graft.ext.Dedup.substringRuns(docs, "id", col("toks"),
          minRunLen, k))
      val direct = run(s"rep$rep direct", () =>
        graft.ext.Dedup.substringRunsDirect(docs, "id", col("toks"),
          minRunLen, k))
      require(grouped == direct,
        s"grouped and direct extensions must agree: $grouped vs $direct")
      require(grouped._1 >= n.toLong * (n - 1) / 2,
        "every pair must report its boilerplate run")
    }
    spark.stop()
  }
}
