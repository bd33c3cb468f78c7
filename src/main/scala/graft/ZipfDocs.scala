package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Zipf-vocabulary document corpus generator — bench-protocol input
  * ONLY (never a correctness input; the oracle corpus stays the
  * driver's testdata).
  *
  * Why it exists (round-7 directive #2): the driver's synthetic
  * documents draw from a ~50-word vocabulary, which structurally
  * defeats document-frequency-ordered prefix filtering (every pair
  * shares hot prefix tokens, so the PPJoin decade ratio read 6.2× on
  * a plan whose whole point is df-ordered pruning) and gives tfidf /
  * vocab / logprob an unrealistically tiny token domain. Real corpora
  * are heavy-tailed; this generator produces one, deterministically,
  * so the text family's scaling evidence runs on the distribution the
  * plans were designed for.
  *
  * Distribution: token ranks follow the s = 1 Zipf law via the exact
  * inverse-CDF trick — for P(r) ∝ 1/r the CDF is ln(r)/ln(V), so
  * rank = clamp(⌊V^u⌋, 1, V) for uniform u. The uniform stream is
  * hash-derived (xxhash64 of (doc seed, position)), so the corpus is
  * a pure function of (nDocs, vocab) — no RNG state, identical bytes
  * on every run and both scales share the leading decade.
  *
  * Near-dup structure: every 10th document (doc_id % 10 == 9) re-uses
  * the token seed of doc_id − 9 and perturbs every 13th token — ~8%
  * token edits, above-threshold Jaccard pairs for the ppjoin/minhash
  * reads, generated without any cross-row join.
  *
  * Usage: runMain graft.ZipfDocs [outDir] [nDocs] [vocab]
  * (writes outDir/documents.parquet with the driver corpus schema:
  * doc_id, text, lang, source, n_chars)
  */
object ZipfDocs {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_zipf/x1")
    val nDocs = if (args.length > 1) args(1).toLong else 5000L
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    frame(spark, nDocs, vocab)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[zipf] $out/documents.parquet written: $nDocs docs, " +
      s"vocab $vocab")
    spark.stop()
  }

  /** The corpus as a DataFrame — a pure function of (nDocs, vocab),
    * shared by the bench-protocol main above and the oracle-checked
    * [[graft.sources.ZipfFixture]] (round-8: heavy-tailed text
    * correctness rows, not just timing protocols).
    */
  def frame(spark: SparkSession, nDocs: Long, vocab: Int)
      : org.apache.spark.sql.DataFrame = {
    val lnV = math.log(vocab.toDouble)
    // deterministic uniform in [0,1) from a 2^40 hash bucket
    def u(seed: String): String =
      s"(pmod(xxhash64($seed), 1099511627776L) / 1099511627776.0)"
    // Zipf rank for position i of the doc's seed stream; perturbed
    // positions (near-dup replicas only) salt the hash, everything
    // else is identical to the source doc
    val tokenExpr =
      s"""concat('w', cast(greatest(least(cast(
         |  exp(${u("__seed * 1000003L + i")} * $lnV) as long),
         |  ${vocab}L), 1L) as string))""".stripMargin.replace("\n", " ")
    val perturbedExpr =
      s"""concat('p', cast(greatest(least(cast(
         |  exp(${u("__seed * 7368787L + i")} * $lnV) as long),
         |  ${vocab}L), 1L) as string))""".stripMargin.replace("\n", " ")
    spark.range(nDocs)
      .withColumn("doc_id", col("id"))
      // replica docs share the seed of the group head
      .withColumn("__rep", col("doc_id") % 10 === 9)
      .withColumn("__seed",
        when(col("__rep"), col("doc_id") - 9).otherwise(col("doc_id")))
      // 20–89 tokens, avg ≈ 54 — matches the driver corpus's mean
      // token count at sf0.1 so the ×1 absolute walls stay comparable
      // to the existing bench rows; the length law matters less than
      // the token law for these plans
      .withColumn("__len",
        (pmod(xxhash64(col("__seed") * 31L + 7L), lit(70L)) + 20L)
          .cast("int"))
      .withColumn("text", expr(
        s"""array_join(transform(sequence(1, __len), i ->
           |  if(__rep AND i % 13 = 0, $perturbedExpr, $tokenExpr)),
           |  ' ')""".stripMargin.replace("\n", " ")))
      .withColumn("lang",
        when(pmod(col("doc_id"), lit(20L)) === 0, "de").otherwise("en"))
      .withColumn("source",
        concat(lit("src"), pmod(col("doc_id"), lit(8L))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }
}
