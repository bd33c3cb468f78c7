package graft.oracle

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.TextAnalysis

/** Fixture frames and constants shared between the harness queries
  * (SparkEntry) and their DuckDB oracles (StaticOracles /
  * DynamicOracles) — extracted so each side references the SAME
  * degraded inputs, planted rows, and split weights, and neither can
  * drift from the other.
  */
private[graft] object Fixtures {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Documents plus exact copies of the first 50 (distinct ids) — the
    * degraded input for exact-dedup demonstrations.
    */
  private[graft] def docsWithCopies(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.unionByName(d.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 1000000))
  }

  /** The planted mixed-language row for x_text_langmix: an English
    * stretch glued to a Spanish one — 22 tokens, split 11/11, so the
    * first half actually ends with the Spanish token "el"; the English
    * stopword score (7 hits) still dominates it. The scrape-
    * concatenation artifact the operator exists to flag; shared with
    * the oracle.
    */
  private[graft] val LangmixPlanted: String =
    "the cat and the dog of a to the house " +
      "el perro y la casa de que el gato y la luna"

  /** Documents + 80%-token-prefix twins as a tokenized (id, toks) frame
    * — the shared near-dup input for x_dedup_minhash / x_dedup_clusters.
    */
  private[graft] def docsWithTwins(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id").as("id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val twins = base.select((col("id") + 1000000).as("id"),
      slice(col("toks"), lit(1),
        floor(size(col("toks")) * 0.8).cast("int")).as("toks"))
    base.unionByName(twins)
  }

  /** Twin-id offset for the incremental query: above every doc_id at
    * every scale factor INCLUDING ScaleData replicas (whose ids shift
    * by r·10^8), so the oracle's new-vs-corpus discriminator stays
    * valid on scaled data too.
    */
  private[graft] val IncrementalTwinOffset = 1000000000000L

  /** Train/valid/test assignment weights for x_sample_split — cumulative
    * thresholds are computed ONCE (Sampling.cumThresholds) and embedded
    * verbatim in the oracle SQL so both engines compare against
    * bit-identical doubles.
    */
  private[graft] val SplitWeights = Seq("train" -> 0.8, "valid" -> 0.1,
    "test" -> 0.1)

  /** Fixed query-term list for the BM25 retrieval row — shared by the
    * Spark expression and the oracle so the per-term contributions add
    * in the same order on both engines.
    */
  private[graft] val Bm25Terms = Seq("spark", "window", "vector")

  /** Subword vocab for the BPE-apply rows (x_text_bpe and the re-based
    * x_sample_pack budget): multi-char pieces with overlapping prefixes
    * ("ta"/"tab", "pa"/"part") so greedy longest-match is actually
    * exercised; characters no piece covers fall back to single-char
    * pieces. Shared verbatim with the DuckDB oracle (embedded as a SQL
    * list literal) so neither side can drift.
    */
  private[graft] val BpeVocab: Seq[String] = Seq(
    "th", "the", "ta", "tab", "le", "sc", "scan", "sp", "spark", "ar",
    "so", "sort", "sl", "ow", "sm", "all", "st", "str", "eam", "row",
    "ha", "hash", "me", "rge", "ba", "tch", "cust", "om", "er", "qu",
    "ery", "fil", "ter", "gr", "oup", "jo", "in", "win", "dow", "vec",
    "tor", "or", "der", "li", "ne", "co", "lumn", "agg", "pa", "rt",
    "part", "ke", "key", "da", "du", "fa", "big", "va", "lue", "an")

  /** Query terms for the Zipf-fixture BM25 row: head / shoulder / tail
    * ranks of the 50k-vocab Zipf law, so the idf spread is realistic
    * (the driver corpus's ~50-word vocabulary cannot produce one).
    */
  private[graft] val ZipfBm25Terms = Seq("w5", "w50", "w500")

  /** Teleport seed NODES for the personalized-PageRank row (customer
    * nodes = custkey·2 in the bipartite purchase graph; custkeys 1–2
    * hold orders at every shipped sf) — shared by the Spark expression
    * and the oracle.
    */
  private[graft] val PprSeeds = Seq(2L, 4L)

  /** Per-source keep-fractions for x_sample_mix (default 0.1 for the
    * unlisted sources).
    */
  private[graft] val MixFractions = Map("src0" -> 0.9, "src1" -> 0.5,
    "src2" -> 0.25)

  /** Skewed source mix shared by the temperature query and its oracle:
    * three sources kept whole, the rest thirded — unequal sizes are
    * what temperature scaling acts on. (The modulus must be coprime
    * with the source count: `source` is doc_id-aligned mod 20, so an
    * even modulus degenerately selects whole sources.)
    */
  private[graft] def skewedDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter((col("doc_id") % 3 === 0) ||
        col("source").isin("src0", "src1", "src2"))

  /** "Version 2" of documents for the reconciliation queries: every
    * doc_id % 17 == 0 row removed, text revised on % 13 == 0, n_chars
    * bumped on % 11 == 0, and a % 19 == 0 slice re-added under shifted
    * ids. Mirrored verbatim by [[DuckSql.duckDocsV2]].
    */
  private[graft] def docsV2(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val base = d.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" (rev2)")))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source"),
        when(col("doc_id") % 11 === 0, col("n_chars") + 7)
          .otherwise(col("n_chars")).as("n_chars"))
    val added = d.filter(col("doc_id") % 19 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(lit("new "), col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    base.unionByName(added)
  }

  /** Funnel step sequence for x_funnel — earliest-transition semantics
    * down signup → view → click → purchase; shared so the Spark query
    * and the oracle's chained CTEs can never disagree on the steps.
    */
  private[graft] val FunnelSteps =
    Seq("signup", "view", "click", "purchase")
}
