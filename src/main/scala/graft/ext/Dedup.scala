package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §7.6): exact, normalized-key,
  * MinHash+LSH banding, SimHash, and n-gram Jaccard verification.
  *
  * Scale design (100 TB): every variant reduces to hash-shuffle
  * aggregations / joins on *bounded-size keys* (hashes, band buckets) —
  * never a full cross join. MinHash banding turns O(n²) pair search into
  * per-bucket joins whose fan-out is controlled by the band count; the
  * expensive exact Jaccard runs only on candidate pairs. AQE handles
  * skewed buckets (e.g. boilerplate-heavy shards).
  */
object Dedup {

  /** Sliding word k-grams (shingles), distinct. */
  def shingles(c: Column, k: Int = 3): Column = {
    val ts = TextAnalysis.tokens(c)
    val n = size(ts)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(ts, i + 1, lit(k)))))
        .otherwise(array(concat_ws(" ", ts))))
  }

  /** Exact duplicate groups by full-content hash: returns
    * (key, cnt) for groups with >1 member. One hash-agg shuffle on a
    * 32-byte key regardless of document size.
    */
  def exactDupGroups(df: DataFrame, c: String): DataFrame =
    df.groupBy(md5(col(c)).as("content_hash"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Normalized-key duplicate groups: first `n` tokens as the key
    * (cheap prefix clustering — catches copy-paste with different tails).
    */
  def normalizedKey(c: Column, n: Int = 3): Column =
    concat_ws(" ", slice(TextAnalysis.tokens(c), 1, n))

  def prefixDupGroups(df: DataFrame, c: String, n: Int = 3): DataFrame =
    df.groupBy(normalizedKey(col(c), n).as("prefix_key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** MinHash signature: `numHashes` permutations approximated by seeded
    * xxhash64; each signature slot is the min hash over the shingle set.
    * Pure higher-order functions — stays inside codegen, no UDF.
    */
  def minhashSignature(c: Column, numHashes: Int = 32, k: Int = 3): Column = {
    val sh = shingles(c, k)
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, s => xxhash64(s, seed))))
  }

  /** LSH banding: split the signature into `bands` bands of
    * `numHashes/bands` rows each; hash each band to a bucket id. Docs
    * sharing any band bucket are candidate near-duplicates.
    */
  def lshBandHashes(sig: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws("_",
          transform(slice(sig, b * rows + 1, lit(rows)),
            h => h.cast("string"))))
          .as("bucket")))
  }

  /** Candidate near-duplicate pairs via MinHash LSH: explode band
    * buckets, self-join per bucket, emit ordered (id_a < id_b) pairs.
    * The shuffle key is (band, bucket) — bounded fan-out, no cross join.
    */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, k: Int = 3): DataFrame = {
    val sig = minhashSignature(col(textCol), numHashes, k)
    val banded = df
      .select(col(idCol).as("id"), sig.as("sig"))
      .select(col("id"),
        explode(lshBandHashes(col("sig"), numHashes, bands)).as("bh"))
      .select(col("id"), col("bh.band").as("band"),
        col("bh.bucket").as("bucket"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity of two text columns: |A∩B| / |A∪B|
    * over distinct word k-grams. Integer-count division — deterministic
    * across engines.
    */
  def jaccard(a: Column, b: Column, k: Int = 3): Column = {
    val sa = shingles(a, k)
    val sb = shingles(b, k)
    val inter = size(array_intersect(sa, sb))
    val union = size(array_union(sa, sb))
    when(union > 0, inter.cast("double") / union).otherwise(lit(0.0))
  }

  /** SimHash-64: per bit, count set bits over token hashes; bit b of the
    * sketch is set when more than half the tokens have it set. One pass
    * over the token array (each hash expanded to its 64 bits, summed
    * with zip_with) — pure higher-order functions, no UDF.
    */
  def simhash64(c: Column): Column = {
    val hs = transform(array_distinct(TextAnalysis.tokens(c)),
      t => xxhash64(t))
    val bitArrays = transform(hs, h =>
      array((0 until 64).map(b =>
        shiftright(h, b).bitwiseAND(lit(1L))): _*))
    val counts = aggregate(bitArrays,
      array_repeat(lit(0L), 64),
      (acc, bits) => zip_with(acc, bits, (a, x) => a + x))
    val n = size(hs)
    (0 until 64).map { b =>
      when(element_at(counts, b + 1) * 2 > n, lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Full near-dup pipeline: MinHash-LSH candidates → exact Jaccard
    * verification at `threshold`. Joins text back only for candidates.
    */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numHashes: Int = 32, bands: Int = 8,
      k: Int = 3): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, numHashes, bands, k)
    val txt = df.select(col(idCol).as("jid"), col(textCol).as("jtext"))
    cands
      .join(txt.withColumnRenamed("jid", "id_a_")
        .withColumnRenamed("jtext", "text_a"), col("id_a") === col("id_a_"))
      .join(txt.withColumnRenamed("jid", "id_b_")
        .withColumnRenamed("jtext", "text_b"), col("id_b") === col("id_b_"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("text_a"), col("text_b"), k).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
