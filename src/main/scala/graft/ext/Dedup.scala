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

  /** Shingle set hashed to longs — all downstream MinHash/Jaccard work
    * runs on 8-byte hashes instead of strings (hash collisions are
    * negligible at 64 bits and the arrays are ~10× cheaper to shuffle
    * and intersect).
    */
  def shingleHashes(c: Column, k: Int = 3): Column =
    transform(shingles(c, k), s => xxhash64(s))

  /** MinHash signature from hashed shingles: `numHashes` permutations
    * approximated by seeded xxhash64; each slot is the min over the
    * shingle set. Pure higher-order functions — stays inside codegen.
    */
  def minhashFromHashes(sh: Column, numHashes: Int = 32): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, h => xxhash64(h, seed))))

  def minhashSignature(c: Column, numHashes: Int = 32, k: Int = 3): Column =
    minhashFromHashes(shingleHashes(c, k), numHashes)

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

  /** Candidate near-duplicate pairs via MinHash LSH over a
    * (id, sig) frame: explode band buckets, self-join per bucket, emit
    * ordered (id_a < id_b) pairs. The shuffle key is (band, bucket) —
    * bounded fan-out, no cross join.
    */
  private def candidatesFromSigs(
      sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val banded = sigs
      .select(col("id"),
        explode(lshBandHashes(col("sig"), numHashes, bands)).as("bh"))
      .select(col("id"), col("bh.band").as("band"),
        col("bh.bucket").as("bucket"))
    // disjoint column names on the two sides: a self-join through `.as`
    // aliases on the same exploded plan defeats equi-key extraction and
    // Catalyst falls back to a nested-loop join (measured 224 s vs 2 s
    // at sf0.1); renamed projections give a plain shuffle hash join on
    // (band, bucket)
    val left = banded.select(col("id").as("id_a"), col("band"),
      col("bucket"))
    val right = banded.select(col("id").as("id_b"),
      col("band").as("band_b"), col("bucket").as("bucket_b"))
    left.join(right,
        col("band") === col("band_b") &&
          col("bucket") === col("bucket_b") &&
          col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, k: Int = 3): DataFrame =
    // cache: both sides of the bucket self-join scan the signatures;
    // without it the (interpreted, lambda-heavy) signature expression
    // is evaluated twice over the full corpus
    candidatesFromSigs(
      df.select(col(idCol).as("id"),
        minhashSignature(col(textCol), numHashes, k).as("sig")).cache(),
      numHashes, bands)

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

  /** SimHash-64 stage 1: per-bit set counts over token hashes + token
    * count, as a struct. One pass over the token array (each hash
    * expanded to its 64 bits, summed with zip_with).
    *
    * Split from [[simhashFinish]] on purpose: higher-order functions are
    * interpreted with NO common-subexpression elimination, so the
    * finishing sum (which reads the counts 64 times) must consume a
    * *materialized* attribute, not re-evaluate this aggregate per bit.
    */
  def simhashBitCounts(c: Column): Column = {
    val hs = transform(array_distinct(TextAnalysis.tokens(c)),
      t => xxhash64(t))
    val bitArrays = transform(hs, h =>
      array((0 until 64).map(b =>
        shiftright(h, b).bitwiseAND(lit(1L))): _*))
    val counts = aggregate(bitArrays,
      array_repeat(lit(0L), 64),
      (acc, bits) => zip_with(acc, bits, (a, x) => a + x))
    struct(counts.as("counts"), size(hs).cast("long").as("n"))
  }

  /** SimHash-64 stage 2: bit b is set when more than half the tokens
    * have it set. 64 cheap array reads of the materialized counts.
    */
  def simhashFinish(parts: Column): Column =
    (0 until 64).map { b =>
      when(element_at(parts.getField("counts"), b + 1) * 2 >
        parts.getField("n"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** One-column convenience (small inputs / tests): for bulk use, project
    * [[simhashBitCounts]] first, then [[simhashFinish]] — see SparkEntry.
    */
  def simhash64(c: Column): Column = simhashFinish(simhashBitCounts(c))

  /** Jaccard over pre-hashed shingle arrays (long-array intersect). */
  def jaccardHashes(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(array_union(a, b))
    when(union > 0, inter.cast("double") / union).otherwise(lit(0.0))
  }

  /** Full near-dup pipeline: shingle-hash each doc ONCE, MinHash-LSH
    * candidates, then exact Jaccard verification on the precomputed
    * long arrays at `threshold`. The shingle computation is cached so
    * the signature build and both sides of the verification join reuse
    * it instead of re-tokenizing per candidate pair (the naive version
    * was ~50× slower at sf0.1).
    */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numHashes: Int = 32, bands: Int = 8,
      k: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      shingleHashes(col(textCol), k).as("sh")).cache()
    val sigs = base.select(col("id"),
      minhashFromHashes(col("sh"), numHashes).as("sig"))
    val cands = candidatesFromSigs(sigs, numHashes, bands)
    cands
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardHashes(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
