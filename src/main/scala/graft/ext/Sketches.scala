package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedTopK

/** KMV (k-minimum-values) distinct-count sketches and their set
  * operations — the mergeable cardinality sketch whose STATE is exactly
  * reproducible in plain SQL, unlike HLL (whose register layout is
  * engine-private).
  *
  * Why KMV next to the existing HLL screen: HLL gives the cheapest
  * single-set cardinality, but its sketches cannot be intersected —
  * cross-SOURCE overlap questions (shared vocabulary, common user ids,
  * contamination overlap between corpus shards) need a sketch whose
  * union AND intersection both estimate soundly. KMV's state is just
  * "the k smallest distinct hash values of the set": union = bottom-k
  * of the concatenation, and the Jaccard of two sets is estimated by
  * how many of the merged bottom-k appear in both — giving
  * |A∩B| ≈ J · |A∪B| with error O(1/√k) (Beyer et al., "On synopses
  * for distinct-value estimation under multiset operations", SIGMOD'07;
  * same bottom-k family as Broder's minwise estimators).
  *
  * Scale design (the 100 TB lens):
  *  - a sketch is built by TWO hash aggregates — `(group, h)` dedup,
  *    then [[BoundedTopK]] per group — both map-side combinable, O(k)
  *    state per group, no window, no sort, no collect;
  *  - sketches are tiny (k longs per group) and MERGEABLE: set algebra
  *    over s sources touches s·k rows regardless of corpus size, so
  *    pairwise source overlap is a broadcast-scale problem even when
  *    each source is terabytes;
  *  - hashing is the engine-portable [[Dedup.hash48]] md5 prefix, so a
  *    DuckDB oracle rebuilds bit-identical sketches and the ESTIMATES
  *    (plain arithmetic over those integers) hash-match cell-for-cell.
  */
object Sketches {

  /** 2^48 — the hash domain size; hash48 values are uniform in
    * [0, 2^48). Exactly representable as a Double (one significand
    * bit), so `(k-1) * Pow2_48` below is exact for any k ≤ 2^5
    * ... in fact for any k whose bit-width ≤ 5 bits of slack; we
    * require k ≤ 4096 which keeps the product ≤ 53 significant bits.
    */
  private[ext] val Pow2_48: Double = 281474976710656.0d

  val MaxK: Int = 4096

  /** Per-group KMV sketch: the `k` smallest DISTINCT hash48 values of
    * `key`, plus the group's exact distinct count (free from the dedup
    * stage). Output: groupCols ++ (n_distinct: long, sketch:
    * array<long> ascending, k_small: the k-th smallest hash, null when
    * the group has fewer than k distinct keys).
    *
    * Distinctness before the bounded agg matters: KMV is defined over
    * the SET of hash values; [[BoundedTopK]] is deliberately a multiset
    * (row_number semantics), so duplicates are removed by a first
    * hash aggregate on (group, h). Both aggregates partial-combine
    * map-side; per-group state is O(k).
    */
  def kmvSketch(
      df: DataFrame, key: Column, groupCols: Seq[String],
      k: Int): DataFrame = {
    require(k > 0 && k <= MaxK, s"kmv k must be in [1, $MaxK], got $k")
    val g = groupCols.map(col)
    df.select(g :+ Dedup.hash48(key).as("__h"): _*)
      .groupBy(g :+ col("__h"): _*).agg(count(lit(1)).as("__dup"))
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n_distinct"),
        // score = -h ranks ascending h; h < 2^48 << 2^53 so the
        // Double negation is exact and the order is total
        BoundedTopK.topk(-col("__h").cast("double"), col("__h"), k)
          .as("__tk"))
      .select(g ++ Seq(
        col("n_distinct"),
        transform(col("__tk"), e => e.getField("id")).as("sketch"),
        when(col("n_distinct") >= k, element_at(
          transform(col("__tk"), e => e.getField("id")), k))
          .as("k_small")): _*)
  }

  /** The standard KMV estimator over a [[kmvSketch]] row: exact when
    * the group holds < k distinct keys (the sketch IS the set),
    * (k-1)·2^48 / h_(k) otherwise. One double division over exact
    * integer operands — deterministic across engines.
    */
  def kmvEstimate(nDistinct: Column, kSmall: Column, k: Int): Column =
    when(kSmall.isNull, nDistinct.cast("double"))
      .otherwise(lit((k - 1).toDouble * Pow2_48) / kSmall.cast("double"))

  /** Pairwise set-operation estimates between every two groups of a
    * [[kmvSketch]] result (groups identified by a single `groupCol`).
    *
    * For each pair a < b the MERGED sketch is the bottom-k of
    * union(sketch_a, sketch_b) — computed by the same dedup +
    * [[BoundedTopK]] pipeline, with each hash's membership bit packed
    * into the carried id (h << 1 | in_both; h < 2^48 so the shift is
    * safe) so one aggregate yields both the k-th merged hash and the
    * common count. Estimates:
    *    jaccard_est = |merged ∩ both| / |merged|
    *    union_est   = KMV estimate of the merged sketch
    *    inter_est   = jaccard_est · union_est
    *
    * Input here is s·k rows (s = #groups) — set algebra over sketches
    * never touches the corpus again, which is the point of the sketch.
    */
  def kmvPairwise(sketches: DataFrame, groupCol: String, k: Int)
      : DataFrame = {
    val e = sketches.select(col(groupCol).as("__g"),
      explode(col("sketch")).as("__h"))
    // every unordered group pair; the sketch table is s rows, so the
    // self-cross is s², broadcast-scale by construction
    val pairs = sketches.select(col(groupCol).as("src_a"))
      .crossJoin(broadcast(sketches.select(col(groupCol).as("src_b"))))
      .filter(col("src_a") < col("src_b"))
    // distinct h per pair with membership flags (a hash appearing in
    // both sketches collapses to one row with in_a = in_b = 1)
    val perPair = pairs.join(broadcast(e), col("__g") === col("src_a") ||
        col("__g") === col("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("__h"))
      .agg(max((col("__g") === col("src_a")).cast("int")).as("in_a"),
        max((col("__g") === col("src_b")).cast("int")).as("in_b"))
    // merged bottom-k per pair; membership packed into the carried id
    // (h << 1 | in_both — h < 2^48 so the shift never overflows)
    val merged = perPair
      .groupBy(col("src_a"), col("src_b"))
      .agg(BoundedTopK.topk(-col("__h").cast("double"),
        shiftleft(col("__h"), 1)
          .bitwiseOR((col("in_a") === 1 && col("in_b") === 1)
            .cast("long")), k).as("__tk"))
    merged.select(col("src_a"), col("src_b"),
        size(col("__tk")).as("n_merged"),
        aggregate(transform(col("__tk"),
            t => t.getField("id").bitwiseAND(1L)),
          lit(0L), (acc, x) => acc + x).as("n_common"),
        shiftrightunsigned(element_at(transform(col("__tk"),
          t => t.getField("id")), size(col("__tk"))), 1).as("max_merged"))
      .select(col("src_a"), col("src_b"), col("n_common"),
        (col("n_common").cast("double") / col("n_merged").cast("double"))
          .as("jaccard_est"),
        when(col("n_merged") < k,
            // fewer than k distinct hashes merged ⇒ both input sets
            // had < k distinct keys ⇒ the merged sketch IS the union
            col("n_merged").cast("double"))
          .otherwise(lit((k - 1).toDouble * Pow2_48)
            / col("max_merged").cast("double")).as("union_est"))
      // inter_est mirrors jaccard_est · union_est with the SAME operand
      // order the oracle uses, so the doubles match bit-for-bit
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
  }

  // -------------------------------------------------- count-min sketch
  // Frequency estimation in CONSTANT space (Cormode & Muthukrishnan,
  // "An improved data stream summary: the count-min sketch and its
  // applications", J. Algorithms 2005): d hash rows × w buckets of
  // counts; est(key) = min over rows of its bucket's count. Always an
  // OVERestimate (collisions only add), within εN (ε = e/w) with
  // probability 1 − e^−d. The 100 TB role: per-shard sketches are d·w
  // longs, merged by cell-wise SUM — frequency screens (stopword
  // discovery, hot-key detection, spam-token flagging) over a corpus
  // too large to groupBy become one constant-size mergeable aggregate.
  // Hashing is the portable md5 prefix, so a DuckDB oracle rebuilds the
  // IDENTICAL sketch and the integer estimates hash-match exactly.

  val CmsMaxDepth = 8
  val CmsMaxWidth = 1 << 20
  private val CmsSep = "\u0001"

  /** The d (row, bucket) cells a key charges: row r uses bucket
    * hash48("cms_r" ⊕ key) mod w — independent rows from one md5 by
    * domain-separating the salt prefix. hash48 ≥ 0, so `%` is the
    * mathematical mod in Spark and DuckDB alike.
    */
  private def cmsCells(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { r =>
      struct(lit(r).as("r"),
        (Dedup.hash48(concat_ws(CmsSep, lit(s"cms_$r"),
          key.cast("string"))) % width).as("bucket"))
    }: _*)

  /** Build a CMS over `key` occurrences (one count per row; nulls
    * skipped). Output: (r, bucket, cnt) — the SPARSE sketch (absent
    * cell = 0), at most d·w rows regardless of input size. One
    * hash aggregate over the d-fold exploded keys, map-side combinable;
    * shards merge by `unionByName` + re-[[cmsMerge]].
    */
  def cmsBuild(df: DataFrame, key: Column, depth: Int, width: Int)
      : DataFrame = {
    require(depth >= 1 && depth <= CmsMaxDepth,
      s"cms depth must be in [1, $CmsMaxDepth], got $depth")
    require(width >= 1 && width <= CmsMaxWidth,
      s"cms width must be in [1, $CmsMaxWidth], got $width")
    df.select(key.as("__k")).filter(col("__k").isNotNull)
      .select(explode(cmsCells(col("__k"), depth, width)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with the same (d, w): cell-wise sum. */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for every distinct key of `keys`: min over the d
    * rows of the key's bucket count (0 when a cell is absent — only
    * possible for keys the sketch never saw). The sketch is ≤ d·w rows
    * and explicitly broadcast: estimation is a narrow map-side join no
    * matter how many keys are probed.
    */
  def cmsEstimate(
      sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(cmsCells(col(keyCol), depth, width)).as("rc"))
      .select(col(keyCol), col("rc.r").as("r"),
        col("rc.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
