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
}
