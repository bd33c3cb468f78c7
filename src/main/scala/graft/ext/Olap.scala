package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-level OLAP aggregation and preference queries — the rollup /
  * cube / pivot family every BI consumer expects over validated data,
  * plus a distributed skyline (pareto frontier) operator.
  *
  * Scale design (100 TB lens):
  *  - rollup/cube are ONE shuffle each: Spark expands the grouping
  *    sets map-side (each input row is replicated into its grouping
  *    combinations BEFORE the exchange, partial-aggregated, then
  *    merged), so a d-dim rollup costs (d+1)× the map-side agg work of
  *    a flat groupBy but the SAME single shuffle of pre-combined
  *    partials — never d+1 separate jobs over the corpus;
  *  - pivot with EXPLICIT values is one conditional hash agg; without
  *    them Spark first runs a distinct-collect job over the pivot
  *    column to the driver — a full extra pass at 100 TB, which is why
  *    [[pivotAgg]] makes the value list mandatory;
  *  - [[skyline]] never goes all-pairs on the corpus: a bounded
  *    dominator-rich sample prunes map-side (one broadcast), and only
  *    the surviving candidate set — skyline-sized for any non-adversarial
  *    distribution — pays the exact quadratic pass.
  */
object Olap {

  /** grouping_id disambiguation: subtotal rows carry NULL in the
    * rolled-up dims, and `gid`'s bit k (MSB-first over `dims`) says
    * whether dim k is aggregated (1) or grouped (0) — the only way to
    * tell a subtotal NULL from a genuine NULL group value. Both Spark
    * `grouping_id()` and the oracle's `GROUPING(...)` use MSB-first
    * argument order, asserted by the harness hash-match.
    */
  def rollupAgg(df: DataFrame, dims: Seq[String],
      aggs: Seq[Column]): DataFrame =
    df.rollup(dims.map(col): _*)
      .agg(grouping_id().cast("long").as("gid"), aggs: _*)

  /** Full cube: every 2^d grouping-set combination in one pass —
    * same single-shuffle expansion as [[rollupAgg]], 2^d map-side
    * replication (keep d small; at d ≥ ~5 prefer explicit grouping
    * sets of the combinations a dashboard actually reads).
    */
  def cubeAgg(df: DataFrame, dims: Seq[String],
      aggs: Seq[Column]): DataFrame =
    df.cube(dims.map(col): _*)
      .agg(grouping_id().cast("long").as("gid"), aggs: _*)

  /** Pivot with a MANDATORY explicit value list: one conditional hash
    * aggregate (each output column is a partial agg gated on its pivot
    * value — map-side combinable, single shuffle). Spark's
    * values-omitted pivot would first collect the column's distinct
    * values to the driver: a second full pass over the corpus plus an
    * unbounded driver set, exactly what a 100 TB plan must not do.
    * Output columns are `<colPrefix><lowercased value>` (pivot values
    * are often raw codes like "O"/"F" — prefixing keeps the frame
    * self-describing and collision-free with the key columns).
    */
  def pivotAgg(df: DataFrame, keys: Seq[String], pivotCol: String,
      values: Seq[String], agg: Column, colPrefix: String): DataFrame = {
    require(values.nonEmpty, "pivotAgg needs an explicit value list")
    values.foldLeft(
      df.groupBy(keys.map(col): _*).pivot(pivotCol, values).agg(agg)
    ) { (d, v) =>
      d.withColumnRenamed(v, s"$colPrefix${v.toLowerCase}")
    }
  }

  /** Incremental maintenance for ADDITIVE grouping-set aggregates
    * (count/sum — the [[rollupAgg]]/[[cubeAgg]] outputs): merge a
    * delta batch's aggregate into a previously materialized one
    * WITHOUT rescanning the base corpus — union the (tiny) aggregate
    * frames and re-sum per (dims, gid) key. Correct because count and
    * sum distribute over disjoint row partitions, and a rollup is the
    * same additive agg per grouping set; `gid` in the key keeps
    * subtotal rows merging with subtotal rows only.
    *
    * The 100 TB point: a daily delta re-aggregates ITSELF (linear in
    * the delta) and then merges O(groups) rows — the base's exabyte
    * of history is never read again. Min/max are also mergeable this
    * way; averages are NOT (merge their sum+count parts instead).
    */
  def mergeAdditive(parts: Seq[DataFrame], keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "mergeAdditive needs at least one part")
    require(measures.nonEmpty, "mergeAdditive needs measure columns")
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
  }

  /** Skyline (pareto frontier): the rows not STRICTLY dominated by any
    * other row, where row a dominates row b iff a ≥ b on every
    * criterion and a > b on at least one (criteria are long-valued,
    * larger-is-better — negate a column to minimize it). Rows with
    * identical criterion vectors dominate neither and are all kept.
    *
    * Two-phase exact algorithm:
    *  1. PRUNE: take `sampleSize` rows with the largest criterion SUM
    *    (a dominator-rich heuristic — the sum-maximal row is always ON
    *    the skyline) and keep their internal skyline as a broadcast
    *    filter. One nested-loop anti join drops everything that set
    *    dominates — map-side, no shuffle of the corpus.
    *  2. EXACT: the survivors — bounded in practice by the skyline
    *    size plus near-frontier points the sample missed — pay the
    *    quadratic self anti join. Correct for ANY sample: a skyline
    *    row is dominated by nothing, so phase 1 can never drop one,
    *    and phase 2 is exact over what remains; the sample only sets
    *    how much phase 2 has to chew.
    *
    * Caller contract — ENFORCED: the quadratic phase assumes
    * survivors fit a nested-loop join, so the survivor frame (already
    * cached for the self join) is counted first and a count past
    * `maxSurvivors` (default 10⁵ — ~10¹⁰ comparisons is the practical
    * broadcast-nested-loop ceiling) fails loudly. A pathological
    * distribution (anti-correlated criteria where most rows are
    * frontier) makes the skyline itself huge — no algorithm returns a
    * small answer there; the guard turns that silent corpus-sized
    * cross join into an error naming the remedy (coarser criterion
    * grid, or a deliberate maxSurvivors raise).
    */
  def skyline(df: DataFrame, criteria: Seq[(String, Column)],
      sampleSize: Int = 512, maxSurvivors: Long = 100000L): DataFrame = {
    require(criteria.nonEmpty, "skyline needs at least one criterion")
    require(maxSurvivors > 0, s"maxSurvivors must be positive: $maxSurvivors")
    val names = criteria.map(_._1)
    val crit = df.select(
      df.columns.map(col) ++
        criteria.map { case (n, c) => c.cast("long").as(s"__sky_$n") }: _*)
    def dom(a: String, b: String): Column =
      names.map(n => col(s"$a.__sky_$n") >= col(s"$b.__sky_$n"))
        .reduce(_ && _) &&
      names.map(n => col(s"$a.__sky_$n") > col(s"$b.__sky_$n"))
        .reduce(_ || _)
    // deterministic output regardless of sample tie-breaks (see above);
    // the sum-ordering just concentrates dominators into the sample
    val sample = crit
      .orderBy(names.map(n => col(s"__sky_$n")).reduce(_ + _).desc)
      .limit(sampleSize)
    val sampleSky = sample.alias("p")
      .join(broadcast(sample.alias("q")), dom("q", "p"), "left_anti")
    val survivors = crit.alias("x")
      .join(broadcast(sampleSky.alias("s")), dom("s", "x"), "left_anti")
    CacheScope.withCached(survivors) { sv =>
      val n = sv.count()
      require(n <= maxSurvivors,
        s"skyline: $n phase-1 survivors (> maxSurvivors = " +
          s"$maxSurvivors) — the exact phase would pay an O(n²) " +
          "nested-loop join; coarsen the criterion grid (quantize " +
          "criteria) or raise maxSurvivors deliberately")
      sv.alias("a")
        .join(broadcast(sv.alias("b")), dom("b", "a"), "left_anti")
        .drop(names.map(n => s"__sky_$n"): _*)
    }
  }
}
