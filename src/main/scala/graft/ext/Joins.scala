package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators a training-data / event pipeline needs and
  * vanilla Spark SQL lacks as first-class verbs: as-of joins (latest
  * right row at-or-before each left row) and interval/range joins.
  *
  * Both are expressed as compositions of existing Spark operators chosen
  * for their plan shape at scale, not as custom physical nodes — the
  * guiding rule (SURVEY.md §7.5) is that a composition Catalyst can see
  * through beats an opaque operator it cannot optimize around.
  *
  * Scale notes:
  *  - [[asOfJoin]] is ONE shuffle on the join key followed by a per-key
  *    sorted window. There is no join node at all, so there is nothing
  *    to degenerate into a broadcast-nested-loop or a skew-prone
  *    sort-merge with range predicates; the only skew sensitivity is a
  *    single hot KEY (all rows of one key sort in one task) — inherent
  *    to as-of semantics, which require a total time order per key.
  *  - [[rangeJoinBinned]] turns a keyless interval join — which Spark
  *    plans as BroadcastNestedLoopJoin, O(|points|·|intervals|)
  *    comparisons — into an equi-join on a time bin, O(|points| +
  *    Σ interval-spans/bin) with a residual filter. Bin width trades
  *    duplication of interval rows against candidate selectivity.
  */
object Joins {

  /** Backward as-of join: for every left row, attach the payload of the
    * single right row with the same key and the greatest `rightTime` that
    * is <= the left row's `leftTime` (ties on time broken by the greatest
    * `rightTieBreak`). Left rows with no such right row keep nulls
    * (left-outer semantics).
    *
    * Plan: tag both sides, union, one hash-partition on the key, and a
    * running `last(payload, ignoreNulls)` over (time, tag, tiebreak)
    * rows-unbounded-preceding — the classic union-window as-of used by
    * event-time engines, here left to Catalyst as a plain Window so the
    * partial ordering, codegen and AQE all apply. No join node, no
    * broadcast, no per-pair comparison.
    *
    * @param payload right columns to carry onto matched left rows; names
    *                must not collide with left output columns.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightTieBreak: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(!payload.exists(leftCols.contains),
      s"payload ${payload.mkString(",")} collides with left columns")
    // the union-window uses internal working columns; an input column
    // with one of these names would silently duplicate (union shape) or
    // be overwritten (withColumn) instead of erroring
    val reserved = Set("__k", "__t", "__tb", "__p", "__tag", "__m")
    val clash = (leftCols ++ payload).filter(reserved.contains)
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} are reserved by asOfJoin " +
        s"(reserved: ${reserved.toSeq.sorted.mkString(", ")})")

    // Right side reduced to (key, time, tiebreak, payload-struct); left
    // side keeps its full row with a null payload slot. The union is by
    // POSITION, so both sides project the same shape.
    val rCols = Seq(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      // keep the tiebreak's own (orderable) type: casting to long would
      // turn e.g. a string id into all-NULLs and silently break the
      // "greatest tiebreak wins" contract
      col(rightTieBreak).as("__tb"),
      struct(payload.map(col): _*).as("__p"), lit(0).as("__tag")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    // null-key/null-time right rows can never be "the latest quote for
    // some key" under SQL join semantics (NULL = NULL is not a match) —
    // dropping them here keeps the union-window formulation equivalent
    // to the join formulation (a null-key LEFT row still survives, in
    // its own window partition, with a null payload)
    val r = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(rCols: _*)
    val lCols = Seq(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(null).cast(right.schema(rightTieBreak).dataType).as("__tb"),
      lit(null).cast(r.schema("__p").dataType).as("__p"),
      lit(1).as("__tag")) ++ leftCols.map(col)
    val l = left.select(lCols: _*)

    // Right rows sort BEFORE a left row at the same instant (tag 0 < 1),
    // so exact-time matches are visible: <=, not <. Among right rows at
    // one instant the greatest tiebreak sorts last and wins `last()`.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("__m", last("__p", ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    matched.select(
      leftCols.map(col) ++ payload.map(p => col("__m").getField(p).as(p)): _*)
  }

  /** Keyed range join: equi-join on `key` plus a half-open time window
    * [rangeStart, rangeEnd) on the right side's `rightTime`, aggregated
    * or not by the caller. Because an equality predicate exists, Catalyst
    * plans a hash/sort-merge equi-join with the range as a residual
    * filter — NOT a nested-loop — so this needs no binning. Exposed as
    * an operator (rather than "just write the join") to pin that plan
    * shape in tests and to keep the half-open convention in one place.
    */
  def rangeJoinKeyed(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      rightTime: Column, rangeStart: Column, rangeEnd: Column): DataFrame =
    left.join(
      right,
      left(leftKey) === right(rightKey) &&
        rightTime >= rangeStart && rightTime < rangeEnd,
      "left_outer")

  /** Keyless interval join via time binning: assign every point to the
    * bin `floor(epoch/binSeconds)`, explode every interval into the bins
    * it overlaps, equi-join on the bin, then apply the exact [start, end)
    * predicate as a residual filter. `distinctPairs` guards against an
    * interval spanning multiple bins matching a point twice (it cannot —
    * a point lives in exactly one bin — so no dedup is needed; the
    * residual filter alone restores exact semantics).
    *
    * Intervals are expected to be few-to-moderate (rule thresholds,
    * maintenance windows, eval windows); the exploded side is
    * |intervals| · avg-span/binWidth rows and broadcast when small.
    */
  def rangeJoinBinned(
      points: DataFrame, pointTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    // microsecond arithmetic throughout: unix_timestamp() truncates to
    // seconds, which under-covers the final bin when an interval end
    // has a sub-second part landing exactly past a bin boundary
    val binUs = binSeconds * 1000000L
    val p = points.withColumn("__bin",
      floor(unix_micros(col(pointTime)) / binUs))
    // end is exclusive: a point at exactly `end` never matches, so the
    // last covered bin is the one containing end - 1 microsecond. An
    // empty or inverted interval (end <= start) covers no bins at all —
    // without the guard, sequence(startBin, endBin) with endBin <
    // startBin generates a DESCENDING list and each degenerate interval
    // fans out spurious candidates for the residual filter to discard
    // (unbounded when end << start)
    val startBin = floor(unix_micros(col(startCol)) / binUs)
    val endBin = floor((unix_micros(col(endCol)) - lit(1)) / binUs)
    val iv = intervals.withColumn("__bin",
      explode(when(col(endCol) > col(startCol), sequence(startBin, endBin))
        .otherwise(array().cast("array<bigint>"))))
    p.join(iv, Seq("__bin"))
      .where(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__bin")
  }

  /** Interval × interval overlap join via the same binning trick as
    * [[rangeJoinBinned]], generalized to intervals on BOTH sides: two
    * half-open intervals [ls, le) and [rs, re) overlap iff
    * max(ls, rs) < min(le, re). Bounds are plain longs in any unit
    * (epoch days, micros, sequence numbers) with `binSize` in the same
    * unit — unlike the point case there is no timestamp in the
    * signature, because interval data is as often day- or
    * offset-grained as it is time-grained.
    *
    * Both sides explode into the bins they cover and equi-join on the
    * bin, so Catalyst plans a hash join — never a nested loop. An
    * overlapping pair shares EVERY bin the overlap region covers; the
    * dedup that the point case didn't need is done with zero extra
    * shuffle by keeping a pair only in its canonical bin — the one
    * containing max(ls, rs), the overlap's first instant, which both
    * sides necessarily cover. Degenerate intervals (end <= start)
    * cover no bins and vanish, exactly like the point case's guard.
    *
    * Scale: fan-out per row is span/binSize — pick binSize near the
    * typical span so each interval lands in O(1) bins; the join then
    * shuffles both sides once on a key whose skew mirrors temporal
    * density (hot bins can be salted upstream if one time window
    * dominates). Output is every (left, right) column pair that
    * overlaps; names must be disjoint (enforced) — aggregate or
    * project downstream.
    */
  def intervalOverlapJoin(
      left: DataFrame, lStart: Column, lEnd: Column,
      right: DataFrame, rStart: Column, rEnd: Column,
      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"intervalOverlapJoin: ambiguous column names ${clash.mkString(",")}" +
        " — rename one side before joining")
    val reserved = Set("__bin", "__ls", "__le", "__rs", "__re")
    val taken = (left.columns ++ right.columns).filter(reserved)
    require(taken.isEmpty,
      s"intervalOverlapJoin: input columns ${taken.mkString(",")} collide " +
        "with internal names — rename them first")
    // exact integer floor division (the [[Experiment.calibrationBins]]
    // idiom — subtract the non-negative pmod remainder, then the `div`
    // quotient is exact at any long magnitude and for negative bounds
    // alike): double `floor(x / binSize)` mis-bins once |x| outgrows
    // 2⁵³ — and the contract explicitly invites micros and sequence
    // numbers — and the canonical-bin predicate recomputes the same
    // floor over DIFFERENT inputs (max of two starts), so a rounding
    // mismatch between the two sites could DROP an overlapping pair
    // outright, not merely duplicate it
    def floorDiv(x: Column): Column =
      call_function("div", x - pmod(x, lit(binSize)), lit(binSize))
    def binned(df: DataFrame, s: Column, e: Column,
        sName: String, eName: String): DataFrame =
      df.withColumn(sName, s.cast("long"))
        .withColumn(eName, e.cast("long"))
        .withColumn("__bin", explode(
          when(col(eName) > col(sName),
            sequence(floorDiv(col(sName)), floorDiv(col(eName) - 1)))
            .otherwise(array().cast("array<bigint>"))))
    val l = binned(left, lStart, lEnd, "__ls", "__le")
    val r = binned(right, rStart, rEnd, "__rs", "__re")
    l.join(r, Seq("__bin"))
      .where(greatest(col("__ls"), col("__rs")) <
        least(col("__le"), col("__re")) &&
        col("__bin") ===
          floorDiv(greatest(col("__ls"), col("__rs"))))
      .drop("__bin", "__ls", "__le", "__rs", "__re")
  }
}
