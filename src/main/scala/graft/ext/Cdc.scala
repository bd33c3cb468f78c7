package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction — turn an append-only change log
  * (upserts + tombstones) into a current snapshot (last-writer-wins)
  * or a full SCD-type-2 history table (validity intervals). These are
  * the two standard materializations of a CDC feed; every warehouse
  * ingestion pipeline runs one of them over its largest tables, so the
  * plan shape matters more here than almost anywhere else.
  *
  * Scale design (100 TB lens):
  *  - [[lastWriterWins]] is ONE hash aggregate — the native
  *    [[graft.functions.LatestBy]] argmax, because Spark's own `max_by`
  *    carries a struct buffer that HashAggregate can't hold and the
  *    plan silently degrades to SortAggregate (a per-partition sort of
  *    the whole change log by key). With LatestBy the winner stays in
  *    ObjectHashAggregate: partial aggregation absorbs hot keys
  *    map-side — a key with 10⁸ churn events combines to one row per
  *    map partition before the shuffle, so the shuffle carries
  *    ≤ (#keys × #partitions) rows regardless of churn. This is the
  *    shape that survives a 100 TB change log; the row_number window
  *    formulation (what the DuckDB oracle runs) would sort every key's
  *    full history;
  *  - [[scd2]] is inherently a per-key ordered walk (each version needs
  *    its successor), so it pays the window's one shuffle + in-partition
  *    sort. A partition holds ONE KEY's versions, never the corpus —
  *    the same bounded-partition exception as [[Sessions]] /
  *    [[Features.trailing]], with [[Profile.keySkew]] as the pre-flight
  *    check for pathological keys;
  *  - both pass payload columns through untouched (no arithmetic), so
  *    results are engine-exact for any column type.
  */
object Cdc {

  /** Current-snapshot view of a change log: for each key keep the
    * payload of the LAST change in `ordCols` order (lexicographic —
    * supply a tie-breaker, e.g. a change id, to make the winner
    * unique), then drop keys whose last change is a tombstone
    * (`isDelete` evaluated on the winning row).
    *
    * `ordCols` must be LONG-valued (convert timestamps with
    * `unix_micros` — a plain long cast truncates to seconds) and must
    * totally order each key's changes: with ties the winner is
    * first-seen, which is partitioning-dependent. Run
    * [[uniqueVersions]] over the log when the total order is not
    * guaranteed by construction — it turns that silent nondeterminism
    * into violation rows. A NULL `isDelete` is treated as NOT a delete
    * (the flag is coalesced to false at ingestion): a row whose delete
    * predicate cannot be evaluated must not silently tombstone its key.
    *
    * Tombstoned keys are DROPPED from the output, which also drops the
    * tombstone's version. For single-shot compaction that is the
    * wanted snapshot; for INCREMENTAL maintenance over out-of-order
    * feeds (repeated merges where an older upsert may arrive after the
    * delete) keep the tombstone in the snapshot instead — include the
    * delete flag and version in `payloadCols`, skip/postpone the
    * filter, and filter at consumption (the foreachBatch maintenance
    * test in StreamingSpec shows the version-retaining pattern).
    */
  def lastWriterWins(
      changes: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[Column],
      payloadCols: Seq[String],
      isDelete: Column): DataFrame =
    compactLatest(
      changes.select(keyCols.map(col) ++ payloadCols.map(col) :+
        coalesce(isDelete, lit(false)).as("__graft_del") :+
        array(ordCols: _*).as("__graft_v"): _*),
      keyCols, payloadCols)

  /** MERGE-INTO: apply a delta batch of changes onto a base snapshot —
    * upserts replace (or insert) the key's row, tombstones remove it.
    * Base rows compete with the MINIMAL version vector, so ANY change
    * for the key wins over the snapshot (a delta batch is by definition
    * newer than the snapshot it applies to); among multiple changes the
    * usual last-writer order decides. Incremental invariant (asserted
    * in CdcSpec and by the harness oracle): applyChanges(snapshot(log ≤
    * t), changes(log > t)) == lastWriterWins(log) whenever the cut is
    * clean. Same single-hash-agg shape as [[lastWriterWins]] over
    * base ∪ changes. "Any change beats the snapshot" is enforced
    * STRUCTURALLY: the comparison vector gets a leading origin element
    * (0 for base rows, 1 for changes), so a change whose `ordCols`
    * legitimately evaluate to all-minimal values still outranks the
    * base row — no sentinel value of the caller's version domain is
    * reserved. NULL `isDelete` on a change is not-a-delete, as in
    * [[lastWriterWins]]. Version ties AMONG CHANGES remain first-seen;
    * [[uniqueVersions]] is the loud check for that.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[Column],
      payloadCols: Seq[String],
      isDelete: Column): DataFrame = {
    val b = base.select(keyCols.map(col) ++ payloadCols.map(col) :+
      lit(false).as("__graft_del") :+
      array(lit(0L) +: Seq.fill(ordCols.length)(lit(Long.MinValue)): _*)
        .as("__graft_v"): _*)
    val c = changes.select(keyCols.map(col) ++ payloadCols.map(col) :+
      coalesce(isDelete, lit(false)).as("__graft_del") :+
      array(lit(1L) +: ordCols: _*).as("__graft_v"): _*)
    compactLatest(b.unionByName(c), keyCols, payloadCols)
  }

  /** Version-uniqueness verifier — the loud check for the
    * [[lastWriterWins]]/[[applyChanges]] caller contract that `ordCols`
    * totally order each key's changes. Returns the violating
    * (key, version) groups with their duplicate counts (empty ⇒ every
    * winner is deterministic). ONE map-side-combinable hash aggregate
    * over (key, version) — output bounded by the number of violating
    * groups, so it is safe to run as a pre-flight on a 100 TB log.
    */
  def uniqueVersions(
      changes: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[Column]): DataFrame =
    changes
      .groupBy((keyCols.map(col) :+
        array(ordCols: _*).as("__graft_v")): _*)
      .agg(count(lit(1)).as("n_changes"))
      .where(col("n_changes") > 1)
      .select(keyCols.map(col) :+ col("__graft_v").as("version") :+
        col("n_changes"): _*)

  /** Shared LWW core: rows carry (__graft_del, __graft_v) — one
    * latest_by hash aggregate, tombstoned winners dropped.
    */
  private def compactLatest(
      rows: DataFrame,
      keyCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    val payload = struct(
      (payloadCols.map(col) :+ col("__graft_del")): _*)
    rows
      .groupBy(keyCols.map(col): _*)
      .agg(graft.functions.LatestBy
        .latestVector(payload, col("__graft_v")).as("__graft_last"))
      .where(!col("__graft_last.__graft_del"))
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"__graft_last.$c").as(c)): _*)
  }

  /** Point-in-time lookup: each fact row joined to the `history`
    * version row (an [[scd2]] output: valid_from / valid_to columns,
    * open interval = null valid_to) that was valid at the fact's
    * timestamp. Equi-join on the key with the interval as a RESIDUAL
    * predicate — a hash join, never a nested loop; SCD2 intervals are
    * disjoint half-open per key, so at most one history row matches.
    * Left-outer: facts before the key's first version survive with
    * null state. Callers rename overlapping columns beforehand.
    */
  def pointInTime(
      facts: DataFrame,
      history: DataFrame,
      factKey: String,
      histKey: String,
      factTs: Column): DataFrame =
    facts.join(history,
      facts(factKey) === history(histKey) &&
        history("valid_from") <= factTs &&
        (history("valid_to").isNull || factTs < history("valid_to")),
      "left_outer")

  /** SCD-type-2 history: every change becomes a row whose validity
    * interval is [its own `ordCol`, the key's NEXT change's `ordCol`),
    * with `valid_to` null (and `is_current` true) for the latest
    * version. `tieCol` breaks `ordCol` ties so intervals are
    * well-defined under simultaneous changes.
    */
  def scd2(
      changes: DataFrame,
      keyCols: Seq[String],
      ordCol: Column,
      tieCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordCol, tieCol)
    changes
      .withColumn("valid_from", ordCol)
      .withColumn("valid_to", lead(ordCol, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** State diff between two SNAPSHOTS of the same table (dataset
    * regression testing / release gating): which keys were added,
    * removed, or changed between versions. The complement of the
    * change-log operators above — those derive a snapshot FROM a
    * log; this derives the log a missing CDC feed would have carried.
    *
    * Returns one row per differing key: (keys..., change) with
    * `change` ∈ added | removed | changed; unchanged keys are
    * filtered out, so output is bounded by the churn, not the corpus.
    * Payload comparison is EXACT null-safe column equality (`<=>`
    * per compare column, inside codegen) — never a hash, so there is
    * no collision class that silently reports "unchanged".
    *
    * Precondition: `keys` is unique within each snapshot (it is a
    * snapshot). Run the library's primary-key check ([[graft
    * .Validate]] K1) as the pre-flight on untrusted inputs — a
    * duplicate key would fan out in the join and double-count churn.
    *
    * Scale: one full-outer shuffle join on the key — co-located (zero
    * exchange) when both snapshots are bucketed by the key, the
    * standard layout for versioned tables; the comparison and the
    * churn filter are narrow.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String], compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(compare.nonEmpty,
      "snapshotDiff needs at least one compare column")
    val o = oldDf.select((keys ++ compare).map(col): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select(
        (keys.map(col) ++ compare.map(c => col(c).as(s"__new_$c"))): _*)
      .withColumn("__in_new", lit(true))
    val same = compare.map(c => col(c) <=> col(s"__new_$c"))
      .reduce(_ && _)
    o.join(n, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!same, "changed")
          .otherwise("unchanged").as("change"): _*)
      .where(col("change") =!= "unchanged")
  }
}
