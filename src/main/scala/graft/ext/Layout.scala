package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-column
  * data skipping.
  *
  * Why it matters at 100 TB: parquet row-group pruning works off
  * per-file min/max ranges. A corpus sorted by ONE key prunes scans on
  * that key only; filters on a second key read everything. Interleaving
  * the bits of k keys into one Morton value and range-sorting by it
  * gives every file a narrow range in EVERY interleaved dimension, so
  * min/max pruning works for all of them at once — the standard
  * lakehouse `OPTIMIZE ZORDER BY` layout, here as a plain deterministic
  * expression + range repartition.
  *
  * The z-value is pure integer bit arithmetic (shifts/masks/adds —
  * exact, order-free, engine-portable), so layouts are reproducible and
  * oracle-checkable cell-for-cell.
  */
object Layout {

  /** Morton (Z-curve) value: interleave the low `bits` bits of each
    * column, column 0 in the lowest lane. Inputs are masked to `bits`
    * (callers with signed/wider keys map them into [0, 2^bits) first —
    * rank or hash them; interleaving raw values preserves locality only
    * for non-negative keys). k·bits must fit a long (≤ 62).
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.length
    require(k >= 2, "z-ordering needs at least two columns")
    require(bits > 0 && k * bits <= 62, s"$k columns × $bits bits > 62")
    val terms = for {
      (c, lane) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * k + lane)
    terms.reduce(_ + _)
  }

  /** Rewrite the frame in Z-order: range-repartition by the z-value
    * (sampled range boundaries — balanced output files without a global
    * sort) and sort within each partition. `numFiles` is the output
    * file-count knob; each written file then spans a contiguous z-range
    * = a small hyper-rectangle of the key space, which is what makes
    * min/max pruning fire on every z-dimension. The z column is kept
    * (`zCol`) so writers can also partition or name by it.
    */
  def zOrdered(df: DataFrame, keys: Seq[String], bits: Int,
      numFiles: Int, zCol: String = "zval"): DataFrame = {
    require(!df.columns.contains(zCol),
      s"input column '$zCol' collides with the z-value output")
    df.withColumn(zCol, zValue(keys.map(col), bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
  }

  /** Zone map: per-file min/max ranges + row counts — the metadata
    * table a scan planner prunes against (parquet row-group stats,
    * Iceberg/Delta file stats, ORC stripe indexes are all this shape).
    * `fileId` is the file-assignment expression (for a Z-ordered
    * layout, a high-bit slice of [[zValue]] — each file id then IS a
    * contiguous z-range = one hyper-rectangle of the key space);
    * `dims` are (name, expr) stat columns, emitted as min_/max_ pairs.
    * One map-side-combinable hash aggregate; output is bounded by the
    * FILE count, not the row count — the whole point: at 100 TB the
    * zone map is the megabytes-sized index a driver can hold, and a
    * predicate consults it instead of opening 10⁵ files.
    */
  /** Hive-style partitioned write + read — THE coarse data-skipping
    * primitive at 100 TB (zonemaps and bloom filters skip within
    * files; directory partitioning skips whole directories before a
    * single footer is opened). Write once partitioned on a
    * low-cardinality column; every later read that filters on it
    * prunes at PLANNING time — PlanSpec asserts the scan's
    * partitionFilters are non-empty and that it lists only the
    * matching partition's files. Spark handles the layout natively;
    * this helper just pins the library's conventions (explicit
    * partition column, overwrite semantics, no schema inference on
    * re-read — partition-column TYPE comes from the caller's schema,
    * not directory-name guessing).
    */
  def writePartitioned(df: DataFrame, dir: String,
      partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(dir)

  def readPartitioned(spark: org.apache.spark.sql.SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).parquet(dir)

  /** DYNAMIC partition overwrite — incremental re-materialization of a
    * derived partitioned table: only the partitions present in `df`
    * are replaced; every other partition's files are byte-untouched
    * (spec-asserted via file listings). This is how a 100 TB derived
    * table absorbs a late batch that touches 2 of 10 000 partitions
    * without rewriting the other 9 998. Static overwrite (the
    * default!) would silently DROP them — the option is set per-write
    * here so the semantics never depend on session state.
    */
  def overwritePartitionsDynamic(df: DataFrame, dir: String,
      partitionCol: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(dir)

  def zoneMap(df: DataFrame, fileId: Column,
      dims: Seq[(String, Column)]): DataFrame = {
    require(dims.nonEmpty, "zone map needs at least one stat dimension")
    val aggs = dims.flatMap { case (n, c) =>
      Seq(min(c).as(s"min_$n"), max(c).as(s"max_$n"))
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(fileId.as("file_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Would this zone-map row survive pruning under a conjunction of
    * per-dimension closed ranges? True iff NO dimension's [min, max]
    * zone is disjoint from its queried [lo, hi] — the standard min/max
    * skip test. Evaluate against a [[zoneMap]] frame; `n_files_scanned
    * / n_files` (and the row-weighted variant) is the layout's pruning
    * ratio, the metric Z-ordering exists to improve on multi-dimension
    * predicates.
    */
  def scanFlag(ranges: Seq[(String, Column, Column)]): Column =
    ranges.map { case (n, lo, hi) =>
      col(s"max_$n") >= lo && col(s"min_$n") <= hi
    }.reduce(_ && _)

  /** Compaction plan over FILE METADATA: assign files, in `orderCol`
    * order, to output bins of ≈ `targetBytes` via the offset rule
    * `bin = (running_total − size) div target` — files stay in order
    * (a Z-/sort-ordered layout keeps its clustering through
    * compaction), every bin except the last reaches the target, and
    * the assignment is a pure function of the metadata (deterministic,
    * engine-portable integer arithmetic).
    *
    * The input is the file-stats table ([[zoneMap]] output, an
    * Iceberg/Delta manifest) — bounded by FILE count (~10⁵ rows for
    * 100 TB at 1 GB files), which is why the single global-order
    * window here is fine: this plans work over metadata; it never
    * touches data. Output: input columns + (bin, bin-relative order
    * preserved by `orderCol`).
    */
  def compactionPlan(files: DataFrame, orderCol: Column,
      sizeCol: Column, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"need targetBytes > 0, got $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("__graft_cum", sum(sizeCol.cast("long")).over(w))
      .withColumn("bin",
        call_function("div",
          col("__graft_cum") - sizeCol.cast("long"), lit(targetBytes)))
      .drop("__graft_cum")
  }

  /** Per-file blocked Bloom filter index over a HIGH-cardinality
    * column — the point-lookup complement to [[zoneMap]]'s range
    * stats (min/max on a key like order id prunes nothing when every
    * file spans the key range; a Bloom bit-set prunes almost
    * everything). `words` 64-bit words per file, two hash positions
    * per value derived from the engine-portable [[Dedup.hash48]]
    * (md5-based — an external system can rebuild the index
    * bit-identically, which is what makes it a FILE FORMAT, not a
    * runtime cache).
    *
    * Output: (file_id, word, bits) — one row per non-zero word,
    * O(files × words) metadata rows regardless of corpus size. Build
    * is one projection + one map-side-combinable bit_or hash agg.
    * False-positive rate for one file with n distinct values:
    * ≈ (1 − e^(−2n/(64·words)))² — size `words` to the expected
    * per-file distinct count (default 8 words = 512 bits suits the
    * ~10³-row files a z-ordered layout produces at the harness scale;
    * a 1 GB production file wants words ≈ rows/32).
    */
  def bloomIndex(df: DataFrame, fileCol: Column, value: Column,
      words: Int = 8): DataFrame = {
    require(words >= 1 && words <= 1024,
      s"words must be in [1, 1024], got $words")
    val b = lit(words * 64L)
    val h = Dedup.hash48(value)
    df.select(fileCol.as("file_id"), h.as("__h"))
      .select(col("file_id"), explode(array(
        pmod(col("__h"), b),
        pmod(call_function("div", col("__h"), b), b))).as("__p"))
      .groupBy(col("file_id"),
        call_function("div", col("__p"), lit(64L)).as("word"))
      .agg(call_function("bit_or",
        call_function("shiftleft", lit(1L),
          pmod(col("__p"), lit(64L)).cast("int"))).as("bits"))
  }

  /** Evaluate a point-lookup probe set against a [[bloomIndex]]:
    * (file_id, scanned) where `scanned` ⇔ SOME probe value has BOTH
    * its bits set in that file's filter — the files a reader must
    * open; everything else is proven probe-free (no false negatives:
    * a file containing a probe value always has both bits set).
    *
    * The probe set is a bounded dimension (a literal IN-list, a
    * broadcast key set): each of the two bit tests is one equi-join
    * of the metadata-sized index against the broadcast probes on the
    * word index, then a key-conjunction semi join — never a scan of
    * data.
    */
  def bloomScanFlag(index: DataFrame, probes: DataFrame,
      words: Int = 8): DataFrame = {
    val b = lit(words * 64L)
    val h = Dedup.hash48(probes.columns.headOption.map(col)
      .getOrElse(col("value")))
    // the probe's own 48-bit hash is its join key across the two bit
    // tests — deterministic, unlike a generated row id
    val pp = probes.select(h.as("__ph")).distinct()
      .select(col("__ph").as("__q"),
        pmod(col("__ph"), b).as("__p1"),
        pmod(call_function("div", col("__ph"), b), b).as("__p2"))
    def hit(p: String) = index.join(
        broadcast(pp.select(col("__q"),
          call_function("div", col(p), lit(64L)).as("word"),
          call_function("shiftleft", lit(1L),
            pmod(col(p), lit(64L)).cast("int")).as("__m"))),
        "word")
      .where(col("bits").bitwiseAND(col("__m")) =!= 0)
      .select("file_id", "__q")
    val hits = hit("__p1").join(hit("__p2"), Seq("file_id", "__q"),
        "left_semi")
      .select("file_id").distinct().withColumn("__hit", lit(true))
    index.select("file_id").distinct()
      .join(hits, Seq("file_id"), "left")
      .select(col("file_id"),
        coalesce(col("__hit"), lit(false)).as("scanned"))
  }
}
