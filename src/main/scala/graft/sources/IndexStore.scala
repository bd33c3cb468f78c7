package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Write-once / read-many index artifacts (round-7 directive #3).
  *
  * The incremental-ingest operators' scale story is "build the corpus
  * index ONCE, serve every future batch from the artifact" — until
  * this module that contract was asserted in scaladoc but never
  * exercised: every harness query rebuilt its index in memory. These
  * helpers persist the index frames as plain parquet (no engine-
  * private format — an external system can rebuild or consume them)
  * and re-read them for serving; the harness proves the round-trip by
  * hash-matching an index-served query against the in-memory path's
  * DuckDB oracle (x_dedup_index_served / x_sim_ivf_served).
  *
  * Artifact schemas (all columns engine-portable primitives):
  *  - dedup:  `shingles.parquet` (id long, sh array<long>) and
  *            `bands.parquet` (id long, band int, bucket long)
  *  - ivf:    `centroids.parquet` (list_id long, cvec array<double>)
  *            and `ivf.parquet` (id long, nvec array<double>,
  *            list_id long)
  *
  * At 100 TB: the dedup band frame is the per-batch join's build side
  * — persist it bucketed by `bucket` ([[Bucketing]]) and the serve
  * join runs exchange-free; the shingle frame is only touched by the
  * candidate verify join (semi-join-shaped, candidate-bounded). The
  * IVF frames are read probe-restricted (nProbe/nLists of the lists).
  * Doubles round-trip parquet bit-identically, so a served query is
  * hash-equal to the in-memory plan, not just approximately equal.
  */
object IndexStore {

  /** One-row (num_hashes, bands, k) parameter record. A batch served
    * with DIFFERENT banding parameters than the index was built with
    * never collides with the corpus buckets and silently under-reports
    * duplicates — so the artifact records its parameters and every
    * read path requires a match (fail loudly, not quietly empty).
    */
  private def metaFrame(spark: SparkSession, numHashes: Int, bands: Int,
      k: Int): DataFrame =
    spark.range(1).select(lit(numHashes).as("num_hashes"),
      lit(bands).as("bands"), lit(k).as("k"))

  private def checkMeta(meta: DataFrame, where: String, numHashes: Int,
      bands: Int, k: Int): Unit = {
    val r = meta.select(col("num_hashes"), col("bands"), col("k")).head
    require(
      r.getInt(0) == numHashes && r.getInt(1) == bands && r.getInt(2) == k,
      s"dedup index at $where was built with (numHashes=${r.getInt(0)}, " +
        s"bands=${r.getInt(1)}, k=${r.getInt(2)}) but is being served " +
        s"with (numHashes=$numHashes, bands=$bands, k=$k) — mismatched " +
        "banding never collides with the corpus buckets and silently " +
        "under-reports duplicates")
  }

  /** Build + persist the near-dup corpus index from a pre-tokenized
    * `(id, toks)` frame. One corpus scan: the shingle frame is cached,
    * written, and reused for the band build. The banding parameters
    * ride along as `meta.parquet`; [[readDedupIndex]] validates them.
    */
  def writeDedupIndex(corpusToks: DataFrame, dir: String,
      numHashes: Int = 32, bands: Int = 16, k: Int = 3): Unit = {
    Scratch.sweepOnce(corpusToks.sparkSession) // age out dead-pid scratch
    val sh = corpusToks.select(col("id"),
      Dedup.shingleHashesFromTokens(col("toks"), k).as("sh")).cache()
    try {
      sh.write.mode("overwrite").parquet(s"$dir/shingles.parquet")
      Dedup.bandAssignmentsFromShingles(sh, numHashes, bands)
        .write.mode("overwrite").parquet(s"$dir/bands.parquet")
      metaFrame(sh.sparkSession, numHashes, bands, k)
        .write.mode("overwrite").parquet(s"$dir/meta.parquet")
    } finally sh.unpersist(blocking = false)
  }

  /** Re-read the two dedup artifacts: (shingles, bands). The serve-time
    * parameters must MATCH the build-time record in `meta.parquet`.
    */
  def readDedupIndex(spark: SparkSession, dir: String,
      numHashes: Int = 32, bands: Int = 16, k: Int = 3)
      : (DataFrame, DataFrame) = {
    checkMeta(spark.read.parquet(s"$dir/meta.parquet"), dir,
      numHashes, bands, k)
    (spark.read.parquet(s"$dir/shingles.parquet"),
      spark.read.parquet(s"$dir/bands.parquet"))
  }

  /** Bucketed-table variant of the dedup index: the band frame is
    * saved bucketed on `(band, bucket)` — the serve join's exchange
    * key — and the shingle frame bucketed on `id` (the verify join's
    * key). Every future batch then joins against co-located splits:
    * the CORPUS side of the per-batch join reads with NO Exchange
    * (asserted in BucketingSpec); only the (small) new batch shuffles
    * to match. At 100 TB this is the difference between re-shuffling
    * the standing index per ingest batch and reading it in place.
    */
  def writeDedupIndexBucketed(corpusToks: DataFrame, table: String,
      numBuckets: Int, numHashes: Int = 32, bands: Int = 16,
      k: Int = 3): Unit = {
    val sh = corpusToks.select(col("id"),
      Dedup.shingleHashesFromTokens(col("toks"), k).as("sh")).cache()
    try {
      Bucketing.writeBucketed(sh, s"${table}_sh", Seq("id"), numBuckets)
      Bucketing.writeBucketed(
        Dedup.bandAssignmentsFromShingles(sh, numHashes, bands),
        s"${table}_bands", Seq("band", "bucket"), numBuckets)
      metaFrame(sh.sparkSession, numHashes, bands, k)
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${table}_meta")
    } finally sh.unpersist(blocking = false)
  }

  /** Re-read the bucketed dedup index: (shingles, bands), both with
    * catalog bucket metadata so the per-batch serve join reads the
    * corpus side with zero exchanges. Parameters validated against the
    * build-time `_meta` record, like [[readDedupIndex]].
    */
  def readDedupIndexBucketed(spark: SparkSession, table: String,
      numHashes: Int = 32, bands: Int = 16, k: Int = 3)
      : (DataFrame, DataFrame) = {
    checkMeta(spark.table(s"${table}_meta"), table, numHashes, bands, k)
    (Bucketing.readBucketed(spark, s"${table}_sh"),
      Bucketing.readBucketed(spark, s"${table}_bands"))
  }

  /** Append a DELTA of new `(id, toks)` documents INTO the standing
    * bucketed dedup index — the maintenance arc that closes the
    * production ingest loop (serve the batch against the index, then
    * ADMIT it so future batches dedup against it too; without this
    * the index is frozen at build time and near-dups arriving in two
    * different later batches are never caught).
    *
    * Only the delta is shingled, minhashed, and shuffled into the
    * table's bucket layout (bucket count read from the catalog; a
    * spec mismatch is rejected by Spark itself, so an append can
    * never silently break the serve join's exchange-free contract —
    * re-asserted after an append in BucketingSpec). The standing
    * index files are never rewritten; each append adds one file per
    * non-empty bucket — the LSM trade, compacted periodically like
    * any bucketed fact table.
    *
    * Serve-time parameters are validated against the build-time meta
    * record FIRST: appending band assignments computed under
    * different banding than the standing rows would corrupt the
    * index silently, the exact failure mode the meta record exists
    * to stop. Shingles and band assignments are pure per-document
    * functions, so append(build(base), delta) is ROW-IDENTICAL to
    * build(base ∪ delta) — the x_dedup_index_append oracle computes
    * the union-corpus answer in DuckDB and the hash-match proves it.
    */
  def appendDedupIndexBucketed(deltaToks: DataFrame, table: String,
      numHashes: Int = 32, bands: Int = 16, k: Int = 3): Unit = {
    val spark = deltaToks.sparkSession
    checkMeta(spark.table(s"${table}_meta"), table, numHashes, bands, k)
    val sh = deltaToks.select(col("id"),
      Dedup.shingleHashesFromTokens(col("toks"), k).as("sh")).cache()
    try {
      Bucketing.appendBucketed(sh, s"${table}_sh", Seq("id"),
        Bucketing.numBucketsOf(spark, s"${table}_sh"))
      Bucketing.appendBucketed(
        Dedup.bandAssignmentsFromShingles(sh, numHashes, bands),
        s"${table}_bands", Seq("band", "bucket"),
        Bucketing.numBucketsOf(spark, s"${table}_bands"))
    } finally sh.unpersist(blocking = false)
  }

  /** Build + persist the SUBSTRING-DEDUP gram index from a
    * pre-tokenized `(id, toks)` frame: `(id, pos, h)` k-gram rows
    * ([[Dedup.substringGrams]]) saved as a bucketed table on `h` — the
    * key BOTH serve-time joins (anchor candidates and diagonal
    * extension) use, so every future batch reads the corpus side of
    * both joins in place (asserted in BucketingSpec). The gram size
    * `k` rides along as `_meta`: serving with a different k than the
    * index was built with never matches a single gram and silently
    * reports zero overlap — fail loudly instead.
    */
  def writeSubstringIndexBucketed(corpusToks: DataFrame, table: String,
      numBuckets: Int, k: Int): Unit = {
    Bucketing.writeBucketed(
      Dedup.substringGrams(corpusToks, "id", col("toks"), k),
      s"${table}_grams", Seq("h"), numBuckets)
    corpusToks.sparkSession.range(1).select(lit(k).as("k"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  /** Re-read the bucketed substring gram index; the serve-time `k`
    * must match the build-time record.
    */
  def readSubstringIndexBucketed(spark: SparkSession, table: String,
      k: Int): DataFrame = {
    checkSubstringMeta(spark, table, k)
    Bucketing.readBucketed(spark, s"${table}_grams")
  }

  private def checkSubstringMeta(spark: SparkSession, table: String,
      k: Int): Unit = {
    val built = spark.table(s"${table}_meta").select(col("k")).head.getInt(0)
    require(built == k,
      s"substring index at $table was built with k=$built but is being " +
        s"served with k=$k — mismatched gram sizes never collide and " +
        "silently report zero overlap")
  }

  /** Append a DELTA of new `(id, toks)` documents INTO the standing
    * bucketed substring gram index — the LSM maintenance arc the
    * MinHash index already has ([[appendDedupIndexBucketed]]): without
    * it a growing 100 TB corpus must re-gram-hash the FULL corpus per
    * ingest batch just to admit the batch into future screens.
    *
    * Only the delta is gram-hashed and shuffled into the table's
    * bucket layout (bucket count read from the catalog; a spec
    * mismatch is rejected by Spark itself, so an append can never
    * silently break the serve join's exchange-free contract —
    * re-asserted post-append in BucketingSpec). Standing files are
    * never rewritten; each append adds one file per non-empty bucket,
    * compacted periodically like any bucketed fact table.
    *
    * The gram size is validated against the build-time `_meta` record
    * FIRST: appending k'-grams into a k-gram index would silently
    * split every cross-boundary run. [[graft.ext.Dedup.substringGrams]]
    * is a pure per-document function, so append(build(base), delta)
    * is ROW-IDENTICAL to build(base ∪ delta) — the
    * x_dedup_substring_append oracle computes the union-corpus answer
    * from scratch in DuckDB and the hash-match proves it.
    */
  def appendSubstringIndexBucketed(deltaToks: DataFrame, table: String,
      k: Int): Unit = {
    val spark = deltaToks.sparkSession
    checkSubstringMeta(spark, table, k)
    Bucketing.appendBucketed(
      Dedup.substringGrams(deltaToks, "id", col("toks"), k),
      s"${table}_grams", Seq("h"),
      Bucketing.numBucketsOf(spark, s"${table}_grams"))
  }

  /** Tombstone DELETION for the MinHash index: deleted document ids
    * land in a sibling `_dead` table — standing index files untouched,
    * one id-list append. Serving excludes dead corpus ids by
    * anti-joining the OUTPUT pairs (batch-sized — the cheap side; a
    * dead doc can only surface through candidates, so post-join
    * exclusion is exact). [[purgeDedupIndexBucketed]] later removes
    * dead rows physically via the compaction rewrite and clears the
    * tombstones; the serve answer is invariant across the purge
    * (BucketingSpec proves excluded-serve ≡ post-purge serve ≡
    * rebuild-without-deleted).
    */
  def deleteFromDedupIndexBucketed(ids: DataFrame, table: String): Unit =
    appendDeadIds(ids, table)

  /** Generic id-tombstone primitives shared by every PER-DOCUMENT index
    * family (MinHash, substring grams, edit-distance, pHash — all pure
    * functions of single documents, so deletes are id-keyed): deleted
    * ids land in a sibling `_dead` table, one batch-sized append,
    * standing index files untouched. Each family serves with dead
    * corpus ids excluded by anti-joining the OUTPUT pairs (batch-sized,
    * exact — a dead doc can only surface through candidates) and purges
    * physically via its compaction rewrite with an anti-join merge.
    */
  private def appendDeadIds(ids: DataFrame, table: String): Unit =
    ids.select(col("id"))
      .write.mode("append").format("parquet")
      .saveAsTable(s"${table}_dead")

  /** The standing tombstone set — empty frame if none were deleted;
    * the empty fallback's id TYPE comes from `idTypeFrom`'s own id
    * column, never a hardcoded type (a mismatched empty frame would
    * silently type-coerce the purge anti-join).
    */
  def readDeadIds(spark: SparkSession, table: String,
      idTypeFrom: String): DataFrame =
    if (spark.catalog.tableExists(s"${table}_dead"))
      spark.table(s"${table}_dead")
    else spark.table(idTypeFrom).select(col("id")).limit(0)

  /** The current tombstone set — empty frame if none were deleted.
    * The empty fallback derives its `id` TYPE from the index's own
    * `_sh` table (round-13, ADVICE): a hardcoded LongType frame would
    * silently type-coerce the purge anti-join and the serve-side
    * exclusion for non-long corpus ids (string-vs-long casts can null
    * out and un-exclude).
    */
  def readDedupDeadIds(spark: SparkSession, table: String): DataFrame =
    readDeadIds(spark, table, s"${table}_sh")

  /** Physically remove tombstoned documents from both index halves
    * (the compaction rewrite with an anti-join merge) and clear the
    * tombstone table. After a purge, serving needs no exclusion until
    * the next delete.
    */
  def purgeDedupIndexBucketed(spark: SparkSession, table: String): Unit = {
    val dead = readDedupDeadIds(spark, table)
    Bucketing.compactBucketed(spark, s"${table}_sh",
      df => df.join(dead, Seq("id"), "left_anti"))
    Bucketing.compactBucketed(spark, s"${table}_bands",
      df => df.join(dead, Seq("id"), "left_anti"))
    spark.sql(s"DROP TABLE IF EXISTS `${table}_dead`")
  }

  /** Compact the standing bucketed MinHash dedup index back to one
    * data file per non-empty bucket ([[Bucketing.compactBucketed]] on
    * both halves) — the periodic rewrite [[appendDedupIndexBucketed]]
    * prices in: after b appended batches every serve scan opens
    * O(b × buckets) small files. Content, bucket layout, and the
    * `_meta` parameter record are all untouched, so serving after a
    * compaction is the SAME join plan over the SAME rows — the
    * x_dedup_index_compact row shares x_dedup_index_append's oracle
    * verbatim (hash-identity IS the claim), and BucketingSpec asserts
    * the file count actually drops and the exchange-free serve
    * contract survives.
    */
  def compactDedupIndexBucketed(spark: SparkSession,
      table: String): Unit = {
    Bucketing.compactBucketed(spark, s"${table}_sh")
    Bucketing.compactBucketed(spark, s"${table}_bands")
  }

  // -------------------------- MinHash family, versioned (round-15 #1)
  /** The MinHash dedup index on [[BucketedManifest]] gen-manifest
    * tables — the first bucketed family on the real table format
    * (round-15 directive #1; rounds 13–14 versioned it on
    * the retired pointer store's hard-link freezes, whose scaladoc named
    * this store as the object-store-deployable fix). Both halves
    * (`_sh` on id, `_bands` on (band, bucket)) are MEMBERS of ONE
    * family: every append commits both in a single atomic manifest
    * (the half-frozen crash split of the freeze-per-half design cannot
    * exist), every commit is a time-travelable version, and compaction
    * publishes merged generations the old versions keep referencing —
    * no hard links, no catalog-table-per-version, no pointer swap.
    * Serve reads are partition-pruned catalog scans carrying the
    * bucket metadata, so the per-batch join still reads the corpus
    * side exchange-free (BucketedManifestSpec asserts the executed
    * plan). Content contract unchanged: x_dedup_index_versioned shares
    * x_dedup_index_append's oracle verbatim through a
    * build/append/compact cycle.
    */
  def writeDedupIndexBucketedVersioned(corpusToks: DataFrame,
      table: String, numBuckets: Int, numHashes: Int = 32,
      bands: Int = 16, k: Int = 3): Unit = {
    val spark = corpusToks.sparkSession
    Scratch.sweepOnce(spark)
    val sh = corpusToks.select(col("id"),
      Dedup.shingleHashesFromTokens(col("toks"), k).as("sh")).cache()
    try {
      BucketedManifest.create(spark, table, Seq(
        (s"${table}_sh", sh, Seq("id"), numBuckets),
        (s"${table}_bands",
          Dedup.bandAssignmentsFromShingles(sh, numHashes, bands),
          Seq("band", "bucket"), numBuckets)))
      metaFrame(spark, numHashes, bands, k)
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${table}_meta")
    } finally sh.unpersist(blocking = false)
  }

  /** (shingles, bands) of the CURRENT version, bucket metadata
    * attached; serve-time parameters validated against the build-time
    * record. The manifest is resolved at call time, so a per-batch
    * caller always serves against everything committed so far.
    */
  def readDedupIndexBucketedVersioned(spark: SparkSession,
      table: String, numHashes: Int = 32, bands: Int = 16, k: Int = 3)
      : (DataFrame, DataFrame) = {
    checkMeta(spark.table(s"${table}_meta"), table, numHashes, bands, k)
    (BucketedManifest.read(spark, table, s"${table}_sh"),
      BucketedManifest.read(spark, table, s"${table}_bands"))
  }

  /** [[appendDedupIndexBucketed]] as ONE atomic family commit: the
    * delta's shingle and band generations land under a claimed gen
    * number and both halves advance in a single manifest link — the
    * committed version is returned and IS the freeze point ("the
    * corpus after this batch"). Standing generations untouched;
    * captured reader frames remain valid.
    */
  def appendDedupIndexBucketedVersioned(deltaToks: DataFrame,
      table: String, numHashes: Int = 32, bands: Int = 16,
      k: Int = 3): Int = {
    val spark = deltaToks.sparkSession
    checkMeta(spark.table(s"${table}_meta"), table, numHashes, bands, k)
    val sh = deltaToks.select(col("id"),
      Dedup.shingleHashesFromTokens(col("toks"), k).as("sh")).cache()
    try
      BucketedManifest.append(spark, table, Seq(
        (s"${table}_sh", sh),
        (s"${table}_bands",
          Dedup.bandAssignmentsFromShingles(sh, numHashes, bands))))
    finally sh.unpersist(blocking = false)
  }

  /** The freeze point of the current ingest state. On the manifest
    * store a snapshot is PURE METADATA — every committed version is
    * already frozen (generations are immutable, manifests reference
    * them forever until vacuum), so "freeze now" just reads the
    * current version number. The round-14 half-by-half freeze (and its
    * crash-split recovery, round-14 ADVICE) is retired structurally:
    * both halves live in one manifest, there are no halves to
    * re-align.
    */
  def snapshotDedupIndexBucketedVersioned(spark: SparkSession,
      table: String): Int =
    BucketedManifest.currentVersion(spark, table)

  /** (shingles, bands) of FROZEN version `v` — the corpus exactly as
    * of that commit, regardless of every admission since.
    */
  def readDedupIndexBucketedVersionedAsOf(spark: SparkSession,
      table: String, v: Int, numHashes: Int = 32, bands: Int = 16,
      k: Int = 3): (DataFrame, DataFrame) = {
    checkMeta(spark.table(s"${table}_meta"), table, numHashes, bands, k)
    (BucketedManifest.readVersion(spark, table, s"${table}_sh", v),
      BucketedManifest.readVersion(spark, table, s"${table}_bands", v))
  }

  /** [[compactDedupIndexBucketed]] as version publication: both
    * halves' one-file-per-bucket merged generations land under one
    * claimed gen and ONE manifest commit — concurrent readers keep
    * their versions' generations until [[BucketedManifest.vacuum]].
    * Content, layout, `_meta` untouched, so the serve answer is
    * hash-invariant.
    */
  def compactDedupIndexBucketedVersioned(spark: SparkSession,
      table: String): Unit =
    BucketedManifest.compact(spark, table)

  /** Size-tiered cadence for the versioned MinHash family
    * ([[BucketedManifest.compactTiered]]): when the manifest
    * references more than `maxGens` generations, merge the smallest
    * down to the cap and reference the big ones untouched — the
    * O(small-generations) maintenance an every-batch ingest loop can
    * afford to run after each admit.
    */
  def maybeCompactDedupIndexBucketedVersioned(spark: SparkSession,
      table: String, maxGens: Int): Boolean =
    BucketedManifest.compactTiered(spark, table, maxGens)

  // ------------------- multi-index pipeline family (round-15 capstone)
  /** The MULTI-INDEX pipeline family: the MinHash halves (content
    * identity) and a key member (document identity) in ONE manifest
    * chain — the composability the gen-manifest store was built for.
    * A training-data ingest loop screens every batch through BOTH
    * gates (near-dup content, duplicate id) and admits the survivors
    * into all three members with ONE atomic commit: a crash between
    * "document counted in the dedup index" and "document counted in
    * the key index" cannot exist, so the two indexes can never
    * disagree about what was admitted — the cross-index consistency a
    * per-index commit protocol cannot give. The dedup halves serve
    * through [[readDedupIndexBucketedVersioned]] unchanged (same
    * member names and `_meta` record); the key member serves the
    * uniqueness gate.
    */
  def writePipelineIndexVersioned(corpusToks: DataFrame, table: String,
      numBuckets: Int, numHashes: Int = 32, bands: Int = 16,
      k: Int = 3): Unit = {
    val spark = corpusToks.sparkSession
    Scratch.sweepOnce(spark)
    val sh = corpusToks.select(col("id"),
      Dedup.shingleHashesFromTokens(col("toks"), k).as("sh")).cache()
    try {
      BucketedManifest.create(spark, table, Seq(
        (s"${table}_sh", sh, Seq("id"), numBuckets),
        (s"${table}_bands",
          Dedup.bandAssignmentsFromShingles(sh, numHashes, bands),
          Seq("band", "bucket"), numBuckets),
        (s"${table}_keys",
          keyCounts(corpusToks.select("id"), Seq("id")),
          Seq("id"), numBuckets)))
      metaFrame(spark, numHashes, bands, k)
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${table}_meta")
    } finally sh.unpersist(blocking = false)
  }

  /** Admit a delta into ALL THREE members atomically (one manifest
    * link — returns the committed version, which is the freeze point
    * of the whole pipeline state).
    */
  def appendPipelineIndexVersioned(deltaToks: DataFrame, table: String,
      numHashes: Int = 32, bands: Int = 16, k: Int = 3): Int = {
    val spark = deltaToks.sparkSession
    checkMeta(spark.table(s"${table}_meta"), table, numHashes, bands, k)
    val sh = deltaToks.select(col("id"),
      Dedup.shingleHashesFromTokens(col("toks"), k).as("sh")).cache()
    try
      BucketedManifest.append(spark, table, Seq(
        (s"${table}_sh", sh),
        (s"${table}_bands",
          Dedup.bandAssignmentsFromShingles(sh, numHashes, bands)),
        (s"${table}_keys",
          keyCounts(deltaToks.select("id"), Seq("id")))))
    finally sh.unpersist(blocking = false)
  }

  /** The key member's raw LSM rows (id, n) of the current version —
    * the uniqueness gate anti-joins present ids, audits sum totals.
    */
  def readPipelineKeyIndex(spark: SparkSession, table: String): DataFrame =
    BucketedManifest.read(spark, table, s"${table}_keys")

  /** EVOLVE a versioned MinHash family into the pipeline family
    * online ([[BucketedManifest.addMember]] — round-16): the key
    * member is derived from the ids ALREADY ADMITTED (the `_sh`
    * member's id set — corpus plus every admission so far) and added
    * in one manifest commit. From that version on,
    * [[readPipelineKeyIndex]] and the identity gate serve exactly as
    * if the family had been born with
    * [[writePipelineIndexVersioned]]; no existing generation is
    * touched, nothing is rebuilt, and time travel before the birth
    * version keeps working for the original members. Returns the
    * birth version.
    */
  def addPipelineKeyMember(spark: SparkSession, table: String,
      numBuckets: Int): Int =
    BucketedManifest.addMember(spark, table, s"${table}_keys",
      keyCounts(BucketedManifest.read(spark, table, s"${table}_sh")
        .select("id").distinct(), Seq("id")),
      Seq("id"), numBuckets)

  /** Size-tiered cadence for the whole pipeline family (round-16
    * directive #2 — the multi-gate ingest loop is the operator a real
    * pipeline runs forever, so its generation growth must be
    * boundable like every other ingest loop's): ONE tiered merge
    * across all three members — the MinHash halves merge by plain
    * concatenation (pure per-document rows), the key member through
    * the LSM re-aggregation (split rows collapse, zero-total keys
    * drop) — published as ONE manifest commit, so even the
    * maintenance path keeps the cross-member atomicity the family
    * exists for. Big standing generations are referenced untouched.
    */
  def maybeCompactPipelineIndexVersioned(spark: SparkSession,
      table: String, maxGens: Int): Boolean =
    BucketedManifest.compactTiered(spark, table, maxGens,
      merges = Map(s"${table}_keys".toLowerCase -> (keyMergeFn _)))

  /** Compact the standing bucketed substring gram index (one half:
    * the gram frame) — same contract as
    * [[compactDedupIndexBucketed]].
    */
  def compactSubstringIndexBucketed(spark: SparkSession,
      table: String): Unit =
    Bucketing.compactBucketed(spark, s"${table}_grams")

  /** The substring gram index on [[BucketedManifest]] gen-manifest
    * tables (round-16 directive #1 — the THIRD family on the table
    * format after MinHash and key, and the heaviest bucketed one:
    * O(tokens) gram rows per document). One member: the gram frame on
    * `h` — the key both serve-time joins use; `_meta` pins k exactly
    * as the swap-compacted twin does. Migrated off
    * the retired pointer store: appends are natively
    * versioned (every admit commits a manifest and IS the freeze
    * point — no hard-link clone, no `file:`-scheme freeze), snapshots
    * are pure metadata reads, tiered compaction references big
    * standing generations untouched, and the store's object-store
    * posture (immutable generation puts + manifest CAS + LWW hint)
    * comes along for free. Serve content is unchanged through the
    * migration: x_dedup_substring_versioned,
    * x_dedup_substring_tiered_versioned, and
    * x_stream_substring_versioned keep sharing
    * x_dedup_substring_append's oracle verbatim on the new store.
    */
  def writeSubstringIndexBucketedVersioned(corpusToks: DataFrame,
      table: String, numBuckets: Int, k: Int): Unit = {
    val spark = corpusToks.sparkSession
    Scratch.sweepOnce(spark)
    BucketedManifest.create(spark, table, Seq(
      (s"${table}_grams",
        Dedup.substringGrams(corpusToks, "id", col("toks"), k),
        Seq("h"), numBuckets)))
    spark.range(1).select(lit(k).as("k"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  /** The CURRENT version's gram set, bucket metadata attached (the
    * manifest is resolved at call time, so a per-batch caller always
    * serves against everything committed so far).
    */
  def readSubstringIndexBucketedVersioned(spark: SparkSession,
      table: String, k: Int): DataFrame = {
    checkSubstringMeta(spark, table, k)
    BucketedManifest.read(spark, table, s"${table}_grams")
  }

  /** Admit a delta's grams as a NEW VERSION (returned — it IS the
    * freeze point "the corpus after this batch"; standing generations
    * untouched, captured reader frames remain valid).
    */
  def appendSubstringIndexBucketedVersioned(deltaToks: DataFrame,
      table: String, k: Int): Int = {
    checkSubstringMeta(deltaToks.sparkSession, table, k)
    BucketedManifest.append(deltaToks.sparkSession, table, Seq(
      (s"${table}_grams",
        Dedup.substringGrams(deltaToks, "id", col("toks"), k))))
  }

  /** The freeze point of the current ingest state — PURE METADATA on
    * the manifest store (every committed version is already frozen;
    * the pointer store needed a hard-link clone for this).
    */
  def snapshotSubstringIndexBucketedVersioned(spark: SparkSession,
      table: String): Int =
    BucketedManifest.currentVersion(spark, table)

  /** The gram set as of FROZEN version `v` — blind to every admission
    * and rewrite since that commit.
    */
  def readSubstringIndexBucketedVersionedAsOf(spark: SparkSession,
      table: String, v: Int, k: Int): DataFrame = {
    checkSubstringMeta(spark, table, k)
    BucketedManifest.readVersion(spark, table, s"${table}_grams", v)
  }

  /** Full compaction as version publication: one merged generation,
    * one file per non-empty bucket; older versions keep their
    * generations until [[BucketedManifest.vacuum]]. Content-invariant
    * (grams are pure per-document rows — no merge algebra needed).
    */
  def compactSubstringIndexBucketedVersioned(spark: SparkSession,
      table: String): Unit =
    BucketedManifest.compact(spark, table)

  /** Size-tiered cadence ([[BucketedManifest.compactTiered]]): when
    * the manifest references more than `maxGens` generations, merge
    * the SMALLEST down to the cap and reference the big standing ones
    * untouched — O(small generations) maintenance with snapshot
    * isolation, replacing the pointer store's hard-link hybrid for
    * this family.
    */
  def maybeCompactSubstringIndexBucketedVersioned(spark: SparkSession,
      table: String, maxGens: Int): Boolean =
    BucketedManifest.compactTiered(spark, table, maxGens)

  /** Size-tiered compaction of the substring gram index: only buckets
    * that accumulated >= `minFilesPerBucket` files are rewritten
    * ([[Bucketing.compactBucketedTiered]]) — the periodic maintenance
    * shape for a 100 TB index whose appends hit a few hot buckets.
    */
  def compactSubstringIndexTiered(spark: SparkSession, table: String,
      minFilesPerBucket: Int): Unit =
    Bucketing.compactBucketedTiered(spark, s"${table}_grams",
      minFilesPerBucket)

  /** Tombstone DELETION for the substring gram index — the MinHash
    * id-tombstone pattern transplanted (round-13 directive #1; grams
    * are a pure per-document frame, so deletes are id-keyed): deleted
    * ids land in `_dead` (one batch-sized append, standing gram files
    * untouched); serving excludes dead corpus ids by anti-joining the
    * OUTPUT run/pair rows on corpus_id (exact — a dead doc can only
    * surface through gram candidates);
    * [[purgeSubstringIndexBucketed]] later removes dead grams
    * physically. The right-to-be-forgotten shape: no rewrite of a
    * 100 TB gram index on the request path.
    */
  def deleteFromSubstringIndexBucketed(ids: DataFrame,
      table: String): Unit =
    appendDeadIds(ids, table)

  /** The substring index's standing tombstone set. */
  def readSubstringDeadIds(spark: SparkSession, table: String): DataFrame =
    readDeadIds(spark, table, s"${table}_grams")

  /** Physically remove tombstoned documents' grams (the compaction
    * rewrite with an anti-join merge) and clear the tombstone table;
    * the served answer is invariant across the purge (BucketingSpec:
    * excluded serve ≡ rebuild-without-deleted ≡ post-purge serve).
    */
  def purgeSubstringIndexBucketed(spark: SparkSession,
      table: String): Unit = {
    val dead = readSubstringDeadIds(spark, table)
    Bucketing.compactBucketed(spark, s"${table}_grams",
      df => df.join(dead, Seq("id"), "left_anti"))
    spark.sql(s"DROP TABLE IF EXISTS `${table}_dead`")
  }

  // ------------------------------------------------ edit-dist index
  /** Persist the PassJoin corpus for incremental edit-distance
    * screening ([[graft.ext.Dedup.editDistanceAgainst]]): three
    * bucketed tables, each on its own serve join's key —
    * `_segs` (id, len, h) on `h` (the single-column candidate join:
    * length and slot are folded INTO the hash by design), `_str`
    * (id, s) on `id` (the verify fetch), `_bylen` (len, id) on `len`
    * (the sub-(d+1)-char directory). All three are pure per-string
    * functions, so append(build(base), delta) ≡ build(base ∪ delta)
    * row-for-row and the generic LSM append/compaction paths apply.
    * `_meta` pins `d`: segments cut for a different threshold never
    * hash-collide with the probes and silently report nothing —
    * fail loudly instead.
    */
  def writeEditIndexBucketed(corpus: DataFrame, table: String,
      numBuckets: Int, d: Int, idCol: String = "id",
      strCol: String = "s"): Unit = {
    Scratch.sweepOnce(corpus.sparkSession)
    val c = normalizedEditFrame(corpus, idCol, strCol).cache()
    try {
      Bucketing.writeBucketed(graft.ext.Dedup.editSegmentFrame(c, d),
        s"${table}_segs", Seq("h"), numBuckets)
      Bucketing.writeBucketed(
        c.select(col("__id").as("id"), col("__s").as("s")),
        s"${table}_str", Seq("id"), numBuckets)
      Bucketing.writeBucketed(
        c.select(col("__l").as("len"), col("__id").as("id")),
        s"${table}_bylen", Seq("len"), numBuckets)
      c.sparkSession.range(1).select(lit(d).as("d"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${table}_meta")
    } finally c.unpersist(blocking = false)
  }

  private def normalizedEditFrame(df: DataFrame, idCol: String,
      strCol: String): DataFrame =
    df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
      .withColumn("__l", length(col("__s")))

  private def checkEditMeta(spark: SparkSession, table: String,
      d: Int): Unit = {
    val built = spark.table(s"${table}_meta").select(col("d")).head
      .getInt(0)
    require(built == d,
      s"edit index at $table was built for d=$built but is being " +
        s"served with d=$d — differently-cut segments never collide " +
        "and silently report no matches")
  }

  /** Admit a checked batch into the standing edit index (all three
    * tables; only the delta shuffles).
    */
  def appendEditIndexBucketed(delta: DataFrame, table: String, d: Int,
      idCol: String = "id", strCol: String = "s"): Unit = {
    val spark = delta.sparkSession
    checkEditMeta(spark, table, d)
    val c = normalizedEditFrame(delta, idCol, strCol).cache()
    try {
      Bucketing.appendBucketed(graft.ext.Dedup.editSegmentFrame(c, d),
        s"${table}_segs", Seq("h"),
        Bucketing.numBucketsOf(spark, s"${table}_segs"))
      Bucketing.appendBucketed(
        c.select(col("__id").as("id"), col("__s").as("s")),
        s"${table}_str", Seq("id"),
        Bucketing.numBucketsOf(spark, s"${table}_str"))
      Bucketing.appendBucketed(
        c.select(col("__l").as("len"), col("__id").as("id")),
        s"${table}_bylen", Seq("len"),
        Bucketing.numBucketsOf(spark, s"${table}_bylen"))
    } finally c.unpersist(blocking = false)
  }

  /** Re-read the edit index: (segs, str, bylen); serve-time `d` must
    * match the build-time record.
    */
  def readEditIndexBucketed(spark: SparkSession, table: String, d: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    checkEditMeta(spark, table, d)
    (Bucketing.readBucketed(spark, s"${table}_segs"),
      Bucketing.readBucketed(spark, s"${table}_str"),
      Bucketing.readBucketed(spark, s"${table}_bylen"))
  }

  /** Compact all three standing edit-index tables back to one file
    * per non-empty bucket — same contract as
    * [[compactDedupIndexBucketed]] (content, layout, `_meta`
    * untouched; the serve plan is the same join over the same rows,
    * so x_dedup_editdist_compact shares the append row's oracle
    * verbatim).
    */
  def compactEditIndexBucketed(spark: SparkSession,
      table: String): Unit = {
    Bucketing.compactBucketed(spark, s"${table}_segs")
    Bucketing.compactBucketed(spark, s"${table}_str")
    Bucketing.compactBucketed(spark, s"${table}_bylen")
  }

  /** The PassJoin edit index on [[BucketedManifest]] gen-manifest
    * tables (round-17 directive #2 — the FOURTH family on the table
    * format, completing the migration the substring family templated
    * in round 16): ONE family with THREE members — `_segs` on `h`
    * (the candidate join), `_str` on `id` (the verify fetch),
    * `_bylen` on `len` (the sub-(d+1)-char directory) — so every
    * admit advances all three in ONE atomic manifest commit: the
    * pointer store's per-table appends could crash with the segment
    * table a batch ahead of the string table (a candidate whose
    * verify fetch finds no string); here that split cannot exist.
    * Appends are natively versioned (each admit IS a freeze point),
    * snapshots are pure metadata, and the store's object-store
    * posture (committer-seam writes, manifest CAS, attach, rollback)
    * comes along for free — no hard links, no `file:`-scheme
    * requirement. `_meta` pins d as before. Serve content is
    * unchanged through the migration: x_dedup_editdist_versioned and
    * x_stream_editdist_versioned keep sharing
    * x_dedup_editdist_append's oracle verbatim on the new store.
    */
  def writeEditIndexBucketedVersioned(corpus: DataFrame, table: String,
      numBuckets: Int, d: Int, idCol: String = "id",
      strCol: String = "s"): Unit = {
    val spark = corpus.sparkSession
    Scratch.sweepOnce(spark)
    val c = normalizedEditFrame(corpus, idCol, strCol).cache()
    try {
      BucketedManifest.create(spark, table, Seq(
        (s"${table}_segs", graft.ext.Dedup.editSegmentFrame(c, d),
          Seq("h"), numBuckets),
        (s"${table}_str",
          c.select(col("__id").as("id"), col("__s").as("s")),
          Seq("id"), numBuckets),
        (s"${table}_bylen",
          c.select(col("__l").as("len"), col("__id").as("id")),
          Seq("len"), numBuckets)))
      spark.range(1).select(lit(d).as("d"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${table}_meta")
    } finally c.unpersist(blocking = false)
  }

  /** Admit a checked batch as a NEW VERSION — all three members in
    * one atomic manifest commit (returned; it IS the freeze point).
    */
  def appendEditIndexBucketedVersioned(delta: DataFrame, table: String,
      d: Int, idCol: String = "id", strCol: String = "s"): Int = {
    checkEditMeta(delta.sparkSession, table, d)
    val c = normalizedEditFrame(delta, idCol, strCol).cache()
    try {
      BucketedManifest.append(delta.sparkSession, table, Seq(
        (s"${table}_segs", graft.ext.Dedup.editSegmentFrame(c, d)),
        (s"${table}_str",
          c.select(col("__id").as("id"), col("__s").as("s"))),
        (s"${table}_bylen",
          c.select(col("__l").as("len"), col("__id").as("id")))))
    } finally c.unpersist(blocking = false)
  }

  def readEditIndexBucketedVersioned(spark: SparkSession, table: String,
      d: Int): (DataFrame, DataFrame, DataFrame) = {
    checkEditMeta(spark, table, d)
    (BucketedManifest.read(spark, table, s"${table}_segs"),
      BucketedManifest.read(spark, table, s"${table}_str"),
      BucketedManifest.read(spark, table, s"${table}_bylen"))
  }

  /** Full compaction as version publication — one merged generation
    * per member, all three published in ONE manifest commit (the
    * pointer store needed three separate compact+repoint cycles).
    */
  def compactEditIndexBucketedVersioned(spark: SparkSession,
      table: String): Unit =
    BucketedManifest.compact(spark, table)

  /** Tombstone DELETION for the edit-distance index (round-13
    * directive #1): all three tables are pure per-string frames keyed
    * by id, so one id-list tombstone covers segments, strings, and the
    * length directory alike. Serving excludes dead corpus ids on the
    * OUTPUT pairs; [[purgeEditIndexBucketed]] rewrites all three
    * tables without dead rows and clears the tombstones.
    */
  def deleteFromEditIndexBucketed(ids: DataFrame, table: String): Unit =
    appendDeadIds(ids, table)

  /** The edit index's standing tombstone set. */
  def readEditDeadIds(spark: SparkSession, table: String): DataFrame =
    readDeadIds(spark, table, s"${table}_str")

  /** Physically remove tombstoned strings from all three edit-index
    * tables (compaction rewrites with an anti-join merge) and clear
    * the tombstone table; serve answer invariant (BucketingSpec).
    */
  def purgeEditIndexBucketed(spark: SparkSession, table: String): Unit = {
    val dead = readEditDeadIds(spark, table)
    Bucketing.compactBucketed(spark, s"${table}_segs",
      df => df.join(dead, Seq("id"), "left_anti"))
    Bucketing.compactBucketed(spark, s"${table}_str",
      df => df.join(dead, Seq("id"), "left_anti"))
    Bucketing.compactBucketed(spark, s"${table}_bylen",
      df => df.join(dead, Seq("id"), "left_anti"))
    spark.sql(s"DROP TABLE IF EXISTS `${table}_dead`")
  }

  // ----------------------------------------------------- pHash index
  /** Persist the banded perceptual-hash frame
    * ([[graft.ext.Multimodal.phashBands]]) as a bucketed table on
    * (band, key) — exactly the serve join's key, so checking an image
    * ingest batch against the standing corpus
    * ([[graft.ext.Multimodal.phashNearDuplicatesAgainst]]) reads the
    * corpus side in place; only the batch is decoded, hashed, banded,
    * and shuffled. `_meta` pins the band count: hashes banded
    * differently never collide and silently report no near-dups —
    * fail loudly instead. Append + compaction come free from the
    * generic bucketed-table paths ([[Bucketing.appendBucketed]] /
    * [[Bucketing.compactBucketed]]) since bands are a pure
    * per-image function.
    */
  def writePhashIndexBucketed(hashes: DataFrame, table: String,
      numBuckets: Int, bands: Int = 8): Unit = {
    Scratch.sweepOnce(hashes.sparkSession)
    Bucketing.writeBucketed(
      graft.ext.Multimodal.phashBands(hashes, bands),
      s"${table}_bands", Seq("band", "key"), numBuckets)
    hashes.sparkSession.range(1).select(lit(bands).as("bands"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  def readPhashIndexBucketed(spark: SparkSession, table: String,
      bands: Int = 8): DataFrame = {
    checkPhashMeta(spark, table, bands)
    Bucketing.readBucketed(spark, s"${table}_bands")
  }

  private def checkPhashMeta(spark: SparkSession, table: String,
      bands: Int): Unit = {
    val built = spark.table(s"${table}_meta")
      .select(col("bands")).head.getInt(0)
    require(built == bands,
      s"phash index at $table was built with bands=$built but is being " +
        s"served with bands=$bands — mismatched banding never collides " +
        "and silently reports no near-duplicates")
  }

  /** Admit a checked image batch's `(id, dhash)` rows into the
    * standing pHash index — the LSM append arc the other per-document
    * families already have: only the delta is banded and shuffled into
    * the table's bucket layout; standing files untouched. Band count
    * validated against the build-time `_meta` record first (banding
    * mismatches never collide — fail loudly). Bands are a pure
    * per-image function, so append(build(base), delta) ≡
    * build(base ∪ delta) row-for-row — x_mm_phash_append proves it by
    * sharing the full-corpus serve oracle.
    */
  def appendPhashIndexBucketed(deltaHashes: DataFrame, table: String,
      bands: Int = 8): Unit = {
    val spark = deltaHashes.sparkSession
    checkPhashMeta(spark, table, bands)
    Bucketing.appendBucketed(
      graft.ext.Multimodal.phashBands(deltaHashes, bands),
      s"${table}_bands", Seq("band", "key"),
      Bucketing.numBucketsOf(spark, s"${table}_bands"))
  }

  /** Compact the standing pHash band table — same contract as
    * [[compactDedupIndexBucketed]].
    */
  def compactPhashIndexBucketed(spark: SparkSession,
      table: String): Unit =
    Bucketing.compactBucketed(spark, s"${table}_bands")

  /** The pHash band index on [[BucketedManifest]] gen-manifest tables
    * (round-17 directive #2 — the FIFTH and final bucketed family on
    * the table format): one member on (band, key); `_meta` pins the
    * band count. Appends are natively versioned, snapshots pure
    * metadata, object-store posture (committer-seam writes, manifest
    * CAS, attach, rollback) inherited — no hard links, no `file:`
    * scheme. Serve content unchanged through the migration:
    * x_mm_phash_versioned and x_stream_phash_versioned keep sharing
    * x_mm_phash_served's oracle verbatim on the new store.
    */
  def writePhashIndexBucketedVersioned(hashes: DataFrame, table: String,
      numBuckets: Int, bands: Int = 8): Unit = {
    val spark = hashes.sparkSession
    Scratch.sweepOnce(spark)
    BucketedManifest.create(spark, table, Seq(
      (s"${table}_bands",
        graft.ext.Multimodal.phashBands(hashes, bands),
        Seq("band", "key"), numBuckets)))
    spark.range(1).select(lit(bands).as("bands"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  def readPhashIndexBucketedVersioned(spark: SparkSession,
      table: String, bands: Int = 8): DataFrame = {
    checkPhashMeta(spark, table, bands)
    BucketedManifest.read(spark, table, s"${table}_bands")
  }

  /** Admit a checked image batch as a NEW VERSION (returned; it IS
    * the freeze point).
    */
  def appendPhashIndexBucketedVersioned(deltaHashes: DataFrame,
      table: String, bands: Int = 8): Int = {
    checkPhashMeta(deltaHashes.sparkSession, table, bands)
    BucketedManifest.append(deltaHashes.sparkSession, table, Seq(
      (s"${table}_bands",
        graft.ext.Multimodal.phashBands(deltaHashes, bands))))
  }

  def compactPhashIndexBucketedVersioned(spark: SparkSession,
      table: String): Unit =
    BucketedManifest.compact(spark, table)

  /** Tombstone DELETION for the pHash index (round-13 directive #1):
    * the banded hash frame is a pure per-image function, so deletes
    * are id-keyed like the other per-document families. Serving
    * excludes dead corpus ids on the OUTPUT pairs;
    * [[purgePhashIndexBucketed]] rewrites the band table without dead
    * rows and clears the tombstones.
    */
  def deleteFromPhashIndexBucketed(ids: DataFrame, table: String): Unit =
    appendDeadIds(ids, table)

  /** The pHash index's standing tombstone set. */
  def readPhashDeadIds(spark: SparkSession, table: String): DataFrame =
    readDeadIds(spark, table, s"${table}_bands")

  /** Physically remove tombstoned images' band rows (compaction
    * rewrite with an anti-join merge) and clear the tombstone table;
    * serve answer invariant (BucketingSpec).
    */
  def purgePhashIndexBucketed(spark: SparkSession, table: String): Unit = {
    val dead = readPhashDeadIds(spark, table)
    Bucketing.compactBucketed(spark, s"${table}_bands",
      df => df.join(dead, Seq("id"), "left_anti"))
    spark.sql(s"DROP TABLE IF EXISTS `${table}_dead`")
  }

  // ------------------------------------------------------- key index
  /** The key-uniqueness / foreign-key twin of the dedup index arc —
    * the validation-core operator a growing 100 TB table actually
    * needs: re-running `unique`/`primaryKey` over the FULL history per
    * ingest batch re-scans and re-shuffles everything ever ingested,
    * when the only question is "does the BATCH collide with what the
    * history already holds". The key index persists one
    * `(key…, n)` count row per distinct historical key tuple, bucketed
    * on the key columns — exactly the serve join's key, so checking a
    * batch reads the history side in place (BucketingSpec) and only
    * the batch shuffles.
    *
    * LSM semantics, deliberately: [[appendKeyIndexBucketed]] appends
    * the DELTA's per-key counts as new rows (never rewrites standing
    * files), so one key's total may be split across several physical
    * rows; every serve path merges with `sum(n) GROUP BY key` — a
    * groupBy on the bucket columns, i.e. exchange-free — which makes
    * correctness invariant under append granularity.
    * [[compactKeyIndexBucketed]] is therefore a true LSM merge, not
    * just a file rewrite: it re-aggregates split rows while
    * compacting, and the serve answer cannot change because the serve
    * already sums.
    *
    * Nulls are exempt, matching [[graft.check.Checks.unique]] / SQL
    * convention: a null key tuple is a `required` problem, not a
    * uniqueness one.
    */
  private def keyCounts(df: DataFrame, keys: Seq[String]): DataFrame =
    df.filter(keys.map(df(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(df(_)): _*)
      .agg(count(lit(1)).as("n"))

  private def checkKeyMeta(spark: SparkSession, table: String,
      keys: Seq[String]): Unit = {
    val built = spark.table(s"${table}_meta")
      .select(col("keys")).head.getString(0)
    require(built == keys.mkString(","),
      s"key index at $table was built on ($built) but is being served " +
        s"on (${keys.mkString(",")}) — a different key set silently " +
        "reports zero collisions")
  }

  def writeKeyIndexBucketed(df: DataFrame, table: String,
      keys: Seq[String], numBuckets: Int): Unit = {
    Scratch.sweepOnce(df.sparkSession)
    Bucketing.writeBucketed(keyCounts(df, keys), s"${table}_keys",
      keys, numBuckets)
    df.sparkSession.range(1).select(lit(keys.mkString(",")).as("keys"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  /** Admit a checked batch's keys into the standing index: only the
    * delta aggregates and shuffles into the table's bucket layout;
    * standing files are untouched. Key columns are validated against
    * the build-time `_meta` record first.
    */
  def appendKeyIndexBucketed(delta: DataFrame, table: String,
      keys: Seq[String]): Unit = {
    val spark = delta.sparkSession
    checkKeyMeta(spark, table, keys)
    Bucketing.appendBucketed(keyCounts(delta, keys), s"${table}_keys",
      keys, Bucketing.numBucketsOf(spark, s"${table}_keys"))
  }

  /** Re-read the standing key index (bucket metadata from the
    * catalog). Rows are RAW LSM rows — consumers must merge per key
    * ([[graft.check.Checks.uniqueAgainstIndex]] does; FK serving
    * doesn't need to, an anti join ignores right-side multiplicity).
    */
  def readKeyIndexBucketed(spark: SparkSession, table: String,
      keys: Seq[String]): DataFrame = {
    checkKeyMeta(spark, table, keys)
    Bucketing.readBucketed(spark, s"${table}_keys")
  }

  /** DELETE keys from the standing index WITHOUT touching history
    * files — LSM tombstones: the deleted rows' per-key counts are
    * appended NEGATED, and because every serve path aggregates with
    * `sum(n)` per key, a fully-deleted key contributes exactly zero
    * from the moment the tombstone lands. This is the
    * right-to-be-forgotten shape at 100 TB: no rewrite of years of
    * standing files, one batch-sized append; the next
    * [[compactKeyIndexBucketed]] collapses tombstones physically
    * (zero-total rows are dropped by the merge). Contract: delete
    * rows that were actually ingested — over-deleting drives a key's
    * total negative, which no serve interprets.
    */
  def deleteFromKeyIndexBucketed(deleted: DataFrame, table: String,
      keys: Seq[String]): Unit = {
    val spark = deleted.sparkSession
    checkKeyMeta(spark, table, keys)
    Bucketing.appendBucketed(
      keyCounts(deleted, keys).withColumn("n", -col("n")),
      s"${table}_keys", keys,
      Bucketing.numBucketsOf(spark, s"${table}_keys"))
  }

  /** True LSM merge-compaction: re-aggregate rows a key accumulated
    * across appends AND rewrite to one file per non-empty bucket,
    * DROPPING keys whose total reached zero (collapsed tombstones —
    * a fully-deleted key physically disappears here). The merge is a
    * groupBy on the bucket columns (exchange-free) and the serve
    * paths already sum per key, so the served answer is invariant —
    * asserted in BucketingSpec alongside the file-count drop.
    */
  def compactKeyIndexBucketed(spark: SparkSession, table: String): Unit =
    Bucketing.compactBucketed(spark, s"${table}_keys", df => {
      val keys = df.columns.filter(_ != "n").toSeq
      df.groupBy(keys.map(df(_)): _*).agg(sum(col("n")).as("n"))
        .filter(col("n") =!= 0)
    })

  // ------------------------- key index, versioned (round-14 #2 cont.)
  /** The key index on [[BucketedManifest]] gen-manifests (round-15 —
    * the second family on the table format, chosen because it is the
    * LSM one: split rows, NEGATED-COUNT tombstones, and a
    * merge-compaction that must re-aggregate INTO the merged
    * generation prove the store's `merges` hook carries the full LSM
    * algebra, not just file layout). Every append — admissions AND
    * tombstones alike — is an atomic versioned commit, so the key
    * history is time-travelable per batch with no freeze step. The
    * substring family followed in round 16, edit-distance and pHash
    * in round 17 — all five bucketed families now live on the table
    * format, and the pointer store is retired.
    */
  def writeKeyIndexBucketedVersioned(df: DataFrame, table: String,
      keys: Seq[String], numBuckets: Int): Unit = {
    val spark = df.sparkSession
    Scratch.sweepOnce(spark)
    BucketedManifest.create(spark, table,
      Seq((s"${table}_keys", keyCounts(df, keys), keys, numBuckets)))
    spark.range(1).select(lit(keys.mkString(",")).as("keys"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_meta")
  }

  /** Admit a delta's count rows as a new version (returns it). */
  def appendKeyIndexBucketedVersioned(delta: DataFrame, table: String,
      keys: Seq[String]): Int = {
    checkKeyMeta(delta.sparkSession, table, keys)
    BucketedManifest.append(delta.sparkSession, table,
      Seq((s"${table}_keys", keyCounts(delta, keys))))
  }

  /** RAW LSM rows of the current version — consumers merge per key,
    * like [[readKeyIndexBucketed]].
    */
  def readKeyIndexBucketedVersioned(spark: SparkSession, table: String,
      keys: Seq[String]): DataFrame = {
    checkKeyMeta(spark, table, keys)
    BucketedManifest.read(spark, table, s"${table}_keys")
  }

  /** RAW LSM rows as of version `v` — the key history at that commit. */
  def readKeyIndexBucketedVersionedAsOf(spark: SparkSession,
      table: String, keys: Seq[String], v: Int): DataFrame = {
    checkKeyMeta(spark, table, keys)
    BucketedManifest.readVersion(spark, table, s"${table}_keys", v)
  }

  /** Negated-count tombstones, committed as their own version
    * ([[deleteFromKeyIndexBucketed]]'s contract — deletion is part of
    * the auditable history too).
    */
  def deleteFromKeyIndexBucketedVersioned(deleted: DataFrame,
      table: String, keys: Seq[String]): Unit = {
    checkKeyMeta(deleted.sparkSession, table, keys)
    BucketedManifest.append(deleted.sparkSession, table,
      Seq((s"${table}_keys",
        keyCounts(deleted, keys).withColumn("n", -col("n"))))): Unit
  }

  private def keyMergeFn(df: DataFrame): DataFrame = {
    val keys = df.columns.filter(_ != "n").toSeq
    df.groupBy(keys.map(df(_)): _*).agg(sum(col("n")).as("n"))
      .filter(col("n") =!= 0)
  }

  /** The LSM merge-compaction as version publication: split rows
    * re-aggregate, zero-total keys (collapsed tombstones) drop, and
    * the result lands as ONE merged generation — readers of older
    * versions keep their generations until vacuum.
    */
  def compactKeyIndexBucketedVersioned(spark: SparkSession,
      table: String): Unit =
    BucketedManifest.compact(spark, table,
      merges = Map(s"${table}_keys".toLowerCase -> (keyMergeFn _)))

  /** Size-tiered cadence for the versioned key index: the smallest
    * generations MERGE (with the LSM re-aggregation — split rows
    * collapse, zero-totals drop within the merged part), big standing
    * generations are referenced untouched. Serve-invariant: consumers
    * sum per key, and re-aggregating a subset of generations never
    * changes a key's total.
    */
  def maybeCompactKeyIndexBucketedVersioned(spark: SparkSession,
      table: String, maxGens: Int): Boolean =
    BucketedManifest.compactTiered(spark, table, maxGens,
      merges = Map(s"${table}_keys".toLowerCase -> (keyMergeFn _)))

  /** Build + persist the IVF index under an explicit centroid frame
    * (pass [[Similarity.firstIdCentroids]] output for the
    * deterministic plumbing path or [[Similarity.kmeansCentroids]]
    * for the quality path — the artifact records whichever was used,
    * since serving MUST probe with the same centroids the index was
    * built with).
    */
  def writeIvfIndex(corpus: DataFrame, centroids: DataFrame,
      dir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    Scratch.sweepOnce(corpus.sparkSession)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    Similarity.ivfIndexWith(corpus, centroids, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$dir/ivf.parquet")
  }

  /** Re-read the IVF artifacts: (index, centroids). */
  def readIvfIndex(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/ivf.parquet"),
      spark.read.parquet(s"$dir/centroids.parquet"))

  /** Admit a vector batch into the standing IVF artifact: only the
    * delta is normalized and assigned (against the ARTIFACT's own
    * centroids — serving must probe with the centroids the index was
    * built with, so the append reads them back rather than taking a
    * caller frame), landing as appended files under `ivf.parquet`.
    * Assignment is a pure per-vector function of the static centroids,
    * so append(build(base), delta) ≡ build(base ∪ delta) row-for-row —
    * x_sim_ivf_append proves it by sharing the full-corpus serve
    * oracle verbatim.
    */
  def appendIvfIndex(delta: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = delta.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
    Similarity.ivfIndexWith(delta, cents, idCol, vecCol)
      .write.mode("append").parquet(s"$dir/ivf.parquet")
  }

  /** Tombstone DELETION for the dir-based IVF artifact (round-13 —
    * the similarity family's right-to-be-forgotten path, completing
    * the per-document families'): dead vector ids append to
    * `dead.parquet`, the standing (id, nvec, list_id) rows untouched.
    * Unlike the pair-output families, exclusion must happen BEFORE
    * ranking — a dropped neighbor is replaced by the next-best, so
    * serving anti-joins the ENC frame ([[readIvfIndexLive]]), never
    * the output. Centroids are the routing MODEL, not corpus content:
    * deleting a vector never removes a centroid (re-fitting is a
    * rebuild decision, exactly like any trained model). The
    * tombstone-presence check and the purge swap use local File ops
    * (the harness shape, like [[Bucketing.compactBucketedTiered]]);
    * an object-store deployment swaps them for its FileSystem.
    */
  def deleteFromIvfIndex(ids: DataFrame, dir: String): Unit =
    ids.select(col("id"))
      .write.mode("append").parquet(s"$dir/dead.parquet")

  /** The IVF artifact's standing tombstone set; the empty fallback's
    * id type comes from the artifact itself.
    */
  def readIvfDeadIds(spark: SparkSession, dir: String): DataFrame =
    if (new java.io.File(s"$dir/dead.parquet").exists())
      spark.read.parquet(s"$dir/dead.parquet")
    else spark.read.parquet(s"$dir/ivf.parquet")
      .select(col("id")).limit(0)

  /** (index minus tombstoned ids, centroids) — the frame serving must
    * rank over while tombstones are pending.
    */
  def readIvfIndexLive(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (enc, cents) = readIvfIndex(spark, dir)
    (enc.join(readIvfDeadIds(spark, dir), Seq("id"), "left_anti"), cents)
  }

  /** Physically remove tombstoned vectors from `ivf.parquet` (rewrite
    * + the rename-aside swap — the original survives under some name
    * at every crash point, the [[Bucketing.compactBucketed]]
    * discipline) and clear the tombstones. Serve answer invariant
    * (IvfDeleteSpec: live serve ≡ rebuild-without-deleted ≡
    * post-purge serve).
    */
  def purgeIvfIndex(spark: SparkSession, dir: String): Unit =
    rewriteFlatArtifact(spark, dir, "ivf.parquet",
      readIvfDeadIds(spark, dir))

  /** FILE compaction for the dir-based IVF artifact: every admitted
    * batch ([[appendIvfIndex]]) lands as its own file set under
    * `ivf.parquet`, so a long-lived ingest loop accumulates
    * one-file-per-batch fragmentation exactly like the bucketed LSM
    * families — this rewrites the LIVE rows into `targetFiles` files
    * (pending tombstones fold in and clear, the bucketed compacts'
    * purge-on-compact discipline) with the same rename-aside swap.
    * Pure layout change: x_sim_ivf_compact shares x_sim_ivf_topk's
    * oracle verbatim through a build-half / append-half / compact
    * cycle, and SimArtifactLifecycleSpec asserts the file count
    * actually dropped.
    */
  def compactIvfIndex(spark: SparkSession, dir: String,
      targetFiles: Int = 1): Unit =
    rewriteFlatArtifact(spark, dir, "ivf.parquet",
      readIvfDeadIds(spark, dir), targetFiles)

  /** The IVF artifact on [[VersionedFlat]] manifests instead of an
    * in-place leaf: the enc frame lives under `dir/enc` as immutable
    * batch dirs behind an atomically-swapped version pointer, so
    * appends and compactions never mutate what a concurrent reader
    * holds and every version stays time-travelable until vacuumed.
    * Centroids remain a plain leaf — the routing model is written once
    * and never rewritten, so it needs no versioning. Serving any
    * version must equal building from that version's corpus directly
    * (assignment is a pure per-vector function of the static
    * centroids): x_sim_ivf_versioned shares x_sim_ivf_topk's oracle
    * through a write/append/compact cycle and x_sim_ivf_time_travel
    * pins version 1's serve to an evens-only recompute.
    */
  def writeIvfIndexVersioned(corpus: DataFrame, centroids: DataFrame,
      dir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    Scratch.sweepOnce(corpus.sparkSession)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    VersionedFlat.write(
      Similarity.ivfIndexWith(corpus, centroids, idCol, vecCol),
      s"$dir/enc")
  }

  /** [[appendIvfIndex]] on the versioned store: the delta is assigned
    * against the artifact's own persisted centroids and published as a
    * new version (previous batches referenced, not rewritten).
    */
  def appendIvfIndexVersioned(delta: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val cents = delta.sparkSession.read
      .parquet(s"$dir/centroids.parquet")
    VersionedFlat.append(
      Similarity.ivfIndexWith(delta, cents, idCol, vecCol), s"$dir/enc")
  }

  /** File compaction on the versioned store: the merged batch is
    * PUBLISHED as a new version rather than swapped in place — readers
    * holding any older version keep their files until vacuum. By
    * default this is LAYOUT-ONLY — tombstones keep masking at serve
    * time and the dead bytes stay until a purge publishes the excluded
    * frame, because in a store whose versions are immutable snapshots,
    * silently erasing rows during a compact would contradict what time
    * travel promises. That deliberately DIVERGES from
    * [[compactIvfIndex]] (the flat twin folds and clears pending
    * tombstones), so the divergence is a call-site-visible FLAG
    * (round-13 ADVICE): `purgeTombstones = true` opts into the flat
    * twin's fold-and-clear semantics (≡ [[purgeIvfIndexVersioned]]
    * with coalescing) for callers that want one verb for both stores.
    */
  def compactIvfIndexVersioned(spark: SparkSession, dir: String,
      targetFiles: Int = 1, purgeTombstones: Boolean = false): Unit =
    if (purgeTombstones) purgeIvfIndexVersioned(spark, dir, targetFiles)
    else VersionedFlat.compact(spark, s"$dir/enc", targetFiles)

  /** (enc of version `asOf` — 0 = current, centroids). */
  def readIvfIndexVersioned(spark: SparkSession, dir: String,
      asOf: Int = 0): (DataFrame, DataFrame) =
    ((if (asOf > 0) VersionedFlat.readVersion(spark, s"$dir/enc", asOf)
      else VersionedFlat.read(spark, s"$dir/enc")),
      spark.read.parquet(s"$dir/centroids.parquet"))

  /** ROLLBACK of the versioned IVF artifact's enc family
    * ([[VersionedFlat.rollback]] — round-16): revert a poisoned
    * admission by reference; the bad version stays time-travelable,
    * the centroids (the artifact's immutable model) are untouched,
    * and serving the current version afterwards equals serving the
    * rolled-back-to version.
    */
  def rollbackIvfIndexVersioned(spark: SparkSession, dir: String,
      v: Int): Int =
    VersionedFlat.rollback(s"$dir/enc", v)

  /** The tombstone algebra composed onto the versioned store — same
    * `dead.parquet` + anti-join-before-ranking as the flat artifact
    * ([[deleteFromIvfIndex]]), with one honest difference a
    * right-to-be-forgotten pipeline must know: tombstones mask SERVING
    * immediately (any version, via [[readIvfIndexVersionedLive]]), but
    * the bytes persist in older versions' batch dirs until
    * [[purgeIvfIndexVersioned]] publishes the excluded frame AND
    * [[VersionedFlat.vacuum]] drops the versions that still hold them
    * — physical erasure is purge + vacuum, by construction of
    * time travel.
    */
  def deleteFromIvfIndexVersioned(ids: DataFrame, dir: String): Unit =
    ids.select(col("id"))
      .write.mode("append").parquet(s"$dir/dead.parquet")

  def readIvfVersionedDeadIds(spark: SparkSession,
      dir: String): DataFrame =
    if (new java.io.File(s"$dir/dead.parquet").exists())
      spark.read.parquet(s"$dir/dead.parquet")
    else VersionedFlat.read(spark, s"$dir/enc")
      .select(col("id")).limit(0)

  /** (current enc minus tombstoned ids, centroids). */
  def readIvfIndexVersionedLive(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (enc, cents) = readIvfIndexVersioned(spark, dir)
    (enc.join(readIvfVersionedDeadIds(spark, dir), Seq("id"),
      "left_anti"), cents)
  }

  /** Publish the tombstone-excluded frame as the next version and
    * clear the tombstones — publish STRICTLY BEFORE the clear, so a
    * crash between the two leaves pending tombstones whose anti-join
    * over the already-purged rows is a harmless no-op. Older versions
    * still hold the dead rows until vacuum (see
    * [[deleteFromIvfIndexVersioned]]).
    *
    * The base version is captured FIRST and passed to
    * [[VersionedFlat.replace]] as `basedOn` (round-14 ADVICE): the
    * excluded frame is computed from exactly that version, so an
    * append that commits between the capture and the CAS raises
    * ConcurrentModificationException instead of being silently erased
    * by a purge built from a now-stale snapshot.
    */
  def purgeIvfIndexVersioned(spark: SparkSession, dir: String,
      targetFiles: Int = 1): Unit = {
    val v = VersionedFlat.currentVersion(s"$dir/enc")
    VersionedFlat.replace(
      VersionedFlat.readVersion(spark, s"$dir/enc", v)
        .join(readIvfVersionedDeadIds(spark, dir), Seq("id"),
          "left_anti"),
      s"$dir/enc", targetFiles, basedOn = v)
    deleteDirTree(new java.io.File(s"$dir/dead.parquet"))
  }

  /** The int8 artifact on [[VersionedFlat]] manifests — the second
    * wiring, showing the store is artifact-agnostic: int8 has NO model
    * leaf at all (per-vector scales), so the whole artifact IS the
    * versioned frame and `write` owns the directory outright. Batches
    * land PACKED (tinyint q, the [[writeInt8Index]] discipline) and
    * [[VersionedFlat.compact]]'s raw rewrite preserves the packed
    * schema through the merged batch — asserted in
    * SimArtifactLifecycleSpec. Serving any version decodes exactly as
    * the flat reader does; x_sim_quantized_versioned shares
    * x_sim_quantized's oracle through a write/append/compact cycle.
    */
  def writeInt8IndexVersioned(corpus: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    Scratch.sweepOnce(corpus.sparkSession)
    VersionedFlat.write(packedInt8(corpus, idCol, vecCol), dir)
  }

  def appendInt8IndexVersioned(delta: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    VersionedFlat.append(packedInt8(delta, idCol, vecCol), dir)

  /** The current (or `asOf`) version decoded for serving — tinyint →
    * double is exact, so versioned serves hash-match the flat path.
    */
  def readInt8IndexVersioned(spark: SparkSession, dir: String,
      asOf: Int = 0): DataFrame =
    (if (asOf > 0) VersionedFlat.readVersion(spark, dir, asOf)
     else VersionedFlat.read(spark, dir))
      .select(col("id"),
        transform(col("q"), x => x.cast("double")).as("q"),
        col("scale"))

  /** One quantize+pack projection shared by the flat and versioned
    * int8 writers.
    */
  private def packedInt8(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    Similarity.int8Index(df, idCol, vecCol)
      .select(col("id"),
        transform(col("q"), x => x.cast("tinyint")).as("q"),
        col("scale"))

  /** Rewrite a flat (per-vector) artifact leaf minus `dead` ids with
    * the rename-aside swap — the original survives under SOME name at
    * every crash point, the [[Bucketing.compactBucketed]] discipline —
    * then clear the tombstones. `targetFiles > 0` coalesces the
    * rewrite (compaction); 0 keeps the write's natural partitioning
    * (purge). The read is RAW (no decode/re-encode), so packed schemas
    * — the int8 leaf's tinyint q — survive the rewrite byte-exact.
    */
  private def rewriteFlatArtifact(spark: SparkSession, dir: String,
      leaf: String, dead: DataFrame, targetFiles: Int = 0): Unit = {
    val tmp = new java.io.File(s"$dir/${leaf}__purge")
    val cur = new java.io.File(s"$dir/$leaf")
    val old = new java.io.File(s"$dir/${leaf}__old")
    val live = spark.read.parquet(cur.getPath)
      .join(dead, Seq("id"), "left_anti")
    (if (targetFiles > 0) live.coalesce(targetFiles) else live)
      .write.mode("overwrite").parquet(tmp.getPath)
    deleteDirTree(old)
    java.nio.file.Files.move(cur.toPath, old.toPath)
    java.nio.file.Files.move(tmp.toPath, cur.toPath)
    deleteDirTree(old)
    deleteDirTree(new java.io.File(s"$dir/dead.parquet"))
  }

  private def deleteDirTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteDirTree)
    f.delete(): Unit
  }

  /** Persist the int8-quantized corpus: `int8.parquet` (id long,
    * q array<tinyint> in [-127, 127], scale double). THE quantized
    * serving artifact a 100 TB corpus persists — and since round 13
    * the artifact REALIZES the packing on disk instead of deferring it
    * to "a production sink": q is stored as one-byte TINYINTs (4×
    * smaller than float32, 8× than the doubles the pre-round-13
    * artifact wrote; Int8PackSpec measures the on-disk ratio).
    * Quantized values are exact integers in [-127, 127], so the
    * tinyint cast on write and the double cast on read
    * ([[readInt8Index]]) both round-trip EXACTLY — index-served
    * rankings stay hash-equal to the in-memory path
    * (x_sim_quantized_served shares x_sim_quantized's oracle
    * verbatim).
    */
  def writeInt8Index(corpus: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    Scratch.sweepOnce(corpus.sparkSession)
    packedInt8(corpus, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$dir/int8.parquet")
  }

  /** LSM APPEND for the int8 artifact: only the delta is normalized,
    * quantized, and packed — per-vector quantization has NO fitted
    * state (each row's scale is its own max-abs), so
    * append(build(base), delta) ≡ build(base ∪ delta) row-for-row and
    * x_sim_quantized_append shares x_sim_quantized's oracle verbatim.
    */
  def appendInt8Index(delta: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    // fail loudly on an unbuilt store (round-13 ADVICE): int8 is the
    // one artifact whose append needs no model read-back, so without
    // this check mode("append") would silently CREATE a partial
    // artifact where every other family's append fails
    require(new java.io.File(s"$dir/int8.parquet").exists(),
      s"no int8 artifact at $dir — build with writeInt8Index first " +
        "(appending into a never-built store would silently create a " +
        "partial corpus)")
    packedInt8(delta, idCol, vecCol)
      .write.mode("append").parquet(s"$dir/int8.parquet")
  }

  /** Re-read the int8 artifact as (id, q array<double>, scale) — the
    * exact frame [[graft.ext.Similarity.quantizedTopKFromIndex]]
    * consumes: every tinyint is an exactly-representable double, so
    * the widening cast reconstructs the in-memory quantized frame
    * bit-for-bit.
    */
  def readInt8Index(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/int8.parquet")
      .select(col("id"),
        transform(col("q"), x => x.cast("double")).as("q"),
        col("scale"))

  /** Tombstone DELETION for the int8 artifact — the IVF pattern on
    * the flat (id, q, scale) corpus: dead ids append to
    * `dead.parquet`; [[readInt8IndexLive]] anti-joins BEFORE ranking
    * (exclusion must precede top-k); [[purgeInt8Index]] rewrites the
    * artifact minus dead rows (tinyint schema preserved — the rewrite
    * never decodes q) with the rename-aside swap and clears the
    * tombstones. The same ten lines transplant to the PQ/IVF-PQ code
    * tables when needed — all the similarity artifacts are flat
    * per-vector frames.
    */
  def deleteFromInt8Index(ids: DataFrame, dir: String): Unit =
    ids.select(col("id"))
      .write.mode("append").parquet(s"$dir/dead.parquet")

  def readInt8DeadIds(spark: SparkSession, dir: String): DataFrame =
    if (new java.io.File(s"$dir/dead.parquet").exists())
      spark.read.parquet(s"$dir/dead.parquet")
    else spark.read.parquet(s"$dir/int8.parquet")
      .select(col("id")).limit(0)

  /** The int8 corpus minus tombstoned ids, decoded for serving. */
  def readInt8IndexLive(spark: SparkSession, dir: String): DataFrame =
    readInt8Index(spark, dir)
      .join(readInt8DeadIds(spark, dir), Seq("id"), "left_anti")

  def purgeInt8Index(spark: SparkSession, dir: String): Unit =
    // raw read inside the helper: q stays tinyint through the rewrite
    rewriteFlatArtifact(spark, dir, "int8.parquet",
      readInt8DeadIds(spark, dir))

  /** [[compactIvfIndex]] for the int8 artifact (appends fragment
    * `int8.parquet` the same way); the raw rewrite preserves the
    * packed tinyint schema.
    */
  def compactInt8Index(spark: SparkSession, dir: String,
      targetFiles: Int = 1): Unit =
    rewriteFlatArtifact(spark, dir, "int8.parquet",
      readInt8DeadIds(spark, dir), targetFiles)

  /** Persist a PQ index: `codebooks.parquet` (j int, code int,
    * cvec array<double>, bias double — m·ks rows, the whole model) and
    * `codes.parquet` (id long, codes array<int> — m small codes per
    * corpus vector, the state that stays in executor memory when float
    * vectors cannot). Plain parquet an external engine can consume;
    * the codebook doubles round-trip bit-identically, so
    * [[readPqModel]] + [[graft.ext.Similarity.pqTopKFromCodes]]
    * reproduce the in-memory ranking exactly.
    */
  private def codebookFrame(spark: SparkSession,
      model: Similarity.PqModel): DataFrame = {
    import spark.implicits._
    (for (j <- 0 until model.m; c <- 0 until model.ks)
      yield (j, c, model.codebooks(j)(c).toSeq, model.biases(j)(c)))
      .toDF("j", "code", "cvec", "bias")
      .coalesce(1)
  }

  def writePqIndex(corpus: DataFrame, model: Similarity.PqModel,
      dir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    Scratch.sweepOnce(corpus.sparkSession)
    codebookFrame(corpus.sparkSession, model)
      .write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    Similarity.pqEncode(corpus, model, idCol, vecCol)
      .select(col("id"), col("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes.parquet")
  }

  /** LSM APPEND for the PQ code table: the delta is encoded against
    * the artifact's OWN persisted codebooks ([[readPqModel]] — the
    * fitted model is read back, never re-fitted or taken from the
    * caller, the [[appendIvfIndex]] discipline) and its code rows land
    * as appended files. Encoding is a pure per-vector function of the
    * static model, so append(build(base), delta) ≡ build(base ∪ delta)
    * and x_sim_pq_append shares x_sim_pq's fitted-literal dynamic
    * oracle verbatim.
    */
  def appendPqIndex(delta: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    Similarity.pqEncode(delta, readPqModel(delta.sparkSession, dir),
        idCol, vecCol)
      .select(col("id"), col("codes"))
      .write.mode("append").parquet(s"$dir/codes.parquet")

  /** Tombstone DELETION for the PQ code table — the documented
    * ten-line transplant of the flat-artifact pattern: dead ids append
    * to `dead.parquet`; [[readPqCodesLive]] anti-joins the codes
    * BEFORE ranking; [[purgePqIndex]] rewrites `codes.parquet` minus
    * dead rows with the rename-aside swap. The codebooks — the fitted
    * model — stay, like the IVF centroids.
    */
  def deleteFromPqIndex(ids: DataFrame, dir: String): Unit =
    ids.select(col("id"))
      .write.mode("append").parquet(s"$dir/dead.parquet")

  def readPqDeadIds(spark: SparkSession, dir: String): DataFrame =
    if (new java.io.File(s"$dir/dead.parquet").exists())
      spark.read.parquet(s"$dir/dead.parquet")
    else spark.read.parquet(s"$dir/codes.parquet")
      .select(col("id")).limit(0)

  /** The PQ corpus codes minus tombstoned ids. */
  def readPqCodesLive(spark: SparkSession, dir: String): DataFrame =
    readPqCodes(spark, dir)
      .join(readPqDeadIds(spark, dir), Seq("id"), "left_anti")

  def purgePqIndex(spark: SparkSession, dir: String): Unit =
    rewriteFlatArtifact(spark, dir, "codes.parquet",
      readPqDeadIds(spark, dir))

  /** [[compactIvfIndex]] for the PQ code table. */
  def compactPqIndex(spark: SparkSession, dir: String,
      targetFiles: Int = 1): Unit =
    rewriteFlatArtifact(spark, dir, "codes.parquet",
      readPqDeadIds(spark, dir), targetFiles)

  // ------------------------------------------- PQ versioned (round-14)
  /** The PQ artifact on [[VersionedFlat]] manifests — round-14
    * directive #1, the third wiring (int8 at [[writeInt8IndexVersioned]]
    * was the template): the (id, codes) frame lives under `dir/codes`
    * as immutable batch dirs behind the manifest chain, so appends and
    * compactions never mutate what a concurrent reader holds and every
    * version stays time-travelable until vacuumed. The codebooks — the
    * fitted MODEL — remain a plain write-once leaf exactly like the
    * IVF centroids: deleting or admitting vectors never refits a model
    * (a refit is a rebuild decision). Encoding is a pure per-vector
    * function of the static model, so serving any version equals
    * building from that version's corpus directly — x_sim_pq_versioned
    * shares x_sim_pq's fitted-literal dynamic oracle through a
    * write/append/compact cycle.
    */
  def writePqIndexVersioned(corpus: DataFrame, model: Similarity.PqModel,
      dir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    Scratch.sweepOnce(corpus.sparkSession)
    codebookFrame(corpus.sparkSession, model)
      .write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    VersionedFlat.write(
      Similarity.pqEncode(corpus, model, idCol, vecCol)
        .select(col("id"), col("codes")),
      s"$dir/codes")
  }

  /** [[appendPqIndex]] on the versioned store: the delta is encoded
    * against the artifact's OWN persisted codebooks and published as a
    * new version (previous batches referenced, not rewritten).
    */
  def appendPqIndexVersioned(delta: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    VersionedFlat.append(
      Similarity.pqEncode(delta, readPqModel(delta.sparkSession, dir),
          idCol, vecCol)
        .select(col("id"), col("codes")),
      s"$dir/codes")

  /** [[compactIvfIndexVersioned]]'s contract for the PQ code table:
    * layout-only by default (tombstones keep masking; time travel
    * keeps its bytes), fold-and-clear under the explicit flag.
    */
  def compactPqIndexVersioned(spark: SparkSession, dir: String,
      targetFiles: Int = 1, purgeTombstones: Boolean = false): Unit =
    if (purgeTombstones) purgePqIndexVersioned(spark, dir, targetFiles)
    else VersionedFlat.compact(spark, s"$dir/codes", targetFiles)

  /** The code frame of version `asOf` (0 = current). */
  def readPqCodesVersioned(spark: SparkSession, dir: String,
      asOf: Int = 0): DataFrame =
    if (asOf > 0) VersionedFlat.readVersion(spark, s"$dir/codes", asOf)
    else VersionedFlat.read(spark, s"$dir/codes")

  /** The tombstone algebra on the versioned PQ store — same
    * `dead.parquet` + anti-join-before-ranking as the flat twin, with
    * the versioned stores' honest difference: tombstones mask serving
    * immediately, the bytes persist in older versions until purge +
    * vacuum (see [[deleteFromIvfIndexVersioned]]).
    */
  def deleteFromPqIndexVersioned(ids: DataFrame, dir: String): Unit =
    ids.select(col("id"))
      .write.mode("append").parquet(s"$dir/dead.parquet")

  def readPqVersionedDeadIds(spark: SparkSession,
      dir: String): DataFrame =
    if (new java.io.File(s"$dir/dead.parquet").exists())
      spark.read.parquet(s"$dir/dead.parquet")
    else readPqCodesVersioned(spark, dir).select(col("id")).limit(0)

  /** The current code frame minus tombstoned ids — exclusion BEFORE
    * ADC ranking, so next-best neighbors promote in.
    */
  def readPqCodesVersionedLive(spark: SparkSession,
      dir: String): DataFrame =
    readPqCodesVersioned(spark, dir)
      .join(readPqVersionedDeadIds(spark, dir), Seq("id"), "left_anti")

  /** Publish the tombstone-excluded code frame as the next version and
    * clear the tombstones — publish STRICTLY BEFORE the clear
    * ([[purgeIvfIndexVersioned]]'s crash discipline, including its
    * captured `basedOn` stale-frame guard).
    */
  def purgePqIndexVersioned(spark: SparkSession, dir: String,
      targetFiles: Int = 1): Unit = {
    val v = VersionedFlat.currentVersion(s"$dir/codes")
    VersionedFlat.replace(
      VersionedFlat.readVersion(spark, s"$dir/codes", v)
        .join(readPqVersionedDeadIds(spark, dir), Seq("id"),
          "left_anti"),
      s"$dir/codes", targetFiles, basedOn = v)
    deleteDirTree(new java.io.File(s"$dir/dead.parquet"))
  }

  /** Persist the COMPOSED IVF-PQ index — the 100 TB ANN architecture
    * end to end on disk: `centroids.parquet` (probe routing),
    * `codebooks.parquet` (the model), `ivfpq.parquet` (id, list_id,
    * codes — one row of a list id plus m small codes per corpus
    * vector, built in one normalized pass). Serving reads all three
    * and never touches the float corpus again
    * ([[graft.ext.Similarity.ivfPqTopKFromIndex]]); doubles
    * round-trip parquet bit-identically, so x_sim_ivf_pq_served
    * shares x_sim_ivf_pq's oracle verbatim.
    */
  def writeIvfPqIndex(corpus: DataFrame, model: Similarity.PqModel,
      centroids: DataFrame, dir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    Scratch.sweepOnce(corpus.sparkSession)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    codebookFrame(corpus.sparkSession, model)
      .write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    Similarity.ivfPqIndex(corpus, model, centroids, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$dir/ivfpq.parquet")
  }

  /** Re-read the IVF-PQ artifacts: (enc, centroids); the model comes
    * from [[readPqModel]] on the same dir.
    */
  def readIvfPqIndex(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/ivfpq.parquet"),
      spark.read.parquet(s"$dir/centroids.parquet"))

  /** LSM APPEND for the composed IVF-PQ artifact: the delta is
    * assigned AND encoded against the artifact's own persisted
    * centroids + codebooks (both model halves read back — admission
    * never re-fits either), landing as appended (id, list_id, codes)
    * files. Both steps are pure per-vector functions of the static
    * model, so append ≡ full rebuild and x_sim_ivf_pq_append shares
    * x_sim_ivf_pq's fitted-literal dynamic oracle verbatim.
    */
  def appendIvfPqIndex(delta: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = delta.sparkSession
    Similarity.ivfPqIndex(delta, readPqModel(spark, dir),
        spark.read.parquet(s"$dir/centroids.parquet"), idCol, vecCol)
      .write.mode("append").parquet(s"$dir/ivfpq.parquet")
  }

  /** Tombstone DELETION for the composed IVF-PQ artifact — the same
    * flat-artifact pattern ([[deleteFromPqIndex]]); centroids AND
    * codebooks (both model halves) stay.
    */
  def deleteFromIvfPqIndex(ids: DataFrame, dir: String): Unit =
    ids.select(col("id"))
      .write.mode("append").parquet(s"$dir/dead.parquet")

  def readIvfPqDeadIds(spark: SparkSession, dir: String): DataFrame =
    if (new java.io.File(s"$dir/dead.parquet").exists())
      spark.read.parquet(s"$dir/dead.parquet")
    else spark.read.parquet(s"$dir/ivfpq.parquet")
      .select(col("id")).limit(0)

  /** (enc minus tombstoned ids, centroids). */
  def readIvfPqIndexLive(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (enc, cents) = readIvfPqIndex(spark, dir)
    (enc.join(readIvfPqDeadIds(spark, dir), Seq("id"), "left_anti"),
      cents)
  }

  def purgeIvfPqIndex(spark: SparkSession, dir: String): Unit =
    rewriteFlatArtifact(spark, dir, "ivfpq.parquet",
      readIvfPqDeadIds(spark, dir))

  /** [[compactIvfIndex]] for the composed IVF-PQ code table. */
  def compactIvfPqIndex(spark: SparkSession, dir: String,
      targetFiles: Int = 1): Unit =
    rewriteFlatArtifact(spark, dir, "ivfpq.parquet",
      readIvfPqDeadIds(spark, dir), targetFiles)

  // --------------------------------------- IVF-PQ versioned (round-14)
  /** The composed IVF-PQ artifact on [[VersionedFlat]] manifests — the
    * last similarity artifact onto the store (round-14 directive #1):
    * the (id, list_id, codes) frame lives under `dir/enc` behind the
    * manifest chain; BOTH model halves (centroids for probe routing,
    * codebooks for ADC) stay plain write-once leaves. Assignment and
    * encoding are pure per-vector functions of the static models, so
    * serving any version equals building from that version's corpus —
    * x_sim_ivf_pq_versioned shares x_sim_ivf_pq's fitted-literal
    * dynamic oracle through a write/append/compact cycle. With this,
    * every flat similarity artifact (IVF, int8, PQ, IVF-PQ) has a
    * reader-snapshot-safe versioned twin; the bucketed catalog
    * families' versioning lives on [[BucketedManifest]].
    */
  def writeIvfPqIndexVersioned(corpus: DataFrame,
      model: Similarity.PqModel, centroids: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    Scratch.sweepOnce(corpus.sparkSession)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    codebookFrame(corpus.sparkSession, model)
      .write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    VersionedFlat.write(
      Similarity.ivfPqIndex(corpus, model, centroids, idCol, vecCol),
      s"$dir/enc")
  }

  /** [[appendIvfPqIndex]] on the versioned store: the delta is
    * assigned AND encoded against the artifact's own persisted model
    * halves, published as a new version.
    */
  def appendIvfPqIndexVersioned(delta: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = delta.sparkSession
    VersionedFlat.append(
      Similarity.ivfPqIndex(delta, readPqModel(spark, dir),
        spark.read.parquet(s"$dir/centroids.parquet"), idCol, vecCol),
      s"$dir/enc")
  }

  /** [[compactIvfIndexVersioned]]'s contract for the IVF-PQ enc
    * table: layout-only by default, fold-and-clear under the flag.
    */
  def compactIvfPqIndexVersioned(spark: SparkSession, dir: String,
      targetFiles: Int = 1, purgeTombstones: Boolean = false): Unit =
    if (purgeTombstones) purgeIvfPqIndexVersioned(spark, dir,
      targetFiles)
    else VersionedFlat.compact(spark, s"$dir/enc", targetFiles)

  /** (enc of version `asOf` — 0 = current, centroids). */
  def readIvfPqIndexVersioned(spark: SparkSession, dir: String,
      asOf: Int = 0): (DataFrame, DataFrame) =
    ((if (asOf > 0) VersionedFlat.readVersion(spark, s"$dir/enc", asOf)
      else VersionedFlat.read(spark, s"$dir/enc")),
      spark.read.parquet(s"$dir/centroids.parquet"))

  /** Versioned IVF-PQ tombstones — [[deleteFromPqIndexVersioned]]'s
    * contract; both model halves stay.
    */
  def deleteFromIvfPqIndexVersioned(ids: DataFrame, dir: String): Unit =
    ids.select(col("id"))
      .write.mode("append").parquet(s"$dir/dead.parquet")

  def readIvfPqVersionedDeadIds(spark: SparkSession,
      dir: String): DataFrame =
    if (new java.io.File(s"$dir/dead.parquet").exists())
      spark.read.parquet(s"$dir/dead.parquet")
    else VersionedFlat.read(spark, s"$dir/enc")
      .select(col("id")).limit(0)

  /** (current enc minus tombstoned ids, centroids) — exclusion before
    * probe-join and ranking.
    */
  def readIvfPqIndexVersionedLive(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (enc, cents) = readIvfPqIndexVersioned(spark, dir)
    (enc.join(readIvfPqVersionedDeadIds(spark, dir), Seq("id"),
      "left_anti"), cents)
  }

  /** Publish the tombstone-excluded enc frame as the next version and
    * clear the tombstones (publish strictly before the clear, with
    * [[purgeIvfIndexVersioned]]'s captured `basedOn` stale-frame
    * guard).
    */
  def purgeIvfPqIndexVersioned(spark: SparkSession, dir: String,
      targetFiles: Int = 1): Unit = {
    val v = VersionedFlat.currentVersion(s"$dir/enc")
    VersionedFlat.replace(
      VersionedFlat.readVersion(spark, s"$dir/enc", v)
        .join(readIvfPqVersionedDeadIds(spark, dir), Seq("id"),
          "left_anti"),
      s"$dir/enc", targetFiles, basedOn = v)
    deleteDirTree(new java.io.File(s"$dir/dead.parquet"))
  }

  /** Reconstruct the PqModel from the codebook artifact (bounded:
    * m·ks rows of ds doubles — driver-side by the same contract as
    * the fit that produced it).
    */
  def readPqModel(spark: SparkSession, dir: String): Similarity.PqModel = {
    val rows = spark.read.parquet(s"$dir/codebooks.parquet")
      .select(col("j"), col("code"), col("cvec"), col("bias"))
      .collect()
    require(rows.nonEmpty, s"empty PQ codebook artifact at $dir")
    val m = rows.iterator.map(_.getInt(0)).max + 1
    val ks = rows.iterator.map(_.getInt(1)).max + 1
    require(rows.length == m * ks,
      s"PQ codebook artifact at $dir has ${rows.length} rows, " +
        s"expected $m×$ks")
    val codebooks = Array.ofDim[Array[Double]](m, ks)
    val biases = Array.ofDim[Double](m, ks)
    rows.foreach { r =>
      codebooks(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      biases(r.getInt(0))(r.getInt(1)) = r.getDouble(3)
    }
    Similarity.PqModel(m, ks, codebooks(0)(0).length, codebooks, biases)
  }

  /** Re-read the PQ corpus codes: (id, codes). */
  def readPqCodes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/codes.parquet")
}
