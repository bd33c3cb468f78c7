package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Version-pointer compaction for BUCKETED catalog tables — the
  * bucketed-family half of the [[VersionedFlat]] story (round-14
  * directive #2).
  *
  * [[Bucketing.compactBucketed]]'s catalog swap (`table` → `table__old`
  * → drop) is crash-safe for the WRITER but deletes the old file
  * listing out from under a concurrent reader the moment `__old` is
  * dropped — the same 1000-reader hazard the flat artifacts had before
  * their manifests. A bucketed table can't simply ride
  * [[VersionedFlat]]: the exchange-free serve contract NEEDS the
  * catalog's bucket metadata, and a manifest-listed path read loses it.
  * So the version unit here is a whole CATALOG TABLE:
  *
  *   - `{family}__vN`       an immutable bucketed table — the complete
  *                          bucket file set of version N at its birth
  *                          (appends ADD files to the LIVE version, see
  *                          below); bucket spec identical across
  *                          versions
  *   - `{family}__current`  a pointer FILE in the warehouse dir naming
  *                          the live version, swapped with the
  *                          tmp + ATOMIC_MOVE discipline
  *
  * Readers resolve the pointer once and hold `spark.table` of a
  * version; COMPACTION writes the merged one-file-per-bucket rewrite
  * as a NEW version table and repoints — the old version's files are
  * untouched until [[vacuum]] drops the whole table, so a reader frame
  * captured before the compaction still collects after it (the
  * snapshot-isolation property the swap could never give), and the
  * serve plan over the new version carries the same catalog bucket
  * metadata (exchange-free, re-asserted in VersionedBucketedSpec).
  *
  * APPENDS deliberately stay in-place on the live version:
  * [[Bucketing.appendBucketed]] only ADDS files, which cannot
  * invalidate a captured listing (the captured files all still exist —
  * the reader just serves the slightly older snapshot it captured, as
  * any snapshot reader does). Versioning every append would need the
  * new version to re-reference the standing files, i.e. a per-FILE
  * manifest riding the bucket metadata — the [[VersionedFlat]] shape —
  * which the catalog cannot express without a table format underneath;
  * deletion is the hazard, and only compaction deletes.
  *
  * == Commit protocol (claim/commit markers, round-15) ==
  *
  * Until round 14 the store was single-writer by contract: the pointer
  * swap was a blind ATOMIC_MOVE and the version table a
  * `mode("overwrite")` create, so two racing compactors/snapshotters
  * would clobber each other. The protocol is now the flat store's
  * optimistic concurrency, adapted to catalog-table versions:
  *
  *  1. CLAIM version N+1: create-if-absent of the
  *     `{family}__claim-(N+1)` marker (an atomic `createDirectory` —
  *     the POSIX create-if-absent primitive; an object store uses a
  *     conditional PUT). Losing the claim means another writer owns
  *     N+1: [[snapshot]] re-reads the head and retries at the new
  *     version if it advanced; [[compact]] fails loudly — its rewrite
  *     was computed from a base that is either about to be superseded
  *     (concurrent writer) or blocked by a crashed claimant
  *     ([[recover]] clears those, quiesced by contract).
  *  2. BUILD the version table `__v(N+1)` fully. The build may
  *     `overwrite` — holding the claim makes the name ours, and
  *     overwriting reclaims any PRE-PROTOCOL orphan debris for free.
  *  3. COMMIT: create the `{family}__commit-(N+1)` marker. Marker
  *     existence IS commit — the committed chain is dense, and
  *     [[currentVersion]] probes forward from the pointer HINT until
  *     the chain ends (the [[VersionedFlat.currentVersion]] shape).
  *  4. ADVANCE the pointer hint (forward-only; losing this race is
  *     harmless, the probe closes any lag).
  *
  * Crash anatomy: a crash before the commit marker leaves a claim (and
  * possibly a table) ABOVE the committed head — invisible to every
  * reader; [[recover]] (explicit, run quiesced — it cannot tell a
  * crashed claimant from a live one, the same contract as
  * [[VersionedFlat.vacuum]]'s orphan collection) drops such orphans.
  * After the marker the version is committed regardless of what else
  * the writer meant to do.
  */
object VersionedBucketed {

  private def warehouse(spark: SparkSession): java.io.File = {
    val w = spark.conf.get("spark.sql.warehouse.dir")
    val uri = new java.net.URI(w)
    val f = if (uri.getScheme == null) new java.io.File(w)
      else new java.io.File(uri)
    f.mkdirs()
    f
  }

  private def ptrFile(spark: SparkSession, family: String): java.io.File =
    new java.io.File(warehouse(spark), s"${family.toLowerCase}__current")

  /** Every version table's data directory, derived from the warehouse
    * and the version name alone — the convention [[attach]] relies on
    * to re-find a lost catalog's tables (and the same path a managed
    * table would have had, so pre-round-16 layouts are unchanged).
    */
  private def versionDir(spark: SparkSession, name: String): java.io.File =
    new java.io.File(warehouse(spark), name.toLowerCase)

  /** Physical catalog-table name of `family`'s version `v`. */
  def versionName(family: String, v: Int): String = s"${family}__v$v"

  private def markerFile(spark: SparkSession, family: String,
      kind: String, v: Int): java.io.File =
    new java.io.File(warehouse(spark),
      s"${family.toLowerCase}__$kind-$v")

  /** Atomic create-if-absent of a claim/commit marker (an empty dir —
    * `createDirectory` is the POSIX conditional PUT). True = ours.
    */
  private def createMarker(spark: SparkSession, family: String,
      kind: String, v: Int): Boolean =
    try {
      java.nio.file.Files.createDirectory(
        markerFile(spark, family, kind, v).toPath)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }

  /** The live version number (0 if the family is uninitialized): the
    * pointer file is a HINT — probe forward along the dense committed
    * chain of `__commit-N` markers until it ends.
    */
  def currentVersion(spark: SparkSession, family: String): Int = {
    val p = ptrFile(spark, family)
    var v =
      if (!p.exists()) 0
      else new String(java.nio.file.Files.readAllBytes(p.toPath),
        "UTF-8").trim.toInt
    while (markerFile(spark, family, "commit", v + 1).exists()) v += 1
    v
  }

  /** The live physical table name; fails loudly when uninitialized. */
  def liveName(spark: SparkSession, family: String): String = {
    val v = currentVersion(spark, family)
    require(v > 0,
      s"$family is not an initialized VersionedBucketed family")
    versionName(family, v)
  }

  /** Per-process tmp-name uniquifier (two threads of one process
    * racing a hint advance must not share a tmp file).
    */
  private val tmpNonce = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Move the pointer HINT forward to `v` if it lags (forward-only;
    * the commit markers are truth, so a raced or crashed advance only
    * costs the probe extra existence checks).
    */
  private def advanceHint(spark: SparkSession, family: String,
      v: Int): Unit = {
    val p = ptrFile(spark, family)
    val pointed =
      if (!p.exists()) 0
      else new String(java.nio.file.Files.readAllBytes(p.toPath),
        "UTF-8").trim.toInt
    if (v > pointed) {
      val tmp = new java.io.File(p.getParentFile,
        s".${p.getName}.p${ProcessHandle.current().pid()}" +
          s"t${tmpNonce.incrementAndGet()}.tmp")
      java.nio.file.Files.write(tmp.toPath, s"$v\n".getBytes("UTF-8"))
      java.nio.file.Files.move(tmp.toPath, p.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Claim version `v`, build its table via `build`, commit, advance
    * the hint — the shared publication engine of [[snapshot]] and
    * [[compact]]. False = the claim was lost (a concurrent writer or
    * a crashed claimant holds `v`); nothing was written.
    */
  private def publish(spark: SparkSession, family: String, v: Int)
      (build: => Unit): Boolean = {
    if (!createMarker(spark, family, "claim", v)) return false
    build
    require(createMarker(spark, family, "commit", v),
      s"commit marker for $family v$v already exists under our claim " +
        "— protocol violation")
    advanceHint(spark, family, v)
    true
  }

  private def versionsOf(spark: SparkSession,
      family: String): Seq[Int] = {
    val re = java.util.regex.Pattern
      .compile(java.util.regex.Pattern.quote(family) + "__v(\\d+)",
        java.util.regex.Pattern.CASE_INSENSITIVE)
    spark.catalog.listTables().collect().toSeq
      .flatMap { t =>
        val m = re.matcher(t.name)
        if (m.matches()) Some(m.group(1).toInt) else None
      }
  }

  /** Drop crashed writers' debris ABOVE the committed head: claims
    * without commit markers and the orphan tables under them.
    * EXPLICIT and quiesced-by-contract (it cannot tell a crashed
    * claimant from a live writer mid-build — the same contract as
    * [[VersionedFlat.vacuum]]'s orphan collection); the live protocol
    * never needs it, a lost claim just fails loudly or retries.
    * Idempotent.
    */
  def recover(spark: SparkSession, family: String): Unit = {
    val cur = currentVersion(spark, family)
    versionsOf(spark, family).filter(_ > cur)
      .foreach(dropVersion(spark, family, _))
    Option(warehouse(spark).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter { f =>
        val m = java.util.regex.Pattern.compile(
          java.util.regex.Pattern.quote(family.toLowerCase) +
            "__claim-(\\d+)").matcher(f.getName)
        m.matches() && m.group(1).toInt > cur
      }
      .foreach(f => deleteDir(f))
  }

  /** Initialize the family with `df` as version 1 (drops any prior
    * versions, markers, and pointer — the write-once init, like
    * [[VersionedFlat.write]]; single-writer by contract, concurrent
    * writers join at the versioned operations). The table is EXTERNAL
    * from birth (explicit path — round-16, matching
    * [[BucketedManifest]]'s posture): the catalog entry is a CACHE,
    * losing it must never delete data, and [[attach]] re-derives it
    * from the warehouse directory and the markers alone.
    */
  def write(df: DataFrame, family: String, keys: Seq[String],
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    versionsOf(spark, family).foreach(dropVersion(spark, family, _))
    Option(warehouse(spark).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.matches(java.util.regex.Pattern.quote(
        family.toLowerCase) + "__(claim|commit)-\\d+"))
      .foreach(deleteDir)
    java.nio.file.Files.deleteIfExists(ptrFile(spark, family).toPath)
    val v1 = versionName(family, 1)
    val ok = publish(spark, family, 1) {
      df.write.mode("overwrite")
        .option("path", versionDir(spark, v1).getPath)
        .bucketBy(numBuckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .format("parquet")
        .saveAsTable(v1)
    }
    require(ok, s"init of $family raced a concurrent writer — " +
      "initialization is single-writer by contract")
  }

  /** The live version's frame, with catalog bucket metadata (the
    * exchange-free serve contract rides along).
    */
  def read(spark: SparkSession, family: String): DataFrame =
    spark.table(liveName(spark, family))

  /** Time travel: version `v`'s table as a snapshot-at-publication.
    * Honest semantics difference from [[VersionedFlat.readVersion]]:
    * appends land in-place on the live version, so the LIVE version's
    * content moves with admissions; a SUPERSEDED version is frozen (it
    * stops receiving appends the moment the pointer passes it). Fails
    * loudly when `v` was vacuumed or never existed.
    */
  def readVersion(spark: SparkSession, family: String,
      v: Int): DataFrame = {
    require(spark.catalog.tableExists(versionName(family, v)),
      s"version $v of $family does not exist (never written, or " +
        "vacuumed)")
    spark.table(versionName(family, v))
  }

  /** Admit a delta into the LIVE version — in-place file ADDS via
    * [[Bucketing.appendBucketed]] under the live table's own bucket
    * spec (adds never invalidate a captured listing; see the object
    * scaladoc for why appends are not versioned).
    *
    * CONCURRENCY CONTRACT: append is an UNCOORDINATED in-place write
    * resolved against [[liveName]] — it takes no claim, so it must
    * NOT run concurrently with [[compact]], [[compactTiered]], or
    * [[snapshot]] (only those three are mutually safe through the
    * claim/commit protocol). An append racing a compaction can land
    * its files in the superseded version AFTER the rewrite's file
    * listing, silently omitting the delta from the new live version.
    * Concurrent appends against each other are safe (file adds under
    * distinct names). A family that needs concurrent append+compact
    * should live on [[BucketedManifest]], where appends are claimed,
    * versioned commits.
    */
  def append(df: DataFrame, family: String): Unit = {
    val spark = df.sparkSession
    val live = liveName(spark, family)
    val spec = spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(live))
      .bucketSpec
    require(spec.isDefined, s"table $live is not bucketed")
    Bucketing.appendBucketed(df, live,
      spec.get.bucketColumnNames, spec.get.numBuckets)
  }

  /** FREEZE the live version — append-level snapshots without a data
    * copy (round-14 follow-through on the honest [[readVersion]] note
    * that only superseded versions are frozen): version v+1 is
    * published as an EXTERNAL bucketed table over a new directory of
    * HARD LINKS to the live version's current data files, and the
    * pointer moves to it. From that instant the old version's file set
    * is fixed forever (appends only ever target the live version), so
    * calling `snapshot` after each ingest batch gives the bucketed
    * families the same commit-granularity time travel the flat
    * manifests give — at O(files) metadata cost, zero bytes copied.
    * Hard links also make retention composable for free: a vacuumed
    * version's directory deletion only drops link counts, never bytes
    * a retained snapshot still references.
    *
    * Local-filesystem shape, like every store here (an object-store
    * deployment has no links — it would name the shared files in a
    * manifest, which is [[BucketedManifest]]). The external CREATE
    * re-declares the live bucket spec verbatim, so serve joins over
    * the snapshot carry the same exchange-free contract — asserted in
    * VersionedBucketedSpec. Concurrency: the version is claimed
    * first; losing the claim re-reads the head and retries at the new
    * version (two racing snapshotters both succeed, at consecutive
    * versions), and a claim held with NO head advance fails loudly
    * (in-flight or crashed claimant — [[recover]] clears the latter).
    * Returns the new live version number.
    */
  def snapshot(spark: SparkSession, family: String,
      maxRetries: Int = 20): Int = {
    var attempts = 0
    while (attempts < maxRetries) {
      val v = currentVersion(spark, family)
      require(v > 0,
        s"$family is not an initialized VersionedBucketed family")
      if (publish(spark, family, v + 1) {
        buildSnapshotClone(spark, family, v)
      }) return v + 1
      // claim lost: if the head advanced a concurrent writer won —
      // retry there; if not, the claimant is in flight or crashed
      if (currentVersion(spark, family) == v)
        throw new IllegalStateException(
          s"version ${v + 1} of $family is claimed but not committed " +
            "— a concurrent writer is in flight, or a crashed claim " +
            "blocks the slot (run recover() when quiesced)")
      attempts += 1
    }
    throw new IllegalStateException(
      s"snapshot of $family lost the version claim $maxRetries times " +
        "— pathological contention")
  }

  /** ROLLBACK: re-publish version `v`'s content as the NEXT live
    * version (round-16 — undo parity with
    * [[BucketedManifest.rollback]] and [[VersionedFlat.rollback]]):
    * the new version's directory is a zero-copy hard-link clone of
    * version `v`'s files, published through the claim/commit
    * protocol, so a poisoned in-place append or a bad compaction is
    * reverted without rewriting a byte — the bad versions stay
    * time-travelable until [[vacuum]]. Requires version `v` to still
    * exist (not vacuumed). Fails loudly on claim contention like
    * [[compact]]. Returns the committed version.
    */
  def rollback(spark: SparkSession, family: String, v: Int): Int = {
    val cur = currentVersion(spark, family)
    require(cur > 0,
      s"$family is not an initialized VersionedBucketed family")
    require(spark.catalog.tableExists(versionName(family, v)),
      s"version $v of $family does not exist (never written, or " +
        "vacuumed) — cannot roll back to it")
    val committed = publish(spark, family, cur + 1) {
      buildClone(spark, family, src = v, dst = cur + 1)
    }
    if (!committed) {
      if (currentVersion(spark, family) > cur)
        throw new java.util.ConcurrentModificationException(
          s"version ${cur + 1} of $family was committed concurrently " +
            "— recompute and retry the rollback")
      throw new IllegalStateException(
        s"version ${cur + 1} of $family is claimed but not committed " +
          "— a concurrent writer is in flight, or a crashed claim " +
          "blocks the slot (run recover() when quiesced)")
    }
    cur + 1
  }

  /** The hard-link clone build of [[snapshot]]: version v+1's
    * directory is populated with links to version v's current files
    * and declared as an external bucketed table with v's spec.
    */
  private def buildSnapshotClone(spark: SparkSession, family: String,
      v: Int): Unit = buildClone(spark, family, src = v, dst = v + 1)

  /** Link-clone version `src`'s file set into a fresh directory and
    * declare it as external table `dst` with `src`'s spec — the
    * shared build of [[snapshot]] (src = live head) and [[rollback]]
    * (src = any retained version).
    */
  private def buildClone(spark: SparkSession, family: String,
      src: Int, dst: Int): Unit = {
    val cur = versionName(family, src)
    val next = versionName(family, dst)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(cur))
    val spec = meta.bucketSpec
    require(spec.isDefined, s"table $cur is not bucketed")
    require(meta.location.getScheme == null ||
      meta.location.getScheme == "file",
      s"snapshot supports local tables, got ${meta.location}")
    val srcDir = new java.io.File(meta.location)
    val dstDir = new java.io.File(srcDir.getParentFile,
      next.toLowerCase)
    if (dstDir.exists()) { // pre-protocol debris (we hold the claim)
      require(!spark.catalog.tableExists(next),
        s"$next exists without being an orphan — refusing to clobber")
      deleteDir(dstDir)
    }
    java.nio.file.Files.createDirectory(dstDir.toPath)
    Option(srcDir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .foreach(f => java.nio.file.Files.createLink(
        new java.io.File(dstDir, f.getName).toPath, f.toPath))
    val keys = spec.get.bucketColumnNames
    val sorts = spec.get.sortColumnNames
    val sortClause = if (sorts.isEmpty) ""
      else sorts.mkString(" SORTED BY (`", "`, `", "`)")
    spark.sql(
      s"""CREATE TABLE `$next` (${meta.schema.toDDL})
         |USING PARQUET
         |CLUSTERED BY (${keys.mkString("`", "`, `", "`")})
         |$sortClause
         |INTO ${spec.get.numBuckets} BUCKETS
         |LOCATION '${dstDir.getPath}'""".stripMargin)
  }

  private def deleteDir(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteDir)
    f.delete(): Unit
  }

  /** SIZE-TIERED versioned compaction (round-15 directive #3 — the
    * hard-link hybrid the round-14 verdict named): version v+1's
    * directory is populated with LINKS to every cold bucket's files
    * and a fresh one-file merge of every HOT bucket (>=
    * `minFilesPerBucket` data files), then declared as an external
    * table with the live spec and published through the claim/commit
    * protocol. Cost is O(hot buckets' bytes) like
    * [[Bucketing.compactBucketedTiered]], but with full snapshot
    * isolation: the live version's files are never touched (its
    * readers and time travelers keep them), and no per-bucket crash
    * protocol is needed — the whole new directory is invisible until
    * the commit marker lands; a crash leaves an orphan claim
    * [[recover]] clears. Cold files are shared by LINK, so vacuuming
    * either version only drops link counts, never bytes the other
    * still references. Returns the number of buckets rewritten
    * (0 = nothing was hot; no version is published in that case).
    */
  def compactTiered(spark: SparkSession, family: String,
      minFilesPerBucket: Int): Int = {
    require(minFilesPerBucket >= 2,
      s"minFilesPerBucket must be >= 2, got $minFilesPerBucket")
    val v = currentVersion(spark, family)
    require(v > 0,
      s"$family is not an initialized VersionedBucketed family")
    val cur = versionName(family, v)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(cur))
    val spec = meta.bucketSpec
    require(spec.isDefined, s"table $cur is not bucketed")
    require(meta.location.getScheme == null ||
      meta.location.getScheme == "file",
      s"tiered compaction supports local tables, got ${meta.location}")
    val srcDir = new java.io.File(meta.location)
    val byBucket = Option(srcDir.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .flatMap(f => Bucketing.bucketIdOf(f.getName).map(_ -> f))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val hot = byBucket.filter(_._2.length >= minFilesPerBucket)
    if (hot.isEmpty) return 0
    val sorts = spec.get.sortColumnNames
    val next = versionName(family, v + 1)
    val committed = publish(spark, family, v + 1) {
      val dstDir = new java.io.File(srcDir.getParentFile,
        next.toLowerCase)
      if (dstDir.exists()) { // pre-protocol debris (we hold the claim)
        require(!spark.catalog.tableExists(next),
          s"$next exists without being an orphan — refusing to clobber")
        deleteDir(dstDir)
      }
      java.nio.file.Files.createDirectory(dstDir.toPath)
      var nonce = 0
      byBucket.toSeq.sortBy(_._1).foreach { case (bucket, files) =>
        if (files.length >= minFilesPerBucket) {
          // hot: one-file merge, written to scratch, moved in under a
          // bucket-suffixed name Spark's scan parses
          nonce += 1
          val scratch = java.nio.file.Files
            .createTempDirectory(s"graft_vtiered_$family").toFile
          val rows = spark.read.schema(meta.schema)
            .parquet(files.map(_.getPath): _*)
            .coalesce(1)
          (if (sorts.nonEmpty)
            rows.sortWithinPartitions(
              sorts.map(org.apache.spark.sql.functions.col): _*)
          else rows)
            .write.mode("overwrite")
            .option("compression", "snappy").parquet(scratch.getPath)
          val produced = Option(scratch.listFiles()).get
            .filter(f => f.getName.endsWith(".parquet") &&
              !f.getName.startsWith("."))
            .head
          val tag = s"p${ProcessHandle.current().pid()}x$nonce"
          java.nio.file.Files.move(produced.toPath,
            new java.io.File(dstDir,
              f"part-00000-graftvtiered$tag%s_$bucket%05d" +
                ".c000.snappy.parquet").toPath)
          deleteDir(scratch)
        } else
          // cold: shared by link — zero bytes copied or rewritten
          files.foreach(f => java.nio.file.Files.createLink(
            new java.io.File(dstDir, f.getName).toPath, f.toPath))
      }
      val keys = spec.get.bucketColumnNames
      val sortClause = if (sorts.isEmpty) ""
        else sorts.mkString(" SORTED BY (`", "`, `", "`)")
      spark.sql(
        s"""CREATE TABLE `$next` (${meta.schema.toDDL})
           |USING PARQUET
           |CLUSTERED BY (${keys.mkString("`", "`, `", "`")})
           |$sortClause
           |INTO ${spec.get.numBuckets} BUCKETS
           |LOCATION '${dstDir.getPath}'""".stripMargin)
    }
    if (!committed) {
      if (currentVersion(spark, family) > v)
        throw new java.util.ConcurrentModificationException(
          s"version ${v + 1} of $family was committed concurrently — " +
            "the tiered rewrite is stale; recompute and retry")
      throw new IllegalStateException(
        s"version ${v + 1} of $family is claimed but not committed — " +
          "a concurrent writer is in flight, or a crashed claim " +
          "blocks the slot (run recover() when quiesced)")
    }
    hot.size
  }

  /** Drop a version table AND its files — `DROP TABLE` alone leaves
    * an EXTERNAL table's directory (the snapshot clones) behind.
    */
  private def dropVersion(spark: SparkSession, family: String,
      v: Int): Unit = {
    val name = versionName(family, v)
    val loc: Option[java.io.File] =
      if (!spark.catalog.tableExists(name)) None
      else {
        val m = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(name))
        if (m.tableType ==
            org.apache.spark.sql.catalyst.catalog.CatalogTableType
              .EXTERNAL &&
            (m.location.getScheme == null ||
              m.location.getScheme == "file"))
          Some(new java.io.File(m.location))
        else None
      }
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    loc.foreach(deleteDir)
  }

  /** Compact the live version into a NEW version table (one file per
    * non-empty bucket, same bucket spec read from the catalog and
    * re-declared verbatim) and repoint — the old version's files stay
    * for its readers until [[vacuum]]. `merge` gives LSM families
    * their re-aggregation ([[Bucketing.compactBucketed]]'s contract:
    * schema-preserving, serve-invariant).
    */
  def compact(spark: SparkSession, family: String,
      merge: DataFrame => DataFrame = identity): Unit = {
    val v = currentVersion(spark, family)
    require(v > 0,
      s"$family is not an initialized VersionedBucketed family")
    val committed = publish(spark, family, v + 1) {
      val cur = versionName(family, v)
      val next = versionName(family, v + 1)
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(cur))
      val spec = meta.bucketSpec
      require(spec.isDefined, s"table $cur is not bucketed")
      val keys = spec.get.bucketColumnNames
      val sorts = spec.get.sortColumnNames
      val n = spec.get.numBuckets
      // path read under the catalog schema — the [[Bucketing
      // .compactBucketed]] discipline: a catalog read advertises the
      // bucket spec and the optimizer elides the repartition, spraying
      // one file per (task × bucket); the path read keeps the
      // repartition, aligning each writer task with exactly one bucket.
      // The explicit schema keeps an emptied LSM index compactable.
      // The overwrite is safe under our claim (and reclaims
      // pre-protocol orphan debris for free).
      val w = merge(spark.read.schema(meta.schema)
          .parquet(meta.location.toString))
        .repartition(n, keys.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite")
        .option("path", versionDir(spark, next).getPath)
        .bucketBy(n, keys.head, keys.tail: _*)
      (if (sorts.nonEmpty) w.sortBy(sorts.head, sorts.tail: _*) else w)
        .format("parquet")
        .saveAsTable(next)
    }
    if (!committed) {
      // Iceberg rewrite semantics ([[VersionedFlat.replace]]): the
      // rewrite was computed from version v — never blindly re-commit
      if (currentVersion(spark, family) > v)
        throw new java.util.ConcurrentModificationException(
          s"version ${v + 1} of $family was committed concurrently — " +
            "the compaction frame is stale; recompute and retry")
      throw new IllegalStateException(
        s"version ${v + 1} of $family is claimed but not committed — " +
          "a concurrent writer is in flight, or a crashed claim " +
          "blocks the slot (run recover() when quiesced)")
    }
  }

  /** Re-register a pointer-store family in a catalog that lost its
    * entries (round-16 directive #4 — the [[BucketedManifest.attach]]
    * story for this store): truth lives in the WAREHOUSE DIRECTORY —
    * the version data directories plus the claim/commit markers and
    * the pointer hint are all plain files that survive a metastore
    * loss, and [[currentVersion]] already resolves the head from them
    * without touching the catalog. Every committed version whose
    * directory still exists (vacuum may have dropped older ones) is
    * re-declared as an EXTERNAL bucketed table over it; after attach,
    * reads, time travel, appends, snapshots, and compactions work
    * exactly as before, including the exchange-free serve plan —
    * asserted in VersionedBucketedSpec.
    *
    * The bucket spec is caller-supplied for the same reason as
    * [[BucketedManifest.attach]]'s: the catalog entry that recorded
    * it is exactly what was lost, and attaching with a different spec
    * than the files were written with would break the exchange-free
    * contract silently — deployments carry (keys, sortKeys,
    * numBuckets) in their own config the way they carry the warehouse
    * path. Pure metadata: no data is read or written. Idempotent over
    * versions that already have entries.
    */
  def attach(spark: SparkSession, family: String, schemaDDL: String,
      keys: Seq[String], sortKeys: Seq[String],
      numBuckets: Int): Unit = {
    val cur = currentVersion(spark, family)
    require(cur > 0,
      s"$family has no committed chain in the warehouse — nothing " +
        "to attach")
    val sortClause = if (sortKeys.isEmpty) ""
      else sortKeys.mkString(" SORTED BY (`", "`, `", "`)")
    (1 to cur).foreach { v =>
      val name = versionName(family, v)
      val dir = versionDir(spark, name)
      if (dir.isDirectory && !spark.catalog.tableExists(name))
        spark.sql(
          s"""CREATE TABLE `$name` ($schemaDDL)
             |USING PARQUET
             |CLUSTERED BY (${keys.mkString("`", "`, `", "`")})
             |$sortClause
             |INTO $numBuckets BUCKETS
             |LOCATION '${dir.getPath}'""".stripMargin)
    }
  }

  /** Drop version tables older than the `retain` most recent (their
    * files go with the managed tables — physical reclamation happens
    * HERE, never during compact) plus any orphans above the committed
    * head, with their claim/commit markers. The live version always
    * survives; the hint is advanced to the true head first so the
    * retention window is measured from the real current (and the
    * probe keeps working after old commit markers are dropped).
    */
  def vacuum(spark: SparkSession, family: String,
      retain: Int = 1): Unit = {
    val cur = currentVersion(spark, family)
    require(cur > 0,
      s"$family is not an initialized VersionedBucketed family")
    advanceHint(spark, family, cur)
    recover(spark, family) // vacuum is quiesced-by-contract, like recover
    val keepMin = math.max(1, cur - math.max(1, retain) + 1)
    versionsOf(spark, family)
      .filter(_ < keepMin)
      .foreach(dropVersion(spark, family, _))
    val re = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(family.toLowerCase) +
        "__(claim|commit)-(\\d+)")
    Option(warehouse(spark).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter { f =>
        val m = re.matcher(f.getName)
        m.matches() && m.group(2).toInt < keepMin
      }
      .foreach(deleteDir)
  }
}
