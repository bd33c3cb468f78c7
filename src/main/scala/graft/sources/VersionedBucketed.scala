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
  * Crash anatomy: compaction creates `__v(N+1)` fully, then swaps the
  * pointer. A crash in between leaves an orphan version table ABOVE
  * the pointer; [[recover]] (run at the head of every compact) drops
  * such orphans, so the retry is clean. The pointer file move is
  * atomic, so readers always resolve a complete table.
  *
  * Single-writer per family by contract (the families' ingest loops
  * already are); the pointer discipline matches [[VersionedFlat]]'s
  * hint so a multi-writer upgrade has one shape to follow.
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

  /** Physical catalog-table name of `family`'s version `v`. */
  def versionName(family: String, v: Int): String = s"${family}__v$v"

  /** The live version number (0 if the family is uninitialized). */
  def currentVersion(spark: SparkSession, family: String): Int = {
    val p = ptrFile(spark, family)
    if (!p.exists()) 0
    else new String(java.nio.file.Files.readAllBytes(p.toPath), "UTF-8")
      .trim.toInt
  }

  /** The live physical table name; fails loudly when uninitialized. */
  def liveName(spark: SparkSession, family: String): String = {
    val v = currentVersion(spark, family)
    require(v > 0,
      s"$family is not an initialized VersionedBucketed family")
    versionName(family, v)
  }

  private def swapPointer(spark: SparkSession, family: String,
      v: Int): Unit = {
    val p = ptrFile(spark, family)
    val tmp = new java.io.File(p.getParentFile,
      s".${p.getName}.p${ProcessHandle.current().pid()}.tmp")
    java.nio.file.Files.write(tmp.toPath, s"$v\n".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, p.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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

  /** Drop orphan version tables ABOVE the pointer (a compaction that
    * crashed between table-create and pointer-swap). Idempotent; run
    * at the head of every [[compact]].
    */
  private def recover(spark: SparkSession, family: String): Unit = {
    val cur = currentVersion(spark, family)
    versionsOf(spark, family).filter(_ > cur)
      .foreach(dropVersion(spark, family, _))
  }

  /** Initialize the family with `df` as version 1 (drops any prior
    * versions and pointer — the write-once init, like
    * [[VersionedFlat.write]]).
    */
  def write(df: DataFrame, family: String, keys: Seq[String],
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    versionsOf(spark, family).foreach(dropVersion(spark, family, _))
    java.nio.file.Files.deleteIfExists(ptrFile(spark, family).toPath)
    Bucketing.writeBucketed(df, versionName(family, 1), keys, numBuckets)
    swapPointer(spark, family, 1)
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
    * manifest, which is the full table-format design the scaladoc on
    * [[VersionedBucketed]] already credits). The external CREATE
    * re-declares the live bucket spec verbatim, so serve joins over
    * the snapshot carry the same exchange-free contract — asserted in
    * VersionedBucketedSpec. Returns the new live version number.
    */
  def snapshot(spark: SparkSession, family: String): Int = {
    recover(spark, family)
    val v = currentVersion(spark, family)
    require(v > 0,
      s"$family is not an initialized VersionedBucketed family")
    val cur = versionName(family, v)
    val next = versionName(family, v + 1)
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
    if (dstDir.exists()) { // crashed prior attempt's debris
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
    swapPointer(spark, family, v + 1)
    v + 1
  }

  private def deleteDir(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteDir)
    f.delete(): Unit
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
    recover(spark, family)
    val v = currentVersion(spark, family)
    require(v > 0,
      s"$family is not an initialized VersionedBucketed family")
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
    val w = merge(spark.read.schema(meta.schema)
        .parquet(meta.location.toString))
      .repartition(n, keys.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .bucketBy(n, keys.head, keys.tail: _*)
    (if (sorts.nonEmpty) w.sortBy(sorts.head, sorts.tail: _*) else w)
      .format("parquet")
      .saveAsTable(next)
    swapPointer(spark, family, v + 1)
  }

  /** Drop version tables older than the `retain` most recent (their
    * files go with the managed tables — physical reclamation happens
    * HERE, never during compact) plus any orphans above the pointer.
    * The live version always survives.
    */
  def vacuum(spark: SparkSession, family: String,
      retain: Int = 1): Unit = {
    val cur = currentVersion(spark, family)
    require(cur > 0,
      s"$family is not an initialized VersionedBucketed family")
    val keepMin = math.max(1, cur - math.max(1, retain) + 1)
    versionsOf(spark, family)
      .filter(v => v < keepMin || v > cur)
      .foreach(dropVersion(spark, family, _))
  }
}
