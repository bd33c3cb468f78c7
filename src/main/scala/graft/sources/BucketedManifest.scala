package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** The gen-manifest bucketed store — the per-file table format for
  * bucketed index families (round-14 verdict item #1, the "last real
  * table-format item"), replacing the retired pointer store's
  * hard-link-freeze + catalog-table-per-version shape for families
  * that adopt it.
  *
  * == The design ==
  *
  * A FAMILY is one manifest chain plus one catalog table per MEMBER
  * (the MinHash index has two members, `…_sh` and `…_bands`; most
  * families have one). Each member table is created ONCE, partitioned
  * by a synthetic `gen` column and bucketed by the member's own keys:
  *
  *   - `{member}` catalog table, `PARTITIONED BY (gen)` +
  *     `CLUSTERED BY (keys) INTO n BUCKETS` — every write lands as a
  *     new immutable GENERATION (one partition directory); standing
  *     generations are never rewritten
  *   - `{warehouse}/{family}__manifest/` a [[VersionedFlat]]-protocol
  *     meta dir: `manifest-NNNNNN` files whose lines are
  *     `member:gen` pairs (the complete generation set of version N),
  *     a forward-only `CURRENT` hint, a forward-only `FLOOR`
  *     checkpoint hint (the lowest version whose manifest can still
  *     exist — [[vacuum]] advances it as manifests expire, so
  *     whole-chain metadata walks read O(retained), round-16 verdict
  *     item #1), and `g-NNNNNN` claim markers that make generation
  *     numbers collision-free under concurrent writers
  *
  * Readers resolve a manifest once and scan
  * `spark.table(member).where(gen IN gens)`: the gen predicate is a
  * PARTITION filter (only the named generations' files are read —
  * asserted in BucketedManifestSpec via the scan's partitionFilters),
  * and the scan still carries the catalog bucket spec, so the
  * exchange-free serve contract over the bucket keys survives
  * versioning verbatim (`outputPartitioning = hashpartitioning(keys,
  * n)` — the property the retired pointer store needed hard-linked
  * external-table clones for, obtained here with zero links and zero
  * per-version catalog entries).
  *
  * What this bought over the pointer store it retired (VersionedBucketed,
  * removed in round 17 once the last families migrated):
  *
  *   - APPENDS ARE VERSIONED. The pointer store's appends mutated the
  *     live version in place (version-per-append needed a per-file
  *     manifest the catalog cannot express — its own scaladoc names
  *     this store as the fix). Here every append commits a manifest:
  *     commit-granularity time travel with no freeze step at all —
  *     "snapshot" is reading the version an append returned.
  *   - MULTI-MEMBER COMMITS ARE ATOMIC. Both MinHash halves advance in
  *     ONE manifest link, so the crash-split the half-by-half freeze
  *     had (round-14 ADVICE: `_sh` frozen, `_bands` not) cannot exist:
  *     a crash mid-append leaves at worst invisible generation files
  *     no manifest references (vacuum collects them, age-gated).
  *   - MULTI-WRITER SAFE end to end (round-14 verdict item #3): gen
  *     claims are create-if-absent markers, manifest commits are the
  *     flat store's CAS (dot-tmp + fsync + atomic hard-link of the
  *     MANIFEST FILE — the one link in the design, a commit primitive,
  *     not a data-file clone); concurrent appends retry at the next
  *     version, concurrent compactions fail loudly
  *     ([[VersionedFlat.replace]]'s Iceberg rewrite semantics).
  *   - OBJECT-STORE POSTURE equals the flat store's: immutable puts
  *     (generation files), conditional PUT (manifests), last-writer-
  *     wins put (hint). No hard links anywhere near data files, no
  *     ATOMIC_MOVE pointer, no catalog-table-per-version metadata
  *     growth — the catalog holds exactly one table per member plus
  *     one partition entry per generation, and [[vacuum]] drops
  *     partitions as manifests expire.
  *
  * Compaction ([[compact]], and the size-tiered [[compactTiered]])
  * publishes MERGED generations and a manifest that references them —
  * old generations stay on disk for their versions' readers until
  * vacuum, so a captured frame never loses files mid-job (the
  * 1000-reader property). Tiered compaction references big standing
  * generations in the new manifest UNTOUCHED and rewrites only the
  * small ones — O(small generations) bytes, snapshot isolation
  * included, the hybrid round-14's verdict asked for (item #4) without
  * needing links: "reference, don't re-link".
  *
  * The generation write itself rides Spark's planned bucketed write
  * (one shuffle of the delta to the declared bucketing, standing files
  * untouched), exactly like [[Bucketing.appendBucketed]].
  */
object BucketedManifest {

  private def warehouse(spark: SparkSession): java.io.File = {
    val w = spark.conf.get("spark.sql.warehouse.dir")
    val uri = new java.net.URI(w)
    val f = if (uri.getScheme == null) new java.io.File(w)
      else new java.io.File(uri)
    f.mkdirs()
    f
  }

  /** The family's manifest meta dir (filesystem, beside the warehouse
    * tables — the pointer-file discipline the retired stores share
    * with [[VersionedFlat]]).
    */
  def metaDir(spark: SparkSession, family: String): String =
    new java.io.File(warehouse(spark),
      s"${family.toLowerCase}__manifest").getPath

  private def line(table: String, gen: Int): String =
    s"${table.toLowerCase}:$gen"

  private def parse(lines: Seq[String]): Seq[(String, Int)] =
    lines.map { l =>
      val i = l.lastIndexOf(':')
      require(i > 0, s"bad manifest line '$l'")
      (l.substring(0, i), l.substring(i + 1).toInt)
    }

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteTree)
    f.delete(): Unit
  }

  /** The live version number (0 if the family is uninitialized). */
  def currentVersion(spark: SparkSession, family: String): Int =
    VersionedFlat.currentVersion(metaDir(spark, family))

  /** The chain's checkpoint FLOOR — the lowest version whose manifest
    * can still exist ([[VersionedFlat.floorVersion]]); the observable
    * the O(retained)-metadata contract is asserted against.
    */
  def floor(spark: SparkSession, family: String): Int =
    VersionedFlat.floorVersion(metaDir(spark, family))

  /** CHECKPOINT the manifest chain (round-16 verdict item #1 —
    * Iceberg's snapshot-log compaction reduced to this store's
    * shape): advance the FLOOR hint to the lowest manifest that still
    * exists, so every whole-chain metadata walk ([[purgeMember]],
    * [[attach]]) starts there and reads O(retained manifests), not
    * O(every version ever committed). [[vacuum]] checkpoints
    * automatically as it expires manifests; this standalone op closes
    * a lagging floor (a crash between vacuum's deletion pass and its
    * advance) in O(lag) existence probes — the same recovery shape as
    * CURRENT's probe. Idempotent; never deletes anything; returns the
    * floor it established.
    */
  def checkpoint(spark: SparkSession, family: String): Int = {
    val meta = metaDir(spark, family)
    val cur = VersionedFlat.currentVersion(meta)
    require(cur > 0,
      s"$family is not an initialized BucketedManifest family")
    var v = VersionedFlat.floorVersion(meta)
    while (v < cur &&
        !new java.io.File(meta, f"manifest-$v%06d").exists()) v += 1
    VersionedFlat.advanceFloor(meta, v)
    v
  }

  private val tokenNonce = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Claim the next collision-free generation number (the claim
    * marker dir makes it safe under concurrent writers; a crashed
    * claim is an invisible orphan vacuum collects). The returned
    * OWNER TOKEN is a writer-unique file dropped inside the claim
    * dir: if an over-aggressive vacuum (orphanMinAgeMs below this
    * write's duration) collects the claim mid-flight and a concurrent
    * claimant re-creates `g-N`, the token is gone — [[requireClaim]]
    * then fails the original writer's COMMIT loudly instead of
    * letting two writers publish manifests that both reference
    * generation N with interleaved files (the silent-clobber path).
    */
  private def claimGen(meta: String): (Int, String) = {
    val (n, dir) = VersionedFlat.claimMarker(meta, "g-")
    val token = s"owner-p${ProcessHandle.current().pid()}" +
      s"t${tokenNonce.incrementAndGet()}"
    java.nio.file.Files.createFile(
      new java.io.File(dir, token).toPath)
    (n, token)
  }

  /** Fail loudly if this writer's claim on generation `gen` is no
    * longer held (vacuum collected it — and possibly another claimant
    * reused the number). Checked immediately before every manifest
    * commit attempt: a commit that proceeds after losing the claim
    * could reference a generation directory another writer now owns.
    */
  private def requireClaim(meta: String, gen: Int, token: String,
      family: String): Unit =
    require(new java.io.File(new java.io.File(meta, f"g-$gen%06d"),
        token).exists(),
      s"writer lost its claim on generation $gen of family $family — " +
        "vacuum ran with orphanMinAgeMs below this write's duration " +
        "and collected the claim mid-flight; the write is aborted to " +
        "avoid publishing a generation number another writer may now " +
        "own. Re-run the operation; set vacuum's orphanMinAgeMs above " +
        "the longest plausible write when writers run concurrently")

  /** Write one member's frame as generation `gen`.
    *
    * Init (table birth, single-writer by the caller's contract) is
    * pure DDL — the member is declared as an EXTERNAL table shell
    * over an empty directory (the same declaration [[attach]] makes
    * over an existing one), and generation 1 then lands through the
    * SAME staged-write + committer-publish path as every later
    * generation (round-16 verdict item #3): NO write in the store's
    * life rides Spark's table committer, so under the put committer
    * the family is rename-free from birth. The only init difference
    * is layout shaping: the delta-sizing `repartition(numBuckets)`
    * is skipped, keeping the corpus-sized birth write shuffle-free
    * and task-parallel (per-task per-bucket files — exactly the
    * layout the old `saveAsTable` bucketed birth produced; the first
    * compaction reaches one file per bucket as before).
    *
    * Every generation writes its parquet DIRECTLY into the `gen=N`
    * partition directory and registers the partition — deliberately
    * NOT a table-level insert:
    *
    *   - a `saveAsTable` append stages under the table-global
    *     `_temporary/0`, so two concurrent appenders clobber each
    *     other's attempt dirs (observed: chmod-on-missing-path task
    *     failures);
    *   - `insertInto` with dynamic partition overwrite has per-query
    *     staging, but the mode rides SESSION conf on the catalog path
    *     (the per-write option is silently ignored — verified
    *     empirically), and a conf flip racing another writer's insert
    *     degrades to a static overwrite that TRUNCATES every standing
    *     generation.
    *
    * The direct write is safe precisely because of the manifest gate:
    * the generation is invisible until its manifest commits, so there
    * is nothing to stage against — a crash leaves unreferenced debris
    * for the age-gated vacuum.
    *
    * Bucket-id file naming is derived from the DATA, never from the
    * writer task index: the frame gains a computed
    * `pmod(hash(keys), n)` column — `functions.hash` IS
    * HashPartitioning's Murmur3, the same identity
    * [[Bucketing.compactBucketed]] relies on — and is written
    * `partitionBy` that column into per-bucket subdirectories of a
    * STAGING directory, whose files are then PUBLISHED into the
    * generation directory under the `_NNNNN` bucket suffix Spark's
    * bucketed scan parses. (A first implementation renamed
    * `part-0000i` files by their task index after a
    * `repartition(n, keys)`; observed failure: on small deltas the
    * shuffle can collapse to fewer output partitions, one file then
    * holds several buckets' rows, and the misnamed file splits groups
    * under the exchange-free agg — the task index is NOT a bucket id,
    * only the routing column is.) The repartition stays as a
    * best-effort one-file-per-bucket layout hint; the sort runs on
    * (bucket, keys...) so the planned write's partition-column sort
    * requirement is already satisfied and each bucket file stays
    * key-sorted — required for the declared SORTED BY once a
    * compaction reaches one file per bucket.
    *
    * Publication rides the [[GenCommitter]] seam (round-16 directive
    * #3): the default [[RenameGenCommitter]] stages beside the
    * generation directory and moves files metadata-only (local/HDFS —
    * it alone carries the `file:`-scheme requirement), while
    * [[PutGenCommitter]] writes each final name as a fresh byte put
    * (the object-store discipline — no rename anywhere; safe because
    * the manifest gate keeps the generation invisible until its
    * commit). Concurrent writers on distinct claimed generations
    * never share a path.
    */
  private def writeGen(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int, gen: Int, init: Boolean): Unit = {
    val spark = df.sparkSession
    if (init) {
      // EXTERNAL from birth (explicit location): the catalog entry is
      // a CACHE over the manifest chain and the files — losing it (an
      // in-memory catalog in a fresh JVM, a metastore rebuild) must
      // never delete data, and [[attach]] re-derives the entry. The
      // shell is empty; the data lands below, through the committer.
      require(!df.schema.fieldNames.map(_.toLowerCase).contains("gen"),
        s"member $table's frame may not carry a 'gen' column — the " +
          "store owns that partition column")
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new java.io.File(warehouse(spark), table.toLowerCase)
      deleteTree(loc)
      loc.mkdirs(): Unit
      spark.sql(
        s"""CREATE TABLE `$table` (${df.schema.toDDL}, gen INT)
           |USING PARQUET
           |PARTITIONED BY (gen)
           |CLUSTERED BY (${keys.mkString("`", "`, `", "`")})
           |SORTED BY (${keys.mkString("`", "`, `", "`")})
           |INTO $numBuckets BUCKETS
           |LOCATION '${loc.getPath}'""".stripMargin)
    }
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val committer = GenCommitter.of(spark)
    committer.requireSupported(meta.location)
    val genDir = new java.io.File(
      new java.io.File(meta.location), s"gen=$gen")
    // The generation directory is created BEFORE the staged write —
    // not at publication — so vacuum's claim guard ("a g-N claim
    // survives while any gen=N directory exists") covers the staged
    // Spark write too, which is where an append spends most of its
    // wall time. Pre-protocol debris under OUR claimed number is
    // reclaimed first (we hold the claim).
    if (genDir.exists()) deleteTree(genDir)
    genDir.mkdirs(): Unit
    val staging = committer.stagingDir(genDir)
    val bucketCol = "__graft_bucket"
    val routed = df
      .select(dataSchema(spark, table).map(f => col(f.name)): _*)
      .withColumn(bucketCol,
        pmod(hash(keys.map(col): _*), lit(numBuckets)))
    // appends shape the (small) delta to one file per bucket; the
    // corpus-sized birth write stays shuffle-free and task-parallel
    val shaped =
      if (init) routed
      else routed.repartition(numBuckets, col(bucketCol))
    shaped
      .sortWithinPartitions(
        (col(bucketCol) +: keys.map(col)): _*)
      .write.mode("overwrite")
      .partitionBy(bucketCol)
      .option("compression", "snappy")
      .parquet(staging.getPath)
    // publish staging/__graft_bucket=K/part-… into gen=N/ as
    // bucket-K files
    val PartRe = "part-(\\d+)-([^.]*)(\\..*)".r
    val BDirRe = (java.util.regex.Pattern.quote(bucketCol) +
      "=(\\d+)").r
    Option(staging.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach { d =>
        d.getName match {
          case BDirRe(b) =>
            Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
              .foreach { f =>
                f.getName match {
                  case PartRe(task, mid, ext) =>
                    committer.publish(f,
                      new java.io.File(genDir,
                        f"part-$task%s-$mid%s_${b.toInt}%05d$ext%s"))
                  case _ => ()
                }
              }
          case _ => ()
        }
      }
    deleteTree(staging)
    spark.sql(s"ALTER TABLE `$table` ADD IF NOT EXISTS PARTITION " +
      s"(gen=$gen)")
    spark.catalog.refreshTable(table)
  }

  private def bucketSpecOf(spark: SparkSession, table: String)
      : (Seq[String], Int) = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec
    require(spec.isDefined, s"table $table is not bucketed")
    (spec.get.bucketColumnNames, spec.get.numBuckets)
  }

  /** Initialize the family: each member's frame becomes generation 1
    * of a fresh table, and manifest version 1 references them — the
    * one single-writer operation by contract (like
    * [[VersionedFlat.write]]); concurrent writers join at [[append]].
    */
  def create(spark: SparkSession, family: String,
      members: Seq[(String, DataFrame, Seq[String], Int)]): Unit = {
    require(members.nonEmpty, "a family needs at least one member")
    val meta = metaDir(spark, family)
    deleteTree(new java.io.File(meta))
    new java.io.File(meta).mkdirs()
    members.foreach { case (t, _, _, _) =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`") }
    val (g, tok) = claimGen(meta)
    members.foreach { case (t, df, keys, n) =>
      writeGen(df, t, keys, n, g, init = true) }
    requireClaim(meta, g, tok, family)
    val ok = VersionedFlat.tryCommit(meta, 1,
      members.map { case (t, _, _, _) => line(t, g) })
    require(ok, s"init of family $family raced a concurrent writer — " +
      "initialization is single-writer by contract")
  }

  /** Admit one delta per member as a NEW VERSION — the whole family
    * advances in one atomic manifest commit (both MinHash halves, one
    * link: the half-frozen crash split cannot exist). Safe under
    * concurrent appenders: the generation is written ONCE under a
    * claimed number; a lost manifest CAS re-reads the winner's line
    * set and retries at the next version. Returns the committed
    * version — which IS the freeze point ("the corpus after this
    * batch"), no snapshot step needed.
    */
  def append(spark: SparkSession, family: String,
      deltas: Seq[(String, DataFrame)], maxRetries: Int = 20): Int = {
    val meta = metaDir(spark, family)
    require(VersionedFlat.currentVersion(meta) > 0,
      s"$family is not an initialized BucketedManifest family")
    // membership is validated up front: appending under a name the
    // current manifest does not list would silently resurrect a
    // dropped member with only the delta's rows — evolution goes
    // through [[addMember]], loudly
    val members = parse(VersionedFlat.readManifest(meta,
      VersionedFlat.currentVersion(meta))).map(_._1).toSet
    deltas.foreach { case (t, _) =>
      require(members.contains(t.toLowerCase),
        s"$t is not a member of family $family — new members are " +
          "added via addMember") }
    val (g, tok) = claimGen(meta)
    val newLines = deltas.map { case (t, df) =>
      val (keys, n) = bucketSpecOf(spark, t)
      writeGen(df, t, keys, n, g, init = false)
      line(t, g)
    }
    var attempts = 0
    while (attempts < maxRetries) {
      requireClaim(meta, g, tok, family)
      val cur = VersionedFlat.currentVersion(meta)
      if (VersionedFlat.tryCommit(meta, cur + 1,
          VersionedFlat.readManifest(meta, cur) ++ newLines))
        return cur + 1
      attempts += 1
    }
    throw new IllegalStateException(
      s"append to family $family lost the manifest CAS $maxRetries " +
        "times — pathological contention; raise maxRetries or " +
        "serialize writers")
  }

  /** Grow the family by a NEW MEMBER — index/schema EVOLUTION without
    * a rebuild (round-16): the member's frame becomes its first
    * generation (a fresh table birth), and the next manifest version
    * references every existing member's generations PLUS the new
    * member's, in one commit. Versions BEFORE the member's birth
    * never list it, so time travel to them fails loudly for this
    * member — the manifest is truth, and there is no retroactive
    * backfill; every later commit carries the member like any other
    * ([[append]] deltas for all members land atomically). Safe
    * against concurrent [[append]]s of the existing members (claimed
    * gen + the same manifest-CAS retry); the new NAME itself is
    * single-writer by contract — adding a member is an operator
    * action, and two concurrent additions of the same table would
    * race the table birth. Returns the committed version (the
    * member's birth version).
    */
  def addMember(spark: SparkSession, family: String, table: String,
      df: DataFrame, keys: Seq[String], numBuckets: Int,
      maxRetries: Int = 20): Int = {
    val meta = metaDir(spark, family)
    require(VersionedFlat.currentVersion(meta) > 0,
      s"$family is not an initialized BucketedManifest family")
    val existing = parse(VersionedFlat.readManifest(meta,
      VersionedFlat.currentVersion(meta))).map(_._1).toSet
    require(!existing.contains(table.toLowerCase),
      s"$table is already a member of $family — admit deltas via " +
        "append")
    val (g, tok) = claimGen(meta)
    writeGen(df, table, keys, numBuckets, g, init = true)
    var attempts = 0
    while (attempts < maxRetries) {
      requireClaim(meta, g, tok, family)
      val cur = VersionedFlat.currentVersion(meta)
      if (VersionedFlat.tryCommit(meta, cur + 1,
          VersionedFlat.readManifest(meta, cur) :+ line(table, g)))
        return cur + 1
      attempts += 1
    }
    throw new IllegalStateException(
      s"addMember($table) to family $family lost the manifest CAS " +
        s"$maxRetries times — pathological contention; raise " +
        "maxRetries or serialize writers")
  }

  /** ROLLBACK: publish version `v`'s exact line set as the NEXT
    * version — the undo operation (round-16; Iceberg's
    * rollback-to-snapshot semantics): a bad commit (a poisoned batch,
    * a mistaken delete) is reverted by REFERENCE, with nothing
    * copied, rewritten, or deleted — the bad versions stay
    * time-travelable for the audit trail until retention ages them
    * out, and the rollback itself is an ordinary auditable commit.
    * Members added after `v` drop out of the head (their generations
    * stay for their versions' readers, like any superseded state);
    * members retired after `v` come back. Fails loudly when `v` was
    * vacuumed or never existed; CAS-retried like [[append]]. Returns
    * the committed version.
    */
  def rollback(spark: SparkSession, family: String, v: Int,
      maxRetries: Int = 20): Int = {
    val meta = metaDir(spark, family)
    require(VersionedFlat.currentVersion(meta) > 0,
      s"$family is not an initialized BucketedManifest family")
    require(v > 0 && new java.io.File(meta, f"manifest-$v%06d").exists(),
      s"version $v of family $family does not exist (never " +
        "committed, or vacuumed) — cannot roll back to it")
    val lines = VersionedFlat.readManifest(meta, v)
    var attempts = 0
    while (attempts < maxRetries) {
      val cur = VersionedFlat.currentVersion(meta)
      if (VersionedFlat.tryCommit(meta, cur + 1, lines))
        return cur + 1
      attempts += 1
    }
    throw new IllegalStateException(
      s"rollback of family $family to version $v lost the manifest " +
        s"CAS $maxRetries times — pathological contention")
  }

  /** RETIRE a member — the evolution inverse of [[addMember]], as a
    * pure manifest operation: the next version references every OTHER
    * member's current generations and simply omits this one. Nothing
    * is deleted: time travel to pre-drop versions keeps serving the
    * member for as long as retention keeps them, current-version
    * reads fail loudly for it, and later [[append]]s reject its name
    * (resurrection goes through [[addMember]], explicitly). Once
    * retention has aged every referencing manifest out,
    * [[purgeMember]] reclaims the table and its files — physical
    * reclamation stays where it always is, behind the retention gate.
    * Returns the committed version.
    */
  def dropMember(spark: SparkSession, family: String, table: String,
      maxRetries: Int = 20): Int = {
    val meta = metaDir(spark, family)
    require(VersionedFlat.currentVersion(meta) > 0,
      s"$family is not an initialized BucketedManifest family")
    var attempts = 0
    while (attempts < maxRetries) {
      val cur = VersionedFlat.currentVersion(meta)
      val lines = VersionedFlat.readManifest(meta, cur)
      val kept = lines.filterNot(l =>
        parse(Seq(l)).head._1 == table.toLowerCase)
      require(kept.size < lines.size,
        s"$table is not a member of family $family")
      require(parse(kept).map(_._1).distinct.nonEmpty,
        s"dropping $table would leave family $family empty — " +
          "retire the family via drop instead")
      if (VersionedFlat.tryCommit(meta, cur + 1, kept))
        return cur + 1
      attempts += 1
    }
    throw new IllegalStateException(
      s"dropMember($table) of family $family lost the manifest CAS " +
        s"$maxRetries times — pathological contention")
  }

  /** Physically reclaim a RETIRED member's table and files. Guarded
    * loudly: refuses while ANY retained manifest still references the
    * member (a time traveler could hold it) — run [[vacuum]] with the
    * desired retention first; the un-referenced check here is the
    * same manifest-is-truth rule every deleter in this store obeys.
    * The walk starts at the checkpoint FLOOR — O(retained) manifest
    * reads, not O(all-time commits) (round-16 verdict item #1).
    */
  def purgeMember(spark: SparkSession, family: String,
      table: String): Unit = {
    val meta = metaDir(spark, family)
    val cur = VersionedFlat.currentVersion(meta)
    require(cur > 0,
      s"$family is not an initialized BucketedManifest family")
    val stillReferenced = (VersionedFlat.floorVersion(meta) to cur)
      .filter(v => new java.io.File(meta, f"manifest-$v%06d").exists())
      .flatMap(v => parse(VersionedFlat.readManifest(meta, v)))
      .exists(_._1 == table.toLowerCase)
    require(!stillReferenced,
      s"$table is still referenced by a retained manifest of " +
        s"$family — vacuum to the desired retention before purging")
    if (spark.catalog.tableExists(table)) {
      val m = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      val loc: Option[java.io.File] =
        if (m.location.getScheme == null ||
            m.location.getScheme == "file")
          Some(new java.io.File(m.location))
        else None
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      loc.foreach(deleteTree)
    }
    deleteTree(new java.io.File(warehouse(spark), table.toLowerCase))
  }

  /** The generation numbers version `v` (0 = current) references for
    * `table` — the observable the cadence/pruning contracts are
    * asserted against.
    */
  def gensOf(spark: SparkSession, family: String, table: String,
      v: Int = 0): Seq[Int] = {
    val meta = metaDir(spark, family)
    val ver = if (v > 0) v else VersionedFlat.currentVersion(meta)
    parse(VersionedFlat.readManifest(meta, ver))
      .collect { case (t, g) if t == table.toLowerCase => g }
  }

  private def genFilter(gens: Seq[Int]): Column =
    col("gen").isin(gens.map(g => g: Any): _*)

  /** Version `v`'s row set for `table`: a catalog scan whose gen
    * predicate prunes to exactly the manifest's generations and whose
    * bucket metadata keeps serve joins exchange-free. Fails loudly on
    * a vacuumed or never-written version.
    */
  def readVersion(spark: SparkSession, family: String, table: String,
      v: Int): DataFrame = {
    val gens = gensOf(spark, family, table, v)
    require(gens.nonEmpty,
      s"version $v of family $family has no generations for $table")
    spark.table(table).where(genFilter(gens)).drop("gen")
  }

  /** The current snapshot for `table`. */
  def read(spark: SparkSession, family: String, table: String): DataFrame =
    readVersion(spark, family, table,
      VersionedFlat.currentVersion(metaDir(spark, family)))

  /** The generation partition directories version `v` references for
    * `table` (from the catalog's partition metadata) — compaction
    * reads these BY PATH so its explicit repartition survives the
    * optimizer (the [[Bucketing.compactBucketed]] discipline) and the
    * rewrite lands one file per non-empty bucket.
    */
  private def genLocations(spark: SparkSession, table: String,
      gens: Seq[Int]): Seq[String] = {
    val cat = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    gens.flatMap { g =>
      cat.listPartitions(ident, Some(Map("gen" -> g.toString)))
        .map(p => p.location.toString)
    }
  }

  private def dataSchema(spark: SparkSession, table: String)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      spark.table(table).schema.filterNot(_.name == "gen"))

  /** Merge the named generations of each member into ONE new
    * generation and commit a manifest referencing `survivors` plus the
    * merged gen — the shared engine of [[compact]] (merge all) and
    * [[compactTiered]] (merge the small ones). The merged rewrite is
    * read by path under the catalog schema and repartitioned to one
    * file per non-empty bucket. CAS semantics are
    * [[VersionedFlat.replace]]'s: computed against `basedOn`, fails
    * loudly (ConcurrentModificationException) if any commit landed
    * since — a retry must recompute.
    */
  private def mergeGens(spark: SparkSession, family: String,
      basedOn: Int, toMerge: Seq[Int], survivors: Seq[(String, Int)],
      merges: Map[String, DataFrame => DataFrame]): Unit = {
    val meta = metaDir(spark, family)
    val tables = parse(VersionedFlat.readManifest(meta, basedOn))
      .map(_._1).distinct
    val (g, tok) = claimGen(meta)
    val mergedLines = tables.map { t =>
      val (keys, n) = bucketSpecOf(spark, t)
      val paths = genLocations(spark, t,
        gensOf(spark, family, t, basedOn).filter(toMerge.contains))
      val rows =
        if (paths.isEmpty)
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            dataSchema(spark, t))
        else spark.read.schema(dataSchema(spark, t)).parquet(paths: _*)
      val merged = merges.getOrElse(t, identity[DataFrame] _)(rows)
      writeGen(merged, t, keys, n, g, init = false)
      line(t, g)
    }
    requireClaim(meta, g, tok, family)
    if (!VersionedFlat.tryCommit(meta, basedOn + 1,
        survivors.map { case (t, sg) => line(t, sg) } ++ mergedLines))
      throw new java.util.ConcurrentModificationException(
        s"version ${basedOn + 1} of family $family was committed " +
          "concurrently — the compaction frame is stale; recompute " +
          "and retry")
  }

  /** Merge ALL current generations into one per member (one file per
    * non-empty bucket) and publish as the next version. Old
    * generations stay for their versions' readers until [[vacuum]].
    * `merges` gives LSM members their re-aggregation (the
    * [[Bucketing.compactBucketed]] contract: schema-preserving,
    * serve-invariant).
    */
  def compact(spark: SparkSession, family: String,
      merges: Map[String, DataFrame => DataFrame] = Map.empty,
      basedOn: Int = 0): Unit = {
    val meta = metaDir(spark, family)
    val v = if (basedOn > 0) basedOn
      else VersionedFlat.currentVersion(meta)
    require(v > 0,
      s"$family is not an initialized BucketedManifest family")
    val all = parse(VersionedFlat.readManifest(meta, v)).map(_._2).distinct
    mergeGens(spark, family, v, all, Seq.empty, merges)
  }

  /** SIZE-TIERED compaction: when the current version references more
    * than `maxGens` generations, merge the SMALLEST ones (by on-disk
    * bytes summed across members) down to `maxGens`, REFERENCING the
    * big standing generations in the new manifest untouched — O(small
    * generations) rewrite cost with full snapshot isolation, the
    * versioned twin of [[Bucketing.compactBucketedTiered]]'s
    * only-rewrite-what-accumulated economics ("reference, don't
    * re-link"). Ingest loops call this after admitting (the
    * [[VersionedFlat.maybeCompact]] cadence shape). Returns whether a
    * compaction ran.
    */
  def compactTiered(spark: SparkSession, family: String, maxGens: Int,
      merges: Map[String, DataFrame => DataFrame] = Map.empty)
      : Boolean = {
    require(maxGens >= 1, s"bad maxGens $maxGens")
    val meta = metaDir(spark, family)
    val v = VersionedFlat.currentVersion(meta)
    require(v > 0,
      s"$family is not an initialized BucketedManifest family")
    val entries = parse(VersionedFlat.readManifest(meta, v))
    val gens = entries.map(_._2).distinct
    if (gens.size <= maxGens) return false
    val sizeOf: Map[Int, Long] = gens.map { g =>
      g -> entries.map(_._1).distinct.flatMap(t =>
        genLocations(spark, t, Seq(g))).map { p =>
          val d = new java.io.File(new java.net.URI(p).getPath)
          Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
            .filter(_.isFile).map(_.length()).sum
        }.sum
    }.toMap
    // merge the smallest (gens - maxGens + 1) so the result has maxGens
    val bySize = gens.sortBy(g => (sizeOf(g), g))
    val toMerge = bySize.take(gens.size - maxGens + 1)
    val survivors = entries.filterNot(e => toMerge.contains(e._2))
      .map { case (t, g) => (t, g) }
    mergeGens(spark, family, v, toMerge, survivors, merges)
    true
  }

  /** Drop manifests older than the `retain` most recent versions, then
    * every generation no retained manifest references — the member
    * directories are listed ON DISK (catalog-registered or not, so a
    * crash between the generation write and ADD PARTITION leaves
    * nothing uncollectable), each reclaimed via DROP PARTITION IF
    * EXISTS plus physical directory delete — and aged orphan
    * claims/tmps ([[VersionedFlat.vacuum]]'s age-gate contract:
    * un-manifested generations younger than `orphanMinAgeMs` might be
    * a live appender's in-flight write and survive; a claim marker
    * additionally survives as long as any young gen or staging
    * directory for its number does — and writeGen creates the gen
    * directory at write START, so the guard spans the whole write.
    * Like every age gate here, concurrent-writer safety requires
    * `orphanMinAgeMs` above the longest plausible write; the default
    * 0 asserts quiescence. A misconfigured age cannot silently
    * corrupt: a writer whose claim was collected detects the loss via
    * its claim owner token and aborts its commit loudly). The current
    * version always survives.
    */
  def vacuum(spark: SparkSession, family: String, retain: Int = 1,
      orphanMinAgeMs: Long = 0L): Unit = {
    val meta = metaDir(spark, family)
    val cur = VersionedFlat.currentVersion(meta)
    require(cur > 0,
      s"$family is not an initialized BucketedManifest family")
    VersionedFlat.advanceCurrent(meta, cur)
    val cutoff = System.currentTimeMillis() - math.max(0L, orphanMinAgeMs)
    val keepMin = math.max(1, cur - math.max(1, retain) + 1)
    val keptEntries = (keepMin to cur)
      .filter(v => new java.io.File(meta, f"manifest-$v%06d").exists())
      .flatMap(v => parse(VersionedFlat.readManifest(meta, v)))
    val tables = keptEntries.map(_._1).distinct
    val referenced: Map[String, Set[Int]] = keptEntries
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Physical generation reclamation, member by member — listing
    // gen=* DIRECTORIES ON DISK, not just registered catalog
    // partitions: a crash between the generation write and ADD
    // PARTITION (or a rebuilt in-memory catalog — the catalog is a
    // CACHE by design) leaves directories no partition entry names,
    // and those must still be collected once unreferenced and aged.
    // `survivingGens` records every gen number that still has a
    // directory on disk after this pass (referenced, or unreferenced
    // but young) — their claim markers must stay (see below).
    val survivingGens = scala.collection.mutable.Set.empty[Int]
    val genDirRe = "gen=(\\d{1,9})".r
    val stagingRe = "\\.gen=(\\d{1,9})\\.staging-.*".r
    tables.foreach { t =>
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).location
      val tableDir =
        if (loc.getScheme == null) new java.io.File(loc.toString)
        else new java.io.File(loc)
      Option(tableDir.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach { d =>
          d.getName match {
            case genDirRe(gs) if d.isDirectory =>
              val g = gs.toInt
              if (!referenced(t).contains(g) &&
                  d.lastModified() <= cutoff) {
                spark.sql(s"ALTER TABLE `$t` DROP IF EXISTS " +
                  s"PARTITION (gen=$g)")
                deleteTree(d)
              } else survivingGens += g
            // a crashed writer's staging (dot-prefixed, beside the
            // gen dirs — both committers stage here) — same age gate
            // as any orphan: young staging may be a live writer's,
            // and while it survives it also keeps its generation
            // number's claim alive (see the claim rule below)
            case stagingRe(gs) if d.isDirectory =>
              if (d.lastModified() <= cutoff) deleteTree(d)
              else survivingGens += gs.toInt
            case _ => ()
          }
        }
    }
    // manifest + claim-marker housekeeping in the meta dir
    val top = Option(new java.io.File(meta).listFiles())
      .getOrElse(Array.empty[java.io.File])
    val manifestRe = "manifest-(\\d{1,9})".r
    val claimRe = "g-(\\d{1,9})".r
    val claimed = keptEntries.map(_._2).toSet
    top.filter(f => f.getName match {
      case manifestRe(d) => d.toInt < keepMin
      case _ => false
    }).foreach(f => java.nio.file.Files.delete(f.toPath))
    // checkpoint the chain: everything below keepMin is deleted
    // history, so [[purgeMember]]/[[attach]] walks start at the floor
    VersionedFlat.advanceFloor(meta, keepMin)
    top.filter(f => f.isFile && f.getName.startsWith(".") &&
        f.getName.endsWith(".tmp") && f.lastModified() <= cutoff)
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    // A claim marker g-N is deletable only when it is aged AND no
    // gen=N directory or .gen=N.staging-* directory survived the
    // pass above for ANY member: the claim is what makes N
    // collision-free, and deleting a live writer's claim would let
    // claimGen reuse N. Writers give the guard its coverage —
    // writeGen creates the (empty) generation directory BEFORE the
    // staged Spark write, so a gen=N dir exists for the whole write,
    // and staging lives beside it under the same number. The guard
    // is still AGE-GATED like every orphan rule here: those dirs are
    // only kept while younger than `orphanMinAgeMs`, so safety under
    // concurrent writers requires an age above the longest plausible
    // write — age 0 asserts quiescence ([[VersionedFlat.vacuum]]'s
    // contract, same words). Against the residual misconfiguration
    // (age below a live write's duration), the writer's claim OWNER
    // TOKEN converts the silent clobber into a loud abort: the
    // in-flight writer re-checks its token immediately before every
    // manifest commit and refuses to publish a stolen number.
    top.filter(f => f.isDirectory && f.lastModified() <= cutoff &&
        (f.getName match {
          case claimRe(d) => !claimed.contains(d.toInt) &&
            !survivingGens.contains(d.toInt)
          case _ => false
        }))
      .foreach(deleteTree)
  }

  /** Re-register a member table in a session whose catalog has no
    * entry for it (a fresh JVM over an in-memory catalog, a new
    * metastore, a disaster-recovery replay): the CATALOG IS A CACHE —
    * truth lives in the manifest chain and the generation files. The
    * member is re-declared as an EXTERNAL table over its existing
    * directory with the given bucket spec (the same
    * declared-spec-drives-planning contract every store here uses),
    * and every generation any retained manifest references is
    * re-registered as a partition. After attach, reads, serves, and
    * new commits work exactly as before — asserted in
    * BucketedManifestSpec, including the exchange-free plan.
    *
    * The bucket spec is caller-supplied because the catalog entry that
    * recorded it is exactly what was lost; attaching with a DIFFERENT
    * spec than the files were written with would break the
    * exchange-free contract silently, so deployments should carry
    * (keys, numBuckets) in their own config the way they carry the
    * warehouse path. No data is read or written — pure metadata,
    * O(generations) catalog calls.
    */
  def attach(spark: SparkSession, family: String, table: String,
      location: String, schemaDDL: String, keys: Seq[String],
      numBuckets: Int): Unit = {
    require(!spark.catalog.tableExists(table),
      s"$table already exists — attach is for catalogs that lost it")
    val meta = metaDir(spark, family)
    require(VersionedFlat.currentVersion(meta) > 0,
      s"$family has no manifest chain at $meta — nothing to attach")
    spark.sql(
      s"""CREATE TABLE `$table` ($schemaDDL, gen INT)
         |USING PARQUET
         |PARTITIONED BY (gen)
         |CLUSTERED BY (${keys.mkString("`", "`, `", "`")})
         |SORTED BY (${keys.mkString("`", "`, `", "`")})
         |INTO $numBuckets BUCKETS
         |LOCATION '$location'""".stripMargin)
    // register every generation a retained manifest references (the
    // manifest is truth; unreferenced debris stays invisible) — the
    // walk starts at the checkpoint FLOOR: O(retained), not O(all-time)
    val cur = VersionedFlat.currentVersion(meta)
    val gens = (VersionedFlat.floorVersion(meta) to cur)
      .filter(v => new java.io.File(meta, f"manifest-$v%06d").exists())
      .flatMap(v => parse(VersionedFlat.readManifest(meta, v)))
      .collect { case (t, g) if t == table.toLowerCase => g }
      .distinct
    gens.foreach(g => spark.sql(
      s"ALTER TABLE `$table` ADD IF NOT EXISTS PARTITION (gen=$g)"))
    spark.catalog.refreshTable(table)
  }

  /** Drop the family entirely (tables, their data dirs, meta dir) —
    * test/scratch hygiene, not a lifecycle operation. Members are
    * EXTERNAL, so the catalog drop alone would leave their data.
    */
  def drop(spark: SparkSession, family: String,
      tables: Seq[String]): Unit = {
    tables.foreach { t =>
      val loc: Option[java.io.File] =
        if (!spark.catalog.tableExists(t)) None
        else {
          val m = spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(t))
          if (m.location.getScheme == null ||
              m.location.getScheme == "file")
            Some(new java.io.File(m.location))
          else None
        }
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      loc.foreach(deleteTree)
      deleteTree(new java.io.File(warehouse(spark), t.toLowerCase))
    }
    deleteTree(new java.io.File(metaDir(spark, family)))
  }
}
