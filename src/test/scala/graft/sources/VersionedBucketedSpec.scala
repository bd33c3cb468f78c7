package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The version-pointer bucketed store's contract (round-14 directive
  * #2): compaction publishes a new table and repoints instead of
  * deleting the listing a concurrent reader holds — snapshot isolation
  * for captured frames, the exchange-free serve plan preserved across
  * versions, crash-orphan recovery, vacuum as the only deleter.
  */
class VersionedBucketedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive
        .QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def dropFamily(family: String): Unit = {
    spark.catalog.listTables().collect()
      .filter(_.name.toLowerCase.startsWith(family.toLowerCase))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `${t.name}`"))
  }

  test("write/append/compact: content invariant, version chain " +
      "advances, per-bucket file count drops to one") {
    val fam = "vb_basic"
    try {
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_custkey"))
      VersionedBucketed.write(o.filter(col("id") % 2 === 0), fam,
        Seq("id"), 4)
      assert(VersionedBucketed.currentVersion(spark, fam) === 1)
      VersionedBucketed.append(o.filter(col("id") % 2 === 1), fam)
      assert(VersionedBucketed.currentVersion(spark, fam) === 1,
        "appends are in-place on the live version")
      val before = Bucketing.dataFileCount(spark, s"${fam}__v1")
      assert(before > 4, "build + append must leave > 1 file per bucket")
      VersionedBucketed.compact(spark, fam)
      assert(VersionedBucketed.currentVersion(spark, fam) === 2)
      assert(Bucketing.dataFileCount(spark, s"${fam}__v2") === 4,
        "the compacted version must hold one file per non-empty bucket")
      assert(VersionedBucketed.read(spark, fam).count() === o.count(),
        "compaction must not change content")
    } finally dropFamily("vb_basic")
  }

  test("attach: a fresh catalog re-derives the family from the " +
      "warehouse directories and markers alone — reads, time travel, " +
      "new commits, and the exchange-free plan survive catalog loss") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val fam = "vb_attach"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_custkey"))
      VersionedBucketed.write(o.filter(col("id") % 2 === 0), fam,
        Seq("id"), 4)
      VersionedBucketed.append(o.filter(col("id") % 2 === 1), fam)
      VersionedBucketed.compact(spark, fam) // v2
      val want = VersionedBucketed.read(spark, fam).count()
      val v1count = VersionedBucketed.readVersion(spark, fam, 1).count()
      val ddl = spark.table(s"${fam}__v1").schema.toDDL
      // the catalog loses both entries (version tables are EXTERNAL
      // from birth — the drop deletes no data; the warehouse files
      // and markers are the truth)
      spark.sql(s"DROP TABLE `${fam}__v1`")
      spark.sql(s"DROP TABLE `${fam}__v2`")
      assert(VersionedBucketed.currentVersion(spark, fam) === 2,
        "the head must resolve from the pointer + markers alone")
      VersionedBucketed.attach(spark, fam, ddl, Seq("id"), Seq("id"), 4)
      assert(VersionedBucketed.read(spark, fam).count() === want,
        "the re-attached live version serves")
      assert(VersionedBucketed.readVersion(spark, fam, 1).count()
        === v1count, "time travel survives re-attach")
      // the commit protocol keeps working on the re-derived entries
      assert(VersionedBucketed.snapshot(spark, fam) === 3)
      assert(VersionedBucketed.read(spark, fam).count() === want)
      // the declared spec still drives planning: zero exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = VersionedBucketed.read(spark, fam)
        .groupBy("id").agg(count(lit(1)).as("n"))
      agg.collect()
      assert(!flatten(agg.queryExecution.executedPlan)
        .exists(_.isInstanceOf[ShuffleExchangeExec]),
        "bucket-key agg over the re-attached family must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      dropFamily("vb_attach")
    }
  }

  test("rollback re-publishes a retained version as a zero-copy " +
      "linked clone: the head reverts, the poisoned version stays " +
      "time-travelable, later appends continue from the reverted " +
      "state, vacuum keeps shared bytes by link count") {
    val fam = "vb_rollback"
    try {
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_custkey"))
      val evens = o.filter(col("id") % 2 === 0)
      VersionedBucketed.write(evens, fam, Seq("id"), 4)
      VersionedBucketed.compact(spark, fam) // v2: the good state
      val want = VersionedBucketed.read(spark, fam).count()
      // the poison: an in-place append of wrong rows onto a SNAPSHOT
      // (v3) so v2 stays frozen, then the bad rows land in v3
      VersionedBucketed.snapshot(spark, fam): Unit
      VersionedBucketed.append(o.filter(col("id") % 2 === 1), fam)
      assert(VersionedBucketed.read(spark, fam).count() > want)
      val rb = VersionedBucketed.rollback(spark, fam, 2)
      assert(rb === 4, "rollback publishes an ordinary next version")
      assert(VersionedBucketed.read(spark, fam).count() === want,
        "the head must serve the rolled-back-to content")
      assert(VersionedBucketed.readVersion(spark, fam, 3).count() > want,
        "the poisoned version stays time-travelable")
      // later work continues from the reverted state
      VersionedBucketed.append(evens.limit(10)
        .select((col("id") + 900000000L).as("id"), col("o_custkey")),
        fam)
      assert(VersionedBucketed.read(spark, fam).count() === want + 10)
      intercept[IllegalArgumentException] {
        VersionedBucketed.rollback(spark, fam, 77)
      }
      // vacuum drops the poisoned versions; the live (cloned) version
      // keeps its bytes via link counts
      VersionedBucketed.vacuum(spark, fam, retain = 1)
      assert(VersionedBucketed.read(spark, fam).count() === want + 10)
    } finally dropFamily("vb_rollback")
  }

  test("snapshot isolation: a reader frame captured before the " +
      "compaction still collects after it (old files undeleted)") {
    val fam = "vb_snap"
    try {
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_custkey"))
      VersionedBucketed.write(o, fam, Seq("id"), 4)
      VersionedBucketed.append(o.select((col("id") + 1000000L).as("id"),
        col("o_custkey")), fam)
      // the long-running reader captures the live version's listing
      val captured = VersionedBucketed.read(spark, fam)
      val want = o.count() * 2
      VersionedBucketed.compact(spark, fam)
      assert(captured.count() === want,
        "the pre-compaction capture must still collect after it — " +
          "the property the catalog swap could never give")
      assert(VersionedBucketed.read(spark, fam).count() === want)
      // a superseded version is frozen and time-travelable until vacuum
      assert(VersionedBucketed.readVersion(spark, fam, 1).count()
        === want)
      // physical reclamation happens at vacuum, not compact
      VersionedBucketed.vacuum(spark, fam, retain = 1)
      assert(!spark.catalog.tableExists(s"${fam}__v1"),
        "vacuum must drop the superseded version table")
      assert(VersionedBucketed.read(spark, fam).count() === want)
      intercept[IllegalArgumentException] {
        VersionedBucketed.readVersion(spark, fam, 1).count()
      }
    } finally dropFamily("vb_snap")
  }

  test("a compaction that crashed between table-create and pointer " +
      "swap leaves an orphan the next compact recovers") {
    val fam = "vb_crash"
    try {
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_custkey"))
      VersionedBucketed.write(o, fam, Seq("id"), 4)
      // simulate the crash: v2 table exists (even with WRONG content),
      // pointer still at 1
      Bucketing.writeBucketed(o.limit(3), s"${fam}__v2", Seq("id"), 4)
      assert(VersionedBucketed.currentVersion(spark, fam) === 1)
      assert(VersionedBucketed.read(spark, fam).count() === o.count(),
        "readers must resolve the pointer, never the orphan")
      VersionedBucketed.compact(spark, fam) // recovers, then publishes v2
      assert(VersionedBucketed.currentVersion(spark, fam) === 2)
      assert(VersionedBucketed.read(spark, fam).count() === o.count(),
        "the recovered compact must publish the REAL rewrite as v2")
    } finally dropFamily("vb_crash")
  }

  test("snapshot freezes the live version as a zero-copy linked " +
      "clone: history fixed, live keeps ingesting, retention safe") {
    val fam = "vb_snapfreeze"
    try {
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_custkey"))
      VersionedBucketed.write(o, fam, Seq("id"), 4)
      val n0 = o.count()
      // freeze point 1: v1 becomes superseded (forever fixed), v2 is
      // the new live — a hard-linked external clone, zero bytes copied
      assert(VersionedBucketed.snapshot(spark, fam) === 2)
      VersionedBucketed.append(o.select((col("id") + 1000000L).as("id"),
        col("o_custkey")), fam)
      assert(VersionedBucketed.readVersion(spark, fam, 1).count() === n0,
        "the frozen version must not see the live append")
      assert(VersionedBucketed.read(spark, fam).count() === 2 * n0,
        "the live external clone must receive the append")
      // freeze point 2, then compact the live
      assert(VersionedBucketed.snapshot(spark, fam) === 3)
      VersionedBucketed.compact(spark, fam) // v4 (managed rewrite)
      assert(VersionedBucketed.readVersion(spark, fam, 2).count()
        === 2 * n0, "freeze point 2 holds batch 1's admission")
      assert(VersionedBucketed.read(spark, fam).count() === 2 * n0)
      // the clone table carries the bucket spec — and the catalog
      // metadata actually drives planning: a bucket-key aggregation
      // over the external clone runs with zero exchanges
      assert(Bucketing.numBucketsOf(spark, s"${fam}__v3") === 4)
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val agg = VersionedBucketed.readVersion(spark, fam, 3)
        .groupBy("id").agg(count(lit(1)).as("n"))
      agg.collect()
      assert(!flatten(agg.queryExecution.executedPlan)
        .exists(_.isInstanceOf[ShuffleExchangeExec]),
        "bucket-key agg over the hard-linked external clone must " +
          "not shuffle")
      // retention: dropping v1-v3 (incl. external clones + their
      // dirs) must not harm v4 — hard links only drop link counts
      VersionedBucketed.vacuum(spark, fam, retain = 1)
      assert(!spark.catalog.tableExists(s"${fam}__v2"))
      val warehouse = new java.io.File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")))
      assert(!new java.io.File(warehouse, s"${fam}__v2").exists(),
        "vacuum must delete the external clone's directory too")
      assert(VersionedBucketed.read(spark, fam).count() === 2 * n0,
        "the live version must survive vacuum untouched")
    } finally dropFamily("vb_snapfreeze")
  }

  // The key family moved to the gen-manifest store in round 15
  // (BucketedManifest — the LSM family proving the merges hook); its
  // merge-compaction contract now lives in BucketedManifestSpec.

  // The MinHash family moved to the gen-manifest store in round 15
  // (BucketedManifest — atomic two-half commits retire the
  // half-frozen crash split structurally); its serve-plan and freeze
  // contracts now live in BucketedManifestSpec. VersionedBucketed
  // remains the version-pointer store for the key / substring / edit
  // / pHash families, pinned above.

  private def warehouseDir: java.io.File =
    new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")))

  test("two concurrent compactors: exactly one publishes, the loser " +
      "fails loudly instead of clobbering, the chain advances by one") {
    val fam = "vb_race"
    try {
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_custkey"))
      VersionedBucketed.write(o, fam, Seq("id"), 4)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (1 to 2).map { _ =>
        new Thread(() =>
          try VersionedBucketed.compact(spark, fam)
          catch { case t: Throwable => errs.add(t): Unit })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(errs.size === 1,
        s"exactly one compactor must lose (got ${errs.size} failures)")
      val loser = errs.peek()
      assert(loser.isInstanceOf[java.util.ConcurrentModificationException]
          || loser.isInstanceOf[IllegalStateException],
        s"the loser must fail with the protocol's exceptions, got $loser")
      assert(VersionedBucketed.currentVersion(spark, fam) === 2,
        "the chain advances by exactly one")
      assert(VersionedBucketed.read(spark, fam).count() === o.count(),
        "the winner's rewrite must be content-invariant")
    } finally dropFamily("vb_race")
  }

  test("versioned tiered compaction: hot buckets rewritten to one " +
      "file, cold buckets shared into the new version by hard link, " +
      "old version untouched") {
    val fam = "vb_tier"
    try {
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_custkey"))
      VersionedBucketed.write(o, fam, Seq("id"), 8)
      // hot appends: tiny deltas hitting a few ids repeatedly
      (1 to 3).foreach { i =>
        VersionedBucketed.append(
          o.filter(col("id") % 400 === 0)
            .select((col("id") + i * 1000000L).as("id"),
              col("o_custkey")), fam)
      }
      val want = VersionedBucketed.read(spark, fam).count()
      val srcDir = new java.io.File(spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst
          .TableIdentifier(s"${fam}__v1")).location)
      def files(d: java.io.File): Map[String, java.nio.file.Path] =
        Option(d.listFiles()).get
          .filter(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith(".")).map(f => f.getName -> f.toPath)
          .toMap
      val before = files(srcDir)
      val rewritten = VersionedBucketed.compactTiered(spark, fam,
        minFilesPerBucket = 2)
      assert(rewritten > 0, "the hot appends must make buckets hot")
      assert(VersionedBucketed.currentVersion(spark, fam) === 2)
      assert(files(srcDir) === before,
        "the old version's directory must be byte-for-byte untouched")
      val dstDir = new java.io.File(spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst
          .TableIdentifier(s"${fam}__v2")).location)
      val after = files(dstDir)
      val shared = after.filter { case (n, p) =>
        before.contains(n) &&
          java.nio.file.Files.isSameFile(p, before(n)) }
      assert(shared.nonEmpty,
        "cold buckets must be shared by hard link (same inode)")
      val hotFiles = after.keys.filterNot(before.contains)
      assert(hotFiles.nonEmpty && hotFiles.forall(
        Bucketing.bucketIdOf(_).isDefined),
        "hot rewrites must carry parseable bucket ids")
      assert(VersionedBucketed.read(spark, fam).count() === want,
        "tiered compaction must be content-invariant")
      assert(VersionedBucketed.readVersion(spark, fam, 1).count()
        === want, "the superseded version still time-travels")
      // no hot buckets left → no-op, no version published
      assert(VersionedBucketed.compactTiered(spark, fam,
        minFilesPerBucket = 2) === 0)
      assert(VersionedBucketed.currentVersion(spark, fam) === 2)
      // retention: vacuuming the old version must not harm the new
      // (links only drop link counts)
      VersionedBucketed.vacuum(spark, fam, retain = 1)
      assert(VersionedBucketed.read(spark, fam).count() === want)
    } finally dropFamily("vb_tier")
  }

  test("a crashed claim blocks its version slot loudly; recover() " +
      "(quiesced) clears it and the retry publishes") {
    val fam = "vb_claim"
    try {
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_custkey"))
      VersionedBucketed.write(o, fam, Seq("id"), 4)
      // the crash: a claim marker with no commit (writer died mid-build)
      java.nio.file.Files.createDirectory(new java.io.File(
        warehouseDir, s"${fam}__claim-2").toPath)
      intercept[IllegalStateException] {
        VersionedBucketed.compact(spark, fam)
      }
      intercept[IllegalStateException] {
        VersionedBucketed.snapshot(spark, fam)
      }
      VersionedBucketed.recover(spark, fam)
      VersionedBucketed.compact(spark, fam)
      assert(VersionedBucketed.currentVersion(spark, fam) === 2)
      assert(VersionedBucketed.read(spark, fam).count() === o.count())
    } finally dropFamily("vb_claim")
  }
}
