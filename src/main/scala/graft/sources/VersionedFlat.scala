package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Version-pointer manifests for the flat (per-vector) artifacts — the
  * missing half of the dir-artifact story at object-store scale.
  *
  * The rename-aside swap ([[IndexStore.compactIvfIndex]] and friends)
  * is crash-safe for the WRITER, but it mutates the artifact in place:
  * between the two renames the leaf briefly has no current directory,
  * and a long-running reader that captured the old file listing has its
  * files deleted out from under it the moment the swap completes. Both
  * are tolerable in a single-process harness and fatal on a 1000-reader
  * cluster. This store removes the mutation entirely:
  *
  *   - `b-NNNNNN/`      immutable batch directories (plain parquet);
  *                      once referenced by any manifest, never rewritten
  *   - `manifest-NNNNNN` one batch-dir name per line — the full file
  *                      listing of version N (no directory listing at
  *                      read time, the Iceberg/Delta lesson: listings
  *                      are slow and racy on object stores)
  *   - `CURRENT`        one line naming the live manifest, swapped with
  *                      an ATOMIC_MOVE — the only mutable file
  *
  * Readers resolve CURRENT once and read exactly the named batch dirs:
  * every version is a consistent SNAPSHOT, a reader mid-job keeps its
  * version's files regardless of concurrent appends/compactions, and
  * `readVersion` time-travels to any un-vacuumed version for free.
  * Writes are single-writer by contract (like every store here); a
  * crashed write leaves at worst an orphan batch dir + manifest that
  * the next attempt overwrites and [[vacuum]] collects — CURRENT is
  * never half-written (tmp + atomic rename), so readers see the old
  * version until the instant the new one is complete.
  *
  * Batch dirs are named by the version that introduces them (the
  * single-writer makes this deterministic — no UUIDs to leak into
  * hashes), appends reference the previous manifest's batches plus
  * their own (O(1) data moved per admit), and compaction writes ONE
  * merged batch and points the new manifest at only it — old versions
  * stay readable until a `vacuum(retain)` drops their manifests and
  * any batch dirs no retained manifest references.
  *
  * Local File ops are the harness shape (same note as
  * [[Bucketing.compactBucketedTiered]]); an object-store deployment
  * swaps them for its FileSystem and keeps the protocol — every store
  * primitive used here (immutable puts, atomic single-key swap) exists
  * on S3-class stores.
  */
object VersionedFlat {

  private def manifestName(v: Int): String = f"manifest-$v%06d"
  private def batchName(v: Int): String = f"b-$v%06d"

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteTree)
    f.delete(): Unit
  }

  /** The live version number (0 if the store is uninitialized). */
  def currentVersion(dir: String): Int = {
    val cur = new java.io.File(dir, "CURRENT")
    if (!cur.exists()) 0
    else new String(java.nio.file.Files.readAllBytes(cur.toPath),
      "UTF-8").trim.stripPrefix("manifest-").toInt
  }

  private def readManifest(dir: String, v: Int): Seq[String] = {
    val m = new java.io.File(dir, manifestName(v))
    require(m.exists(),
      s"version $v of $dir does not exist (never written, or vacuumed)")
    new String(java.nio.file.Files.readAllBytes(m.toPath), "UTF-8")
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Publish `batches` as version `v` and atomically repoint CURRENT.
    * The manifest is fully written under its final name BEFORE the
    * pointer moves; the pointer move is a same-directory ATOMIC_MOVE.
    * (Durability of the manifest bytes themselves across a POWER loss
    * is the filesystem's job, as everywhere in this store layer; an
    * object-store deployment gets it free — a PUT is atomic and
    * durable before it acknowledges.)
    */
  private def publish(dir: String, v: Int, batches: Seq[String]): Unit = {
    java.nio.file.Files.write(
      new java.io.File(dir, manifestName(v)).toPath,
      (batches.mkString("\n") + "\n").getBytes("UTF-8"))
    val tmp = new java.io.File(dir, "CURRENT.tmp")
    java.nio.file.Files.write(tmp.toPath,
      (manifestName(v) + "\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(dir, "CURRENT").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write a batch dir for version `v` (wiping any orphan a crashed
    * previous attempt at the same version left behind).
    */
  private def writeBatch(df: DataFrame, dir: String, v: Int): String = {
    val b = new java.io.File(dir, batchName(v))
    deleteTree(b)
    df.write.mode("overwrite").parquet(b.getPath)
    batchName(v)
  }

  /** Initialize the store with `df` as version 1 (wipes `dir`). */
  def write(df: DataFrame, dir: String): Unit = {
    deleteTree(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    publish(dir, 1, Seq(writeBatch(df, dir, 1)))
  }

  /** Admit `df` as version current+1: one new immutable batch dir, a
    * manifest referencing the previous version's batches plus it —
    * O(batch) data written, standing batches untouched.
    */
  def append(df: DataFrame, dir: String): Unit = {
    val cur = currentVersion(dir)
    require(cur > 0, s"$dir is not an initialized VersionedFlat store")
    val v = cur + 1
    publish(dir, v, readManifest(dir, cur) :+ writeBatch(df, dir, v))
  }

  /** Publish `df` as the next version's SOLE content — the
    * compaction/purge primitive (the caller decides what survives:
    * everything for a plain compact, the tombstone-excluded frame for
    * a purge). `df` may freely read the current version's batches: the
    * merged batch lands in a NEW dir, nothing is rewritten in place.
    */
  def replace(df: DataFrame, dir: String, targetFiles: Int = 1): Unit = {
    val cur = currentVersion(dir)
    require(cur > 0, s"$dir is not an initialized VersionedFlat store")
    val v = cur + 1
    publish(dir, v,
      Seq(writeBatch(df.coalesce(math.max(1, targetFiles)), dir, v)))
  }

  /** Compact the current version's batches into ONE merged batch dir
    * (`targetFiles` files) and publish it as the next version's sole
    * content. Readers on older versions are untouched — their batch
    * dirs remain until [[vacuum]].
    */
  def compact(spark: SparkSession, dir: String,
      targetFiles: Int = 1): Unit =
    replace(read(spark, dir), dir, targetFiles)

  /** The current snapshot. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, currentVersion(dir))

  /** Time travel: the exact row set of version `v`. Fails loudly if
    * `v` was vacuumed or never existed — a silent fallback to another
    * version would un-pin every downstream reproducibility claim.
    */
  def readVersion(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val paths = readManifest(dir, v)
      .map(b => new java.io.File(dir, b).getPath)
    spark.read.parquet(paths: _*)
  }

  /** Drop manifests older than the `retain` most recent versions, then
    * every batch dir no retained manifest references — including
    * orphans a crashed writer left (single-writer contract: vacuum is
    * the writer's housekeeping, so nothing in-flight can own them).
    * The current version always survives (`retain` is clamped to 1+).
    */
  def vacuum(dir: String, retain: Int = 1): Unit = {
    val cur = currentVersion(dir)
    require(cur > 0, s"$dir is not an initialized VersionedFlat store")
    val keepMin = math.max(1, cur - math.max(1, retain) + 1)
    val kept = (keepMin to cur)
      .filter(v => new java.io.File(dir, manifestName(v)).exists())
    val referenced = kept.flatMap(readManifest(dir, _)).toSet
    val top = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
    top.filter(f => f.getName.startsWith("manifest-") &&
        f.getName.stripPrefix("manifest-").toInt < keepMin)
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    // orphan manifests above CURRENT (crashed publish) go too
    top.filter(f => f.getName.startsWith("manifest-") &&
        f.getName.stripPrefix("manifest-").toInt > cur)
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    top.filter(f => f.isDirectory && f.getName.startsWith("b-") &&
        !referenced(f.getName))
      .foreach(deleteTree)
  }
}
