package graft.sources

/** How a staged generation write becomes the generation directory's
  * final bucket-suffixed files — the publication seam of
  * [[BucketedManifest.writeGen]] (round-16 directive #3).
  *
  * The staged OUTPUT is committer-independent: Spark writes the
  * bucket-routed delta `partitionBy(__graft_bucket)` into a staging
  * directory, producing one `__graft_bucket=K/part-…` file per
  * written bucket. Only the PUBLICATION step — landing each staged
  * file at its final `part-…_KKKKK` name inside `gen=N/` — differs
  * by storage:
  *
  *   - [[RenameGenCommitter]] (default): a same-filesystem
  *     `Files.move` — metadata-only because the staging directory is
  *     created BESIDE the generation directory (same parent, same
  *     mount). This is the local/HDFS discipline and the only place
  *     in the store that assumes renames exist, so it alone carries
  *     the `file:`-scheme requirement.
  *   - [[PutGenCommitter]]: a fresh full-byte write at the final name
  *     — the OBJECT-STORE discipline, where rename does not exist and
  *     "commit" means "PUT the final key". Safe without any staging
  *     protocol precisely because of the manifest gate: the
  *     generation is invisible until its manifest commits, so a
  *     partially-published generation is unreferenced debris at worst
  *     (the age-gated vacuum collects it). Modeled here with an NIO
  *     copy against the local filesystem — a real deployment swaps
  *     exactly this object's two methods for its store client's
  *     upload calls; nothing outside the committer assumes
  *     renameability.
  *
  * Selected per session via `spark.graft.genCommitter`
  * (`rename` | `put`); BucketedManifestSpec drives a family through
  * both and pins identical content, bucket-file layout, and the
  * exchange-free serve plan.
  *
  * EVERY write in a family's life goes through this seam — table
  * birth is pure DDL (an external shell over an empty directory) and
  * generation 1 lands through the same staged-write + publish path
  * as every later generation (round-16 verdict item #3), so under
  * the put committer a family is rename-free from its first byte.
  */
sealed trait GenCommitter {
  /** Committer name, for error messages and the conf round-trip. */
  def name: String

  /** Fail loudly if this committer cannot publish into `location`
    * (called before any bytes move).
    */
  def requireSupported(location: java.net.URI): Unit

  /** The directory the partitioned staging write lands in. Dot-
    * prefixed so even a raw directory listing skips it; the manifest
    * gate already keeps it invisible to every reader.
    */
  def stagingDir(genDir: java.io.File): java.io.File

  /** Land one staged file at its final name (replacing pre-protocol
    * debris if present — the caller holds the generation claim).
    */
  def publish(src: java.io.File, dst: java.io.File): Unit
}

object GenCommitter {
  /** Resolve the session's committer (`spark.graft.genCommitter`,
    * default `rename`).
    */
  def of(spark: org.apache.spark.sql.SparkSession): GenCommitter =
    spark.conf.get("spark.graft.genCommitter", "rename") match {
      case RenameGenCommitter.name => RenameGenCommitter
      case PutGenCommitter.name => PutGenCommitter
      case other => throw new IllegalArgumentException(
        s"unknown spark.graft.genCommitter '$other' — expected " +
          s"'${RenameGenCommitter.name}' or '${PutGenCommitter.name}'")
    }

  private val nonce = new java.util.concurrent.atomic.AtomicLong(0L)

  private[sources] def stagingName(genDir: java.io.File): String =
    s".${genDir.getName}.staging-p${ProcessHandle.current().pid()}" +
      s"t${nonce.incrementAndGet()}"
}

/** Same-filesystem rename publication (local/HDFS): staging lives
  * BESIDE the generation directory so every move is metadata-only.
  */
object RenameGenCommitter extends GenCommitter {
  val name = "rename"

  def requireSupported(location: java.net.URI): Unit =
    require(location.getScheme == null || location.getScheme == "file",
      s"the rename committer needs a same-filesystem move and " +
        s"supports local tables only, got $location — use the put " +
        "committer (spark.graft.genCommitter=put) for stores " +
        "without rename")

  def stagingDir(genDir: java.io.File): java.io.File =
    new java.io.File(genDir.getParentFile,
      GenCommitter.stagingName(genDir))

  def publish(src: java.io.File, dst: java.io.File): Unit =
    java.nio.file.Files.move(src.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
}

/** Put publication (object-store discipline): each final name is a
  * fresh full-byte write — publish never renames, so staging needs no
  * same-filesystem relationship with the destination. The source file
  * is left intact; the caller deletes the staging tree wholesale,
  * exactly as an object-store deployment discards its upload buffers.
  *
  * Staging nevertheless lives BESIDE the generation directory (same
  * dot-prefixed location the rename committer uses), for two reasons
  * that are about the staged SPARK write, not the publish: (1) the
  * staged write's tasks run on executors, and the table directory is
  * the storage every executor can already reach — a driver-local
  * tmpdir is not (the round-16 shape staged there and was silently
  * local-mode-only); (2) a crashed writer's staging is then swept by
  * the same age-gated [[BucketedManifest.vacuum]] rule that collects
  * rename-committer staging, and while young it keeps the writer's
  * generation-number claim alive. A real object-store deployment
  * replaces the staged-write-then-put shape wholesale: its tasks
  * buffer in executor-local scratch and stream multipart uploads —
  * the seam to swap is exactly these two methods.
  */
object PutGenCommitter extends GenCommitter {
  val name = "put"

  def requireSupported(location: java.net.URI): Unit = ()

  def stagingDir(genDir: java.io.File): java.io.File =
    new java.io.File(genDir.getParentFile,
      GenCommitter.stagingName(genDir))

  def publish(src: java.io.File, dst: java.io.File): Unit =
    java.nio.file.Files.copy(src.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
}
