package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.ZipfDocs

/** Persisted heavy-tailed document fixture for ORACLE-CHECKED text
  * rows (round-8 directive: the driver's synthetic documents draw from
  * a ~50-word vocabulary, which structurally defeats df-ordered prefix
  * filtering and shrinks idf to a toy domain — until this fixture the
  * Zipf evidence lived only in untimed bench-protocol artifacts, so
  * text-family CORRECTNESS never ran on the distribution the operators
  * were designed for).
  *
  * [[ensure]] materializes the deterministic [[graft.ZipfDocs]] corpus
  * once per sf dir (idempotent — keyed on `_SUCCESS`, the
  * [[CsvFixture.ensure]] pattern; Bench pre-builds it untimed, Verify
  * builds it on first touch) and returns the ABSOLUTE parquet path:
  * the DuckDB oracle reads the same files via `read_parquet`, so the
  * harness hash-compare runs engine-vs-engine over identical bytes.
  *
  * Sizing follows the sf leaf (sf0.001 → 500 docs, sf0.01 → 2,000,
  * sf0.1 → 10,000; vocab 50,000 throughout — the tail law matters,
  * not the corpus size); the corpus is a pure function of
  * (nDocs, vocab), so every run writes identical rows.
  */
object ZipfFixture {

  val Vocab = 50000

  def nDocsFor(sfDir: String): Long =
    Paths.get(sfDir).getFileName.toString match {
      case "sf0.001" => 500L
      case "sf0.01"  => 2000L
      case "sf0.1"   => 10000L
      case _         => 2000L
    }

  /** Write (once) and return the absolute path of the fixture's
    * `documents.parquet` directory for `sfDir`.
    *
    * Publication is ATOMIC (round-8 ADVICE): the corpus is written to
    * a pid-keyed staging directory and renamed into place in one
    * filesystem move, so the shared path either doesn't exist or holds
    * a COMPLETE fixture — a concurrent run (parallel Verify + Bench
    * over the same sf dir) or the DuckDB oracle's read_parquet can
    * never observe deleted/partial part files mid-rewrite, which the
    * old check-then-`mode(overwrite)` allowed. A lost race is benign:
    * the corpus is a pure function of (nDocs, vocab), so the winner's
    * bytes are identical and the loser's staging dir is discarded. A
    * directory WITHOUT `_SUCCESS` at the final path is crash debris
    * (atomic publication means a winner appears complete instantly) —
    * it is swept and the move retried once.
    */
  def ensure(spark: SparkSession, sfDir: String,
      outBase: String = "target/zipf_fixture"): String = {
    val leaf = Paths.get(sfDir).getFileName.toString
    val dir = Paths.get(outBase, leaf, "documents.parquet").toAbsolutePath
    if (!Files.exists(dir.resolve("_SUCCESS"))) {
      val tmp = Paths.get(outBase, leaf,
        s"documents.parquet.stage_p${ProcessHandle.current().pid()}")
        .toAbsolutePath
      ZipfDocs.frame(spark, nDocsFor(sfDir), Vocab)
        .write.mode("overwrite").parquet(tmp.toString)
      if (!publish(tmp, dir)) {
        // the occupant is either a racing winner (complete, keep it)
        // or crash debris (no _SUCCESS — sweep and retry once)
        if (!Files.exists(dir.resolve("_SUCCESS"))) {
          deleteRecursively(dir)
          publish(tmp, dir)
        }
        deleteRecursively(tmp)
      }
    }
    dir.toString
  }

  /** Atomic directory rename into place; false if the target already
    * exists (the filesystem arbitrates the race).
    */
  private def publish(tmp: java.nio.file.Path,
      dir: java.nio.file.Path): Boolean =
    try {
      Files.move(tmp, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      true
    } catch { case _: java.nio.file.FileSystemException => false }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
