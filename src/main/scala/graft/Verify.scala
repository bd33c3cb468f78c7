package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // only — the driver always calls with two args = run everything)
    val Array(sfDir, outDir) = args.take(2)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").filter(_.nonEmpty).toSet
      else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop per-query leaked caches (e.g. the near-dup hash arrays),
      // checkpoint blocks (clearCache misses those — see Bench), and
      // nudge the weak-ref ContextCleaner
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // merge data-dependent oracles (fitted-constant SQL rendered for
    // THIS sfDir); a generation failure degrades that one query back to
    // the rows-only check instead of zeroing the whole dump
    // skip the generation work entirely (an embeddings scan + driver
    // k-means fit) when a name filter excludes every dynamic query
    val dynamicNeeded =
      only.isEmpty || only.exists(SparkEntry.dynamicQueryNames)
    val dynamic =
      if (!dynamicNeeded) Map.empty[String, String]
      else try SparkEntry.dynamicOracleSql(spark, sfDir, only)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle generation failed: $e")
        Map.empty[String, String]
      }
    val json = (SparkEntry.oracleSql ++ dynamic)
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // provenance stamp (round-10 ADVICE: a fresh re-run over
    // deterministic code is otherwise indistinguishable from a copied
    // artifact) — wall time + the HEAD sha this dump was built from
    val sha =
      try {
        val p = new ProcessBuilder("git", "rev-parse", "HEAD")
          .directory(new java.io.File(".")).start()
        val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
        if (p.waitFor() == 0) out else "unknown"
      } catch { case _: Throwable => "unknown" }
    Files.writeString(Paths.get(s"$outDir/run_meta.json"),
      s"""{"epoch_ms": ${System.currentTimeMillis()}, """ +
        s""""head_sha": ${q(sha)}, "sf_dir": ${q(sfDir)}}""")
    spark.stop()
  }
}
