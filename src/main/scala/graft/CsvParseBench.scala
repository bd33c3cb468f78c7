package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B for the dictionary-parse experiment (round-7 directive
  * #6): times the full CSV flagship (`Validate.validateCsv` over the
  * star-schema fixture) under several dict-field type sets. Not part
  * of the harness contract; numbers land in PLANS.md and decide the
  * production default.
  */
object CsvParseBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pkg = graft.sources.CsvFixture.ensure(spark, sfDir)
    // order configurable so position/JIT bias is measurable: the
    // round-7 first A/B ran row-first and flattered whichever variant
    // came later
    val reversed = sys.env.get("SPARK_GRAFT_CSV_REVERSE").contains("1")
    val base: Seq[(String, (Set[String], Boolean))] = Seq(
      "row-parse" -> ((Set.empty[String], false)),
      "row-parse+rawcache" -> ((Set.empty[String], true)),
      "dict: dates" -> ((Set("date", "datetime"), false)))
    val variants = if (reversed) base.reverse else base
    // one untimed warmup on the row path (JIT for the shared stack)
    Validate.reportDF(spark,
      Validate.validateCsv(spark, pkg)).count()
    for ((name, types) <- variants) {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = Validate.reportDF(spark,
          Validate.validateCsv(spark, pkg, types._1, types._2)).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        (dt, n)
      }
      println(f"[csvparse] $name%-24s walls=${walls.map(w =>
        f"${w._1}%.2f").mkString(",")} rows=${walls.head._2}")
    }
    spark.stop()
  }
}
