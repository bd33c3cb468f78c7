package graft

import org.apache.spark.sql.SparkSession

/** Scratch in-JVM measurement (not part of the harness contract):
  * VersionedFlat read-plan cost as a function of manifest batch count
  * (round-14 directive #6). Each append adds one batch-dir root to the
  * current manifest, and the multi-path parquet read carries one root
  * per batch — this measures where planning (analysis + file-listing +
  * physical planning) starts to hurt, to ground the maybeCompact
  * cadence default. Prints one line per batch count: planning wall
  * (executedPlan construction) and end-to-end count() wall.
  */
object VflatPlanAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 8, 32, 128, 512)
    counts.foreach { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_vplan_$n").toString
      graft.sources.VersionedFlat.write(
        Seq((0L, "v0")).toDF("id", "s").coalesce(1), dir)
      (1 until n).foreach { i =>
        graft.sources.VersionedFlat.append(
          Seq((i.toLong, s"v$i")).toDF("id", "s").coalesce(1), dir)
      }
      // warm the session's parquet footer codepaths once
      graft.sources.VersionedFlat.read(spark, dir).count(): Unit
      val reps = 3
      val (plan, total) = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = graft.sources.VersionedFlat.read(spark, dir)
        df.queryExecution.executedPlan // force planning
        val t1 = System.nanoTime()
        val c = df.count()
        val t2 = System.nanoTime()
        require(c == n.toLong, s"expected $n rows, got $c")
        ((t1 - t0) / 1e3, (t2 - t0) / 1e3)
      }.minBy(_._2)
      println(f"batches=$n%4d  plan=${plan / 1000}%8.1f ms  " +
        f"count=${total / 1000}%8.1f ms")
    }
    spark.stop()
  }
}
