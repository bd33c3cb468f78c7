package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch single-query profiler (not part of the harness contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.toSeq match {
      case Seq() => Seq("x_dedup_minhash")
      case s => s
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    names.foreach { name =>
      // the builder call is INSIDE the timed region: eager operators
      // (duplicateClusters' propagation loop, ivf index builds) do their
      // work at plan-build time, exactly as Bench accounts them
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      if (explain) {
        println(s"[prof] ===== $name =====")
        println(df.queryExecution.executedPlan.treeString.linesIterator
          .map("[prof] " + _).mkString("\n"))
      }
      val n = df.count()
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
