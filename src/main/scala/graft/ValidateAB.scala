package graft

import org.apache.spark.sql.SparkSession

/** Scratch in-JVM A/B for round-12 directive #5 (not part of the
  * harness contract): per-TABLE check submission (the pre-round-12
  * shape — one composite future per resource, within-table checks
  * serial) vs per-CHECK submission ([[Validate.validateTyped]]'s new
  * shape). Variants interleave in one JVM per the round-11 fused-check
  * post-mortem (cross-JVM A/Bs had the sign wrong once); reports are
  * asserted identical every rep.
  */
object ValidateAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Tables.loadAll(spark, sfDir)
    val pkg = Tables.starSchema

    // the OLD submission shape, driven through the same task seam
    def perTable(): graft.report.PackageReport = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, pkg.resources.size.max(1)))
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val futures = pkg.resources.map { res =>
        Future(graft.report.TableReport(res.name,
          Validate.resourceTasks(tables, res).flatMap(_())))
      }
      try graft.report.PackageReport(
        Await.result(Future.sequence(futures), Duration.Inf))
      finally pool.shutdown()
    }

    def time[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // warmup both paths once, untimed
    val w1 = perTable(); val w2 = Validate.validateTyped(tables, pkg)
    require(w1 == w2, "reports must be identical")
    val olds = collection.mutable.ArrayBuffer.empty[Double]
    val news = collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { i =>
      val (to, ro) = time(perTable())
      val (tn, rn) = time(Validate.validateTyped(tables, pkg))
      require(ro == rn, s"rep $i: reports diverged")
      olds += to; news += tn
      println(f"[vab] rep $i: per-table $to%6.2f s   per-check $tn%6.2f s")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply((xs.length - 1) / 2)
    println(f"[vab] MEDIAN per-table ${med(olds.toSeq)}%6.2f s   " +
      f"per-check ${med(news.toSeq)}%6.2f s   (reps=$reps, $sfDir)")
    spark.stop()
  }
}
