package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** THROWAWAY: does dynamic-partition-overwrite insertInto write
  * correct bucket files into a partitioned+bucketed table, and is it
  * concurrent-safe across distinct gens?
  */
class ProtoInsSpec extends SparkSpec {

  test("proto: insertInto dynamic overwrite on bucketed+partitioned") {
    val fam = "proto_ins"
    spark.sql(s"DROP TABLE IF EXISTS `$fam`")
    val df = spark.range(0, 100).select(col("id"),
      (col("id") % 7).as("v"))
    df.withColumn("gen", lit(1))
      .write.mode("overwrite").partitionBy("gen")
      .bucketBy(4, "id").sortBy("id")
      .format("parquet").saveAsTable(fam)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = Seq(2, 3, 4, 5).map { g =>
        new Thread(() =>
          try {
            spark.range(g * 100, g * 100 + 100)
              .select(col("id"), (col("id") % 7).as("v"),
                lit(g).as("gen"))
              .write.mode("overwrite").insertInto(fam)
          } catch { case t: Throwable => errs.add(t): Unit })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(errs.isEmpty, s"${Option(errs.peek()).map(_.toString)}")
      assert(spark.table(fam).count() === 500)
      assert(spark.table(fam).where(col("gen") === 1).count() === 100,
        "dynamic overwrite must not clobber other partitions")
      // bucket file naming intact in an inserted gen?
      val loc = spark.sessionState.catalog.listPartitions(
        org.apache.spark.sql.catalyst.TableIdentifier(fam),
        Some(Map("gen" -> "3"))).head.location
      val names = Option(new java.io.File(new java.net.URI(
        loc.toString).getPath).listFiles()).get
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).map(_.getName).toSeq
      println(s"GEN3 FILES: $names")
      assert(names.forall(n => Bucketing.bucketIdOf(n).isDefined),
        s"inserted files must carry bucket ids: $names")
      // exchange-free agg over all gens
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => q +: flatten(q.plan)
        case other => other +: other.children.flatMap(flatten)
      }
      val agg = spark.table(fam).drop("gen").groupBy("id")
        .agg(sum("v").as("sv"))
      agg.collect()
      assert(!flatten(agg.queryExecution.executedPlan)
        .exists(_.isInstanceOf[ShuffleExchangeExec]))
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
      spark.sql(s"DROP TABLE IF EXISTS `$fam`")
    }
  }
}
