package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange

import graft.{SparkSpec, Tables}

/** Co-located joins via bucketing: tables bucketed on the join key must
  * join with ZERO shuffles (the 100 TB repeated-check path).
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fk join between tables bucketed on the key has no shuffle") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey")
    Bucketing.writeBucketed(li, "li_b", Seq("l_orderkey"), 8)
    Bucketing.writeBucketed(o, "o_b", Seq("o_orderkey"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle (or its absence) shows
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readBucketed(spark, "li_b")
        .join(Bucketing.readBucketed(spark, "o_b"),
          col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      assert(n == Tables.load(spark, dir, "lineitem").count(),
        "every lineitem row has its order")
      val plan = joined.queryExecution.executedPlan
      val exchanges = plan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"expected a shuffle-free co-located join, found:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("bucketed aggregation on the bucket key skips the shuffle") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber")
    Bucketing.writeBucketed(li, "li_agg_b", Seq("l_orderkey"), 8)
    try {
      val agg = Bucketing.readBucketed(spark, "li_agg_b")
        .groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
      agg.count()
      val exchanges = agg.queryExecution.executedPlan
        .collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        "groupBy on the bucket key must not re-shuffle")
    } finally spark.sql("DROP TABLE IF EXISTS li_agg_b")
  }
}
