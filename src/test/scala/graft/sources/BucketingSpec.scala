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

  test("bucketed band index: per-batch join reads the corpus side in place") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        graft.ext.TextAnalysis.tokens(col("text")).as("toks"))
    graft.sources.IndexStore.writeDedupIndexBucketed(docs, "idx_spec",
      numBuckets = 8, k = 5)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val corpus = Bucketing.readBucketed(spark, "idx_spec_bands")
        .select(col("id").as("corpus_id"), col("band"), col("bucket"))
      // a fresh ingest batch: the same docs re-banded under new ids
      val batch = graft.ext.Dedup.bandAssignmentsFromShingles(
          docs.select((col("id") + 100000L).as("id"),
            graft.ext.Dedup.shingleHashesFromTokens(col("toks"), 5)
              .as("sh")),
          32, 16)
        .select(col("id").as("new_id"), col("band").as("band_n"),
          col("bucket").as("bucket_n"))
      val joined = batch.join(corpus,
        col("band_n") === col("band") && col("bucket_n") === col("bucket"))
      assert(joined.count() > 0, "twin batch must hit corpus buckets")
      // traverse through AQE stages (executedPlan alone hides the
      // finalized subtree behind AdaptiveSparkPlanExec)
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => q +: flatten(q.plan)
        case other => other +: other.children.flatMap(flatten)
      }
      val all = flatten(joined.queryExecution.executedPlan)
      def isIndexScan(p: org.apache.spark.sql.execution.SparkPlan) =
        p match {
          case s: FileSourceScanExec =>
            s.tableIdentifier.exists(_.table == "idx_spec_bands")
          case _ => false
        }
      // the batch side may shuffle to match the bucketing; NO exchange
      // may sit anywhere above the bucketed corpus scan
      val offending = all.collect { case e: ShuffleExchangeExec
        if flatten(e.child).exists(isIndexScan) => e }
      assert(offending.isEmpty,
        "corpus index side must read in place")
      // and the bucketed scan IS present (the index, not a recompute)
      assert(all.exists(isIndexScan),
        "join must read the bucketed index table")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS idx_spec_bands")
      spark.sql("DROP TABLE IF EXISTS idx_spec_sh")
      spark.sql("DROP TABLE IF EXISTS idx_spec_meta")
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
