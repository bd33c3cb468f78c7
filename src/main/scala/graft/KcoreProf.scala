package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler for the x_graph_kcore 10× decade
  * regression (round 7). Not part of the harness contract.
  */
object KcoreProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kcore] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = Tables.load(spark, dir, "lineitem")
      .where(col("l_orderkey") % 3 === 0)
    val edges = time("coPartEdges build+count") {
      val e = li
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + 2, size(col("ps"))), y =>
            struct(x.as("src"), y.as("dst")))))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .localCheckpoint(true)
      println(s"[kcore] edges = ${e.count()}")
      e
    }
    val und = time("canonical distinct") {
      val u = edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct().localCheckpoint(true)
      println(s"[kcore] und = ${u.count()}")
      u
    }
    var e = time("symmetrize") {
      und.union(und.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint(true)
    }
    for (r <- 1 to 3) {
      e = time(s"round $r") {
        val deg = time(s"round $r deg") {
          e.groupBy("a").agg(count(lit(1)).as("__deg"))
            .localCheckpoint(true)
        }
        val alive = deg.filter(col("__deg") >= 25)
          .select(col("a").as("__alive"))
        println(s"[kcore] round $r alive=${alive.count()} " +
          s"of ${deg.count()}")
        val pre = e
          .join(alive.select(col("__alive").as("a"))
            .hint("shuffle_hash"), Seq("a"), "left_semi")
          .join(alive.select(col("__alive").as("b"))
            .hint("shuffle_hash"), Seq("b"), "left_semi")
        if (r == 1 && sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
          pre.count()
          println(pre.queryExecution.executedPlan.treeString
            .linesIterator.map("[kcore-plan] " + _).mkString("\n"))
        }
        val next = time(s"round $r joins+ckpt") {
          val n = pre.localCheckpoint(true)
          println(s"[kcore] round $r edges = ${n.count()}")
          n
        }
        next
      }
    }
    spark.stop()
  }
}
