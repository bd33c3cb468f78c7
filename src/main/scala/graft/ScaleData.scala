package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-up generator for bench evidence beyond the shipped scale
  * factors: replicates an sf directory `copies`× with per-replica key
  * shifting, producing a dataset whose VALIDATION WORKLOAD scales
  * linearly (the scale-invariance experiment recorded in PLANS.md).
  *
  * Replica design — each choice keeps per-row work identical while
  * preventing cross-replica interactions that would bend the scaling
  * away from linear:
  *   - fact/dim keys shift by `r · 10^8` on both sides of every fk, so
  *     referential structure (including the seeded orphans) replicates
  *     per replica;
  *   - duplicate-PK patterns replicate per replica (linear growth);
  *   - document text is caesar-rotated per replica — token/shingle
  *     SHAPES are identical but no shingle collides across replicas
  *     (otherwise every doc would near-dup its 9 replicas and the LSH
  *     candidate count would grow quadratically);
  *   - embeddings are circularly shifted per replica — norms unchanged,
  *     cross-replica cosines drop to noise (same reason);
  *   - event times shift by `r` days and user ids are disjoint, so
  *     sessions replicate linearly;
  *   - region/nation stay single-copy (real dims stay small at scale).
  *
  * Usage: runMain graft.ScaleData [srcDir] [outDir] [copies]
  */
object ScaleData {
  private val K = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shift(df: DataFrame, r: Int, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, (col(c) + lit(r * K)).cast(df.schema(c).dataType)))

    def rep(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val all = (0 until copies).map(r => f(df, r)).reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name written")
    }

    // dims stay single-copy
    Seq("region", "nation").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet")
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    val abc = "abcdefghijklmnopqrstuvwxyz"
    def rot(r: Int): String = abc.drop(r % 26) + abc.take(r % 26)
    rep("customer")((d, r) => shift(d, r, "c_custkey"))
    rep("supplier")((d, r) => shift(d, r, "s_suppkey"))
    rep("part") { (d, r) =>
      // p_name is caesar-rotated per replica (like document text):
      // verbatim copies would fuzzy-match ACROSS replicas and the
      // linkage decade read becomes ~100× output fan-out instead of
      // 10× input scaling — rotation keeps per-replica match structure
      // identical while cross-replica names differ in every character
      shift(d, r, "p_partkey").withColumn("p_name",
        translate(col("p_name"), abc + abc.toUpperCase,
          rot(r) + rot(r).toUpperCase))
    }
    rep("orders")((d, r) => shift(d, r, "o_orderkey", "o_custkey"))
    rep("lineitem")((d, r) =>
      shift(d, r, "l_orderkey", "l_partkey", "l_suppkey"))
    rep("events") { (d, r) =>
      val keyed = shift(d, r, "event_id", "user_id")
      // write ts as a µs TIMESTAMP (not raw nanos long): the replica is
      // read by BOTH engines for oracle compares, and DuckDB sees a
      // bare BIGINT column as numbers — no interval arithmetic. The
      // µs truncation is exactly what both engines apply to the
      // original TIMESTAMP(NANOS) source anyway.
      if (keyed.schema("ts").dataType == LongType)
        keyed.withColumn("ts", timestamp_micros(
          expr("ts div 1000") + lit(r * 86400L * 1000000L)))
      else keyed.withColumn("ts",
        col("ts") + expr(s"INTERVAL $r DAYS"))
    }
    rep("documents") { (d, r) =>
      shift(d, r, "doc_id").withColumn("text",
        translate(col("text"), abc + abc.toUpperCase,
          rot(r) + rot(r).toUpperCase))
    }
    rep("embeddings") { (d, r) =>
      val shifted = shift(d, r, "vec_id")
      if (r == 0) shifted
      else shifted.withColumn("embedding",
        expr(s"concat(slice(embedding, ${r + 1}, " +
          s"size(embedding) - $r), slice(embedding, 1, $r))"))
    }
    println(s"[scale] done: $out ($copies x $src)")
    spark.stop()
  }
}
