package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch in-JVM A/B for round-12 directive #6 (not part of the
  * harness contract): the old per-token `exists` coverage
  * (O(tokens × intervals)) vs the merged two-pointer fold now in
  * [[graft.ext.Dedup.stripSubstringRuns]], on a worst-case
  * heavily-templated fixture (every doc dense with overlapping runs).
  * Results asserted identical each rep.
  */
object StripAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = 500
    val nToks = 3000
    val nRuns = 1000
    val docs = spark.range(1, nDocs + 1).select(col("id"),
      transform(sequence(lit(1), lit(nToks)),
        i => concat(lit("t"), pmod(col("id") * i, lit(97)))).as("toks"))
    // overlapping length-10 runs every 2 positions over the doc's front
    val runs = spark.range(1, nDocs + 1).select(col("id").as("id_b"),
        explode(sequence(lit(0), lit(nRuns - 1))).as("j"))
      .select(lit(0L).as("id_a"), col("id_b"), lit(1L).as("pos_a"),
        (col("j") * 2 + 1).cast(LongType).as("pos_b"),
        lit(10L).cast(LongType).as("run_len"))
      .drop("j")

    // the pre-round-12 formulation, verbatim
    def oldStrip(df: DataFrame): DataFrame = {
      val iv = runs.select(col("id_b").as("__sid"),
          struct(col("pos_b").as("s"),
            (col("pos_b") + col("run_len") - 1).as("e")).as("__iv"))
        .groupBy("__sid")
        .agg(sort_array(collect_list(col("__iv"))).as("__ivs"))
      val covered = (p: org.apache.spark.sql.Column,
          ivs: org.apache.spark.sql.Column) =>
        exists(ivs, iv => p >= iv.getField("s") && p <= iv.getField("e"))
      df.select(col("id"), col("toks").as("__t"))
        .join(iv, col("id") === col("__sid"), "left")
        .select(col("id"), col("__t"),
          coalesce(col("__ivs"),
            array().cast("array<struct<s:long,e:long>>")).as("__ivs"))
        .select(col("id"), size(col("__t")).as("__n"),
          filter(transform(col("__t"), (t, i) =>
              struct((i + 1).cast(LongType).as("p"), t.as("t"))),
            pt => !covered(pt.getField("p"), col("__ivs"))).as("__kept"))
        .filter(size(col("__kept")) > 0)
        .select(col("id"),
          concat_ws(" ", transform(col("__kept"), _.getField("t")))
            .as("text"),
          size(col("__kept")).cast(LongType).as("n_kept"),
          (col("__n") - size(col("__kept"))).cast(LongType)
            .as("n_removed"))
    }

    def time(body: => Array[org.apache.spark.sql.Row]): (Double,
        Array[org.apache.spark.sql.Row]) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    // warmup
    oldStrip(docs).count()
    graft.ext.Dedup.stripSubstringRuns(docs, "id", col("toks"), runs)
      .count()
    (1 to 3).foreach { i =>
      val (to, ro) = time(oldStrip(docs).orderBy("id").collect())
      val (tn, rn) = time(graft.ext.Dedup
        .stripSubstringRuns(docs, "id", col("toks"), runs)
        .orderBy("id").collect())
      require(ro.sameElements(rn), s"rep $i diverged")
      println(f"[sab] rep $i: exists $to%6.2f s   two-pointer $tn%6.2f s" +
        f"   ($nDocs docs x $nToks toks x $nRuns runs)")
    }
    spark.stop()
  }
}
