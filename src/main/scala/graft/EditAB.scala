package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch in-JVM A/B (not part of the harness contract): the
  * edit-distance segment-frequency cap on a TEMPLATE-HEAVY corpus —
  * the adversarial shape a boilerplate-laden 100 TB crawl actually
  * has. Every document shares a 60-char boilerplate prefix; tails are
  * unique except for planted one-char mutant pairs. The boilerplate's
  * segments collide across the WHOLE corpus, so the uncapped join
  * generates ~n²/2 candidates that all verify to distance > d — pure
  * waste — while the capped join reaches the same exact answer
  * through the rare tail segments alone. Result sets asserted EQUAL
  * each rep (the cap loses only pairs whose every shared untouched
  * segment is boilerplate — and such pairs differ in their whole tail,
  * putting them far beyond d anyway on this corpus).
  */
object EditAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val d = 4
    // 200-char boilerplate + 50-char FIXED-WIDTH unique tail: every
    // document has the same length (250), so segments 0–3 (chars
    // 0–199) fall entirely inside the boilerplate and are shared by
    // the WHOLE corpus — the hot-segment shape. Every 10th doc gets a
    // mutant twin (id + 1000000, one char substituted INSIDE the
    // boilerplate, at position 70 — deliberately: the twin's rare
    // TAIL segment stays identical to its source's, so the planted
    // pair remains discoverable via that rare segment even when the
    // cap drops every hot boilerplate segment (a tail mutation would
    // leave only capped-away hot segments as candidates and the
    // capped ⊆ exact assertion below would trivialize to empty).
    val boiler = ("official disclaimer: the following text is " +
      "provided as is, without warranty of any kind, express or " +
      "implied, including but not limited to the warranties of " +
      "merchantability or fitness. ").padTo(200, 'z').mkString
    def tail(id: org.apache.spark.sql.Column) =
      concat_ws("", transform(sequence(lit(1), lit(5)),
        i => lpad(pmod(id * i * 2654435761L, lit(9999999967L))
          .cast("string"), 10, "0")))
    val base = spark.range(1, n + 1).select(col("id"),
      concat(lit(boiler), tail(col("id"))).as("s"))
    val twins = base.filter(col("id") % 10 === 0)
      .select((col("id") + 1000000L).as("id"),
        concat(substring(col("s"), 1, 69), lit("X"),
          col("s").substr(lit(71), length(col("s")))).as("s"))
    val docs = base.unionByName(twins).cache()
    docs.count()

    def run(tag: String, cap: Long): Set[(Long, Long, Long)] = {
      val t0 = System.nanoTime()
      val got = graft.ext.Dedup.editDistancePairs(docs, "id", col("s"),
          d, maxSegFreq = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-14s cap=$cap%-6d wall=$dt%7.2f s pairs=${got.size}")
      got
    }
    // interleaved reps: the cap's contract is a SUBSET with exact
    // distances that keeps every pair with in-cap segment evidence —
    // on this corpus that is all planted mutant pairs (they share
    // their rare tail segment); the uncapped run also surfaces a few
    // incidental tail-collision pairs whose only shared segments are
    // boilerplate, the documented recall loss
    for (rep <- 1 to 3) {
      val capped = run(s"rep$rep capped", 100L)
      val uncapped = run(s"rep$rep uncapped", 0L)
      require(capped.subsetOf(uncapped),
        "capped result must be a subset of the exact answer")
      val planted = uncapped.filter { case (a, b, _) =>
        b == a + 1000000L
      }
      require(planted.size == n / 10 && planted.subsetOf(capped),
        s"cap must keep every planted mutant pair " +
          s"(${planted.size} planted, ${(planted -- capped).size} lost)")
      println(s"rep$rep: planted=${planted.size} " +
        s"boilerplate-only pairs lost to the cap=" +
        s"${(uncapped -- capped).size}")
    }
    spark.stop()
  }
}
