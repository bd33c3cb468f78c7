package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Algebraic laws of the CDC compaction family on random change logs —
  * the invariants an incremental pipeline silently relies on: a
  * driver-computed LWW reference, arrival-order independence, and
  * snapshot/delta split-invariance across any version-clean cut.
  */
class CdcPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  // (key, version, payload, delete) with few keys and tight versions →
  // plenty of per-key churn; cid (the index) breaks version ties
  private val logGen = Gen.listOfN(40,
    Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 9L),
      Gen.alphaStr.map(_.take(4)), Gen.prob(0.25)))
    .map(_.zipWithIndex.map { case ((k, v, p, d), i) =>
      (k, v, i.toLong, p, d)
    })

  private def lww(rows: Seq[(Long, Long, Long, String, Boolean)]) =
    Cdc.lastWriterWins(
      rows.toDF("k", "v", "cid", "payload", "del"),
      Seq("k"), Seq(col("v"), col("cid")),
      Seq("v", "cid", "payload"), col("del"))

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "cid", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  /** Driver-side reference: last (v, cid) wins, tombstones drop. */
  private def reference(rows: Seq[(Long, Long, Long, String, Boolean)]) =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      val (_, v, cid, p, del) = rs.maxBy(r => (r._2, r._3))
      if (del) None else Some((k, cid, p))
    }.toSet

  test("law: lastWriterWins equals the driver LWW reference") {
    check(Prop.forAll(logGen) { rows =>
      rows.isEmpty || collect(lww(rows)) == reference(rows)
    })
  }

  test("law: compaction is arrival-order independent") {
    check(Prop.forAll(logGen) { rows =>
      rows.isEmpty ||
        collect(lww(scala.util.Random.shuffle(rows))) ==
          collect(lww(rows))
    })
  }

  test("law: snapshot + delta across any version-clean cut == batch") {
    val cutGen = Gen.choose(0L, 10L)
    check(Prop.forAll(logGen, cutGen) { (rows, cut) =>
      rows.isEmpty || {
        val (early, late) = rows.partition(_._2 < cut)
        val base = lww(early)
        val inc = Cdc.applyChanges(base,
          late.toDF("k", "v", "cid", "payload", "del"),
          Seq("k"), Seq(col("v"), col("cid")),
          Seq("v", "cid", "payload"), col("del"))
        collect(inc) == reference(rows)
      }
    })
  }
}
