package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property laws for the temporal joins and per-key caps: random data
  * against driver-computed reference semantics (the SQL formulations a
  * DuckDB user would write), including duplicate timestamps, null
  * keys, and skewed key distributions that fixed examples miss.
  */
class JoinsPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  private val keyGen = Gen.oneOf("A", "B", "C")
  // ~12% null keys: SQL join semantics (NULL never matches) must hold
  private val keyOptGen =
    Gen.frequency(7 -> keyGen.map(Option(_)), 1 -> Gen.const(None))
  private val tsGen = Gen.choose(0L, 50L) // tight range → many ties

  test("law: asOfJoin equals the latest-at-or-before reference " +
      "(incl. null keys)") {
    val leftGen = Gen.listOfN(25,
      Gen.zip(keyOptGen, tsGen)).map(_.zipWithIndex.map {
        case ((k, t), i) => (i.toLong, k, t)
      })
    val rightGen = Gen.listOfN(25,
      Gen.zip(keyOptGen, tsGen)).map(_.zipWithIndex.map {
        case ((k, t), i) => (1000L + i, k, t, i * 1.5)
      })
    check(Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val l = ls.toDF("lid", "k", "t")
        .select(col("lid"), col("k"), timestamp_micros(col("t")).as("t"))
      val r = rs.toDF("rid", "rk", "rt", "px")
        .select(col("rid"), col("rk"),
          timestamp_micros(col("rt")).as("rt"), col("px"))
      val got = Joins.asOfJoin(l, r, "k", "t", "rk", "rt", "rid",
          Seq("rid", "px"))
        .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
      // reference: per left row, the right row with max (rt, rid)
      // among same-NON-NULL-key rows with rt <= t; a null left or
      // right key never matches (SQL join semantics)
      val want = ls.map { case (lid, k, t) =>
        val cands = rs.filter(x =>
          k.isDefined && x._2.isDefined && x._2 == k && x._3 <= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(x => (x._3, x._1))._1))
      }.toMap
      got == want
    })
  }

  test("law: capPerKey keeps exactly min(cap, n) smallest-hash ids") {
    val rowsGen = Gen.listOfN(60, keyGen).map(_.zipWithIndex.map {
      case (k, i) => (i.toLong, k)
    })
    val capGen = Gen.choose(1, 15)
    check(Prop.forAll(rowsGen, capGen) { (rows, cap) =>
      val df = rows.toDF("id", "k")
      val kept = Sampling.capPerKey(df, Seq("k"), "id", cap, "p")
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // reference: per key, the cap smallest (hash, id) pairs
      def h(id: Long) = graft.ext.Dedup.hash48Value(s"p$id")
      val want = rows.groupBy(_._2).map { case (k, g) =>
        k -> g.map(_._1).sortBy(id => (h(id), id)).take(cap).toSet
      }
      kept == want
    })
  }

  test("law: rangeJoinBinned equals the filtered cross join at any bin") {
    val ptsGen = Gen.listOfN(30, Gen.choose(0L, 2000000L))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val ivGen = Gen.listOfN(5,
      Gen.zip(Gen.choose(0L, 2000000L), Gen.choose(0L, 500000L)))
      .map(_.zipWithIndex.map { case ((s, w), i) => (s"w$i", s, s + w) })
    val binGen = Gen.oneOf(1L, 7L, 60L)
    check(Prop.forAll(ptsGen, ivGen, binGen) { (ps, ivs, binSec) =>
      val p = ps.toDF("pid", "pt")
        .select(col("pid"), timestamp_micros(col("pt")).as("pt"))
      val iv = ivs.toDF("w", "ws", "we")
        .select(col("w"), timestamp_micros(col("ws")).as("ws"),
          timestamp_micros(col("we")).as("we"))
      val got = Joins.rangeJoinBinned(p, "pt", iv, "ws", "we", binSec)
        .select("pid", "w").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = (for {
        (pid, t) <- ps
        (w, s, e) <- ivs
        if t >= s && t < e
      } yield (pid, w)).toSet
      got == want
    })
  }
}
