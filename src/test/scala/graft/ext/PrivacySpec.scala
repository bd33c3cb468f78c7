package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // zip=1 has 3 rows (2 diagnoses), zip=2 has 1 row, zip=3 has 2 rows
  // sharing ONE diagnosis (k-anonymous at k=2 but not 2-diverse)
  private def rows = Seq(
    (1, "a", "flu"), (1, "b", "flu"), (1, "c", "cold"),
    (2, "d", "flu"),
    (3, "e", "ulcer"), (3, "f", "ulcer")
  ).toDF("zip", "who", "diagnosis")

  test("kAnonymityViolations finds groups below k") {
    val v = Privacy.kAnonymityViolations(rows, Seq("zip"), 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(v === Map(2 -> 1L, 3 -> 2L))
  }

  test("kAnonymityStats reports rows at risk and the rate") {
    val s = Privacy.kAnonymityStats(rows, Seq("zip"), 3).collect().head
    assert(s.getAs[Long]("n_groups") === 3L)
    assert(s.getAs[Long]("n_violating") === 2L)
    assert(s.getAs[Long]("n_rows_at_risk") === 3L)
    assert(s.getAs[Double]("at_risk_rate") === 0.5)
  }

  test("lDiversityViolations flags homogeneous groups even when k holds") {
    val v = Privacy.lDiversityViolations(rows, Seq("zip"),
        col("diagnosis"), 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // zip=3 passes k=2 anonymity yet leaks: every member shares "ulcer"
    assert(v === Map(2 -> 1L, 3 -> 1L))
  }

  test("clean table yields no violations and zero risk") {
    val ok = Seq((1, "x"), (1, "y"), (1, "z")).toDF("zip", "who")
    assert(Privacy.kAnonymityViolations(ok, Seq("zip"), 3).count() === 0)
    val s = Privacy.kAnonymityStats(ok, Seq("zip"), 3).collect().head
    assert(s.getAs[Long]("n_violating") === 0L)
    assert(s.getAs[Double]("at_risk_rate") === 0.0)
  }

  /** Driver-side t_num reference: Σ over ALL global values of
    * |n_gv·N − N_v·n_g| — absent values contribute N_v·n_g.
    */
  private def refTnum(rows: Seq[(Int, String)]): Map[Int, Long] = {
    val n = rows.size.toLong
    val global = rows.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
    rows.groupBy(_._1).map { case (g, xs) =>
      val ng = xs.size.toLong
      val gv = xs.groupBy(_._2).map { case (v, ys) => v -> ys.size.toLong }
      g -> global.map { case (v, nv) =>
        math.abs(gv.getOrElse(v, 0L) * n - nv * ng) }.sum
    }
  }

  test("tCloseness: exact integer EMD incl. absent-value mass") {
    val rows = Seq(1 -> "a", 1 -> "b", 2 -> "a", 2 -> "b", 3 -> "a",
      3 -> "a")
    val out = Privacy.tCloseness(rows.toDF("zip", "diag"), Seq("zip"),
        col("diag"), (1L, 10L))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    val ref = refTnum(rows)
    // groups 1,2 mirror the global mix apart from group 3's skew;
    // group 3 is pure "a" and must carry the absent-"b" mass
    assert(out.keySet === Set(1, 2, 3))
    out.foreach { case (g, (ng, tnum, t, viol)) =>
      assert(tnum === ref(g), s"group $g")
      assert(math.abs(t - tnum.toDouble / (2.0 * ng * 6)) < 1e-15)
      // verdict is the integer cross-multiplication of t > 1/10
      assert(viol === (tnum * 10 > 2 * ng * 6))
    }
    assert(out(3)._4, "the pure group must violate t > 0.1")
  }

  test("tCloseness: a group matching the global mix scores zero") {
    val rows = Seq(1 -> "a", 1 -> "b", 2 -> "a", 2 -> "b")
    val out = Privacy.tCloseness(rows.toDF("zip", "diag"), Seq("zip"),
        col("diag"), (1L, 10L))
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getBoolean(4)))
      .toMap
    assert(out === Map(1 -> ((0L, false)), 2 -> ((0L, false))))
  }
}
