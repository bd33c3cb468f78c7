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
}
