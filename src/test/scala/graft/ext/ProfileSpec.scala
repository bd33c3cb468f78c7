package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("benford extracts leading digits, shares, and expectations") {
    // digits: 1 (1.0, 12.0, 0.15 → 1), 9 (900.0), 0-excluded, null-safe
    val df = Seq[java.lang.Double](1.0, 12.0, 0.15, 900.0, 0.0, null,
      -230.0).toDF("v")
    val out = Profile.benford(df, "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(t => (t._1, t._2)).toSeq ===
      Seq((1L, 3L), (2L, 1L), (9L, 1L)))
    assert(out.map(_._3).sum === 1.0)
    assert(math.abs(out.head._4 - math.log10(2.0)) < 1e-12)
  }

  test("benford on an empty or all-zero column is empty") {
    val df = Seq(0.0, 0.0).toDF("v")
    assert(Profile.benford(df, "v").count() === 0L)
  }
}
