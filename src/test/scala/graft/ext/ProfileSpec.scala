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

  test("PoissonCdf matches the closed form") {
    // e^-1 · Σ_{j≤k} 1/j! for k = 0..8
    val e = math.exp(-1.0)
    assert(Profile.PoissonCdf.head === e)
    assert(math.abs(Profile.PoissonCdf(1) - 2 * e) < 1e-15)
    assert(Profile.PoissonCdf.length === 9)
    assert(Profile.PoissonCdf.last > 0.999998)
    assert(Profile.PoissonCdf === Profile.PoissonCdf.sorted)
  }

  test("bootstrapMeans: exact sums, weights reproducible, sane spread") {
    val df = (1 to 500).map(i => (i.toLong, 100L + (i % 7))).toDF("id", "c")
    val out = Profile.bootstrapMeans(df, col("id"), col("c"), 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.length === 16)
    // Poisson(1) weights: n_eff concentrates near n
    out.foreach { case (_, nEff, sumC, mean) =>
      assert(nEff > 350 && nEff < 650)
      assert(math.abs(mean - sumC / 100.0 / nEff) < 1e-12)
      // mean of values in [1.00, 1.06] stays there
      assert(mean > 1.0 && mean < 1.07)
    }
    // deterministic: a second run is bitwise identical
    val again = Profile.bootstrapMeans(df, col("id"), col("c"), 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === again.toSeq)
  }

  test("corrMatrix: perfect linear, anti-linear, and degenerate pairs") {
    val df = (1L to 50L).map(x => (x, 2 * x, 100 - x, 7L))
      .toDF("x", "y2", "yn", "const")
    val out = Profile.corrMatrix(df, Seq("x" -> col("x"),
        "y2" -> col("y2"), "yn" -> col("yn"), "const" -> col("const")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_ => r.getDouble(3))))
      .toMap
    assert(out.size === 6)
    // r is DETERMINISTIC, not algebraically exact: sqrt(va)·sqrt(vb)
    // rounds, so a perfect fit lands within an ulp of ±1
    assert(out(("x", "y2"))._1 === 50L)
    assert(math.abs(out(("x", "y2"))._2.get - 1.0) < 1e-12)
    assert(math.abs(out(("x", "yn"))._2.get + 1.0) < 1e-12)
    // zero-variance column → null r, never NaN or ±Infinity
    assert(out(("x", "const"))._2.isEmpty)
    assert(out(("y2", "const"))._2.isEmpty)
  }

  test("corrMatrix drops rows with any null (listwise) and is rerun-stable") {
    val df = Seq((Some(1L), Some(10L)), (Some(2L), None),
      (Some(3L), Some(30L)), (None, Some(9L)), (Some(5L), Some(50L)))
      .toDF("a", "b")
    val run = () => Profile.corrMatrix(df,
        Seq("a" -> col("a"), "b" -> col("b")))
      .collect().map(r => (r.getLong(2), r.getDouble(3))).head
    val (n, r1) = run()
    assert(n === 3L) // only the fully-populated rows
    assert(math.abs(r1 - 1.0) < 1e-15)
    assert(run() === ((n, r1))) // bitwise rerun stability
  }
}
