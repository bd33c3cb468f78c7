package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    Experiment.cuped(rows.toDF("arm", "x", "y"), col("arm"),
        col("x"), col("y"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

  test("cuped: perfectly predictive covariate removes ALL variance") {
    // y == x in both arms → pooled θ = 1, var_adj = y−x variance = 0;
    // identical x distributions → x̄_arm = x̄_pool → mean_adj untouched
    val rows = for (a <- Seq("control", "treat"); v <- Seq(10L, 20L, 30L))
      yield (a, v, v)
    val out = run(rows)
    out.values.foreach { case (n, mp, ma, vp, va) =>
      assert(n === 3L)
      assert(mp === 20.0 && ma === 20.0)
      assert(vp === 200.0 / 3.0)
      assert(va === 0.0) // exactly — the identities cancel bitwise
    }
  }

  test("cuped: constant covariate degrades to the plain readout") {
    val rows = Seq(("control", 5L, 10L), ("control", 5L, 30L),
      ("treat", 5L, 20L), ("treat", 5L, 40L))
    val out = run(rows)
    out.values.foreach { case (_, mp, ma, vp, va) =>
      assert(ma === mp && va === vp) // θ = 0, never NaN
    }
    assert(out("control")._2 === 20.0 && out("treat")._2 === 30.0)
  }

  test("cuped: correlated covariate shrinks variance, preserves lift") {
    // y = x + effect + small deterministic noise; x identical across
    // arms so the adjusted LIFT equals the raw lift exactly
    val rows = for {
      a <- Seq("control", "treat"); i <- 1L to 40L
    } yield (a, 100L + i * 7L,
      100L + i * 7L + (if (a == "treat") 50L else 0L) + (i * 13L) % 5L)
    val out = run(rows)
    val (_, mpC, maC, vpC, vaC) = ("" , out("control")._2,
      out("control")._3, out("control")._4, out("control")._5)
    assert(vaC < vpC * 0.01, s"variance must collapse: $vaC vs $vpC")
    assert(out("treat")._5 < out("treat")._4 * 0.01)
    val rawLift = out("treat")._2 - mpC
    val adjLift = out("treat")._3 - maC
    assert(math.abs(adjLift - rawLift) < 1e-9)
  }

  test("cuped drops units with a NULL side") {
    val df = Seq((Some(1L), Some(10L)), (None, Some(5L)),
      (Some(3L), None), (Some(5L), Some(50L)))
      .toDF("x", "y").withColumn("arm", lit("a"))
    val r = Experiment.cuped(df, col("arm"), col("x"), col("y"))
      .collect().head
    assert(r.getLong(1) === 2L)
  }
}
