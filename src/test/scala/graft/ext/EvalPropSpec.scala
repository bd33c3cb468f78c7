package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Algebraic laws of the round-7 eval/retrieval operators on random
  * inputs — each law pins the distributed plan to a straight-line
  * driver-side reference, so a regression in shuffle/aggregate wiring
  * (not just in formulas) fails loudly.
  */
class EvalPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  private val ratersGen = Gen.listOfN(30,
    Gen.zip(Gen.prob(0.5), Gen.prob(0.3)))

  test("law: kappa is symmetric and matches the driver-side formula") {
    check(Prop.forAll(ratersGen) { rows =>
      val df = rows.toDF("a", "b")
      def k(x: String, y: String): Option[Double] = {
        val r = Experiment.kappa(df, col(x), col(y)).collect().head
        if (r.isNullAt(2)) None else Some(r.getDouble(2))
      }
      val n = rows.size.toDouble
      val a1 = rows.count(_._1).toDouble
      val b1 = rows.count(_._2).toDouble
      val both = rows.count(r => r._1 && r._2).toDouble
      val agree = n - a1 - b1 + 2 * both
      val chance = a1 * b1 + (n - a1) * (n - b1)
      val expect =
        if (n * n == chance) None
        else Some(BigDecimal((n * agree - chance) / (n * n - chance))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // symmetric in the raters, and equal to the scalar reference
      k("a", "b") == k("b", "a") &&
        k("a", "b").map(v => math.abs(v - expect.get) < 1e-9)
          .getOrElse(expect.isEmpty)
    })
  }

  private val docsGen = Gen.listOfN(12,
    Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))

  test("law: bm25TopK equals a straight-line Scala reference") {
    check(Prop.forAll(docsGen) { texts =>
      val terms = Seq("a", "c")
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.bm25TopK(df, col("doc_id"), col("text"),
          terms, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // scalar reference: same rational formula, same tie-break
      val toks = texts.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
      val n = toks.size.toLong
      val l = toks.map(_.size.toLong).sum
      val dfs = terms.map(t => t -> toks.count(_.contains(t)).toLong)
        .toMap
      val scored = toks.zipWithIndex.map { case (ts, i) =>
        val len = ts.size.toLong
        val s = terms.map { t =>
          val tf = ts.count(_ == t).toLong
          if (tf == 0) 0.0
          else ((2 * n - 2 * dfs(t) + 1).toDouble /
              (2 * dfs(t) + 1).toDouble) *
            ((22.0 * tf * l) / (10.0 * tf * l + 3.0 * l + 9.0 * len * n))
        }.reduce(_ + _)
        (i.toLong, s)
      }.filter(_._2 > 0)
        .sortBy { case (id, s) => (-s, id) }
        .take(5)
        .map { case (id, s) => (id, BigDecimal(s)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      got == scored
    })
  }

  private val strataGen = Gen.listOfN(50,
    Gen.zip(Gen.oneOf("p", "q", "r"), Gen.choose(0L, 40L)))

  test("law: neymanAllocation conserves the budget with ±1 fair shares") {
    check(Prop.forAll(strataGen, Gen.choose(1L, 97L)) { (rows, total) =>
      val out = Sampling.neymanAllocation(rows.toDF("g", "v"),
          col("g"), col("v"), total)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      out.values.sum == total && out.values.forall(_ >= 0)
    })
  }
}
