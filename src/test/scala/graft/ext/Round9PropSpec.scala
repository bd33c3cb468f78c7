package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Algebraic laws of the round-9 operators on random inputs — the
  * [[EvalPropSpec]] discipline: each law pins the distributed plan to
  * a straight-line driver-side reference or an exact identity, so a
  * regression in shuffle/aggregate wiring (not just in formulas)
  * fails loudly.
  */
class Round9PropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  /** A random top-k run over one query: a permutation of a doc subset. */
  private val runGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(2, 8)
    docs <- Gen.pick(n, 10L to 30L)
    perm <- Gen.const(scala.util.Random.shuffle(docs.toList))
  } yield perm.zipWithIndex.map { case (d, i) => (1L, d, i + 1L) }

  test("law: RBO is symmetric, bounded, and exact on identical runs") {
    check(Prop.forAll(runGen, runGen) { (ra, rb) =>
      val a = ra.toDF("query_id", "doc_id", "rank")
      val b = rb.toDF("query_id", "doc_id", "rank")
      def rbo(x: org.apache.spark.sql.DataFrame,
          y: org.apache.spark.sql.DataFrame): Double =
        Experiment.rboTruncated(x, y, 8).collect().head.getDouble(2)
      val ab = rbo(a, b)
      // symmetry: max(ra, rb) is symmetric in the runs
      val symmetric = ab == rbo(b, a)
      // identical runs score the exact prefix mass Σ (1−p)p^{d−1},
      // d over 1..|run| (every common doc enters at its own depth)
      val (w, dd) = Experiment.rboWeights(8, 9L, 10L)
      val selfExpect = BigDecimal(
        ra.map { case (_, _, r) => w(r.toInt - 1) }.sum.toDouble /
          dd.toDouble)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      val self = rbo(a, a) == selfExpect
      symmetric && self && ab >= 0.0 && ab <= 1.0
    })
  }

  test("law: Kendall tau is symmetric, anti-symmetric under reversal, " +
      "and matches the scalar pair count") {
    check(Prop.forAll(runGen, runGen) { (ra, rb) =>
      val a = ra.toDF("query_id", "doc_id", "rank")
      val b = rb.toDF("query_id", "doc_id", "rank")
      def tau(x: org.apache.spark.sql.DataFrame,
          y: org.apache.spark.sql.DataFrame): Option[Double] = {
        val r = Experiment.kendallTau(x, y, 8).collect().head
        if (r.isNullAt(4)) None else Some(r.getDouble(4))
      }
      // scalar reference: all common-doc pairs, count inversions
      val ma = ra.map { case (_, d, r) => d -> r }.toMap
      val mb = rb.map { case (_, d, r) => d -> r }.toMap
      val common = ma.keySet.intersect(mb.keySet).toList.sorted
      val pairs = for {
        (u, i) <- common.zipWithIndex; v <- common.drop(i + 1)
      } yield math.signum((ma(u) - ma(v)).toDouble) *
        math.signum((mb(u) - mb(v)).toDouble)
      val expect =
        if (pairs.size < 1) None
        else Some(BigDecimal(pairs.sum / pairs.size)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val got = tau(a, b)
      // reversal of one run flips the sign exactly
      val kMax = rb.map(_._3).max
      val rev = rb.map { case (q, d, r) => (q, d, kMax + 1 - r) }
        .toDF("query_id", "doc_id", "rank")
      val flip = (tau(a, b), tau(a, rev)) match {
        case (Some(t1), Some(t2)) => t1 == -t2
        case (None, None)         => true
        case _                    => false
      }
      got == tau(b, a) && flip &&
        ((got, expect) match {
          case (Some(g), Some(e)) => math.abs(g - e) < 1e-9
          case (None, None)       => true
          case _                  => false
        })
    })
  }

  private val giniGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(0L, 50L))

  test("law: Gini is scale-invariant and matches the mean-difference " +
      "identity") {
    check(Prop.forAll(giniGen, Gen.choose(2L, 9L)) { (xs, c) =>
      def gini(vs: List[Long]): Option[Double] = {
        val r = Profile.giniByGroup(vs.map(("g", _)).toDF("s", "x"),
          col("s"), col("x")).collect().head
        if (r.isNullAt(3)) None else Some(r.getDouble(3))
      }
      val g = gini(xs)
      // scalar reference: G = Σ_ij |xi − xj| / (2 n Σx)
      val s = xs.sum.toDouble
      val expect =
        if (s == 0) None
        else Some(BigDecimal(
          (for (a <- xs; b <- xs) yield math.abs(a - b).toDouble).sum /
            (2.0 * xs.size * s))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val matches = (g, expect) match {
        case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
        case (None, None)       => true
        case _                  => false
      }
      // multiplying every value by a positive constant changes nothing
      matches && gini(xs.map(_ * c)) == g
    })
  }

  test("law: matchDistribution output ⊆ source ids, ≤ n rows, and " +
      "per-bin counts never exceed quotas") {
    val srcGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 500L), Gen.choose(0L, 40L)))
    check(Prop.forAll(srcGen, giniGen) { (src0, tgt) =>
      val src = src0.distinctBy(_._1)
      val source = src.toDF("id", "v")
      val target = tgt.map(v => Tuple1(v)).toDF("v")
      val picked = Sampling.matchDistribution(target, source,
          col("v"), col("v"), "id", nBins = 4, n = 7, salt = "pp")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val ids = src.map(_._1).toSet
      picked.length <= 7 &&
        picked.forall { case (id, _) => ids(id) } &&
        picked.map(_._1).distinct.length == picked.length
    })
  }

  test("law: grouped KS equals the single-cohort operator on every " +
      "random window") {
    val winGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 2L), Gen.choose(1L, 15L)))
    val refGen = Gen.nonEmptyListOf(Gen.choose(1L, 15L))
    check(Prop.forAll(winGen, refGen) { (ws, ref) =>
      val win = ws.toDF("w", "v")
      val refDf = ref.map(Tuple1(_)).toDF("v")
      val grouped = Profile.ksTwoSampleByGroup(win, col("w"), col("v"),
          refDf, col("v"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
        .toMap
      ws.map(_._1).distinct.forall { w =>
        val lone = Profile.ksTwoSample(
            win.where(col("w") === w).select(col("v")), refDf, col("v"))
          .collect().head
        grouped(w) == ((lone.getLong(0), lone.getLong(1),
          lone.getDouble(2), lone.getLong(3)))
      }
    })
  }
}
