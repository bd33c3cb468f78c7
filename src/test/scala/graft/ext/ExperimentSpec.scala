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

  private def auc(rows: Seq[(Long, Boolean)]): (Any, Long, Long) = {
    val r = Experiment.aucExact(rows.toDF("s", "l"), col("s"), col("l"))
      .collect().head
    (r.get(0), r.getLong(1), r.getLong(2))
  }

  test("aucExact: perfect separation, reversal, and half-tie credit") {
    // all positives above all negatives → 1.0; reversed → 0.0
    assert(auc(Seq((1L, false), (2L, false), (3L, true), (4L, true)))
      === ((1.0, 2L, 2L)))
    assert(auc(Seq((1L, true), (2L, true), (3L, false), (4L, false)))
      === ((0.0, 2L, 2L)))
    // label independent of score at every tied value → exactly 0.5
    assert(auc(Seq((1L, false), (1L, true), (2L, false), (2L, true)))
      ._1 === 0.5)
    // hand-check with ties across classes: scores 1⁻ 2⁻ 2⁺ 3⁺ →
    // pairs: (2⁺,1⁻)=1, (2⁺,2⁻)=½, (3⁺,1⁻)=1, (3⁺,2⁻)=1 → 3.5/4
    assert(auc(Seq((1L, false), (2L, false), (2L, true), (3L, true)))
      ._1 === 0.875)
  }

  test("aucExact: single-class input yields NULL, not NaN") {
    val (a, p, n) = auc(Seq((1L, true), (2L, true)))
    assert(a === null && p === 2L && n === 0L)
  }

  test("aucExact drops NULL-score and NULL-label rows listwise") {
    val df = Seq((Some(1L), Some(false)), (Some(2L), None),
      (None, Some(true)), (Some(3L), Some(true)))
      .toDF("s", "l")
    val r = Experiment.aucExact(df, col("s"), col("l")).collect().head
    assert(r.getDouble(0) === 1.0)
    assert(r.getLong(1) === 1L && r.getLong(2) === 1L)
  }

  test("calibrationBins: clamped fixed-width bins, exact rates") {
    val rows = Seq((10L, true), (20L, false), (70L, true),
      (640L, true), (9999L, false))
    val out = Experiment.calibrationBins(rows.toDF("s", "l"),
        col("s"), col("l"), 64L, 9L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // bin 0: 10,20 → mean 15, rate ½; bin 1: 70; bin 9 clamps 640+9999
    assert(out.toSeq === Seq((0L, 2L, 1L, 15.0, 0.5),
      (1L, 1L, 1L, 70.0, 1.0), (9L, 2L, 1L, 5319.5, 0.5)))
  }

  test("calibrationBins clamps negative scores into bin 0") {
    // floor(-1/64) = -1 and floor(-700/64) = -11: without the lower
    // clamp these would leak one bin per distinct negative floor,
    // breaking the maxBin+1 output bound the scaladoc promises
    val rows = Seq((-700L, true), (-1L, false), (5L, true))
    val out = Experiment.calibrationBins(rows.toDF("s", "l"),
        col("s"), col("l"), 64L, 9L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 3L, 2L)))
  }

  test("calibrationBins floor division is exact floor, not truncation") {
    // a truncating integer division would put -63 in bin 0 via
    // trunc(-63/64) = 0 the same as floor — but -65 distinguishes:
    // floor(-65/64) = -2 (clamped to 0) vs trunc = -1 (clamped to 0);
    // the observable check is that positive bins are unaffected and
    // the mean inside bin 0 proves which rows landed there
    val rows = Seq((-65L, false), (64L, true), (127L, true))
    val out = Experiment.calibrationBins(rows.toDF("s", "l"),
        col("s"), col("l"), 64L, 9L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq === Seq((0L, 1L, -65.0), (1L, 2L, 95.5)))
  }

  test("sliceMetrics: per-value rates, null slice audited, z signs") {
    val df = Seq(
      ("en", true), ("en", true), ("en", false), ("en", true),
      ("de", false), ("de", false), (null: String, true))
      .toDF("lang", "l")
    val out = Experiment.sliceMetrics(df, Seq("lang" -> col("lang")),
        col("l"))
      .collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.get(6)))
      .toMap
    assert(out("en") === ((4L, 3L, 0.75,
      out("en")._4))) // en above global → positive z
    assert(out("en")._4.asInstanceOf[Double] > 0)
    assert(out("de")._4.asInstanceOf[Double] < 0)
    assert(out("null") === ((1L, 1L, 1.0, out("null")._4)))
    // global rate is the same on every row
    val g = Experiment.sliceMetrics(df, Seq("lang" -> col("lang")),
      col("l")).select("global_rate").distinct().collect()
    assert(g.length === 1 &&
      math.abs(g.head.getDouble(0) - 4.0 / 7.0) < 1e-9)
  }

  test("calibrationQuantile: equal-mass bins, ties collapse together") {
    // scores 1..100, label = score > 50: quintiles put exactly 20 in
    // each bin and the positive rate steps 0, 0, .5, 1, 1
    val rows = (1L to 100L).map(i => (i, i > 50))
    val out = Experiment.calibrationQuantile(rows.toDF("s", "l"),
        col("s"), col("l"), 5)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(out.map(_._2).toSeq === Seq(20L, 20L, 20L, 20L, 20L))
    assert(out.map(_._3).toSeq === Seq(0.0, 0.0, 0.5, 1.0, 1.0))
    // a constant score collapses every row into the TOP bin (all
    // thresholds equal the value, >= matches all) — one row out
    val const = (1L to 10L).map(_ => (7L, true))
    val c = Experiment.calibrationQuantile(const.toDF("s", "l"),
      col("s"), col("l"), 5).collect()
    assert(c.length === 1 && c.head.getLong(1) === 10L)
  }

  test("kappa: perfect, independent, and constant raters") {
    import org.apache.spark.sql.DataFrame
    def k(rows: Seq[(Boolean, Boolean)]): (Long, Any, Any) = {
      val df: DataFrame = rows.toDF("a", "b")
      val r = Experiment.kappa(df, col("a"), col("b")).collect().head
      (r.getLong(0), r.get(1), r.get(2))
    }
    // identical raters → κ = 1 (marginals balanced so pe = 1/2)
    assert(k(Seq((true, true), (false, false))) === ((2L, 1.0, 1.0)))
    // exactly-independent 2×2 (all four cells equal) → po = pe → κ = 0
    assert(k(Seq((true, true), (true, false), (false, true),
      (false, false))) === ((4L, 0.5, 0.0)))
    // perfect disagreement → κ = −1
    assert(k(Seq((true, false), (false, true))) === ((2L, 0.0, -1.0)))
    // BOTH raters constant → pe = 1 → denominator 0 → NULL, never NaN
    assert(k(Seq((true, true), (true, true)))._3 === null)
    // ONE constant rater is defined: agreement is pure chance → κ = 0
    assert(k(Seq((true, true), (true, false)))._3 === 0.0)
  }

  test("kappa drops NULL-rater rows listwise") {
    val df = Seq((Some(true), Some(true)), (None, Some(false)),
      (Some(false), None), (Some(false), Some(false)))
      .toDF("a", "b")
    val r = Experiment.kappa(df, col("a"), col("b")).collect().head
    assert(r.getLong(0) === 2L && r.getDouble(2) === 1.0)
  }

  test("rankingMetrics: hand-computed P@k / recall / RR / NDCG") {
    val run = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 20L, 2L), (1L, 30L, 1L), (1L, 40L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val r = Experiment.rankingMetrics(run, qrels, 3).collect().head
    assert(r.getLong(1) === 3L) // n_rel
    assert(r.getLong(2) === 3L) // n_ret
    assert(r.getLong(3) === 2L) // n_hits: d20 (rel 2), d30 (rel 1)
    assert(math.abs(r.getDouble(4) - 2.0 / 3) < 1e-9)  // p_at_k
    assert(math.abs(r.getDouble(5) - 2.0 / 3) < 1e-9)  // recall
    assert(r.getDouble(6) === 0.5) // rr: first hit at rank 2
    // dcg = 3/log2(3) + 1/log2(4); idcg over rels (2,1,1) =
    // 3/log2(2) + 1/log2(3) + 1/log2(4)
    val dcg = 3.0 / (math.log(3) / math.log(2)) + 0.5
    val idcg = 3.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(math.abs(r.getDouble(7) - dcg / idcg) < 1e-9)
  }

  test("rankingMetrics: no relevant judgments → NULL recall and ndcg") {
    val run = Seq((7L, 1L, 1L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((7L, 1L, 0L)).toDF("query_id", "doc_id", "rel")
    val r = Experiment.rankingMetrics(run, qrels, 5).collect().head
    assert(r.getLong(1) === 0L && r.getLong(3) === 0L)
    assert(r.isNullAt(5) && r.isNullAt(7)) // recall, ndcg undefined
    assert(r.getDouble(4) === 0.0 && r.getDouble(6) === 0.0)
  }

  test("rankingMetrics: judged query with nothing retrieved reports " +
      "n_ret = 0 and zero scores, never vanishes") {
    // query 2 is judged but the retriever returned nothing for it;
    // query 3 retrieved only past k (rank 4 > k = 3) — both must
    // anchor a row with zero quality, not drop out of the average
    val run = Seq((1L, 10L, 1L), (3L, 11L, 4L))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 10L, 1L), (2L, 20L, 2L), (3L, 11L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val rows = Experiment.rankingMetrics(run, qrels, 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    for (qid <- Seq(2L, 3L)) {
      val r = rows(qid)
      assert(r.getLong(2) === 0L, s"q$qid n_ret")  // nothing within k
      assert(r.getLong(1) === 1L && r.getLong(3) === 0L)
      assert(r.getDouble(4) === 0.0 && r.getDouble(5) === 0.0)
      assert(r.getDouble(6) === 0.0 && r.getDouble(7) === 0.0)
    }
    assert(rows(1L).getDouble(7) === 1.0)
  }

  test("rboTruncated: hand-computed overlap weights, exact rational") {
    // identical top-3 lists: RBO_min@3 = 0.1·(1 + 0.9 + 0.81) = 0.271
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val r1 = Experiment.rboTruncated(a, a, 3).collect().head
    assert(r1.getLong(1) === 3L && r1.getDouble(2) === 0.271)
    // swapped top-2: X_1 = 0, X_2 = 2 → 0.1·0.9·(2/2) = 0.09
    val b = Seq((1L, 20L, 1L), (1L, 10L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val r2 = Experiment.rboTruncated(
      a.where(col("rank") <= 2), b, 2).collect().head
    assert(r2.getLong(1) === 2L && r2.getDouble(2) === 0.09)
    // disjoint-query anchoring: a query present in only one run
    // reports rbo 0, never vanishes
    val c = Seq((9L, 50L, 1L)).toDF("query_id", "doc_id", "rank")
    val rows = Experiment.rboTruncated(a, c, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows === Map(1L -> ((0L, 0.0)), 9L -> ((0L, 0.0))))
    // weight-table internals: k = 3, p = 9/10 → D = 6000,
    // W = (1032, 432, 162) exactly
    assert(Experiment.rboWeights(3, 9L, 10L) ===
      ((Seq(1032L, 432L, 162L), 6000L)))
  }

  test("kendallTau: hand-computed inversions, reversal = -1, anchor") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    // full reversal: all 3 pairs inverted → tau = -1
    val rev = Seq((1L, 10L, 3L), (1L, 20L, 2L), (1L, 30L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val r1 = Experiment.kendallTau(a, rev, 3).collect().head
    assert(r1.getLong(1) === 3L && r1.getLong(2) === 0L &&
      r1.getLong(3) === 3L && r1.getDouble(4) === -1.0)
    // one adjacent swap: D = 1 of 3 pairs → tau = 1/3
    val swap = Seq((1L, 10L, 2L), (1L, 20L, 1L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val r2 = Experiment.kendallTau(a, swap, 3).collect().head
    assert(r2.getLong(2) === 2L && r2.getLong(3) === 1L)
    assert(math.abs(r2.getDouble(4) - 1.0 / 3) < 1e-12)
    // identical runs: tau = 1
    assert(Experiment.kendallTau(a, a, 3).collect().head
      .getDouble(4) === 1.0)
    // anchoring: query only in one run → n_common 0, NULL tau;
    // single common doc → no pairs, NULL tau
    val c = Seq((9L, 50L, 1L), (1L, 10L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val rows = Experiment.kendallTau(a, c, 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(1L, 9L))
    assert(rows(1L).getLong(1) === 1L && rows(1L).isNullAt(4))
    assert(rows(9L).getLong(1) === 0L && rows(9L).isNullAt(4))
  }

  test("rankingMetrics: perfect run in ideal order scores NDCG = 1") {
    val run = Seq((1L, 5L, 1L), (1L, 6L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 5L, 3L), (1L, 6L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val r = Experiment.rankingMetrics(run, qrels, 2).collect().head
    assert(r.getDouble(7) === 1.0 && r.getDouble(6) === 1.0)
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0)
  }

  test("aucExact enforces the bounded-domain contract loudly") {
    val rows = (1L to 100L).map(i => (i, i % 2 == 0))
    val ex = intercept[IllegalArgumentException] {
      Experiment.aucExact(rows.toDF("s", "l"), col("s"), col("l"),
        maxDomain = 50L).collect()
    }
    assert(ex.getMessage.contains("pre-bin"))
    // at the threshold it still runs (the guard is > , not >=)
    val ok = Experiment.aucExact(rows.toDF("s", "l"), col("s"),
      col("l"), maxDomain = 100L).collect().head
    assert(ok.getLong(1) === 50L && ok.getLong(2) === 50L)
  }
}
