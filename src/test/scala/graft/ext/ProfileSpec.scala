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

  test("olsTrend recovers an exact line per group; degenerate x → null") {
    val df = (1L to 40L).flatMap { x =>
      Seq(("up", x, 3 * x + 7), ("down", x, 100 - 2 * x),
        ("flat", 5L, x)) // zero x-variance group
    }.toDF("g", "x", "y")
    val out = Profile.olsTrend(df, Seq("g"), col("x"), col("y"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        Option(r.get(2)).map(_ => r.getDouble(2)),
        Option(r.get(3)).map(_ => r.getDouble(3))))
      .toMap
    // exact integer moments → the perfect fit is exact, not approximate
    assert(out("up") === ((40L, Some(3.0), Some(7.0))))
    assert(out("down") === ((40L, Some(-2.0), Some(100.0))))
    assert(out("flat")._2.isEmpty && out("flat")._3.isEmpty)
  }

  test("olsTrend drops rows with a null in either variable") {
    val df = Seq((Some(1L), Some(10L)), (Some(2L), None),
      (None, Some(5L)), (Some(3L), Some(30L))).toDF("x", "y")
      .withColumn("g", lit("a"))
    val r = Profile.olsTrend(df, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(2) === 10.0)
  }

  test("chiSquare matches the hand-computed 2x2 statistic") {
    // O = [[30,10],[10,30]] → E = 20 everywhere, χ² = 4·(10²/20) = 20,
    // dof = 1, V = √(20/80) = 0.5
    val rows =
      Seq.fill(30)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
      Seq.fill(10)(("B", "X")) ++ Seq.fill(30)(("B", "Y"))
    val r = Profile.chiSquare(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(r.getLong(0) === 80L)
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getLong(3) === 1L)
    assert(math.abs(r.getDouble(4) - 20.0) < 1e-9)
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-9)
  }

  test("chiSquare: proportional table scores zero; absent cells count") {
    val indep = Seq.fill(20)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
      Seq.fill(40)(("B", "X")) ++ Seq.fill(20)(("B", "Y"))
    val r0 = Profile.chiSquare(indep.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(r0.getDouble(4) === 0.0)
    // ("B","Y") never observed: its expected mass E = 9·9/18 = 4.5
    // must still contribute — χ² = Σ (O−E)²/E = 4.5+4.5+4.5+4.5 = 18
    val gap = Seq.fill(9)(("A", "Y")) ++ Seq.fill(9)(("B", "X"))
    val r1 = Profile.chiSquare(gap.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(math.abs(r1.getDouble(4) - 18.0) < 1e-9)
  }

  test("mutualInfo: independence → 0 exactly; identity → H, norm 1") {
    // proportional table: o·N == r·c in every cell → ln(1) = 0 terms
    val indep = Seq.fill(20)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
      Seq.fill(40)(("B", "X")) ++ Seq.fill(20)(("B", "Y"))
    val r0 = Profile.mutualInfo(indep.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(r0.getDouble(2) === 0.0)
    // a == b: I(A;A) = H(A); two equal classes → H = ln 2
    val ident = (Seq.fill(30)("u") ++ Seq.fill(30)("v")).map(x => (x, x))
    val r1 = Profile.mutualInfo(ident.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(math.abs(r1.getDouble(2) - math.log(2)) < 1e-9)
    assert(math.abs(r1.getDouble(2) - r1.getDouble(3)) < 1e-12)
    assert(math.abs(r1.getDouble(5) - 1.0) < 1e-12)
    // hand case: [[30,10],[10,30]] — I = Σ p·ln(p/(pa·pb))
    val rows =
      Seq.fill(30)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
      Seq.fill(10)(("B", "X")) ++ Seq.fill(30)(("B", "Y"))
    val r2 = Profile.mutualInfo(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    val expected = 2 * (0.375 * math.log(1.5) + 0.125 * math.log(0.5))
    assert(math.abs(r2.getDouble(2) - expected) < 1e-9)
  }

  test("fdViolations reports only violating groups, with witnesses") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "z")).toDF("k", "v")
    val out = Profile.fdViolations(df, Seq("k"), col("v"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
      .toMap
    assert(out === Map(2L -> ((3L, 3L, "a", "c"))))
    // a holding FD yields an empty frame
    assert(Profile.fdViolations(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      Seq("k"), col("v")).count() === 0L)
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

  test("madOutliers: exact lower medians, robust to contamination") {
    // group "a": 1..9 plus two wild outliers; median/MAD unmoved
    val rows = ((1L to 9L).map(("a", _)) ++ Seq(("a", 1000L),
      ("a", -1000L)) ++ (10L to 20L).map(("b", _))).toDF("g", "v")
    val out = Profile.madOutliers(rows, Seq("g"), col("v"), 3L, 1L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toMap
    // 11 values sorted: -1000,1..9,1000 → lower median 5; devs sorted:
    // 0,1,1,2,2,3,3,4,4,1005,995 → median dev 3; outliers beyond 9: 2
    assert(out("a") === ((11L, 5L, 3L, 2L)))
    // clean uniform group: median 15, MAD 3, no outliers at 3*MAD
    assert(out("b") === ((11L, 15L, 3L, 0L)))
  }

  test("madOutliers lower-median convention on even group sizes") {
    val rows = Seq(("x", 1L), ("x", 2L), ("x", 3L), ("x", 4L))
      .toDF("g", "v")
    val r = Profile.madOutliers(rows, Seq("g"), col("v"), 3L, 1L)
      .collect().head
    assert(r.getLong(2) === 2L) // lower of the two middles, never 2.5
  }

  test("ksTwoSample: hand-computed exact supremum and location") {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(3L, 4L).toDF("v")
    // F_a = 1/3, 2/3, 1, 1 at v = 1..4; F_b = 0, 0, 1/2, 1 →
    // diffs 1/3, 2/3, 1/2, 0 — supremum 2/3 achieved at v = 2
    val r = Profile.ksTwoSample(a, b, col("v")).collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - 2.0 / 3) < 1e-12)
    assert(r.getLong(3) === 2L)
  }

  test("ksTwoSample: identical distributions score 0; disjoint score 1") {
    val x = Seq(1L, 2L, 2L, 5L).toDF("v")
    val same = Profile.ksTwoSample(x, x, col("v")).collect().head
    assert(same.getDouble(2) === 0.0)
    val lo = Seq(1L, 2L).toDF("v")
    val hi = Seq(9L, 10L).toDF("v")
    val far = Profile.ksTwoSample(lo, hi, col("v")).collect().head
    assert(far.getDouble(2) === 1.0 && far.getLong(3) === 2L)
  }

  test("ksTwoSampleByGroup ≡ per-group ksTwoSample loop, including " +
      "degenerate groups") {
    // window 0: shifted; window 1: identical to ref; window 2: only
    // NULL values (degenerate — must still anchor a row with n_a = 0
    // and NULL ks, where the per-window loop would have thrown the
    // ANSI divide-by-zero)
    val win = Seq((0L, Some(7L)), (0L, Some(8L)), (1L, Some(1L)),
      (1L, Some(2L)), (2L, None: Option[Long]))
      .toDF("w", "v")
    val ref = Seq(1L, 2L).toDF("v")
    val rows = Profile.ksTwoSampleByGroup(win, col("w"), col("v"),
        ref, col("v"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(0L, 1L, 2L))
    for (wId <- Seq(0L, 1L)) {
      val g = rows(wId)
      val lone = Profile.ksTwoSample(
          win.where(col("w") === wId).select(col("v")), ref, col("v"))
        .collect().head
      assert((g.getLong(1), g.getLong(2), g.getDouble(3), g.getLong(4))
        === ((lone.getLong(0), lone.getLong(1), lone.getDouble(2),
          lone.getLong(3))), s"window $wId")
    }
    assert(rows(0L).getDouble(3) === 1.0) // disjoint supports
    assert(rows(1L).getDouble(3) === 0.0) // identical
    val g2 = rows(2L)
    assert(g2.getLong(1) === 0L && g2.getLong(2) === 2L)
    assert(g2.isNullAt(3)) // undefined KS on an empty cohort
  }

  test("ksTwoSampleByGroup enforces the per-group domain bound") {
    val win = (1L to 40L).map(v => (0L, v)).toDF("w", "v")
    val ref = Seq(1L).toDF("v")
    val ex = intercept[IllegalArgumentException] {
      Profile.ksTwoSampleByGroup(win, col("w"), col("v"), ref, col("v"),
        maxDomain = 20L).collect()
    }
    assert(ex.getMessage.contains("quantize"))
  }

  test("spearman: monotone = 1, reversed = -1, ties hand-computed, " +
      "constant NULL") {
    val up = Seq((1L, 10L), (2L, 400L), (3L, 900000L)).toDF("x", "y")
    assert(Profile.spearman(up, col("x"), col("y")).collect().head
      .getDouble(1) === 1.0) // any monotone map scores exactly 1
    val down = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(Profile.spearman(down, col("x"), col("y")).collect().head
      .getDouble(1) === -1.0)
    // ties in x: mid-ranks (2cum−cnt) = (2,2,5) vs (1,3,5) →
    // ρ = 18/sqrt(18·24) = sqrt(3)/2
    val tied = Seq((1L, 5L), (1L, 7L), (2L, 9L)).toDF("x", "y")
    val r = Profile.spearman(tied, col("x"), col("y")).collect().head
    assert(r.getLong(0) === 3L)
    assert(math.abs(r.getDouble(1) - math.sqrt(3.0) / 2) < 1e-12)
    // constant column: zero rank variance → NULL, never NaN
    val const = Seq((1L, 5L), (1L, 7L)).toDF("x", "y")
    assert(Profile.spearman(const, col("x"), col("y")).collect().head
      .isNullAt(1))
  }

  test("giniByGroup: hand values, uniform 0, concentrated (n-1)/n, " +
      "all-zero NULL, negatives rejected") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 4L),  // G = 1/3
      ("u", 2L), ("u", 2L),                        // uniform → 0
      ("c", 0L), ("c", 0L), ("c", 9L),             // max conc → 2/3
      ("z", 0L), ("z", 0L))                        // S = 0 → NULL
      .toDF("s", "x")
    val rows = Profile.giniByGroup(df, col("s"), col("x"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(rows("a").getDouble(3) - 1.0 / 3) < 1e-12)
    assert(rows("a").getLong(1) === 3L && rows("a").getLong(2) === 6L)
    assert(rows("u").getDouble(3) === 0.0)
    assert(math.abs(rows("c").getDouble(3) - 2.0 / 3) < 1e-12)
    assert(rows("z").isNullAt(3))
    val ex = intercept[IllegalArgumentException] {
      Profile.giniByGroup(Seq(("a", -1L)).toDF("s", "x"),
        col("s"), col("x")).collect()
    }
    assert(ex.getMessage.contains("non-negative"))
  }

  test("quantileNormalize: hand-computed grid mapping") {
    // pooled = [1,2,3,4,10]; nBins = 4 → grid = (2.0, 3.0, 4.0);
    // source b's lone huge value sits at its own median → pooled
    // median 3.0 — the cross-source calibration this exists for
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L)).toDF("s", "x")
    val rows = Profile.quantileNormalize(df, col("s"), col("x"),
        nBins = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows(("a", 1L)) === ((0.125, 2.0))) // q < 1/4 clamps to p25
    assert(rows(("a", 2L)) === ((0.375, 2.0)))
    assert(rows(("a", 3L)) === ((0.625, 3.0)))
    assert(rows(("a", 4L)) === ((0.875, 4.0)))
    assert(rows(("b", 10L)) === ((0.5, 3.0)))
  }

  test("quantileNormalize enforces the per-group domain bound") {
    val wide = (1L to 40L).map(v => ("a", v)).toDF("s", "x")
    val ex = intercept[IllegalArgumentException] {
      Profile.quantileNormalize(wide, col("s"), col("x"),
        nBins = 4, maxDomain = 20L).collect()
    }
    assert(ex.getMessage.contains("quantize"))
  }

  test("jsDivergence: hand-computed terms, identical = 0, disjoint = ln2") {
    // P = {x}, Q = {x:1/2, y:1/2}:
    //   term_x = (ln(4/3) + 0.5·ln(2/3)) / 2, term_y = 0.25·ln 2 —
    //   snapped separately, js = 0.215761554339
    val df = Seq(("p", "x"), ("q", "x"), ("q", "y")).toDF("k", "v")
    val r = Profile.jsDivergence(df, col("k"), col("v")).collect().head
    assert((r.getString(0), r.getString(1)) === (("p", "q")))
    assert((r.getLong(2), r.getLong(3)) === ((1L, 2L)))
    assert(math.abs(r.getDouble(4) - 0.215761554339) < 1e-11)
    // identical distributions
    val same = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("k", "v")
    assert(Profile.jsDivergence(same, col("k"), col("v"))
      .collect().head.getDouble(4) === 0.0)
    // fully disjoint vocabularies: js = ln 2, js_norm = 1
    val disj = Seq(("a", "x"), ("a", "y"), ("b", "z")).toDF("k", "v")
    val d = Profile.jsDivergence(disj, col("k"), col("v")).collect().head
    assert(math.abs(d.getDouble(4) - math.log(2.0)) < 1e-11)
    assert(d.getDouble(5) === 1.0)
  }

  test("jsDivergence emits every unordered group pair exactly once") {
    val df = Seq(("a", "x"), ("b", "x"), ("c", "y")).toDF("k", "v")
    val pairs = Profile.jsDivergence(df, col("k"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("jsDivergence equi-join form ≡ the union-domain enumeration, " +
      "bit for bit") {
    // r17 plan change (shared-token equi-join + exact private-mass
    // redistribution) pinned against a literal reimplementation of the
    // old algorithm: replicate every cell to its pairs, build the
    // union domain with zeros, snap each term once, sum. Mixed
    // shared/private vocabularies and skewed counts on purpose.
    val df = (1L to 5000L)
      .map(i => (s"s${i % 7}", s"w${(i * i) % (41 + (i % 7) * 13)}"))
      .toDF("k", "v")
    val cells = df.groupBy(col("k"), col("v"))
      .agg(count(lit(1)).as("c"))
    val tot = cells.groupBy("k").agg(sum(col("c")).as("n"))
    val pairs = tot.select(col("k").as("ka"), col("n").as("na"))
      .join(tot.select(col("k").as("kb"), col("n").as("nb")),
        col("ka") < col("kb"))
    val dom = cells.join(broadcast(pairs),
        col("k") === col("ka") || col("k") === col("kb"))
      .groupBy(col("ka"), col("kb"), col("v"))
      .agg(coalesce(sum(when(col("k") === col("ka"), col("c"))),
          lit(0L)).as("ca"),
        coalesce(sum(when(col("k") === col("kb"), col("c"))),
          lit(0L)).as("cb"),
        first(col("na")).as("na"), first(col("nb")).as("nb"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val p = d(col("ca")) / d(col("na"))
    val q = d(col("cb")) / d(col("nb"))
    val term = (when(col("ca") > 0,
        p * log(lit(2.0) * p / (p + q))).otherwise(lit(0.0)) +
      when(col("cb") > 0,
        q * log(lit(2.0) * q / (p + q))).otherwise(lit(0.0))) / 2
    val expected = dom
      .select(col("ka"), col("kb"), col("na"), col("nb"),
        round(term * 1e12).cast("long").as("t12"))
      .groupBy(col("ka"), col("kb"))
      .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
        sum(col("t12").cast("decimal(38,0)")).as("js12"))
      .select(col("ka"), col("kb"), col("na"), col("nb"),
        round(d(col("js12")) / 1e12, 12).as("js"),
        round(d(col("js12")) / (lit(math.log(2.0)) * 1e12), 12)
          .as("jsn"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val got = Profile.jsDivergence(df, col("k"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(v === expected(k),
      s"pair $k diverged from the union-domain enumeration") }
  }

  test("ksTwoSample enforces the bounded-domain contract loudly") {
    val wide = (1L to 40L).toDF("v")
    val ex = intercept[IllegalArgumentException] {
      Profile.ksTwoSample(wide, wide, col("v"), maxDomain = 20L)
        .collect()
    }
    assert(ex.getMessage.contains("quantize"))
    assert(Profile.ksTwoSample(wide, wide, col("v"), maxDomain = 40L)
      .collect().length === 1)
  }

  test("madOutliers enforces the bounded-domain contract loudly") {
    // per-key domain is what matters: 30 distinct values in one key
    // trips a maxDomain of 20 even though the other key is tiny
    val rows = ((1L to 30L).map(("wide", _)) ++ Seq(("narrow", 1L)))
      .toDF("g", "v")
    val ex = intercept[IllegalArgumentException] {
      Profile.madOutliers(rows, Seq("g"), col("v"), 3L, 1L,
        maxDomain = 20L).collect()
    }
    assert(ex.getMessage.contains("quantize"))
    // at the threshold it still runs (guard is > , not >=)
    val ok = Profile.madOutliers(rows, Seq("g"), col("v"), 3L, 1L,
      maxDomain = 30L).collect()
    assert(ok.length === 2)
  }
}