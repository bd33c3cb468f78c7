package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation readouts — the A/B-test summary a data platform
  * runs over event logs, with CUPED variance reduction (Deng, Xu,
  * Kohavi & Walker, "Improving the sensitivity of online controlled
  * experiments by utilizing pre-experiment data", WSDM 2013).
  *
  * Determinism treatment (the [[Profile.corrMatrix]] discipline): a
  * naive CUPED pass computes per-unit adjusted values y − θ(x − x̄)
  * and averages DOUBLES — partition-order-dependent, never
  * hash-matchable. Here everything is derived from per-arm EXACT
  * integer moments (n, Σx, Σy, Σx², Σy², Σxy as decimal(38,0) sums of
  * cents) via algebraic identities, so the float work is a fixed
  * chain of correctly-rounded double ops on exact integers:
  *
  *   θ        = cov_pool(x,y) / var_pool(x)        (pooled, standard)
  *   mean_adj = ȳ_arm − θ·(x̄_arm − x̄_pool)
  *   var_adj  = var_arm(y) − 2θ·cov_arm(x,y) + θ²·var_arm(x)
  *
  * (population variances, ÷n — the n/(n−1) correction is a constant
  * factor both engines would apply identically; omitted for formula
  * parity). Per-unit adjusted values are never materialized.
  *
  * Scale design: ONE map-side-combinable hash aggregate per arm over
  * the unit frame; pooled moments are the Σ of the (tiny) arm rows via
  * a broadcast; output is one row per arm. No window, no collect, no
  * second scan.
  */
object Experiment {

  /** CUPED readout over a one-row-per-unit frame: `armCol` the
    * variant label, `preCents`/`postCents` integer-valued pre-period
    * covariate and experiment metric. Output per arm: (arm, n,
    * mean_post, mean_adj, var_post, var_adj) — `mean_adj` is the
    * CUPED-adjusted mean whose between-rerun variance shrinks by the
    * pooled corr(x,y)²; `var_adj`/`var_post` is the realized
    * variance-reduction ratio.
    *
    * Units with NULL in either column are dropped (listwise, as in
    * [[Profile.corrMatrix]]). Degenerate pooled var(x) = 0 → θ = 0
    * (no adjustment), never NaN.
    */
  def cuped(units: DataFrame, armCol: Column, preCents: Column,
      postCents: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = units.select(armCol.as("arm"),
        preCents.cast("long").as("__x"), postCents.cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val arm = base.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum(dec(col("__x"))).as("sx"),
      sum(dec(col("__y"))).as("sy"),
      sum(dec(col("__x")) * dec(col("__x"))).as("sxx"),
      sum(dec(col("__y")) * dec(col("__y"))).as("syy"),
      sum(dec(col("__x")) * dec(col("__y"))).as("sxy"))
    val pool = arm.agg(sum(col("n")).as("pn"),
      sum(col("sx")).as("psx"), sum(col("sy")).as("psy"),
      sum(col("sxx")).as("psxx"), sum(col("sxy")).as("psxy"))
    def d(c: String) = col(c).cast("double")
    // pooled θ: cov/var with the common 1/n² factor cancelled —
    // θ = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    val pvar = d("pn") * d("psxx") - d("psx") * d("psx")
    val theta = when(pvar > 0,
      (d("pn") * d("psxy") - d("psx") * d("psy")) / pvar).otherwise(0.0)
    val xbarPool = d("psx") / d("pn")
    arm.crossJoin(broadcast(pool))
      .select(col("arm"), col("n"),
        theta.as("__th"), xbarPool.as("__xbp"),
        (d("sy") / d("n")).as("mean_post"),
        (d("sx") / d("n")).as("__xb"),
        ((d("n") * d("syy") - d("sy") * d("sy")) / (d("n") * d("n")))
          .as("var_post"),
        ((d("n") * d("sxx") - d("sx") * d("sx")) / (d("n") * d("n")))
          .as("__vx"),
        ((d("n") * d("sxy") - d("sx") * d("sy")) / (d("n") * d("n")))
          .as("__cxy"))
      .select(col("arm"), col("n"), col("mean_post"),
        (col("mean_post") - col("__th") * (col("__xb") - col("__xbp")))
          .as("mean_adj"),
        col("var_post"),
        (col("var_post") - lit(2.0) * col("__th") * col("__cxy") +
          col("__th") * col("__th") * col("__vx")).as("var_adj"))
  }

  /** Exact ROC AUC of an integer-valued score against a boolean label,
    * in the Mann–Whitney rank form with the standard tie treatment
    * (ties count half): AUC = Σ_s pos(s)·(2·negBelow(s) + neg(s)) /
    * (2·P·N). Rows with NULL score or label are dropped listwise;
    * P = 0 or N = 0 → NULL (undefined, never NaN).
    *
    * Scale design: the corpus collapses FIRST to one row per distinct
    * score via a map-side-combinable hash aggregate, so the global
    * cumulative window runs over the score DOMAIN, not the row count —
    * the [[Profile.madOutliers]] bounded-domain discipline. For a
    * continuous score, pre-bin (e.g. [[calibrationBins]] buckets or
    * quantile bins) so the domain stays bounded; the binned AUC is the
    * trapezoidal estimate of the same integral. Tie products are
    * accumulated in decimal(38,0) — P·N long arithmetic overflows past
    * ~3·10⁹ rows per class, decimal does not.
    *
    * The bounded-domain contract is ENFORCED, not advisory: the
    * distinct-score frame is counted before the window, and a domain
    * past `maxDomain` (default 2·10⁶ — a single-partition sort of 2 M
    * tiny rows costs seconds; an unbounded one is the 100×-scale
    * cliff) fails loudly with the pre-bin remedy in the message,
    * instead of silently single-partition-sorting a corpus-sized
    * domain. The count reuses the cached grouped frame the window
    * consumes — one extra job over an in-memory frame, not a rescan.
    *
    * Output: one row (auc rounded to 12 decimals — both engines divide
    * the same exactly-represented integers — positives, negatives).
    */
  def aucExact(df: DataFrame, score: Column, label: Column,
      maxDomain: Long = 2000000L): DataFrame = {
    require(maxDomain > 0, s"maxDomain must be positive: $maxDomain")
    val base = df.select(score.cast("long").as("__s"), label.as("__l"))
      .where(col("__s").isNotNull && col("__l").isNotNull)
    val grouped = base.groupBy("__s").agg(
      sum(when(col("__l"), 1L).otherwise(0L)).as("pos"),
      sum(when(col("__l"), 0L).otherwise(1L)).as("neg"))
    CacheScope.withCached(grouped) { g =>
      val domain = g.count()
      require(domain <= maxDomain,
        s"aucExact: score domain has $domain distinct values " +
          s"(> maxDomain = $maxDomain) — the global cumulative window " +
          "would single-partition-sort the whole domain; pre-bin the " +
          "score (fixed-width or quantile bins) or raise maxDomain " +
          "deliberately")
      // negatives strictly below this score: cumulative over the
      // distinct score rows (bounded domain — enforced above), ascending
      val w = Window.orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
      val c = g.withColumn("cneg",
        coalesce(sum(col("neg")).over(w), lit(0L)))
      val dec = (x: Column) => x.cast("decimal(38,0)")
      c.agg(
          sum(dec(col("pos")) * dec(col("cneg") * 2 + col("neg")))
            .as("__num2"),
          sum(col("pos")).as("positives"),
          sum(col("neg")).as("negatives"))
        .select(
          when(col("positives") > 0 && col("negatives") > 0,
            round(col("__num2").cast("double") /
              (col("positives").cast("double") *
                col("negatives").cast("double") * 2.0), 12)).as("auc"),
          col("positives"), col("negatives"))
    }
  }

  /** Slice-level metric audit (the "slice finder" eval-ops shape):
    * for each nominated slicing dimension, per observed value — row
    * count, positive count/rate, the global rate, and the one-sample
    * binomial z-score of the slice against the global rate
    * (z = (p̂ − P)/√(P(1−P)/n)) — the first-pass answer to "which
    * data slices is the model/label failing on?". Slices with |z|
    * large and n non-trivial are the ones worth drilling into.
    *
    * One pass — literally: dimensions explode through a per-row map
    * literal (the dictionary-parse trick — ONE exchange carrying
    * ≈ Σ dimension cardinalities after map-side combine), and the
    * global rate is DERIVED from the grouped frame (every base row
    * lands in exactly one value of each slice, so summing one slice's
    * n/pos recovers the corpus totals — the cached bounded grouped
    * frame feeds both readouts; the corpus and the exploded map are
    * scanned once). z is a fixed chain of correctly-rounded double
    * ops on exact counts, rounded to 12. Output is bounded by
    * Σ dimension cardinalities (nominate bounded-domain dimensions).
    * NULL label drops the row; NULL dimension values audit as the
    * string "null" (absence is itself a slice).
    */
  def sliceMetrics(df: DataFrame, slices: Seq[(String, Column)],
      label: Column): DataFrame = {
    require(slices.nonEmpty, "sliceMetrics needs at least one slice")
    val pairs = slices.flatMap { case (n, c) =>
      Seq(lit(n), coalesce(c.cast("string"), lit("null")))
    }
    val base = df.select(label.as("__l"),
        explode(map(pairs: _*)).as(Seq("slice", "value")))
      .where(col("__l").isNotNull)
    val grouped = base.groupBy("slice", "value")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("pos"))
    val g = col("__gpos").cast("double") / col("__gn").cast("double")
    val p = col("pos").cast("double") / col("n").cast("double")
    CacheScope.withCached(grouped) { gdf =>
      val global = gdf.filter(col("slice") === lit(slices.head._1))
        .agg(coalesce(sum(col("n")), lit(0L)).as("__gn"),
          coalesce(sum(col("pos")), lit(0L)).as("__gpos"))
      gdf.crossJoin(broadcast(global))
        .select(col("slice"), col("value"), col("n"), col("pos"),
          round(p, 12).as("rate"),
          round(g, 12).as("global_rate"),
          when(col("__gpos") > 0 && col("__gpos") < col("__gn"),
            round((p - g) /
              sqrt(g * (lit(1.0) - g) / col("n").cast("double")), 12))
            .as("z"))
    }
  }

  /** Equal-frequency calibration bins: the [[calibrationBins]] readout
    * with EXACT-QUANTILE bin edges instead of fixed widths — bin =
    * count of exceeded thresholds t_{1..nBins−1} (percentile i/nBins),
    * so bins hold ≈ equal mass except where score ties collapse them
    * (deterministic: ties all land in the same bin). One exact-
    * percentile aggregate broadcast back (state bounded by score
    * cardinality — scores are bounded-domain by the [[aucExact]]
    * contract), then the same single hash aggregate; output ≤ nBins
    * rows.
    */
  def calibrationQuantile(df: DataFrame, score: Column, label: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"bad nBins $nBins")
    val base = df.select(score.cast("long").as("__s"), label.as("__l"))
      .where(col("__s").isNotNull && col("__l").isNotNull)
    val probs = array((1 until nBins).map(i =>
      lit(i.toDouble / nBins)): _*)
    val bounds = base.agg(
      percentile(col("__s").cast("double"), probs).as("__b"))
    val bin = (1 until nBins).map(i =>
      when(col("__s").cast("double") >= element_at(col("__b"), i), 1L)
        .otherwise(0L)).reduce(_ + _)
    base.crossJoin(broadcast(bounds))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("pos"),
        round(sum(col("__s").cast("decimal(38,0)")).cast("double") /
          count(lit(1)).cast("double"), 12).as("mean_score"),
        round(sum(when(col("__l"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 12).as("pos_rate"))
  }

  /** Cohen's κ inter-annotator agreement between two boolean raters:
    * κ = (p_o − p_e)/(1 − p_e) with p_o the observed agreement rate
    * and p_e the chance agreement from the raters' marginals — the
    * label-quality readout for double-annotated data (κ ≈ 0 means the
    * expensive second rater is adding coin flips).
    *
    * Exactness: everything derives from four exact long counts (n,
    * a₁, b₁, both₁) in ONE map-side-combinable aggregate; κ is
    * cross-multiplied to a single division of exact decimal(38,0)
    * integers — κ = (n·agree − chance)/(n² − chance) with
    * agree = n − a₁ − b₁ + 2·both₁ and
    * chance = a₁·b₁ + (n−a₁)(n−b₁) — so the float work is one
    * correctly-rounded division (n² and the marginal products
    * overflow long past ~3·10⁹ rows; decimal does not). Constant
    * raters make the denominator 0 → κ NULL (undefined), never NaN.
    * NULL in either rater drops the row listwise. Output: one row
    * (n, po, kappa), ratios rounded to 12 decimals.
    */
  def kappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val g = df.select(a.as("__a"), b.as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__a"), 1L).otherwise(0L)).as("a1"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("b1"),
        sum(when(col("__a") && col("__b"), 1L).otherwise(0L))
          .as("both1"))
    val agree = dec(col("n") - col("a1") - col("b1") + col("both1") * 2)
    val chance = dec(col("a1")) * dec(col("b1")) +
      dec(col("n") - col("a1")) * dec(col("n") - col("b1"))
    val den = dec(col("n")) * dec(col("n")) - chance
    g.select(col("n"),
      when(col("n") > 0,
        round(agree.cast("double") / col("n").cast("double"), 12))
        .as("po"),
      when(den =!= 0,
        round((dec(col("n")) * agree - chance).cast("double") /
          den.cast("double"), 12)).as("kappa"))
  }

  /** Reliability diagram over fixed-width score bins: bin =
    * clamp(floor(score / width), 0, maxBin), per bin the row count,
    * positive count, mean score and positive rate. The eval-side
    * complement of [[aucExact]] — AUC says the score RANKS, calibration
    * says the score MEANS what it claims. Fixed-width integer bins (not
    * quantiles) keep the binning a pure per-row expression: one hash
    * aggregate, zero windows, output bounded by maxBin + 1 rows at any
    * corpus size — the TWO-sided clamp makes that bound hold for
    * negative score domains too (a lone upper clamp would leak one bin
    * per distinct negative floor).
    *
    * Exactness: floor(score / width) is computed as integer floor
    * division — (s − pmod(s, w)) div w — never double division, so the
    * bin id is exact at any long magnitude (double floor is wrong past
    * 2⁵³); mean_score sums scores as decimal(38,0) (the [[cuped]]
    * discipline — a raw long sum silently wraps in non-ANSI Spark
    * while the oracle engine promotes, an engine-divergence class, not
    * just an overflow). NULL score or label drops the row listwise.
    */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      width: Long, maxBin: Long): DataFrame = {
    require(width > 0 && maxBin >= 0, "width > 0, maxBin >= 0")
    val base = df.select(score.cast("long").as("__s"), label.as("__l"))
      .where(col("__s").isNotNull && col("__l").isNotNull)
    // exact floor division on longs: subtract the positive remainder,
    // then the quotient is exact under ANY integer-division rounding —
    // the oracle mirrors the same construction, so the two engines
    // cannot disagree on truncation direction for negatives
    val floorDiv = call_function("div",
      col("__s") - pmod(col("__s"), lit(width)), lit(width))
    base
      .groupBy(least(greatest(floorDiv, lit(0L)), lit(maxBin)).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("pos"),
        round(sum(col("__s").cast("decimal(38,0)")).cast("double") /
          count(lit(1)).cast("double"), 12).as("mean_score"),
        round(sum(when(col("__l"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 12).as("pos_rate"))
  }

  /** Ranking-quality metrics per query — the retrieval-eval readout
    * (TREC form): precision@k, recall@k, reciprocal rank, and NDCG@k
    * with graded relevance, for scoring any (query_id, doc_id, rank)
    * run — BM25, ANN, or a fused ranking — against a
    * (query_id, doc_id, rel) judgment set.
    *
    * Determinism: the only libm call is log2 in the DCG discount, so
    * each gain term (2^rel − 1)/log2(rank + 1) is snapped to 10⁻¹²
    * fixed point and summed as exact longs (the [[graft.ext.Profile
    * .mutualInfo]] discipline — order-free, and a last-ulp libm
    * divergence is absorbed by the snap); 2^rel is exact for judgment-
    * scale rel, reciprocal rank is a single correctly-rounded
    * division, and NDCG is one division of two snapped longs. Ideal
    * DCG ranks the top-k judgments through `bounded_top_k`
    * ((rel desc, doc_id asc) — tie order cannot change the sum, since
    * equal rels produce equal terms at any permutation of positions).
    *
    * Scale: the run is ≤ k rows per query by contract and judgments
    * are eval-set-bounded; everything here is two broadcast-friendly
    * equi-joins and per-query hash aggregates with O(k) bounded-top-k
    * state — no windows, no corpus scan. Queries with no relevant
    * judgment report n_rel = 0 and NULL recall/ndcg (undefined, never
    * a fabricated 0).
    *
    * Anchor: the output covers run ∪ positively-judged queries (full
    * outer on query_id). A judged query the retriever returned
    * NOTHING for (or only ranks > k) reports n_ret = 0 and zero
    * p/recall/rr/ndcg — dropping it would overstate averaged quality
    * exactly when a retriever fails hardest. Queries judged only
    * with rel = 0 rows are not anchored (rel > 0 defines "judged
    * relevant" here, matching the n_rel count).
    *
    * Output per query: (query_id, n_rel, n_ret, n_hits, p_at_k,
    * recall_at_k, rr, ndcg), ratios rounded to 12.
    */
  def rankingMetrics(run: DataFrame, qrels: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"bad k $k")
    import graft.functions.BoundedTopK
    val snap = (c: Column) => round(c * 1e12).cast("long")
    // DCG term at 1-based rank r: (2^rel − 1) / log2(r + 1)
    val gain = (rel: Column, rank: Column) =>
      snap((pow(lit(2.0), rel) - 1.0) / log2(rank + lit(1.0)))
    val r = run.select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("__rank"))
      .where(col("__rank") <= k)
    val q = qrels.select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rel").cast("long").as("__rel"))
      .where(col("__rel") > 0)
    // per-query judgment totals + ideal DCG over the k best judgments
    val ideal = q.groupBy("query_id")
      .agg(count(lit(1)).as("n_rel"),
        BoundedTopK.topk(col("__rel"), col("doc_id"), k).as("__tk"))
      .select(col("query_id"), col("n_rel"),
        posexplode(col("__tk")).as(Seq("__p", "__e")))
      .groupBy("query_id")
      .agg(first(col("n_rel")).as("n_rel"),
        sum(gain(col("__e.score"), col("__p") + 1)).as("__idcg12"))
    val hits = r.join(q, Seq("query_id", "doc_id"))
    val perHit = hits.groupBy("query_id")
      .agg(count(lit(1)).as("n_hits"),
        max(snap(lit(1.0) / col("__rank"))).as("__rr12"),
        sum(gain(col("__rel"), col("__rank"))).as("__dcg12"))
    // anchor on run ∪ judged queries (round-8 ADVICE): a judged query
    // whose retriever returned NOTHING (or only ranks > k) must report
    // n_ret = 0 with zero precision/recall/rr/ndcg — a run-anchored
    // frame silently dropped it, and averaging the output then
    // OVERSTATED quality exactly when a retriever failed hardest
    r.groupBy("query_id").agg(count(lit(1)).as("n_ret"))
      .join(ideal, Seq("query_id"), "full_outer")
      .join(perHit, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_ret"), lit(0L)).as("n_ret"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / k, 12)
          .as("p_at_k"),
        when(col("n_rel") > 0,
          round(coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_rel").cast("double"), 12)).as("recall_at_k"),
        round(coalesce(col("__rr12"), lit(0L)).cast("double") / 1e12, 12)
          .as("rr"),
        when(col("__idcg12") > 0,
          round(coalesce(col("__dcg12"), lit(0L)).cast("double") /
            col("__idcg12").cast("double"), 12)).as("ndcg"))
  }

  /** Truncated Rank-Biased Overlap between two top-k runs (Webber,
    * Moffat & Zobel, "A similarity measure for indefinite rankings",
    * TOIS 2010) — the principled top-weighted comparison of two
    * retrieval runs (e.g. a float index vs its quantized serving twin:
    * how much does quantization reorder what users actually see?).
    * RBO_min@k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d, the
    * known-prefix lower bound (no extrapolation term — that models
    * unseen tails, which a drift gate should not invent).
    *
    * EXACT RATIONAL arithmetic, no libm: with p = pNum/pDen every
    * depth weight is a fraction over D = pDen^k · lcm(1..k), so the
    * per-doc contribution Σ_{d≥max(rankA,rankB)} (1−p)p^{d−1}/d
    * collapses to one LONG from a k-entry lookup table computed once
    * in exact integer arithmetic (BigInt at build, overflow-checked);
    * the per-query score is an exact long Σ and ONE correctly-rounded
    * division by D — bit-identical on any engine, stronger than the
    * snapped-libm discipline ([[rankingMetrics]]'s log2 gains) because
    * there is no float term to snap at all.
    *
    * Shape: the depth sum is reindexed per DOC — doc enters every
    * prefix from depth m = max(rank_A, rank_B), so
    * Σ_d X_d·w_d = Σ_docs W(m) — ONE equi-join of two ≤k-per-query
    * runs on (query_id, doc_id) + one hash agg; anchored on A ∪ B
    * query ids so a disjoint pair reports rbo = 0 instead of
    * vanishing (the [[rankingMetrics]] anchor discipline). No window,
    * no corpus scan.
    *
    * Output per query: (query_id, n_common, rbo_min), rbo rounded 12.
    */
  def rboTruncated(runA: DataFrame, runB: DataFrame, k: Int,
      pNum: Long = 9L, pDen: Long = 10L): DataFrame = {
    val (wD, d) = rboWeights(k, pNum, pDen)
    def leg(r: DataFrame, rk: String): DataFrame =
      r.select(col("query_id").cast("long").as("query_id"),
          col("doc_id").cast("long").as("doc_id"),
          col("rank").cast("long").as(rk))
        .where(col(rk) >= 1 && col(rk) <= k)
    val a = leg(runA, "__ra")
    val b = leg(runB, "__rb")
    val wArr = array(wD.map(lit(_)): _*)
    val common = a.join(b, Seq("query_id", "doc_id"))
      .select(col("query_id"),
        element_at(wArr,
          greatest(col("__ra"), col("__rb")).cast("int")).as("__w"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_common"), sum(col("__w")).as("__wsum"))
    a.select("query_id").union(b.select("query_id")).distinct()
      .join(common, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("__wsum"), lit(0L)).cast("double") /
          d.toDouble, 12).as("rbo_min"))
  }

  /** Kendall rank correlation between two top-k runs, per query —
    * the UNWEIGHTED complement of [[rboTruncated]] (RBO asks "do the
    * prefixes users see agree?"; tau asks "is the relative order of
    * everything both retrievers returned preserved?" — a quantized
    * index can score well on one and badly on the other, which is why
    * eval suites report both). Computed over the common documents of
    * the two runs: concordant = pairs ordered the same way in both,
    * discordant = inverted pairs, τ = (C − D) / (n(n−1)/2).
    *
    * Exactness: ranks within a run are distinct by the ranking
    * contract, so there are no ties and τ_b degenerates to τ_a — C,
    * D, and the pair total are exact integers and the score is ONE
    * correctly-rounded division (no libm; the [[rboTruncated]]
    * discipline). Inversions are counted with the per-query basket
    * trick ([[graft.ext.Graph.neighborJaccard]]'s fan-out): sort the
    * common docs by run-A rank inside a bounded array, fan the ≤
    * C(k,2) ordered pairs out IN CODEGEN, and count run-B inversions
    * — one hash agg, no self-join of the run tables, no window.
    *
    * Anchoring follows [[rboTruncated]]: every query in either run
    * reports a row; τ is NULL below two common docs (undefined, never
    * a fabricated 0 — the n_common column carries the why).
    *
    * Output per query: (query_id, n_common, concordant, discordant,
    * tau), tau rounded 12.
    */
  def kendallTau(runA: DataFrame, runB: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    def leg(r: DataFrame, rk: String): DataFrame =
      r.select(col("query_id").cast("long").as("query_id"),
          col("doc_id").cast("long").as("doc_id"),
          col("rank").cast("long").as(rk))
        .where(col(rk) >= 1 && col(rk) <= k)
    val a = leg(runA, "__ra")
    val b = leg(runB, "__rb")
    // run-B ranks in run-A rank order; distinct __ra makes the sort
    // key unique, so the array is a pure function of the two runs
    val rbs = transform(
      sort_array(collect_list(struct(col("__ra"), col("__rb")))),
      x => x.getField("__rb"))
    val common = a.join(b, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_common"), rbs.as("__rbs"))
      .select(col("query_id"), col("n_common"),
        aggregate(
          flatten(transform(col("__rbs"), (x, i) =>
            transform(slice(col("__rbs"), i + 2,
                size(col("__rbs"))),
              y => when(x > y, 1L).otherwise(0L)))),
          lit(0L), (acc, v) => acc + v).as("__d"))
    a.select("query_id").union(b.select("query_id")).distinct()
      .join(common, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("__d"), lit(0L)).as("discordant"))
      .select(col("query_id"), col("n_common"),
        (expr("n_common * (n_common - 1) div 2") - col("discordant"))
          .as("concordant"),
        col("discordant"))
      .select(col("query_id"), col("n_common"), col("concordant"),
        col("discordant"),
        when(col("n_common") >= 2,
          round((col("concordant") - col("discordant")).cast("double") /
            expr("(n_common * (n_common - 1) div 2)").cast("double"),
            12)).as("tau"))
  }

  /** W(m)·D for m in 1..k (W(m) = Σ_{d=m..k} (1−p)p^{d−1}/d) and the
    * common denominator D = pDen^k · lcm(1..k) — exact integers,
    * BigInt-checked to fit a long with k·W(1)·D headroom for the
    * per-query sum. Shared verbatim by the DuckDB oracle (the
    * constants are part of the operator contract, like PQ codebooks;
    * the hash-match proves the JOIN/Σ/anchor path exact).
    */
  private[graft] def rboWeights(k: Int, pNum: Long, pDen: Long)
      : (Seq[Long], Long) = {
    require(k >= 1 && k <= 12, s"k must be in [1, 12], got $k")
    require(pNum > 0 && pDen > pNum && pDen <= 16,
      s"need 0 < pNum < pDen <= 16, got $pNum/$pDen")
    def gcd(a: BigInt, b: BigInt): BigInt = if (b == 0) a else gcd(b, a % b)
    val lcm = (1 to k).map(BigInt(_)).reduce((x, y) => x * y / gcd(x, y))
    val d = BigInt(pDen).pow(k) * lcm
    // term(d') = (pDen−pNum)·pNum^{d'−1} · (D / pDen^{d'} / d') — every
    // factor divides exactly by construction
    val terms = (1 to k).map { dd =>
      BigInt(pDen - pNum) * BigInt(pNum).pow(dd - 1) *
        (d / BigInt(pDen).pow(dd) / dd)
    }
    val w = (1 to k).map(m => terms.drop(m - 1).sum)
    require(w.head * k <= BigInt(Long.MaxValue) / 4 && d.isValidLong,
      s"rbo weights overflow for k=$k p=$pNum/$pDen")
    (w.map(_.toLong), d.toLong)
  }
}
