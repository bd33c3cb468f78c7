package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph centrality over edge tables — PageRank (Page, Brin, Motwani,
  * Winograd, "The PageRank citation ranking", 1999) with a FIXED-POINT
  * integer formulation so a fixed iteration count is bitwise
  * reproducible across engines, partitionings, and reruns.
  *
  * Why integer fixed-point: the float PageRank update sums
  * contributions whose addition order Spark does not define — a
  * parallel aggregate would drift in the last ulps between runs and
  * never hash-match an external oracle. Here ranks are longs in units
  * of 1/Scale: contribution = `rank div out_degree`, the damped update
  * is `base + (dampNum · Σcontrib) div dampDen` — every operation is
  * exact long arithmetic, Σ is order-independent, so iteration k is a
  * pure function of the edge set. The dropped division remainders are a
  * deliberate, documented quantization (≤ N·Scale⁻¹ mass per step);
  * ranking quality is unaffected (Scale = 10¹²) and determinism is
  * bought with it. Dangling-node mass is dropped by default (the
  * "leaked mass" variant — deterministic, oracle-mirrored);
  * `danglingRedistribute = true` switches to the classic
  * redistribute-uniformly variant most published rankings expect, with
  * the SAME exact-long determinism: the dangling sum is an
  * order-independent long Σ, its per-node share `dsum div N` enters the
  * damped update as one more exact term.
  *
  * Scale design (100 TB lens):
  *  - per iteration: one `src` equi-join (ranks are pre-partitioned on
  *    id; the edge list is partitioned on src ONCE and cached, so the
  *    join reuses its exchange every round) + one map-side-combinable
  *    hash agg on dst. Hub skew (the whole-web problem) is absorbed by
  *    partial aggregation: a dst with 10⁸ in-edges combines to one row
  *    per map partition before the shuffle. The dangling variant adds
  *    one co-partitioned filter-join + a 1-row Σ agg per round, carried
  *    back into the plan as a broadcast scalar — never a driver value;
  *  - iterations are a bounded, caller-chosen constant; each round's
  *    plan grows linearly. Past [[DeepIterThreshold]] rounds the loop
  *    localCheckpoints the rank frame EVERY round ([[Dedup]]-style
  *    lineage truncation), so a 64-round run neither re-plans a
  *    64-join chain nor overflows the optimizer — proven bit-stable at
  *    10 rounds by the `x_graph_pagerank_deep` oracle row;
  *  - overflow headroom: Σcontrib + dsum div N ≤ 2·Scale (total mass),
  *    so dampNum·Σ ≤ 170·10¹² ≪ 2⁶³ — no overflow under ANSI mode.
  */
object Graph {

  /** Rank unit: ranks are longs in units of Scale⁻¹; total initial mass
    * = N·(Scale div N) ≈ Scale. 10¹² keeps six significant digits past
    * any corpus size while leaving 2⁶³/Scale ≈ 9·10⁶ headroom on the
    * damped product.
    */
  val Scale = 1000000000000L

  /** Past this many iterations the loop truncates lineage with an
    * eager localCheckpoint every round: a 10+-round chain of
    * join+agg+join plans otherwise grows superlinearly in analysis/
    * optimization cost and re-derives every prior round on the final
    * action. Below it, the raw chain is cheaper (no per-round
    * materialization barrier).
    */
  val DeepIterThreshold = 8

  /** PageRank over a directed edge list. `edges` must have long-typed
    * `srcCol`/`dstCol`; duplicate edges are collapsed (set semantics,
    * like the matrix formulation). Returns (id, rank_scaled) for every
    * node appearing as a source or destination.
    *
    * damp = dampNum/dampDen (default 85/100); update per node v:
    *   r'(v) = (dampDen−dampNum)·(Scale div N) div dampDen
    *         + dampNum·(Σ_{u→v}(r(u) div deg(u)) [+ dsum div N]) div dampDen
    * where the `dsum div N` term (total rank mass sitting on
    * out-degree-0 nodes, shared uniformly) applies only with
    * `danglingRedistribute = true`.
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampNum: Long = 85L, dampDen: Long = 100L,
      danglingRedistribute: Boolean = false)
      : DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64], got $iterations")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < $dampNum < $dampDen")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .cache()
    try {
      // node set annotated ONCE with has_out (out-degree > 0) so the
      // dangling variant's per-round mass Σ is a filter over the cached
      // id-partitioned layout, not a fresh anti-join
      val srcIds = e.select(col("src").as("id")).distinct()
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .join(srcIds.withColumn("__has_out", lit(true)), Seq("id"), "left")
        .select(col("id"), coalesce(col("__has_out"), lit(false))
          .as("has_out"))
      // one bounded driver action fixes N — the only collect; init and
      // base are exact longs shared with any external re-derivation
      val n = nodes.count()
      val init = Scale / n
      val base = (dampDen - dampNum) * init / dampDen
      // edge list annotated with out-degree, partitioned by src once so
      // every iteration's rank join reuses the layout. The degree
      // attach pins SHUFFLED HASH with the node-bounded degree side as
      // build (r17, guide §3.1): the unhinted plan BROADCAST the
      // 587k-row EDGE side (its cached estimate sat under the 10 MB
      // threshold) and streamed the degrees — a 32 MiB broadcast
      // build, and backwards at any scale.
      val eDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("deg"))
          .hint("shuffle_hash"), "src")
      CacheScope.withCached2(
        eDeg.repartition(col("src")), nodes.repartition(col("id"))) {
        (eDeg, nodes) =>
        var ranks = nodes.select(col("id"), col("has_out"),
          lit(init).as("r"))
        for (_ <- 1 to iterations) {
          // rank side pinned SHUFFLED HASH (r17): the unhinted
          // per-round join sort-merge-joined, re-SORTING the cached
          // 587k-row edge frame every iteration (measured 4.6 s sort
          // time in a 14.8 s round pipeline at sf0.1) — the
          // labelPropagation scaladoc's own treatment, now measured
          // worth it here too
          val sums = eDeg
            .join(ranks.select(col("id").as("src"), col("r"))
              .hint("shuffle_hash"), "src")
            .select(col("dst"), expr("r div deg").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
          // per-node incoming mass; dangling share enters as ONE
          // broadcast scalar row (exact long Σ — order-independent)
          val contrib =
            if (!danglingRedistribute) expr(s"($dampNum * " +
              s"coalesce(sc, 0L)) div $dampDen")
            else expr(s"($dampNum * (coalesce(sc, 0L) + " +
              s"__dang div $n)) div $dampDen")
          var next = nodes
            .join(sums, nodes("id") === sums("dst"), "left")
          if (danglingRedistribute)
            next = next.crossJoin(broadcast(
              ranks.where(!col("has_out"))
                .agg(coalesce(sum(col("r")), lit(0L)).as("__dang"))))
          ranks = next.select(nodes("id"), nodes("has_out"),
            (lit(base) + contrib).as("r"))
          // deep runs: truncate lineage every round (see
          // [[DeepIterThreshold]]); short runs keep the lazy chain.
          // The dangling variant ALWAYS truncates: it reads the prior
          // round's ranks twice (contribution join + mass Σ), so an
          // unchecked chain would double per round — checkpointing
          // makes each round's cost linear and the Σ read-once.
          if (danglingRedistribute || iterations > DeepIterThreshold)
            ranks = ranks.localCheckpoint(eager = true)
        }
        // withCached2 localCheckpoints this result before releasing the
        // cached layouts its lineage reads
        ranks.select(col("id"), col("r").as("rank_scaled"))
      }
    } finally e.unpersist(blocking = false)
  }

  /** Triangle participation counts over an undirected edge list via
    * degree-ordered orientation (the "forward" algorithm of Schank &
    * Wagner 2005 / Latapy 2008; the orientation trick MapReduce
    * formulations reuse — Suri & Vassilvitskii, WWW'11). Returns
    * (id, n_triangles) for every node that closes at least one
    * triangle; counts are exact integers.
    *
    * Why orientation matters at 100 TB: the naive wedge join e ⋈ e on
    * a shared endpoint enumerates Σ_v deg(v)² wedges — one 10⁸-degree
    * hub alone contributes 10¹⁶ candidate rows. Orienting every
    * undirected edge from its (degree, id)-smaller endpoint to the
    * larger turns the edge set into a DAG where each node keeps only
    * edges toward higher-degree peers, so out-degrees are O(√m) and
    * the wedge join generates O(m^{3/2}) candidates — the optimal
    * triangle-enumeration bound — with every triangle appearing
    * EXACTLY once as u→v, v→w, u→w (no ÷6 dedup pass).
    *
    * Plan shape: canonical dedup (one hash agg), degree agg (map-side
    * combinable — hub skew collapses before the shuffle), orientation
    * projection, wedge equi-join on the middle node, and a LEFT SEMI
    * close join on (u, w) — every shuffle is on join keys; no window,
    * no cross product, no driver action.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
    val deg = e0.select(col("a").as("id"))
      .union(e0.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    // canonical edges have a < b, so the (degree, id) tie-break is
    // simply da <= db → keep (a, b), else flip
    val oriented = e0
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v"))
    // canonical edges feed the degree agg (both endpoints) and both
    // orientation joins; the oriented DAG feeds three consumers (two
    // wedge sides + the close join) — cache BOTH for the scope, one
    // result checkpoint
    CacheScope.withCached2(e0, oriented) { (_, o) =>
      val wedges = o
        .join(o.select(col("u").as("v"), col("v").as("w")), "v")
      // close the wedges against the edge set with a SHUFFLED HASH
      // semi join: the wedge stream is the O(m^{3/2}) side and must
      // not be SORTED (SMJ would) nor the edge side broadcast (it is
      // corpus-sized at scale) — hashing the m-row side per partition
      // is the strategy that survives 100×
      val tri = wedges.join(
        o.select(col("u"), col("v").as("w")).hint("shuffle_hash"),
        Seq("u", "w"), "left_semi")
      // one pass over the triangle stream: explode the three corners
      // instead of unioning three re-computations of the join pipeline
      tri.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    }
  }

  /** Weakly-connected components over an undirected edge list:
    * (id, component_id) with the component labeled by its minimum
    * member id. Delegates to the min-label propagation core shared
    * with [[Dedup.duplicateClusters]] (one shuffle per round against a
    * cached pre-partitioned edge list, map-side partial min, decimal
    * convergence check, per-round localCheckpoint lineage truncation) —
    * the same operator, named for general graph use rather than its
    * dedup-clustering application.
    */
  def connectedComponents(
      edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIters: Int = 20): DataFrame =
    Dedup.duplicateClusters(edges, src, dst, maxIters)
      .withColumnRenamed("cluster_id", "component_id")

  /** Multi-source BFS: exact minimum hop distance from ANY row of
    * `sources` (a 1-column frame of long node ids) to every node
    * reachable within `maxHops` directed edges. Returns (id, hops);
    * unreached nodes are absent. Exact integer distances — bitwise
    * deterministic for a fixed edge set and hop cap.
    *
    * Frontier iteration, the textbook distributed BFS: round k joins
    * ONLY the hop-(k−1) frontier against the edge list (cached,
    * pre-partitioned on src — every round reuses the layout) and
    * min-merges the candidates into the accumulated distance frame;
    * the new frontier is exactly the nodes whose merged distance
    * equals k (first reached this round), so work per round is
    * proportional to the frontier×out-degree, not the graph. Hub
    * fan-in collapses in the map-side partial of the min agg. Both
    * accumulator and frontier are localCheckpointed each round
    * ([[DeepIterThreshold]] rationale — an unbounded lineage chain
    * would re-derive every prior round per action). No driver-side
    * collect anywhere; output bounded by reachable node count.
    */
  def shortestHops(
      edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 32,
      s"maxHops must be in [1, 32], got $maxHops")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val src0 = sources.toDF("id").select(col("id").cast("long").as("id"))
      .filter(col("id").isNotNull).distinct()
      .withColumn("hops", lit(0L))
    CacheScope.withCached(e.repartition(col("src"))) { eP =>
      var dist = src0.localCheckpoint(eager = true)
      var frontier = dist
      for (k <- 1 to maxHops) {
        val candidates = frontier
          .join(eP, frontier("id") === eP("src"))
          .select(col("dst").as("id"), lit(k.toLong).as("hops"))
        dist = dist.union(candidates)
          .groupBy("id").agg(min(col("hops")).as("hops"))
          .localCheckpoint(eager = true)
        frontier = dist.where(col("hops") === k)
      }
      dist
    }
  }

  /** Personalized PageRank: the random walk teleports to the SEED set
    * instead of uniformly — the similarity-to-seeds measure behind
    * related-item recommendation and seed-expansion labeling. Same
    * exact-long fixed-point discipline as [[pageRank]] (init mass
    * Scale div |S| on seeds, zero elsewhere; per round
    * r'(v) = [v ∈ S]·((dampDen−dampNum)·(Scale div |S|) div dampDen)
    * + dampNum·Σ_{u→v}(r(u) div deg(u)) div dampDen), same
    * src-partitioned cached edge layout, one equi-join + map-side-
    * combinable aggregate per round, per-round checkpoint past
    * [[DeepIterThreshold]]. Seeds are a bounded literal list (they
    * parameterize the teleport VECTOR, not a data-sized frame);
    * dangling mass is dropped, as in the standard PPR formulation —
    * walks that fall off the graph restart by teleport only.
    */
  def personalizedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, seeds: Seq[Long],
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64], got $iterations")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < $dampNum < $dampDen")
    require(seeds.nonEmpty && seeds.size <= 10000,
      s"seeds must be a bounded non-empty list, got ${seeds.size}")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .cache()
    try {
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      val init = Scale / seeds.size
      val base = (dampDen - dampNum) * init / dampDen
      def isSeed(c: Column): Column = c.isin(seeds: _*)
      // same two shuffle-hash pins as [[pageRank]] (r17): node-bounded
      // degree side as build for the attach; rank side as build for
      // the per-round join (the unhinted plans broadcast the edge side
      // / re-sorted the cached edge frame per round)
      val eDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("deg"))
          .hint("shuffle_hash"), "src")
      CacheScope.withCached2(
        eDeg.repartition(col("src")), nodes.repartition(col("id"))) {
        (eDeg, nodes) =>
        var ranks = nodes.select(col("id"),
          when(isSeed(col("id")), lit(init)).otherwise(lit(0L)).as("r"))
        for (_ <- 1 to iterations) {
          val sums = eDeg
            .join(ranks.select(col("id").as("src"), col("r"))
              .hint("shuffle_hash"), "src")
            .select(col("dst"), expr("r div deg").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
          ranks = nodes
            .join(sums, nodes("id") === sums("dst"), "left")
            .select(nodes("id"),
              (when(isSeed(nodes("id")), lit(base)).otherwise(lit(0L)) +
                expr(s"($dampNum * coalesce(sc, 0L)) div $dampDen"))
                .as("r"))
          if (iterations > DeepIterThreshold)
            ranks = ranks.localCheckpoint(eager = true)
        }
        ranks.select(col("id"), col("r").as("rank_scaled"))
      }
    } finally e.unpersist(blocking = false)
  }

  /** Neighbor-set Jaccard similarity between wedge-endpoint pairs —
    * the classic structural link-prediction / role-similarity score:
    * J(u,v) = |N(u) ∩ N(v)| / (deg(u) + deg(v) − |N(u) ∩ N(v)|),
    * computed for every pair sharing at least one neighbor (all other
    * pairs score 0 and are never enumerated). Top-`topK` pairs by
    * (jaccard desc, u, v).
    *
    * Scale design: common-neighbor counts come from per-CENTER
    * neighbor baskets (sort_array + in-codegen pair fan-out — the
    * co-purchase basket trick: ONE shuffle to group, no edge×edge
    * self-join) aggregated map-side; work is Σ_c deg(c)²/2 — wedge
    * pairs, the same budget any common-neighbor count pays.
    * `maxCenterDegree` (0 = off) prunes hub centers above the cap
    * before fan-out, the [[graft.ext.Dedup]] capBuckets guard: one
    * mega-hub otherwise quadratically dominates (its wedge pairs say
    * "these two nodes both touch the hub" — the least informative
    * signal in the graph, which is why dropping it is standard).
    * Degrees join back from the node-bounded degree frame; ranking
    * is TakeOrdered. The oracle computes ground truth via the NAIVE
    * wedge self-join, so the hash-match proves the basket path exact.
    */
  def neighborJaccard(edges: DataFrame, srcCol: String, dstCol: String,
      topK: Int, maxCenterDegree: Int = 0): DataFrame = {
    require(topK >= 1, s"bad topK $topK")
    val und = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    CacheScope.withCached(
      und.union(und.select(col("b").as("a"), col("a").as("b")))) { sym =>
      val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      val centers0 = sym.select(col("a").as("c"), col("b").as("n"))
      val centers =
        if (maxCenterDegree <= 0) centers0
        else centers0.join(
          deg.filter(col("deg") <= maxCenterDegree)
            .select(col("a").as("c")),
          Seq("c"), "left_semi")
      val common = centers
        .groupBy("c").agg(sort_array(collect_list(col("n"))).as("ns"))
        .select(explode(flatten(transform(col("ns"), (x, i) =>
          transform(slice(col("ns"), i + 2, size(col("ns"))), y =>
            struct(x.as("u"), y.as("v")))))).as("p"))
        .groupBy(col("p.u").as("u"), col("p.v").as("v"))
        .agg(count(lit(1)).as("common"))
      common
        .join(deg.select(col("a").as("u"), col("deg").as("__du")), "u")
        .join(deg.select(col("a").as("v"), col("deg").as("__dv")), "v")
        .select(col("u"), col("v"), col("common"),
          round(col("common").cast("double") /
            (col("__du") + col("__dv") - col("common")).cast("double"),
            12).as("jaccard"))
        .orderBy(desc("jaccard"), col("u"), col("v"))
        .limit(topK)
    }
  }

  /** Adamic–Adar link prediction — the degree-weighted twin of
    * [[neighborJaccard]]: AA(u,v) = Σ_{c ∈ N(u) ∩ N(v)} 1/ln(deg(c)),
    * so a common neighbor that touches everything contributes almost
    * nothing while a selective one is strong evidence (Adamic & Adar,
    * "Friends and neighbors on the Web", 2003). Top-`topK` pairs.
    *
    * Rides the identical per-center basket machinery (ONE shuffle to
    * group, in-codegen wedge fan-out, Σ deg(c)²/2 work, the same
    * `maxCenterDegree` hub cap — which here also bounds the weight
    * floor, since a capped hub's 1/ln(deg) is the smallest possible
    * contribution). The only change: each center's wedge pairs
    * aggregate the center's weight instead of a count. The 1/ln term
    * is libm, so it is snapped to 10⁻¹² fixed point ONCE per center
    * and the per-pair score is an exact long sum of snapped terms
    * (the [[graft.ext.Profile.mutualInfo]] discipline) — ranking ties
    * break on the exact integer, bit-stable on any engine. Centers of
    * degree 1 produce no wedges; ln(deg ≥ 2) > 0, so the weight is
    * always finite.
    *
    * Output: (u, v, common, aa_score) by (score desc, u, v).
    */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      topK: Int, maxCenterDegree: Int = 0): DataFrame = {
    require(topK >= 1, s"bad topK $topK")
    val und = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    CacheScope.withCached(
      und.union(und.select(col("b").as("a"), col("a").as("b")))) { sym =>
      val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      val centers0 = sym.select(col("a").as("c"), col("b").as("n"))
      val centers =
        if (maxCenterDegree <= 0) centers0
        else centers0.join(
          deg.filter(col("deg") <= maxCenterDegree)
            .select(col("a").as("c")),
          Seq("c"), "left_semi")
      val w12 = round(lit(1e12) / log(col("deg").cast("double")))
        .cast("long")
      // deg >= 2 BEFORE the weight projection: a degree-1 center spawns
      // no wedges, but ln(1) = 0 would still divide-by-zero under ANSI
      val wedges = centers
        .join(deg.select(col("a").as("c"), col("deg")), "c")
        .filter(col("deg") >= 2)
        .groupBy("c")
        .agg(sort_array(collect_list(col("n"))).as("ns"),
          first(w12).as("__w12"))
        .select(col("__w12"), explode(flatten(transform(col("ns"),
          (x, i) => transform(slice(col("ns"), i + 2, size(col("ns"))),
            y => struct(x.as("u"), y.as("v")))))).as("p"))
        .groupBy(col("p.u").as("u"), col("p.v").as("v"))
        .agg(count(lit(1)).as("common"), sum(col("__w12")).as("__aa12"))
      wedges
        .select(col("u"), col("v"), col("common"),
          round(col("__aa12").cast("double") / 1e12, 12).as("aa_score"),
          col("__aa12"))
        .orderBy(desc("__aa12"), col("u"), col("v"))
        .limit(topK)
        .drop("__aa12")
    }
  }

  /** HITS hubs & authorities (Kleinberg, "Authoritative sources in a
    * hyperlinked environment", JACM 1999) in exact integer fixed
    * point: per round, authority(v) = Σ_{u→v} hub(u), then hub(u) =
    * Σ_{u→v} authority(v), each L1-normalized to total mass
    * [[HitsScale]]. The textbook L2 norm needs a square root, which
    * no engine reproduces bitwise; L1 produces the identical RANKING
    * (normalization is a per-round positive scalar either way) with
    * pure integer arithmetic: sums are order-independent longs and
    * the normalization is one exact integral division
    * `(score · Scale) div total` — the product is carried as
    * decimal(38,0) (score ≤ total ≤ N·Scale ≈ 2⁶³ would overflow a
    * long times Scale), the dropped remainders are the same
    * documented ≤ N·Scale⁻¹ quantization as [[pageRank]]'s.
    *
    * Scale design: identical skeleton to [[pageRank]] — the edge list
    * is partitioned on src once and cached; each round is two
    * equi-joins + two map-side-combinable hash aggs + two 1-row total
    * sums carried back as broadcast scalars (never driver values).
    * Hub skew collapses in partial aggregation. Both raw frames
    * localCheckpoint EVERY round — each is read twice by its
    * normalization, so an unmaterialized chain doubles per read
    * (exponential in rounds; measured 231 jobs lazy vs 41
    * materialized at 2 rounds). Returns (id, hub_scaled,
    * auth_scaled).
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64], got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      // r17: the dedup'd edge frame feeds THREE cache builds (the
      // src-partitioned layout + both union branches of the node set)
      // — cache it for the scope like [[pageRank]] does, or the
      // 600k-row scan+distinct runs three times per call
      .cache()
    // Normalization stays decimal(38,0) — but it runs on NODE-bounded
    // rows only. The cast covers both the long raw sums (rounds ≥ 2)
    // and round 1's decimal indeg·Scale products; `div` on decimals
    // yields LONG, so the normalized columns are longs, as before.
    // The total Σ casts PER ROW before summing: a long-typed sum
    // accumulator would overflow at Σ ≈ E·Scale on a 10¹²-edge graph.
    def l1Norm(df: DataFrame, raw: String, out: String): DataFrame =
      df.crossJoin(broadcast(
          df.agg(sum(col(raw).cast("decimal(38,0)")).as("__tot"))))
        .select(col("id"),
          expr(s"(CAST($raw AS DECIMAL(38,0)) * $HitsScale) div __tot")
            .as(out))
    try CacheScope.withCached2(
      e.repartition(col("src")),
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .repartition(col("id"))) { (eCached, nodes) =>
      // Round-17 optimization (guide §1.2 step 2 / §4 "expression
      // choice"): the edge-wide aggregates sum LONGS, never
      // decimal(38,0) — a decimal sum accumulates through BigDecimal
      // (precision > 18), measured as THE cost of this operator
      // (~330 s summed task time at sf0.1; ~20 µs/row in the hot hash
      // agg). Safe at ANY graph size by the L1 invariant: after each
      // normalization Σ_v score(v) ≤ HitsScale = 10⁹, so every
      // per-node raw sum (a sum over a SUBSET of the normalized
      // scores) is ≤ 10⁹ ≪ 2⁶³. Only round 1's input is the
      // un-normalized constant init mass, where a per-node sum is
      // Scale·indeg — indeg > 9.2·10⁹ would overflow a long — so
      // round 1 aggregates a plain count and takes the Scale product
      // in decimal on the node-bounded output. Totals and the
      // (raw · Scale) div tot products stay decimal, node-bounded.
      // Values are bit-identical to the decimal formulation (same
      // integer sums, same integral divisions); the joins pin
      // SHUFFLED HASH with the node-bounded score frame as build side
      // (the labelPropagation treatment — the unhinted plan
      // sort-merge-joined, re-sorting the cached edge frame every
      // half-round).
      var hub: DataFrame = null // null in round 1 ⇔ all nodes at init
      var auth: DataFrame = null
      for (it <- 1 to iterations) {
        // each raw frame is read TWICE by its normalization (main +
        // total Σ) and feeds the next half-round's join — an
        // unmaterialized chain doubles per read and goes exponential
        // in the round count (measured: 231 jobs / 24 s for 2 rounds
        // at sf0.01 lazy vs 41 jobs materialized). ALWAYS truncate,
        // the dangling-PageRank discipline; the normalized frames
        // stay lazy cheap projections over the materialized raws.
        val aSums =
          if (it == 1)
            // hub ≡ HitsScale: Σ_{u→v} hub(u) = Scale · indeg(v),
            // exactly — no join, one long count agg, one decimal
            // product per NODE row
            eCached.groupBy(col("dst").as("id"))
              .agg(count(lit(1)).as("__indeg"))
              .select(col("id"),
                (lit(HitsScale).cast("decimal(38,0)") * col("__indeg"))
                  .as("ar"))
          else
            eCached.join(
                hub.select(col("id").as("src"), col("h"))
                  .hint("shuffle_hash"), "src")
              .groupBy(col("dst").as("id"))
              .agg(sum(col("h")).as("ar"))
        val aRaw = nodes.join(aSums, Seq("id"), "left")
          .select(col("id"), coalesce(col("ar"),
            lit(0L).cast(if (it == 1) "decimal(38,0)" else "long"))
            .as("ar"))
          .localCheckpoint(eager = true)
        auth = l1Norm(aRaw, "ar", "a")
        val hRaw = nodes.join(
            eCached.join(
                auth.select(col("id").as("dst"), col("a"))
                  .hint("shuffle_hash"), "dst")
              .groupBy(col("src").as("id"))
              .agg(sum(col("a")).as("hr")),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("hr"), lit(0L)).as("hr"))
          .localCheckpoint(eager = true)
        hub = l1Norm(hRaw, "hr", "h")
      }
      hub.join(auth, Seq("id"))
        .select(col("id"), col("h").as("hub_scaled"),
          col("a").as("auth_scaled"))
    } finally e.unpersist(blocking = false)
  }

  /** HITS mass unit (see [[hits]]): 10⁹ keeps the decimal(38,0)
    * normalization product N·Scale·Scale ≤ 10³⁸ for any corpus that
    * fits a long id space.
    */
  val HitsScale = 1000000000L

  /** Degree assortativity (Newman, "Assortative mixing in networks",
    * PRL 2002): the Pearson correlation of endpoint degrees over
    * every directed edge of the symmetrized graph — positive means
    * hubs attach to hubs (social nets), negative means hubs attach to
    * leaves (the usual shape of co-occurrence and dependency graphs;
    * a sampling or dedup step that flips the sign has changed the
    * graph's structure, which is the drift this detects).
    *
    * Delegates the moment computation to [[graft.ext.Profile
    * .corrMatrix]] — exact decimal(38,0) sums in ONE scan, a single
    * final double expression (sqrt of identical doubles is correctly
    * rounded, so engines agree) — after one shuffle to build the
    * (deg(src), deg(dst)) pair frame: degree agg, then two
    * co-partitioned joins back to the symmetric edge list. Returns
    * one row (n_pairs, assortativity); null assortativity on a
    * degree-regular graph (zero variance), never NaN.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    CacheScope.withCached(
      und.union(und.select(col("b").as("a"), col("a").as("b")))) { sym =>
      val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      val pairs = sym
        .join(deg.select(col("a"), col("deg").as("deg_src")), "a")
        .join(deg.select(col("a").as("b"), col("deg").as("deg_dst")), "b")
      Profile.corrMatrix(pairs,
          Seq("deg_src" -> col("deg_src"), "deg_dst" -> col("deg_dst")))
        .select(col("n").as("n_pairs"), col("corr").as("assortativity"))
    }
  }

  /** Label-propagation community detection (Raghavan, Albert, Kumara,
    * "Near linear time algorithm to detect community structures in
    * large-scale networks", 2007), SYNCHRONOUS variant with a fully
    * deterministic tie-break so a fixed round count is a pure function
    * of the edge set (the published algorithm breaks ties RANDOMLY and
    * updates asynchronously in arrival order — both unreproducible on
    * a distributed engine). Labels start as node ids; each round every
    * node adopts the most frequent label among its neighbors, ties to
    * the SMALLEST label. Returns (id, community) after exactly
    * `rounds` rounds — the fixed-round contract is the determinism
    * contract (sync LPA can 2-cycle on bipartite structure, so
    * "until converged" is not well-defined; callers pick the horizon,
    * oracles unroll the same rounds).
    *
    * Scale design (100 TB lens): per round, ONE equi-join of the
    * label frame against the symmetric edge list — cached and
    * pre-partitioned on the neighbor column once, so every round
    * reuses that exchange — then two map-side-combinable hash aggs:
    * count per (node, label) (hub skew collapses in the partial agg)
    * and an argmax per node computed as `max(struct(cnt, -label))`,
    * exact long arithmetic with no window and no sort. Past
    * [[DeepIterThreshold]] rounds the label frame localCheckpoints
    * every round ([[pageRank]]'s lineage-truncation discipline).
    *
    * The per-round join pins SHUFFLED HASH with the node-bounded
    * label frame as build side (the [[triangleCounts]]/[[kCorePeel]]
    * treatment): the label side comes out of a struct-max aggregate
    * whose size the planner can't estimate, so the unhinted plan
    * sort-merge-joined — re-SORTING the corpus-sized cached edge
    * frame every round. Measured at sf0.1 (round 9): the hint halves
    * the row's wall (8.1 → 5.0 s; summed task 122 → 65 k ms) and
    * with it the per-round marginal cost sits BELOW a [[pageRank]]
    * round (the round-8 2.4×-per-round reading divided setup-
    * inclusive suite-contended totals by round count; the clean
    * marginal — task(10 rounds) − task(4 rounds), over 6 — was
    * already 0.73× a pagerank round before the hint). pageRank/
    * [[hits]]/[[personalizedPageRank]] measured FLAT under the same
    * hint (their node-bounded side is already planned well), so only
    * this join pins it.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1, 64], got $rounds")
    val und = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
    CacheScope.withCached(sym.repartition(col("b"))) { symB =>
      // every node appears on both sides of sym, so the node set and
      // the initial labels need no separate frame
      var lbl = symB.select(col("a").as("id")).distinct()
        .select(col("id"), col("id").as("lbl"))
      for (r <- 1 to rounds) {
        // argmax by (count desc, label asc) as one exact-long struct
        // max: negating the label flips the order, so no window/sort.
        // Labels are node ids (≥ 0 after the cast filter), far from
        // Long.MinValue, so the negation cannot overflow.
        lbl = symB
          .join(lbl.select(col("id").as("b"), col("lbl"))
            .hint("shuffle_hash"), "b")
          .groupBy(col("a"), col("lbl"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("a"))
          .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
          .select(col("a").as("id"), (-col("m.nl")).as("lbl"))
        if (rounds > DeepIterThreshold)
          lbl = lbl.localCheckpoint(eager = true)
      }
      lbl.select(col("id"), col("lbl").as("community"))
    }
  }

  /** k-core peeling, `rounds` synchronous rounds: repeatedly drop
    * every node whose CURRENT degree (in the surviving subgraph) is
    * below `k`. After enough rounds this is exactly the k-core (the
    * maximal subgraph with min degree ≥ k); a FIXED round count keeps
    * the operator oracle-checkable (the oracle unrolls the same
    * rounds) and is how production uses it anyway — each round kills
    * a strictly shrinking shell, so a handful of rounds removes the
    * overwhelming mass and the result is reported per round count,
    * like [[pageRank]]'s fixed iterations.
    *
    * Returns (id, deg): surviving nodes with their residual degree.
    *
    * Scale: per round ONE hash aggregate (degrees, map-side partial —
    * checkpoint-materialized, it is a NODE-bounded artifact consumed
    * three times: fixed-point test and both join sides; the round-7
    * decade protocol caught the uncached first cut re-running the
    * corpus-wide aggregate once per semi join) and two left-semi
    * joins of the edge frame against the alive set, pinned
    * shuffle-hash with the node-bounded side as build (the
    * [[triangleCounts]] treatment — never sorts the edge stream).
    * Rounds EARLY-EXIT at the fixed point (alive count unchanged ⇒
    * every later round is an identity — same result, and a converged
    * graph costs one aggregate, not `rounds` × 2 joins); each
    * surviving-edge frame is checkpointed so lineage stays flat.
    */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"bad k $k")
    require(rounds >= 1 && rounds <= 32, s"bad rounds $rounds")
    // rounds run on the CANONICAL (a < b) frame — half the rows,
    // half the per-round shuffle and checkpoint bytes of a
    // symmetrized edge list; degrees stack both endpoint columns
    // into one aggregate instead
    var e = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint(eager = true)
    def degrees(f: DataFrame): DataFrame = f
      .select(col("a").as("n"))
      .union(f.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("__deg"))
    var converged = false
    for (_ <- 1 to rounds if !converged) {
      val deg = degrees(e).localCheckpoint(eager = true)
      val alive = deg.filter(col("__deg") >= k)
        .select(col("n").as("__alive"))
      // ONE blocking action per round: total and surviving counts come
      // out of the same aggregate over the materialized node-bounded
      // frame (the r7 shape ran alive.count() AND deg.count() — two
      // job submissions per round for one scalar each)
      val cnt = deg.agg(count(lit(1)),
        sum(when(col("__deg") >= k, 1L).otherwise(0L))).head
      val aliveN = if (cnt.isNullAt(1)) 0L else cnt.getLong(1)
      if (aliveN == cnt.getLong(0)) converged = true
      else e = e
        .join(alive.select(col("__alive").as("a")).hint("shuffle_hash"),
          Seq("a"), "left_semi")
        .join(alive.select(col("__alive").as("b")).hint("shuffle_hash"),
          Seq("b"), "left_semi")
        .localCheckpoint(eager = true)
    }
    degrees(e).select(col("n").as("id"), col("__deg").as("deg"))
  }
}
