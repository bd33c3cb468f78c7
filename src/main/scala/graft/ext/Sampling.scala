package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data pipelines
  * (SURVEY.md §7.6 extension surface).
  *
  * Everything here keys off [[hashUnit]]: a reproducible uniform [0,1)
  * value derived from the row's id, NOT from Spark's `df.sample` (whose
  * survivors depend on partition layout and rerun nondeterministically).
  * That buys, at any scale:
  *   - narrow plans — sampling/splitting is a filter/projection, zero
  *     shuffle, fully pushdown-friendly;
  *   - stability — the same row lands in the same split on every run,
  *     every engine, every partition count (held-out sets stay held out
  *     when the corpus is re-ingested);
  *   - independence — distinct `salt` values draw independent samples
  *     from the same ids (e.g. a 1% profiling sample uncorrelated with
  *     the train/valid/test split).
  *
  * The hash is the engine-portable md5-prefix ([[Dedup.hash48]]), so
  * every operator is oracle-checkable cell-for-cell: 48-bit values and
  * division by 2^48 are both exact in IEEE doubles, making `u < t`
  * comparisons bit-identical across engines.
  */
object Sampling {

  /** 2^48 — the exclusive upper bound of [[Dedup.hash48]] values. */
  val HashSpan: Double = 281474976710656.0

  /** Ceiling on distinct buckets [[globalIndex]] will collect counts
    * for (2^20) — the documented bound on its one driver-side collect.
    */
  val MaxBuckets: Int = 1 << 20

  /** Deterministic uniform [0,1): md5-prefix hash of (salt ++ id),
    * scaled by 2^-48. Exact in double arithmetic end-to-end.
    */
  def hashUnit(id: Column, salt: String = ""): Column =
    Dedup.hash48(concat(lit(salt), id.cast("string"))) / lit(HashSpan)

  /** Keep each row iff its hash unit is below `fraction` — a
    * deterministic Bernoulli(fraction) sample, as a plain filter.
    */
  def sampleByHash(
      df: DataFrame, idCol: String, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashUnit(col(idCol), salt) < fraction)

  /** Exactly-n deterministic sample: the n rows with the smallest
    * (hash-unit, id) — a total order, so the sample is reproducible,
    * order-independent, and EXACTLY n rows (a Bernoulli sample's size
    * is binomial; eval-set carving usually needs a count, not a rate).
    * Plans as TakeOrderedAndProject: an O(n) bounded heap per
    * partition, then an O(n · partitions) driver-side merge — no global
    * sort, no shuffle of the corpus (asserted in PlanSpec). Driver
    * memory is n rows — size n accordingly (thousands, not billions;
    * for rate-sized samples use [[sampleByHash]]).
    */
  def exactN(df: DataFrame, idCol: String, n: Int,
      salt: String = ""): DataFrame = {
    require(n > 0, "exactN needs n > 0")
    require(!df.columns.contains("__u"),
      "input column '__u' collides with exactN's working column")
    df.withColumn("__u", hashUnit(col(idCol), salt))
      .orderBy(col("__u"), col(idCol))
      .limit(n)
      .drop("__u")
  }

  /** Weighted sample without replacement, exactly n rows — the
    * Efraimidis–Spirakis A-ES scheme on deterministic randomness: each
    * row draws its reproducible uniform u and competes on
    * key = ln(u)/w (the monotone twin of the classic u^(1/w)); the n
    * largest keys win, so a row's inclusion probability is
    * proportional to its weight, without replacement, in ONE pass.
    * Non-positive weights are excluded. u is offset to (hash+0.5)/2^48
    * — strictly inside (0,1), still exact in doubles, so ln never sees
    * zero.
    *
    * Same plan contract as [[exactN]]: TakeOrderedAndProject — an O(n)
    * heap per partition + driver k-merge, no shuffle, no global sort;
    * and the same determinism: the winners are a pure function of
    * (id, weight) sets, independent of layout or rerun. The standard
    * quality-weighted corpus subset draw ("sample 1M docs ∝ quality
    * score") at any scale.
    *
    * Oracle-parity caveat (platform libm): the key uses `ln`, and
    * neither the JVM's `Math.log` nor DuckDB's `ln` is guaranteed
    * correctly rounded, so a 1-ulp divergence between the two libms
    * could in principle flip which row sits exactly at the top-n
    * boundary. u and w are engine-exact (48-bit hash, user doubles);
    * only the log itself carries this assumption. On this harness's
    * platform the two agree (the cell-for-cell compare is green); a
    * cross-platform deployment should treat boundary rows as tolerant
    * rather than bit-pinned.
    */
  def weightedExactN(
      df: DataFrame, idCol: String, weightCol: String, n: Int,
      salt: String = ""): DataFrame = {
    require(n > 0, "weightedExactN needs n > 0")
    require(!df.columns.contains("__k"),
      "input column '__k' collides with weightedExactN's working column")
    val u = (Dedup.hash48(concat(lit(salt), col(idCol).cast("string")))
      + lit(0.5)) / lit(HashSpan)
    df.filter(col(weightCol) > 0)
      .withColumn("__k", log(u) / col(weightCol))
      .orderBy(col("__k").desc, col(idCol))
      .limit(n)
      .drop("__k")
  }

  /** Cumulative split thresholds for `weights` normalized to sum 1:
    * the first n-1 upper bounds (the last split takes the remainder).
    * Exposed so oracle SQL can embed the SAME doubles the engine
    * compares against (re-deriving them risks one-ulp drift at the
    * boundaries).
    */
  def cumThresholds(weights: Seq[(String, Double)]): Seq[Double] = {
    val total = weights.map(_._2).sum
    weights.init.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
  }

  /** Assign every row to a named split (train/valid/test/...) by hash
    * threshold: split i takes u in [cum(i-1), cum(i)). Weights are
    * normalized; the assignment is a single projection.
    */
  def splitAssign(
      df: DataFrame, idCol: String, weights: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "split weights must be positive")
    val u = hashUnit(col(idCol), salt)
    val expr = weights.init.zip(cumThresholds(weights))
      .foldRight(lit(weights.last._1): Column) { case (((name, _), c), acc) =>
        when(u < c, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Deterministic output sharding: shard = hash48(salt ++ id) mod n.
    * A pure function of the row id — rerun-stable, engine-portable,
    * and independent of partition layout (unlike partition-index or
    * round-robin sharding, which reshuffle rows between shards whenever
    * the upstream plan changes). Downstream:
    * `.repartition(col("shard")).write.partitionBy("shard")` writes one
    * stable directory per shard with one shuffle.
    */
  def shardAssign(
      df: DataFrame, idCol: String, nShards: Int,
      salt: String = ""): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard",
      Dedup.hash48(concat(lit(salt), col(idCol).cast("string")))
        % nShards)
  }

  /** Per-key row cap (the C4/RefinedWeb "at most N documents per
    * domain" rule): for every key keep the `maxPerKey` rows with the
    * smallest deterministic hash — an unbiased fixed-size sample per
    * key, stable across reruns and partitionings. Returns the kept
    * (keys..., id) tuples; callers semi-join back for full rows.
    *
    * Ranking is the [[graft.functions.BoundedTopK]] aggregate (order:
    * hash asc, id asc via negated score), NOT `Window.partitionBy(key)`
    * + `row_number`: the aggregate's map-side partials hold ≤ maxPerKey
    * entries per key, so a hot key (the exact case the cap exists for —
    * one domain with 10^9 pages) costs O(maxPerKey) memory per task and
    * never routes all its rows through one reducer sort.
    */
  def capPerKey(
      df: DataFrame, keys: Seq[String], idCol: String, maxPerKey: Int,
      salt: String = ""): DataFrame = {
    require(keys.nonEmpty && maxPerKey > 0, "need keys and a positive cap")
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.BoundedTopK.topk(
        -hashUnit(col(idCol), salt), col(idCol).cast("long"), maxPerKey)
        .as("__tk"))
      .select(keys.map(col) :+ explode(col("__tk")).as("__e"): _*)
      .select(keys.map(col) :+ col("__e.id").as(idCol): _*)
  }

  /** Distribution-MATCHED sampling: draw ≈`n` rows from `source` so
    * the drawn value distribution follows `target`'s SHAPE — the
    * matched-control curation step ("sample web documents whose
    * length profile matches the curated corpus", "draw negatives with
    * the positives' score distribution") that plain rate sampling
    * cannot express: a uniform rate preserves the SOURCE's shape, not
    * the target's.
    *
    * Mechanics: `target` defines an `nBins` equal-frequency grid (its
    * own exact interpolated percentiles — the
    * [[graft.ext.Experiment.calibrationQuantile]] edge discipline, so
    * bin = count of exceeded thresholds, ties deterministic);
    * per-bin quotas are `n·cnt_T(bin) div n_T` — exact integral
    * shares of the requested size, Σ ≤ n; winners per bin are the
    * quota-many smallest-hash source rows (the [[capPerKey]]
    * BoundedTopK discipline — map-side O(k) state per bin, no
    * window, partition/rerun/engine-stable). A bin the source cannot
    * fill delivers what it has — the shortfall is REPORTED by the
    * (bin, quota, taken) output, never silently rebalanced onto
    * other bins (that would distort the shape the caller asked for).
    *
    * Scale: the grid and quota frames are nBins-bounded broadcasts;
    * the source pays one projection + one hash agg with O(n) state
    * per bin. Output: (idCol, bin) winners — semi-join back for full
    * rows; `groupBy(bin).count()` against the quota frame reads the
    * fill rates when shortfall matters.
    */
  def matchDistribution(target: DataFrame, source: DataFrame,
      targetValue: Column, sourceValue: Column, idCol: String,
      nBins: Int, n: Int, salt: String = ""): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"bad nBins $nBins")
    require(n >= 1, s"bad n $n")
    val probs = array((1 until nBins).map(i =>
      lit(i.toDouble / nBins)): _*)
    val grid = target.select(targetValue.cast("double").as("__tv"))
      .where(col("__tv").isNotNull)
      .agg(percentile(col("__tv"), probs).as("__b"))
    def binOf(v: Column): Column = (1 until nBins).map(i =>
      when(v >= element_at(col("__b"), i), 1L).otherwise(0L))
      .reduce(_ + _)
    val tHist = target.select(targetValue.cast("double").as("__tv"))
      .where(col("__tv").isNotNull)
      .crossJoin(broadcast(grid))
      .groupBy(binOf(col("__tv")).as("__bin"))
      .agg(count(lit(1)).as("__ct"))
    val quotas = tHist.crossJoin(broadcast(
        tHist.agg(sum(col("__ct")).as("__nt"))))
      .select(col("__bin"),
        expr(s"(${n.toLong}L * __ct) div __nt").as("__quota"))
    source.select(col(idCol), sourceValue.cast("double").as("__sv"))
      .where(col("__sv").isNotNull)
      .crossJoin(broadcast(grid))
      .groupBy(binOf(col("__sv")).as("__bin"))
      .agg(graft.functions.BoundedTopK.topk(
        -hashUnit(col(idCol), salt), col(idCol).cast("long"), n)
        .as("__tk"))
      .join(broadcast(quotas), Seq("__bin"))
      .select(col("__bin"), col("__quota"),
        posexplode(col("__tk")).as(Seq("__p", "__e")))
      .where(col("__p") < col("__quota"))
      .select(col("__e.id").as(idCol), col("__bin").as("bin"))
  }

  /** Deterministic sequence packing: assign rows to token-budget bins —
    * the pretraining batch-packing step. Rows are ordered by their
    * stable hash within a hash shard; a running weight sum assigns each
    * row to bin `floor(cum_before / budget)` (append-style packing: a
    * row may straddle its bin's boundary, the convention streaming
    * packers use — no bin ever waits for a better-fitting row, so the
    * assignment is a pure function of (id, weight) sets).
    *
    * Parallelism note: the running sum is a per-shard window, so
    * `nShards` bounds the parallelism of this stage — size it to the
    * cluster (thousands at 100 TB), not to the default 8. Packing is
    * inherently sequential WITHIN a bin sequence; sharding first is
    * what makes it distributable, at the cost of `nShards` partially
    * filled trailing bins.
    */
  def packBins(
      df: DataFrame, idCol: String, weightCol: String, budget: Double,
      nShards: Int, salt: String = ""): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(!df.columns.exists(Seq("__cum", "__u").contains),
      "input columns collide with packing working columns (__cum/__u)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard")
      .orderBy(hashUnit(col(idCol), salt), col(idCol))
      .rowsBetween(Long.MinValue, -1L)
    shardAssign(df, idCol, nShards, salt)
      .withColumn("__cum",
        coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("__cum") / budget))
      .drop("__cum")
  }

  /** Materialize packed training sequences: concatenate each
    * [[packBins]] bin's documents — in the same stable hash order the
    * packer assigned them — into one text per bin, with doc and weight
    * totals. Output: (shard, bin, text, n_docs, total_weight).
    *
    * The reassembly is one hash aggregation on (shard, bin) whose state
    * is a single bin's documents — bounded by the token budget plus the
    * one straddling doc, NEVER by corpus size — so a 100 TB corpus
    * packs with per-task memory set by `budget`, and `nShards` remains
    * the parallelism knob. The in-bin sort is per-row-group
    * `array_sort`, not a window or global sort.
    */
  def packSequences(
      df: DataFrame, idCol: String, weightCol: String, textCol: String,
      budget: Double, nShards: Int, salt: String = "",
      sep: String = "\n"): DataFrame =
    packBins(df, idCol, weightCol, budget, nShards, salt)
      .withColumn("__u", hashUnit(col(idCol), salt))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol)).as("total_weight"),
        // tie-break on the id AS-IS: a cast("long") here would be null
        // for string ids and silently fall through to text ordering
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("__u"),
            col(idCol).as("__id"),
            col(textCol).as("__t")))),
          s => s.getField("__t"))).as("text"))
      .select(col("shard"), col("bin"), col("text"), col("n_docs"),
        col("total_weight"))

  /** Token-budget corpus mixing: from each source keep documents — in
    * stable hash order — until that source's budget of `weightCol`
    * (tokens, chars, bytes) is exhausted; the straddling document is
    * kept (append-style, same convention as [[packBins]]). THE
    * mixture-construction operator — "30 B tokens of web, 5 B of code"
    * is an absolute-budget ask that rate-based [[weightedMix]] can't
    * express exactly. Deterministic: the kept set is a pure function of
    * (id, weight, source) — rerun/layout/engine-stable. Sources absent
    * from `budgets` are dropped.
    *
    * The running sum is a per-source window over the weight column —
    * parallelism = |sources| (the same sequential-within-group contract
    * as packBins); a single source needing more parallelism can be
    * pre-sharded and its budget split across shards.
    */
  def takeTokenBudget(
      df: DataFrame, idCol: String, weightCol: String, sourceCol: String,
      budgets: Map[String, Double], salt: String = ""): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0),
      "need at least one positive budget")
    require(!df.columns.contains("__cum"),
      "input column '__cum' collides with takeTokenBudget's working column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(hashUnit(col(idCol), salt), col(idCol))
      .rowsBetween(Long.MinValue, -1L)
    val budget = budgets.toSeq.sortBy(_._1)
      .foldRight(lit(null).cast("double"): Column) { case ((s, b), acc) =>
        when(col(sourceCol) === s, lit(b)).otherwise(acc)
      }
    df.withColumn("__cum",
        coalesce(sum(col(weightCol)).over(w).cast("double"), lit(0.0)))
      .filter(col("__cum") < budget)
      .drop("__cum")
  }

  /** Scalable deterministic GLOBAL row numbering by (`orderKey`, id)
    * ascending: returns (id..., idx) with idx = 0-based global rank.
    * The naive formulation — `row_number` over a global ORDER BY — is a
    * single-partition window: every row of a 100 TB corpus through one
    * reducer. This is the classic two-phase replacement:
    *
    *   1. `bucket` (caller-supplied, a MONOTONE coarsening of orderKey
    *      with bounded cardinality — all rows of a lower bucket order
    *      before all rows of a higher one) partitions the order;
    *   2. per-bucket counts (one map-side-combinable agg, output =
    *      #buckets rows) are prefix-summed on the driver into bucket
    *      offsets — bounded state, independent of corpus size;
    *   3. within-bucket `row_number` (a Window PARTITIONED on bucket —
    *      each partition holds ≈ n/#buckets rows, the knob the caller
    *      sizes to executor memory) + broadcast offset = global index.
    *
    * Ties in orderKey land in the same bucket (bucket is a function of
    * the key), so the global order is exactly (orderKey, id) — identical
    * to the single-window formulation, hash-checkable against a plain
    * `row_number() OVER (ORDER BY key, id) - 1` oracle.
    */
  def globalIndex(df: DataFrame, idCol: String, orderKey: Column,
      bucket: Column): DataFrame =
    globalIndexWithTotal(df, idCol, orderKey, bucket)._1

  /** [[globalIndex]] plus the total row count — the count falls out of
    * the collected bucket counts, so callers needing it (e.g.
    * [[curriculumShards]]'s shard cut) avoid re-scanning the index.
    */
  def globalIndexWithTotal(df: DataFrame, idCol: String, orderKey: Column,
      bucket: Column): (DataFrame, Long) = {
    require(
      !df.columns.exists(Seq("__ok", "__b", "__off", "__rn", "idx").contains),
      "input columns collide with globalIndex working/output columns " +
        "(__ok/__b/__off/__rn/idx)")
    var total = 0L
    val indexed = CacheScope.withCached(
      df.withColumn("__ok", orderKey)
        .withColumn("__b", bucket.cast("long"))) { base =>
      // The per-bucket count collect is the ONLY driver-side state this
      // operator holds; cap its cardinality so a caller passing a
      // high-cardinality bucket expression (e.g. the raw hash) fails
      // fast instead of OOMing the driver. limit(MaxBuckets+1) bounds
      // the collect itself — at most MaxBuckets+1 rows ever reach the
      // driver, even when the bucket column has billions of values.
      val probe = base.groupBy(col("__b")).count()
        .limit(MaxBuckets + 1).collect()
      require(probe.length <= MaxBuckets,
        s"globalIndex bucket expression produced more than $MaxBuckets " +
          "distinct buckets; coarsen it (bucket must be a bounded, " +
          "monotone function of the order key)")
      val counts = probe
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      total = counts.map(_._2).sum
      val offsets = counts.map(_._1)
        .zip(counts.scanLeft(0L)(_ + _._2).init)
      indexWithOffsets(base, idCol, offsets.toSeq)
    }
    (indexed, total)
  }

  /** Phase 3 of [[globalIndex]] — bucketed numbering against collected
    * bucket offsets. Package-private so PlanSpec can assert the Window
    * is PARTITIONED (on __b), never a single-partition global sort.
    */
  private[graft] def indexWithOffsets(base: DataFrame, idCol: String,
      offsets: Seq[(Long, Long)]): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__b", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__ok"), col(idCol))
    base.join(broadcast(offDf), "__b")
      .withColumn("__rn", row_number().over(w))
      .withColumn("idx", col("__off") + col("__rn") - 1)
      .drop("__ok", "__b", "__off", "__rn")
  }

  /** Deterministic global shuffle with a materialized order index: rows
    * numbered by their stable hash — the "randomize training order,
    * reproducibly" operator. `nBuckets` (≤ 16384) is the parallelism /
    * partition-size knob for the bucketed numbering; bucket = the hash's
    * top bits, monotone by construction. Output: input columns + idx.
    */
  def deterministicShuffle(df: DataFrame, idCol: String,
      nBuckets: Int = 1024, salt: String = ""): DataFrame = {
    require(nBuckets > 0 && nBuckets <= 16384,
      "nBuckets must be in (0, 16384]")
    val h = Dedup.hash48(concat(lit(salt), col(idCol).cast("string")))
    // bucket = top bits of h: (h * nBuckets) stays < 2^62 for
    // nBuckets ≤ 2^14, and shiftright by 48 is exact long division by
    // 2^48 — genuinely integer end-to-end (a double `/` here would
    // round above 2^53, still monotone but not the exact math claimed)
    globalIndex(df, idCol, h, shiftright(h * nBuckets, 48))
  }

  /** Curriculum sharding: order the corpus by a difficulty/quality
    * score (ascending, id tie-break) and cut it into `nShards` equal
    * contiguous shards — shard 0 = easiest fraction, the
    * curriculum-learning data layout. `bucket` coarsens the score
    * monotonically (e.g. `floor(score / w)`); clamping keeps any
    * outlier monotone. Output: input columns + idx + shard.
    */
  def curriculumShards(df: DataFrame, idCol: String, scoreCol: Column,
      bucket: Column, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(!df.columns.contains("shard"),
      "input column 'shard' collides with curriculumShards's output")
    val (idx, total) = globalIndexWithTotal(df, idCol, scoreCol, bucket)
    idx.withColumn("shard",
      floor(col("idx") * nShards / lit(total)).cast("int"))
  }

  /** Temperature-scaled per-source keep rates from observed source
    * sizes: rate_s ∝ n_s^(α-1), scaled so the LARGEST source keeps
    * `maxRate` of its rows — the multinomial temperature-sampling rule
    * (mT5/XLM-R style) that upsamples small sources relative to large
    * ones (α = 1 keeps every source at `maxRate`; α → 0 equalizes
    * EXPECTED draws across sources). Returns (source → rate), rates
    * clamped to 1.0. Driver state = one row per source (bounded); the
    * fit is deterministic — a pure function of the counts in sorted
    * source order — so the rates can be embedded as literals in
    * engine query and oracle alike.
    */
  def temperatureRates(df: DataFrame, sourceCol: String, alpha: Double,
      maxRate: Double = 1.0): Seq[(String, Double)] = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(maxRate > 0 && maxRate <= 1, "maxRate must be in (0, 1]")
    // null sources get no rate (weightedMix's default drops them) —
    // a null key would otherwise NPE the sort and render an invalid
    // SQL literal in generated oracles
    val counts = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty, "no sources to rate")
    // rate_s = maxRate · (n_s / n_max)^(α-1), clamped at 1: the
    // largest source keeps maxRate, smaller sources keep MORE
    // (upsampled toward balance as α decreases)
    val nMax = counts.map(_._2).max.toDouble
    counts.map { case (s, n) =>
      s -> math.min(1.0, maxRate * math.pow(n / nMax, alpha - 1.0))
    }.toSeq
  }

  /** [[weightedMix]] under [[temperatureRates]] — the one-call
    * temperature-mixing operator. Still a single narrow filter per row;
    * the only non-projection work is the bounded per-source count.
    */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
      alpha: Double, maxRate: Double = 1.0,
      salt: String = ""): DataFrame =
    weightedMix(df, idCol, sourceCol,
      temperatureRates(df, sourceCol, alpha, maxRate).toMap,
      default = 0.0, salt = salt)

  /** Weighted corpus mixing: keep a row iff its hash unit is below the
    * keep-fraction of its `sourceCol` value (`default` for unlisted
    * sources). The standard "mix N corpora at chosen rates into one
    * training set" operator — still a single narrow filter; the
    * per-source rate lookup is a constant-folded CASE chain.
    */
  def weightedMix(
      df: DataFrame, idCol: String, sourceCol: String,
      fractions: Map[String, Double], default: Double = 0.0,
      salt: String = ""): DataFrame = {
    val rate = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(default): Column) { case ((src, f), acc) =>
        when(col(sourceCol) === src, lit(f)).otherwise(acc)
      }
    df.filter(hashUnit(col(idCol), salt) < rate)
  }

  /** Deterministic negative sampling for contrastive / recommender
    * training pairs: each (user, positive-item) row fans out to `k`
    * pseudo-random negatives drawn UNIFORMLY from the dense item
    * universe [1, m] minus the positive itself — the standard
    * in-batch-free negative generator, reproducible across reruns,
    * engines, and partitionings (the draw is [[Dedup.hash48]] of
    * "neg_<user>_<pos>_<slot>", not an RNG).
    *
    * The exclude-the-positive trick costs no rejection loop: draw
    * n₀ ∈ [1, m−1] and shift draws ≥ pos up by one — an exact
    * bijection onto [1, m] \ {pos}, still uniform (modulo the hash's
    * negligible 48-bit bias over item universes ≪ 2⁴⁸).
    *
    * Scale design: one broadcast of the 1-row universe bound, then a
    * pure narrow projection (sequence-explode × hash) — ZERO
    * shuffles; output is k× the pair count, streamed straight to the
    * sink. Caller contract: item ids are dense in [1, m] (TPC-H-style
    * surrogate keys; remap sparse ids first with [[globalIndex]]).
    */
  def negativeSamples(pairs: DataFrame, userCol: String, posCol: String,
      universe: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val mx = broadcast(
      universe.agg(max(col(itemCol)).cast("long").as("__m")))
    val h = Dedup.hash48(concat_ws("_", lit("neg"),
      col("user_id"), col("pos_item"), col("slot")))
    val neg0 = pmod(h, col("__m") - 1) + 1
    pairs.select(col(userCol).cast("long").as("user_id"),
        col(posCol).cast("long").as("pos_item"))
      .crossJoin(mx)
      .select(col("user_id"), col("pos_item"), col("__m"),
        explode(sequence(lit(1L), lit(k.toLong))).as("slot"))
      .select(col("user_id"), col("pos_item"), col("slot"),
        when(neg0 >= col("pos_item"), neg0 + 1).otherwise(neg0)
          .as("neg_item"))
  }

  /** Neyman allocation for stratified sampling: split a budget of
    * `total` samples across strata proportionally to N_h·σ_h (stratum
    * size × population std dev) — the variance-optimal allocation for
    * estimating the overall mean. The eval-set-design complement of
    * [[exactN]]: exactN draws the rows, this says how many per
    * stratum.
    *
    * Determinism treatment: σ_h comes from exact decimal moments (one
    * hash aggregate) through a fixed chain of correctly-rounded double
    * ops; the weight N_h·σ_h is then SNAPPED to 10⁻⁶ fixed point
    * (floor) so the apportionment runs on EXACT INTEGERS — quota
    * floor-division and largest-remainder top-up are integer
    * arithmetic with (remainder desc, stratum asc) tie-break, so the
    * allocations sum to exactly `total` and hash-match any engine.
    * A cross-strata DOUBLE sum would be partition-order-dependent;
    * the fixed-point long sum is not.
    *
    * Scale: one corpus aggregate to stratum grain; everything after
    * (including the single-partition window) runs on the bounded
    * strata frame — document the stratum-count bound, not a row
    * bound. Output: (stratum, n_rows, sigma, alloc) with Σ alloc =
    * min(total, …); all-zero weights (every stratum constant) fall
    * back to pure size-proportional allocation.
    */
  def neymanAllocation(df: DataFrame, stratumCol: Column,
      valueCol: Column, total: Long): DataFrame = {
    require(total >= 0, s"bad total $total")
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val strata = df
      .select(stratumCol.as("stratum"), valueCol.cast("long").as("__v"))
      .where(col("stratum").isNotNull && col("__v").isNotNull)
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_rows"),
        sum(dec(col("__v"))).as("__s"),
        sum(dec(col("__v")) * dec(col("__v"))).as("__ss"))
    def d(c: String) = col(c).cast("double")
    // population σ² = (n·Σv² − (Σv)²)/n² — exact moments, fixed chain
    val sigma = sqrt(greatest(
      (d("n_rows") * d("__ss") - d("__s") * d("__s")) /
        (d("n_rows") * d("n_rows")), lit(0.0)))
    // 1e-6 fixed-point weight; constant strata weigh 0 and the
    // all-constant corpus degrades to size-proportional shares
    val w = strata.withColumn("sigma", sigma)
      .withColumn("__w",
        floor(col("n_rows").cast("double") * col("sigma") * 1e6)
          .cast("long"))
    val wTot = sum(dec(col("__w")))
      .over(Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing))
    val nTot = sum(dec(col("n_rows")))
      .over(Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing))
    val withW = w
      .withColumn("__wtot", wTot)
      .withColumn("__q",
        when(col("__wtot") > 0, dec(lit(total)) * dec(col("__w")))
          .otherwise(dec(lit(total)) * dec(col("n_rows"))))
      .withColumn("__den", when(col("__wtot") > 0, col("__wtot"))
        .otherwise(nTot))
      .withColumn("__base",
        call_function("div",
          col("__q") - pmod(col("__q"), col("__den")), col("__den"))
          .cast("long"))
      .withColumn("__rem", pmod(col("__q"), col("__den")))
    val rankW = Window.orderBy(col("__rem").desc, col("stratum"))
    val baseW = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    withW
      .withColumn("__rank", row_number().over(rankW).cast("long"))
      .withColumn("__left", lit(total) - sum(col("__base")).over(baseW))
      .select(col("stratum"), col("n_rows"),
        round(col("sigma"), 12).as("sigma"),
        (col("__base") +
          when(col("__rank") <= col("__left"), 1L).otherwise(0L))
          .as("alloc"))
  }
}
