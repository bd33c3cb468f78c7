package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event logs — funnel conversion, cohort
  * retention, and item co-occurrence lift. The three classic "how do
  * users move through the product" OLAP queries, shaped so every stage
  * is a keyed hash aggregate or a key-equi join (never a per-user
  * ordered scan, never a cross product).
  *
  * Scale design (100 TB lens):
  *  - [[funnel]] is (#steps − 1) equi-joins on the user key, each
  *    followed by a map-side-combinable `min` aggregate. Each stage's
  *    input is FILTERED to one step's events before the join, so the
  *    join sides shrink monotonically down the funnel; all stages
  *    shuffle on the same key, so AQE/exchange reuse keeps one
  *    partitioning alive across the chain. The per-step count branches
  *    re-state their prefix chains in the plan, but each repeated
  *    exchange is identical and dedups to one execution via Spark's
  *    ReusedExchange. No window: the "first time user reached step k
  *    after step k−1" is a min-agg, not a sort;
  *  - [[cohortRetention]] is two hash aggregates and one self-join on
  *    the user key (first-week fit, join back, count-distinct per
  *    cell). The output is bounded by #weeks² cells regardless of
  *    corpus size;
  *  - [[pairLift]] joins the DISTINCT (user, item) set with itself on
  *    user — at most (items per user)² candidate rows per user, the
  *    standard market-basket bound — then broadcasts the per-item
  *    counts (≤ #distinct items rows) back onto the pair counts. Lift
  *    arithmetic is integer-exact until the final single division;
  *  - week bucketing is exact long arithmetic: `ts − (ts mod 7d)` is
  *    divisible by 7d, and both operands of the final division are
  *    < 2⁵³, so the double division is exact and engine-portable.
  */
object Behavior {

  private val WeekUs = 7L * 86400L * 1000000L

  /** Absolute 7-day bucket index of a microsecond timestamp (epoch
    * anchored). Exact: the subtraction makes the dividend an exact
    * multiple of `WeekUs`, so the double division has a representable
    * integer result (both inputs < 2⁵³) and rounds to it exactly.
    */
  def weekIndex(tsMicros: Column): Column =
    ((tsMicros - pmod(tsMicros, lit(WeekUs))) / lit(WeekUs)).cast("long")

  /** Ordered-step funnel: row k reports how many users performed
    * `steps(k)` strictly AFTER their earliest qualifying time for
    * `steps(k-1)` (earliest-transition semantics — each user's clock
    * for step k starts at their first step-(k−1) arrival). Returns one
    * row per step: (step_idx, step, users).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: Column,
      typeCol: Column,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached = events.where(typeCol === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("__graft_t"))
    val perStep = scala.collection.mutable.ArrayBuffer(
      (0, steps.head, reached))
    for (i <- 1 until steps.length) {
      reached = events.where(typeCol === steps(i))
        .join(reached, userCol)
        .where(tsCol > col("__graft_t"))
        .groupBy(userCol).agg(min(tsCol).as("__graft_t"))
      perStep += ((i, steps(i), reached))
    }
    perStep.map { case (i, s, df) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i).as("step_idx"), lit(s).as("step"), col("users"))
    }.reduce(_.unionAll(_))
  }

  /** [[funnel]] with step LATENCIES: for every transition k−1 → k
    * (step_idx ≥ 1) the number of converting users, the exact long sum
    * of their per-user transition times (µs), and the mean. `tsMicros`
    * must be a LONG microsecond column (unlike [[funnel]], arithmetic
    * happens on it). Same join/min-agg chain — the previous step's
    * arrival time rides along as a constant-per-group max, so the
    * delta is computed without any extra join or window. The mean is
    * the ONLY float op (one IEEE division of exact integers); empty
    * steps report (0, 0, null).
    */
  def funnelTimes(
      events: DataFrame,
      userCol: String,
      tsMicros: Column,
      typeCol: Column,
      steps: Seq[String]): DataFrame = {
    require(steps.length >= 2, "funnelTimes needs at least two steps")
    var reached = events.where(typeCol === steps.head)
      .groupBy(userCol).agg(min(tsMicros).as("__graft_t"))
    val perStep =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, DataFrame)]
    for (i <- 1 until steps.length) {
      val prev = reached.select(col(userCol),
        col("__graft_t").as("__graft_tp"))
      reached = events.where(typeCol === steps(i))
        .join(prev, userCol)
        .where(tsMicros > col("__graft_tp"))
        .groupBy(userCol)
        .agg(min(tsMicros).as("__graft_t"),
          max("__graft_tp").as("__graft_tp")) // constant per group
      perStep += ((i, steps(i), reached))
    }
    perStep.map { case (i, s, df) =>
      df.agg(
          count(lit(1)).as("users"),
          coalesce(sum(col("__graft_t") - col("__graft_tp")), lit(0L))
            .as("sum_us"))
        .select(lit(i).as("step_idx"), lit(s).as("step"), col("users"),
          col("sum_us"),
          when(col("users") > 0,
            col("sum_us").cast("double") / col("users").cast("double"))
            .as("avg_us"))
    }.reduce(_.unionAll(_))
  }

  /** Weekly cohort retention: users are cohorted by the week of their
    * FIRST event; each (cohort_week, week_offset) cell counts the
    * distinct cohort members active that many weeks later (offset 0 =
    * the cohort's own size).
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsMicros: Column): DataFrame = {
    val wk = events
      .select(col(userCol).as("__graft_u"), weekIndex(tsMicros).as("__graft_w"))
    val first = wk.groupBy("__graft_u").agg(min("__graft_w").as("__graft_cw"))
    wk.join(first, "__graft_u")
      .groupBy(col("__graft_cw").as("cohort_week"),
        (col("__graft_w") - col("__graft_cw")).as("week_offset"))
      .agg(countDistinct(col("__graft_u")).as("users"))
  }

  /** Pairwise co-occurrence lift over (id, item) observations: for
    * every unordered item pair {a < b}, the number of ids that saw
    * both, each item's own id count, and
    * lift = (n_ab · N) / (n_a · n_b) where N = total distinct ids.
    * Lift > 1 means the pair co-occurs more than independence predicts.
    * All counts are exact longs; the single final division is the only
    * float op (both operands exact, IEEE division — engine-portable).
    */
  def pairLift(df: DataFrame, idCol: String, itemCol: String): DataFrame = {
    // scoped cache: the distinct (id, item) frame feeds FOUR subtrees
    // (both self-join sides, the per-item counts, the total) — without
    // it the corpus distinct shuffle runs once per consumer
    CacheScope.withCached(
      df.select(col(idCol).as("__graft_u"), col(itemCol).as("__graft_i"))
        .where(col("__graft_i").isNotNull).distinct()) { d =>
      val perItem = d.groupBy(col("__graft_i")).agg(count(lit(1)).as("n"))
      val total = d.select(
        countDistinct(col("__graft_u")).as("__graft_n_total"))
      val pairs = d.toDF("__graft_u", "item_a")
        .join(d.toDF("__graft_u", "item_b"), "__graft_u")
        .where(col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(perItem.toDF("item_a", "n_a")), "item_a")
        .join(broadcast(perItem.toDF("item_b", "n_b")), "item_b")
        .crossJoin(broadcast(total))
        .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
          col("n_b"),
          ((col("n_ab") * col("__graft_n_total")).cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("lift"))
    }
  }

  /** First-order Markov transition matrix over each key's time-ordered
    * event stream: for every observed (from_state, to_state) step, the
    * exact transition count and probability
    * p = n / Σ_to n (row-normalized). One per-key `lead` window — the
    * sequencing is inherent to "what happens next", and a partition
    * holds ONE key's events (the bounded-partition exception documented
    * on [[Sessions]]) — then everything downstream is hash aggregation
    * over an output bounded by (#states)², not the corpus. Counts are
    * exact longs; the single final division is IEEE-exact-rounded on
    * both engines. Ties on `tsUs` are ordered by `tieCol` so the
    * successor — and therefore the matrix — is deterministic.
    */
  def transitionMatrix(
      events: DataFrame, keyCol: String, tsUs: Column, tieCol: Column,
      stateCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(tsUs, tieCol)
    val steps = events
      .select(stateCol.as("from_state"),
        lead(stateCol, 1).over(w).as("to_state"))
      .where(col("to_state").isNotNull)
      .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
    // row totals: a second tiny agg + broadcast join over the bounded
    // matrix beats a window re-sort of it
    steps
      .join(broadcast(steps.groupBy("from_state")
        .agg(sum("n").as("__graft_row_n"))), "from_state")
      .select(col("from_state"), col("to_state"), col("n"),
        (col("n").cast("double") / col("__graft_row_n").cast("double"))
          .as("p"))
  }

  /** Top-k session paths: sessionize each key's stream under `gapUs`
    * ([[Sessions.assign]] semantics), render each session as the
    * time-ordered `sep`-joined state string, and return the `k` most
    * frequent paths (count desc, path asc — total order, so the cut is
    * deterministic). The per-session array is bounded by session
    * length, the path aggregate by the number of DISTINCT paths — both
    * independent of corpus size. `collect_list` order is made
    * deterministic by sorting the collected (ts, tie, state) structs,
    * not by trusting arrival order.
    */
  def topPaths(
      events: DataFrame, keyCol: String, tsUs: Column, tieCol: Column,
      stateCol: Column, gapUs: Long, k: Int, sep: String = ">")
      : DataFrame = {
    val assigned = Sessions.assign(
      events.select(col(keyCol), tsUs.as("__graft_ts"),
        tieCol.as("__graft_tie"), stateCol.as("__graft_st")),
      keyCol, col("__graft_ts"), col("__graft_tie"), gapUs)
    assigned
      .groupBy(col(keyCol), col("session_idx"))
      .agg(array_sort(collect_list(struct(col("__graft_ts"),
        col("__graft_tie"), col("__graft_st")))).as("__graft_seq"))
      .select(array_join(transform(col("__graft_seq"),
        s => s.getField("__graft_st")), sep).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), asc("path"))
      .limit(k)
  }

  /** RFM (recency / frequency / monetary) segmentation over an event
    * stream: per user, days since last activity (vs the corpus max —
    * exact integer µs floor-div), event count, and exact monetary
    * cents; each metric scored 1–5 by quintile THRESHOLDS (count of
    * exceeded exact-percentile bounds, the [[Profile.quantileBuckets]]
    * comparison form — NOT ntile, which needs a corpus-wide single-
    * partition sort and ties break by row order; threshold buckets
    * are a broadcast compare, deterministic, and oracle-mirrorable
    * via quantile_cont). 5 = best (most recent / most frequent /
    * highest spend). Output: one row per populated (r, f, m) cell
    * with user count and total cents — ≤125 rows at any corpus size.
    *
    * Scale: one hash aggregate events→users, ONE exact-percentile
    * aggregate over the user frame, both broadcast back; scoring is
    * a pure projection, the cell rollup one bounded aggregate.
    * Percentile state is bounded by each metric's DISTINCT-VALUE
    * domain: recency days and event counts are narrow, but raw cent
    * totals are near-unique per user — at billion-user scale pass a
    * pre-quantized `valueCol` (whole currency units, or fixed-width
    * bins) so the monetary domain stays bounded, the
    * [[Profile.madOutliers]] contract. ENFORCED like that operator's:
    * one counted aggregate over the user frame, and past `maxDomain`
    * distinct monetary totals the call fails loudly with the quantize
    * remedy instead of silently growing corpus-sized percentile state.
    */
  def rfmSegments(events: DataFrame, userCol: Column, tsCol: Column,
      valueCol: Column, maxDomain: Long = 2000000L): DataFrame = {
    require(maxDomain > 0, s"maxDomain must be positive: $maxDomain")
    val dayUs = 86400000000L
    val users = events
      .select(userCol.as("__u"), unix_micros(tsCol).as("__ts"),
        round(valueCol * 100).cast("long").as("__cents"))
      .where(col("__u").isNotNull && col("__ts").isNotNull)
      .groupBy("__u")
      // cents sum in decimal(38,0), cast back to long: ANSI mode makes
      // an out-of-range total a LOUD error on both engines (HUGEINT →
      // BIGINT on the oracle side), never a silent wrap
      .agg(max(col("__ts")).as("__last"), count(lit(1)).as("__f"),
        coalesce(sum(col("__cents").cast("decimal(38,0)")), lit(0L))
          .cast("long").as("__m"))
    val mDomain = users.agg(count_distinct(col("__m"))).head.getLong(0)
    require(mDomain <= maxDomain,
      s"rfmSegments: $mDomain distinct monetary totals (> maxDomain = " +
        s"$maxDomain) — the exact-percentile state would grow with user " +
        "count; pre-quantize valueCol (whole currency units or " +
        "fixed-width bins) or raise maxDomain deliberately")
    val probs = array(Seq(0.2, 0.4, 0.6, 0.8).map(lit): _*)
    val withR = users
      .crossJoin(broadcast(users.agg(max(col("__last")).as("__now"))))
      .withColumn("__r",
        expr(s"(__now - __last) div $dayUs"))
    val bounds = withR.agg(
      percentile(col("__r").cast("double"), probs).as("__br"),
      percentile(col("__f").cast("double"), probs).as("__bf"),
      percentile(col("__m").cast("double"), probs).as("__bm"))
    def score(v: Column, b: Column, invert: Boolean): Column = {
      val exceeded = (1 to 4).map(i =>
        when(v >= element_at(b, i), 1).otherwise(0)).reduce(_ + _)
      (if (invert) lit(5) - exceeded else lit(1) + exceeded)
        .cast("long")
    }
    withR.crossJoin(broadcast(bounds))
      .select(
        // recency inverted: fewer days since last touch scores higher
        score(col("__r").cast("double"), col("__br"), invert = true)
          .as("r_score"),
        score(col("__f").cast("double"), col("__bf"), invert = false)
          .as("f_score"),
        score(col("__m").cast("double"), col("__bm"), invert = false)
          .as("m_score"),
        col("__m"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"),
        sum(col("__m").cast("decimal(38,0)")).cast("long")
          .as("m_total_cents"))
  }
}
