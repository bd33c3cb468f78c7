package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk scans over quasi-identifier combinations — the release
  * gate a dataset passes before leaving a boundary (training-corpus
  * export, eval-set publication): k-anonymity (Sweeney, IJUFKS 2002)
  * and l-diversity (Machanavajjhala et al., ICDE 2006).
  *
  * A row is k-anonymous when at least k rows share its full
  * quasi-identifier combination; a group is l-diverse when its
  * sensitive attribute takes at least l distinct values (k-anonymity
  * without diversity still leaks the sensitive value when a whole
  * group shares it).
  *
  * Scale design: every scan is one or two hash aggregates over the
  * quasi columns — map-side combinable, output bounded by the
  * quasi-combination cardinality (the groups), never by row count; the
  * stats variant folds the group table a second time into ONE row. No
  * windows, no joins, no collects.
  */
object Privacy {

  /** Quasi-identifier groups smaller than `k` — the rows whose
    * combination re-identifies them. Output: quasi ++ (group_size).
    */
  def kAnonymityViolations(
      df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
  }

  /** One-row release report: group/violation cardinalities, rows at
    * risk, and the at-risk fraction (what suppression would delete).
    */
  def kAnonymityStats(
      df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        count(lit(1)).as("n_groups"),
        coalesce(sum((col("__n") < k).cast("long")), lit(0L))
          .as("n_violating"),
        coalesce(sum(when(col("__n") < k, col("__n")).otherwise(0L)),
          lit(0L)).as("n_rows_at_risk"),
        coalesce(sum(col("__n")), lit(0L)).as("n_rows"))
      .select(col("n_groups"), col("n_violating"), col("n_rows_at_risk"),
        (col("n_rows_at_risk").cast("double") / col("n_rows").cast("double"))
          .as("at_risk_rate"))
  }

  /** Quasi groups whose `sensitive` expression takes fewer than `l`
    * distinct values. Two hash aggregates: a (quasi, sensitive) dedup,
    * then a bounded count per group — the distributed-safe shape of
    * count_distinct that never holds a group's value set in one task.
    */
  def lDiversityViolations(
      df: DataFrame, quasi: Seq[String], sensitive: Column,
      l: Int): DataFrame = {
    require(l >= 2, s"l-diversity needs l >= 2, got $l")
    df.select(quasi.map(col) :+ sensitive.as("__s"): _*)
      .distinct()
      .groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") < l)
  }

  /** t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) for a
    * CATEGORICAL sensitive attribute under the equal-distance ground
    * metric, where EMD reduces to total variation distance:
    * t(g) = ½ · Σ_v |p_g(v) − p(v)|. Computed EXACTLY in integers:
    *
    *   t_num(g) = Σ_{v∈g} |n_gv·N − N_v·n_g| + (N − Σ_{v∈g} N_v)·n_g
    *
    * (the second term is the mass of values the group never takes —
    * dropping it would under-report skewed groups), with
    * t = t_num / (2·n_g·N) as the single IEEE division and the
    * `violates` verdict evaluated on cross-multiplied INTEGERS — no
    * float touches the decision. `tNumDen` is the threshold as an
    * exact rational (e.g. (15, 100) for t > 0.15).
    *
    * Overflow headroom: every product is ≤ N² — exact below N ≈ 3·10⁹
    * sensitive rows; above that, fold pre-aggregated counts instead
    * (the counts table, not the corpus, is what this scans).
    *
    * Scale design: two map-side-combinable hash aggs (group×value,
    * group) sharing one shuffle key family, the value distribution
    * and corpus total as BROADCAST dimensions; output bounded by
    * group cardinality. No window, no collect.
    */
  def tCloseness(
      df: DataFrame, quasi: Seq[String], sensitive: Column,
      tNumDen: (Long, Long)): DataFrame = {
    val (tn, td) = tNumDen
    require(tn >= 0 && td > 0, s"threshold must be >= 0, got $tn/$td")
    val base = df.select(quasi.map(col) :+ sensitive.as("__s"): _*)
      .where(col("__s").isNotNull)
    val gv = base.groupBy(quasi.map(col) :+ col("__s"): _*)
      .agg(count(lit(1)).as("__ngv"))
    val global = base.groupBy(col("__s")).agg(count(lit(1)).as("__nv"))
    val tot = global.agg(sum(col("__nv")).as("__ntot"))
    val g = gv.groupBy(quasi.map(col): _*)
      .agg(sum(col("__ngv")).as("__ng"))
    gv.join(broadcast(global), "__s")
      .join(g, quasi)
      .crossJoin(broadcast(tot))
      .groupBy(quasi.map(col): _*)
      .agg(first(col("__ng")).as("n_rows"),
        first(col("__ntot")).as("__nt"),
        sum(abs(col("__ngv") * col("__ntot") -
          col("__nv") * col("__ng"))).as("__bad_present"),
        sum(col("__nv")).as("__covered"))
      .select(quasi.map(col) :+ col("n_rows") :+ col("__nt") :+
        (col("__bad_present") +
          (col("__nt") - col("__covered")) * col("n_rows"))
          .as("t_num"): _*)
      .select(quasi.map(col) :+ col("n_rows") :+ col("t_num") :+
        (col("t_num").cast("double") /
          (lit(2.0) * col("n_rows").cast("double") *
            col("__nt").cast("double"))).as("t") :+
        (col("t_num") * td >
          lit(2L) * tn * col("n_rows") * col("__nt")).as("violates"): _*)
  }
}
