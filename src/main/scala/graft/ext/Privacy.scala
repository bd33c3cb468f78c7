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
}
