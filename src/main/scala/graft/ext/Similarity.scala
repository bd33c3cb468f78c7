package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (SURVEY.md §7.6).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     The query side is broadcast (it is small by construction); the
  *     corpus streams, so cost is O(|corpus|·|queries|) with no shuffle
  *     of the corpus.
  *   - [[lshBuckets]] / [[lshCandidatePairs]]: random-hyperplane LSH —
  *     the 100 TB path. Sign-bit signatures bucket the corpus; only
  *     within-bucket pairs are compared. Hyperplanes are generated
  *     deterministically from hashes, so results are reproducible with
  *     no driver-side randomness.
  *
  * All dot products fold left-to-right over the array in doubles —
  * deterministic (same result every run, any partitioning).
  */
object Similarity {

  /** Double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Exact top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, rank), rank 1..k by cosine
    * descending, neighbor id ascending on ties. Self-matches excluded.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component: hash of
    * (plane index, dimension index) mapped into [-0.5, 0.5).
    */
  private def planeComponent(p: Column, i: Column): Column =
    (pmod(xxhash64(lit("graft_plane"), p, i), lit(10000L)).cast("double")
      / 10000.0) - 0.5

  /** Sign-bit LSH bucket id from `nPlanes` hyperplanes (≤ 63). */
  def lshBucket(vec: Column, nPlanes: Int = 12): Column =
    (0 until nPlanes).map { p =>
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(lit(p), i)),
        lit(0.0), (s, v) => s + v)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Corpus bucketed by LSH signature — the index build. */
  def lshBuckets(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", nPlanes: Int = 12): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))

  /** Within-bucket near-duplicate pairs above a cosine threshold.
    * Shuffles on the bucket id only; exact cosine runs per candidate.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", nPlanes: Int = 12,
      threshold: Double = 0.9): DataFrame = {
    val b = lshBuckets(df, idCol, vecCol, nPlanes)
    val a = b.as("a")
    val c = b.as("b")
    a.join(c, col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.vec"), col("b.vec")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Exact all-pairs cosine above a threshold on a *bounded* subset —
    * the correctness oracle for the LSH path. Cross join: only for
    * verification at small n.
    */
  def exactPairs(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", threshold: Double = 0.9): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val a = v.as("a")
    val b = v.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.vec"), col("b.vec")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
