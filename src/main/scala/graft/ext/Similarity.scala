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

  /** Unit-normalize each vector ONCE per row (`nvec` double array).
    * Array folds are interpreted (higher-order functions don't codegen),
    * so norms must never be recomputed inside a pair join: normalizing
    * up front makes every pairwise cosine a single O(d) dot fold —
    * at n·k candidate pairs that is the difference between O(n·k·d) and
    * O(n·k·d²)-ish work. Zero vectors are dropped (cosine undefined).
    */
  def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", norm(col("vec")))
      .filter(col("nrm") > 0)
      .select(col("id"),
        transform(col("vec"), x => x.cast("double") / col("nrm"))
          .as("nvec"))

  /** Dot of two pre-normalized double arrays = cosine. Native codegen'd
    * expression (graft.functions.DotProduct) — the HOF fold
    * `aggregate(zip_with(...))` is interpreted and this is the inner
    * loop of every pair-scoring stage. Identical left-to-right
    * summation order, so results are unchanged.
    */
  def dotN(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  /** Exact top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, rank), rank 1..k by cosine
    * descending, neighbor id ascending on ties. Self-matches excluded.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = normalized(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("nvec").as("qvec"))
    val c = normalized(corpus, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("nvec").as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dotN(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane components: portable hash of
    * (plane index, dimension index) mapped into [-0.5, 0.5), derived
    * from [[Dedup.hash48Value]] ONCE at plan-build time and embedded as
    * a constant-folded literal matrix — zero per-row hashing (the md5
    * variant cost ~0.5 ms/row interpreted at 64 dims × 8 planes).
    * Components are rationals with denominator 10^4, so any engine
    * evaluating the same literals gets bit-identical dot products.
    */
  val MaxPlanes = 16
  val MaxDims = 256
  val planeMatrix: IndexedSeq[IndexedSeq[Double]] =
    (0 until MaxPlanes).map { p =>
      (0 until MaxDims).map { i =>
        (Dedup.hash48Value(s"graft_plane_${p}_$i") % 10000L).toDouble /
          10000.0 - 0.5
      }
    }
  private val planeLit: IndexedSeq[Column] =
    planeMatrix.map(row => array(row.map(lit): _*))

  /** Sign-bit LSH bucket id from `nPlanes` hyperplanes (≤ 63). Vectors
    * longer than [[MaxDims]] are rejected at plan time.
    */
  def lshBucket(vec: Column, nPlanes: Int = 12): Column = {
    require(nPlanes <= MaxPlanes, s"nPlanes $nPlanes > $MaxPlanes")
    (0 until nPlanes).map { p =>
      val plane = planeLit(p)
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * element_at(plane, i + 1)),
        lit(0.0), (s, v) => s + v)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

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
    // cache: the normalize+bucket projection is interpreted (HOF) work
    // and both sides of the self-join scan it
    val b = normalized(df, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("nvec"), nPlanes))
      .cache()
    // disjoint names → guaranteed equi join on bucket (see Dedup note)
    val left = b.select(col("id").as("id_a"), col("nvec").as("nvec_a"),
      col("bucket"))
    val right = b.select(col("id").as("id_b"), col("nvec").as("nvec_b"),
      col("bucket").as("bucket_b"))
    left.join(right, col("bucket") === col("bucket_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        dotN(col("nvec_a"), col("nvec_b")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** IVF (inverted-file) ANN index: a coarse quantizer assigns each
    * vector to its nearest centroid; a query probes only the `nProbe`
    * nearest centroid lists instead of the full corpus.
    *
    * Centroids are taken deterministically (the `nLists` corpus vectors
    * with the smallest ids) — a production build would k-means them, but
    * the *plumbing* (assignment shuffle on list id, probe-restricted
    * search, broadcast centroids) is identical and that is what has to
    * scale: corpus shuffles once at build time; each query touches
    * `nProbe / nLists` of the data.
    */
  def ivfIndex(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", nLists: Int = 16): DataFrame = {
    // cache: scanned for the centroid pick AND the assignment pass
    val v = normalized(df, idCol, vecCol).cache()
    val cents = v.orderBy(col("id")).limit(nLists)
      .select(col("id").as("list_id"), col("nvec").as("cvec"))
    // assign: argmax centroid dot per vector (broadcast centroids)
    val scored = v.crossJoin(broadcast(cents))
      .select(col("id"), col("nvec"), col("list_id"),
        dotN(col("nvec"), col("cvec")).as("cd"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cd").desc, col("list_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("nvec"), col("list_id"))
  }

  /** Probe-restricted top-k search over an [[ivfIndex]]: each query is
    * routed to its `nProbe` closest centroid lists, then exact cosine
    * ranks candidates within those lists only.
    */
  def ivfTopK(queries: DataFrame, index: DataFrame, corpus: DataFrame,
      k: Int, nProbe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding", nLists: Int = 16): DataFrame = {
    val q = normalized(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("nvec").as("qvec"))
    val cents = normalized(corpus, idCol, vecCol)
      .orderBy(col("id")).limit(nLists)
      .select(col("id").as("list_id"), col("nvec").as("cvec"))
    // route each query to nProbe lists
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cd").desc, col("list_id").asc)
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qvec"), col("list_id"),
        dotN(col("qvec"), col("cvec")).as("cd"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qvec"), col("list_id"))
    // search only the probed lists (equi join on list id)
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    probes.join(index.select(col("id").as("neighbor_id"),
        col("nvec").as("cvec2"), col("list_id").as("list_id_i")),
        col("list_id") === col("list_id_i"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dotN(col("qvec"), col("cvec2")).as("sim"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Exact all-pairs cosine above a threshold on a *bounded* subset —
    * the correctness oracle for the LSH path. Cross join: only for
    * verification at small n.
    */
  def exactPairs(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", threshold: Double = 0.9): DataFrame = {
    val v = normalized(df, idCol, vecCol)
    val a = v.as("a")
    val b = v.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        dotN(col("a.nvec"), col("b.nvec")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
