package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share k-gram
  * shingles with an evaluation set (SURVEY.md §7.6 extension surface —
  * the standard pre-training hygiene pass that keeps eval questions out
  * of the training corpus).
  *
  * Scale shape: the eval side is a benchmark suite — tiny next to a
  * 100 TB corpus — so its exploded shingle table is `broadcast()` and
  * the contamination scan is ONE map-side hash-join pass over the train
  * shingles, zero shuffle for the join itself. Only the surviving
  * (train_doc, eval_doc) collisions shuffle, into the pair aggregation,
  * and that input is already restricted to actual shingle matches. The
  * shingle hashing is the portable 48-bit md5 prefix ([[Dedup.hash48]]),
  * so the whole pass is oracle-checkable.
  */
object Decontaminate {

  /** Overlap report over pre-tokenized (id, toks) frames: training docs
    * sharing at least `minShared` distinct k-gram shingles with an eval
    * doc, with the share of the eval doc's shingles covered.
    *
    * Shingle arrays are distinct per doc (see [[Dedup.shinglesFromTokens]]),
    * so each exploded (id, hash) pair is unique and a plain `count` of
    * join hits equals the distinct-shared-shingle count — no
    * count_distinct shuffle-side expansion needed.
    */
  /** Train shingles exploded to (train_id, h). */
  private def trainShingles(train: DataFrame, k: Int): DataFrame =
    train.select(col("train_id"),
      explode(Dedup.shingleHashesFromTokens(col("toks"), k)).as("h"))

  /** Eval shingles exploded to (eval_id, n_eval, h). The scoped cache
    * is a materialization barrier: size() and explode() both consume
    * the shingle HOF; without it CollapseProject re-evaluates the
    * shingling per consumer (interpreted HOFs have no CSE).
    */
  private def evalShingles(evalSet: DataFrame, k: Int): DataFrame =
    CacheScope.withCached(
      evalSet.select(col("id").as("eval_id"),
        Dedup.shingleHashesFromTokens(col("toks"), k).as("sh"))) { base =>
      base.select(col("eval_id"), size(col("sh")).as("n_eval"),
        explode(col("sh")).as("h"))
    }

  /** Shared tail: count distinct shared shingles per (train, eval) pair
    * and keep pairs at/over `minShared`, with the eval-coverage share.
    */
  private def overlapReport(joined: DataFrame, minShared: Int): DataFrame =
    joined
      .groupBy("train_id", "eval_id", "n_eval")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("train_id"), col("eval_id"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_eval"))
          .as("eval_coverage"))

  def contaminationFromTokens(
      train: DataFrame, evalSet: DataFrame,
      k: Int = 5, minShared: Int = 2): DataFrame = {
    val trainSh = trainShingles(
      train.select(col("id").as("train_id"), col("toks")), k)
    val evalSh = evalShingles(evalSet, k)
    overlapReport(trainSh.join(broadcast(evalSh), "h"), minShared)
  }

  /** [[contaminationFromTokens]] with a bloom prefilter on the train
    * side — the shape for when the eval suite itself is too large to
    * broadcast as an exploded shingle table. The eval shingle hashes
    * aggregate into a CONSTANT-size bloom ([[graft.functions.Bloom]]:
    * numBits bits however many shingles eval has); train shingles are
    * screened map-side with `might_contain` BEFORE any join, so only
    * candidate collisions (true hits + the configured false-positive
    * rate) ever shuffle. The exact join then removes false positives:
    * the RESULT is identical to the exact pass — bloom screens have no
    * false negatives — which is what the shared oracle checks. The
    * verification join is deliberately un-hinted: the screened side is
    * candidate-only and AQE size-gates the strategy.
    */
  def contaminationBloom(
      train: DataFrame, evalSet: DataFrame,
      k: Int = 5, minShared: Int = 2,
      estimatedEvalShingles: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    val trainSh = trainShingles(
      train.select(col("id").as("train_id"), col("toks")), k)
    val evalSh = evalShingles(evalSet, k)
    val filter = evalSh
      .agg(graft.functions.Bloom.agg(col("h"), estimatedEvalShingles,
        numBits).as("bf"))
      .head.getAs[Array[Byte]](0)
    overlapReport(
      trainSh
        .filter(graft.functions.Bloom.mightContain(filter, col("h")))
        .join(evalSh, "h"),
      minShared)
  }

  /** SUBSTRING-level decontamination: training documents sharing a
    * verbatim token run ≥ `minRunLen` with an eval document — the
    * standard "long n-gram overlap" eval-leakage check (the GPT-3
    * appendix shape), generalized to MAXIMAL runs with positions.
    * Complements the other two passes: the shingle pass counts shared
    * k-grams anywhere (scattered paraphrase-with-quotes leakage), the
    * semantic pass catches reformulations, this one proves CONTIGUOUS
    * verbatim copying and reports how long it is.
    *
    * Scale shape: the eval side is a benchmark suite — its (id, pos, h)
    * gram frame is `broadcast()`, and the train corpus STREAMS through
    * one map-side hash join on the 8-byte gram hash with ZERO train
    * shuffle (plan-asserted, like the shingle pass); only actual gram
    * collisions shuffle, into the bounded per-(pair, diagonal) chain
    * aggregation ([[Dedup.chainRuns]]). Exact by construction — every
    * matching diagonal position is recovered in the same join.
    *
    * Output: (train_id, eval_id, n_runs, max_run, overlap_tokens), one
    * row per contaminated pair.
    */
  def substringContamination(train: DataFrame, evalSet: DataFrame,
      minRunLen: Int = 30, k: Int = 8): DataFrame = {
    val gt = Dedup.substringGrams(
        train.select(col("id"), col("toks")), "id", col("toks"), k)
      .select(col("id").as("train_id"), col("pos").as("pos_t"), col("h"))
    val ge = Dedup.substringGrams(
        evalSet.select(col("id"), col("toks")), "id", col("toks"), k)
      .select(col("id").as("eval_id"), col("pos").as("pos_e"),
        col("h").as("h_e"))
    val matched = gt.join(broadcast(ge), col("h") === col("h_e"))
      .select(col("train_id"), col("eval_id"),
        (col("pos_t") - col("pos_e")).as("diag"), col("pos_t"))
    Dedup.chainRuns(matched, "train_id", "eval_id", "pos_t", "pos_e",
        minRunLen, k)
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_runs"),
        max(col("run_len")).as("max_run"),
        sum(col("run_len")).as("overlap_tokens"))
  }

  /** Embedding-space (semantic) decontamination: training vectors whose
    * cosine against ANY eval vector reaches `threshold`, each with its
    * best-matching eval id — catches paraphrased/reformatted benchmark
    * leakage that k-gram shingle overlap misses.
    *
    * Same scale shape as the shingle pass: the eval side is broadcast
    * (a benchmark suite is tiny next to the corpus), the train side
    * STREAMS through the nested-loop join — zero corpus shuffle — and
    * the per-train argmax is the bounded-top-k hash aggregate (k=1,
    * map-side partials), not a window sort. Sub-threshold pairs are
    * filtered before the aggregate, so the shuffle carries only actual
    * contamination candidates. Cosines are left-to-right double folds
    * over pre-normalized vectors ([[Similarity.normalized]] /
    * [[Similarity.dotN]]) — deterministic and oracle-portable. Ties on
    * the max go to the smaller eval id.
    */
  def semanticContamination(train: DataFrame, evalSet: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.8): DataFrame = {
    val tr = Similarity.normalized(train, idCol, vecCol)
      .select(col("id").as("train_id"), col("nvec").as("tvec"))
    val ev = Similarity.normalized(evalSet, idCol, vecCol)
      .select(col("id").as("eval_id"), col("nvec").as("evec"))
    tr.crossJoin(broadcast(ev))
      .select(col("train_id"), col("eval_id"),
        Similarity.dotN(col("tvec"), col("evec")).as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy(col("train_id"))
      .agg(graft.functions.BoundedTopK.topk(
        col("sim"), col("eval_id"), 1).as("best"))
      .select(col("train_id"),
        element_at(col("best"), 1).getField("id").as("eval_id"),
        element_at(col("best"), 1).getField("score").as("sim"))
  }

  /** Text-column convenience: tokenize both corpora, then
    * [[contaminationFromTokens]].
    */
  def contamination(
      train: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String,
      k: Int = 5, minShared: Int = 2): DataFrame = {
    def shape(df: DataFrame): DataFrame =
      df.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
    contaminationFromTokens(shape(train), shape(evalSet), k, minShared)
  }
}
