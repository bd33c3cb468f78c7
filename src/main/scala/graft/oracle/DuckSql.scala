package graft.oracle

/** DuckDB SQL fragment builders — portable renderings of the engine's
  * hash / permutation / hyperplane / shingle arithmetic, shared across
  * the static and dynamic oracle maps. Each builder documents the
  * engine expression it mirrors; both sides compute over bit-identical
  * values (48-bit integer hashes, Double.toString round-trips).
  */
private[graft] object DuckSql {

  import Fixtures.IncrementalTwinOffset

  import graft.ext.{Dedup, Similarity}

  /** LSH kNN-graph CTE chain (normalize → bucket → within-bucket score
    * → per-query rank), shared by `x_sim_knn_graph` (the edge list) and
    * `x_sim_graph_degree` (the in-degree/hubness distribution over the
    * same edges). Ends after the `r` CTE — append the final SELECT (or
    * further CTEs after a comma).
    */
  private[graft] lazy val duckKnnGraphCore: String =
    s"""WITH v0 AS (
      |  SELECT vec_id AS id, embedding AS vec,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings),
      |v AS (SELECT id,
      |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS nvec
      |      FROM v0 WHERE nrm > 0),
      |planesd AS (SELECT ${duckPlanes(8, 64)} AS m),
      |bkt AS (
      |  SELECT id, nvec,
      |    CAST(list_sum(list_transform(range(0, 8), p ->
      |      CASE WHEN list_sum(list_transform(range(1, len(nvec) + 1),
      |          d -> nvec[d] * m[CAST(p + 1 AS INTEGER)][CAST(d AS INTEGER)]))
      |          > 0
      |        THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
      |        ELSE 0 END)) AS BIGINT) AS bucket
      |  FROM v, planesd),
      |s AS (
      |  SELECT a.id AS query_id, b.id AS neighbor_id,
      |    list_sum(list_transform(range(1, len(a.nvec) + 1),
      |      i -> a.nvec[i] * b.nvec[i])) AS sim
      |  FROM bkt a JOIN bkt b
      |    ON a.bucket = b.bucket AND a.id <> b.id),
      |r AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM s)""".stripMargin

  /** Exact-decontamination oracle, shared by `x_decontaminate` and
    * `x_decontaminate_bloom` — the bloom screen composes with the exact
    * verification join into a result IDENTICAL to the exact pass, and
    * sharing the SQL is how the harness proves it.
    */
  private[graft] lazy val decontaminateOracle: String =
    s"""WITH tok AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
      |      AS toks
      |  FROM documents),
      |tr AS (
      |  SELECT doc_id AS train_id, ${duckShingleHashes5("toks")} AS sh
      |  FROM tok),
      |evtok AS (
      |  SELECT doc_id + 2000000 AS eval_id,
      |    list_slice(toks, 1, CAST(floor(len(toks) * 0.8) AS INTEGER))
      |      AS toks
      |  FROM tok WHERE doc_id % 50 = 0),
      |ev AS (
      |  SELECT eval_id, ${duckShingleHashes5("toks")} AS sh FROM evtok)
      |SELECT train_id, eval_id, n_shared,
      |  CAST(n_shared AS DOUBLE) / n_eval AS eval_coverage
      |FROM (SELECT t.train_id, e.eval_id,
      |        len(list_intersect(t.sh, e.sh)) AS n_shared,
      |        len(e.sh) AS n_eval
      |      FROM tr t, ev e)
      |WHERE n_shared >= 2
      |ORDER BY train_id, eval_id""".stripMargin

  /** DuckDB rendering of [[Dedup.hash48]]: integer value of the first 12
    * hex chars of md5(e) — parsed digit-by-digit (DuckDB 1.0 has no
    * hex-to-int builtin). `hp` is reserved as the digit-index lambda var.
    */
  private[graft] def duckHash48(e: String): String =
    s"""CAST(list_sum(list_transform(range(1, 13),
       |  hp -> CAST(strpos('0123456789abcdef',
       |    substr(md5($e), CAST(hp AS INTEGER), 1)) - 1 AS BIGINT)
       |    * (CAST(1 AS BIGINT) << CAST(4 * (12 - hp) AS INTEGER))))
       |  AS BIGINT)""".stripMargin

  /** DuckDB rendering of the MinHash permutation (Dedup.permHash): the
    * same md5-derived coefficient constants, embedded as array literals.
    */
  private[graft] def duckPerm(h: String, i: String): String = {
    val as = Dedup.minhashA.take(32).mkString("[", ",", "]")
    val bs = Dedup.minhashB.take(32).mkString("[", ",", "]")
    s"""($as[CAST($i + 1 AS INTEGER)] * ($h % ${Dedup.P31})
       |  + $bs[CAST($i + 1 AS INTEGER)]) % ${Dedup.P31}""".stripMargin
  }

  /** DuckDB literal of Similarity.planeMatrix (nPlanes × dims): the
    * exact same plan-time constants, as a nested list literal — no
    * hashing in the oracle either. Double.toString round-trips, so both
    * engines parse to bit-identical doubles.
    */
  private[graft] def duckPlanes(nPlanes: Int, dims: Int, offset: Int = 0): String =
    (offset until offset + nPlanes).map(p =>
      Similarity.planeMatrix(p).take(dims).mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  /** DuckDB rendering of Dedup.shingleHashesFromTokens at k=5 over a
    * token-list expression.
    */
  private[graft] def duckShingleHashes5(toks: String): String =
    s"""list_transform(
       |    list_distinct(CASE WHEN len($toks) >= 5
       |      THEN list_transform(range(1, len($toks) - 3),
       |        i -> array_to_string(list_slice($toks, i, i + 4), ' '))
       |      ELSE [array_to_string($toks, ' ')] END),
       |    s -> ${duckHash48("s")})""".stripMargin

  /** Shared DuckDB CTE chain rendering the MinHash pipeline base
    * (documents + prefix twins → hashed shingles → MinHash signatures →
    * LSH band buckets) — the pair variants below build on it.
    * `twinOffset` is the id shift of the synthetic prefix twins.
    */
  private[graft] def duckMinhashBaseCtes(twinOffset: Long = 1000000L): String =
    s"""tok AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
      |      AS toks
      |  FROM documents),
      |bothd AS (
      |  SELECT doc_id AS id, toks FROM tok
      |  UNION ALL
      |  SELECT doc_id + $twinOffset AS id,
      |    list_slice(toks, 1, CAST(floor(len(toks) * 0.8) AS INTEGER))
      |      AS toks
      |  FROM tok),
      |$duckMinhashSigCtes""".stripMargin

  /** Shingle → signature → band CTE suffix over any `bothd(id, toks)`
    * frame (k = 5 shingles, 32 hashes, 16 bands of 2) — factored so
    * oracle variants only restate their corpus construction.
    */
  private[graft] def duckMinhashSigCtes: String =
    s"""shd AS (
      |  SELECT id, list_transform(
      |    list_distinct(CASE WHEN len(toks) >= 5
      |      THEN list_transform(range(1, len(toks) - 3),
      |        i -> array_to_string(list_slice(toks, i, i + 4), ' '))
      |      ELSE [array_to_string(toks, ' ')] END),
      |    s -> ${duckHash48("s")}) AS sh
      |  FROM bothd),
      |sigd AS (
      |  SELECT id, list_transform(range(0, 32),
      |    i -> list_min(list_transform(sh, h -> ${duckPerm("h", "i")})))
      |    AS sig
      |  FROM shd),
      |banded AS (
      |  SELECT id, bb.b AS band,
      |    array_to_string(list_slice(sig, bb.b * 2 + 1, bb.b * 2 + 2), '_')
      |      AS bucket
      |  FROM sigd, (SELECT unnest(range(0, 16)) AS b) bb)""".stripMargin

  /** Index-APPEND oracle corpus (x_dedup_index_append): the union
    * corpus a from-scratch rebuild would index — documents plus the
    * appended 80%-prefix delta twins (@`deltaOffset`) — probed by
    * 60%-prefix twins (@`probeOffset`); `j` holds the verified
    * probe-vs-corpus Jaccard pairs. append(build(base), delta) must
    * reproduce exactly this.
    */
  private[graft] def duckMinhashAppendCtes(deltaOffset: Long,
      probeOffset: Long): String =
    s"""tok AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
      |      AS toks
      |  FROM documents),
      |bothd AS (
      |  SELECT doc_id AS id, toks FROM tok
      |  UNION ALL
      |  SELECT doc_id + $deltaOffset AS id,
      |    list_slice(toks, 1, CAST(floor(len(toks) * 0.8) AS INTEGER))
      |      AS toks
      |  FROM tok
      |  UNION ALL
      |  SELECT doc_id + $probeOffset AS id,
      |    list_slice(toks, 1, CAST(floor(len(toks) * 0.6) AS INTEGER))
      |      AS toks
      |  FROM tok),
      |$duckMinhashSigCtes,
      |cand AS (
      |  SELECT DISTINCT b.id AS new_id, a.id AS corpus_id
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bucket = b.bucket
      |  WHERE a.id < $probeOffset AND b.id >= $probeOffset),
      |j AS (
      |  SELECT c.new_id, c.corpus_id,
      |    CASE WHEN len(list_distinct(list_concat(sn.sh, sc.sh))) > 0
      |      THEN CAST(len(list_intersect(sn.sh, sc.sh)) AS DOUBLE)
      |        / len(list_distinct(list_concat(sn.sh, sc.sh)))
      |      ELSE 0.0 END AS jaccard
      |  FROM cand c
      |  JOIN shd sn ON c.new_id = sn.id
      |  JOIN shd sc ON c.corpus_id = sc.id)""".stripMargin

  /** [[duckMinhashBaseCtes]] + all-pairs candidates and verified
    * Jaccard pairs in `j` — the x_dedup_minhash shape, reused by the
    * transitive-cluster closure.
    */
  private[graft] def duckMinhashPairCtes: String =
    s"""${duckMinhashBaseCtes()},
      |cand AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
      |j AS (
      |  SELECT c.id_a, c.id_b,
      |    CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
      |      THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      |        / len(list_distinct(list_concat(sa.sh, sb.sh)))
      |      ELSE 0.0 END AS jaccard
      |  FROM cand c
      |  JOIN shd sa ON c.id_a = sa.id
      |  JOIN shd sb ON c.id_b = sb.id)""".stripMargin

  /** [[duckMinhashBaseCtes]] + new-batch (twin ids >= the offset) vs
    * corpus (original ids) candidates only — the incremental-ingestion
    * shape of x_dedup_incremental. The offset sits above every doc_id
    * at every scale factor including ScaleData replicas, keeping the
    * set discriminator valid on scaled data.
    */
  private[graft] def duckMinhashIncrementalCtes: String =
    s"""${duckMinhashBaseCtes(IncrementalTwinOffset)},
      |cand AS (
      |  SELECT DISTINCT b.id AS new_id, a.id AS corpus_id
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bucket = b.bucket
      |  WHERE a.id < $IncrementalTwinOffset
      |    AND b.id >= $IncrementalTwinOffset),
      |j AS (
      |  SELECT c.new_id, c.corpus_id,
      |    CASE WHEN len(list_distinct(list_concat(sn.sh, sc.sh))) > 0
      |      THEN CAST(len(list_intersect(sn.sh, sc.sh)) AS DOUBLE)
      |        / len(list_distinct(list_concat(sn.sh, sc.sh)))
      |      ELSE 0.0 END AS jaccard
      |  FROM cand c
      |  JOIN shd sn ON c.new_id = sn.id
      |  JOIN shd sc ON c.corpus_id = sc.id)""".stripMargin

  /** "Version 2" of documents for the reconciliation queries — the SQL
    * twin of [[Fixtures.docsV2]] (removed % 17, revised % 13, bumped
    * % 11, re-added % 19 under shifted ids).
    */
  private[graft] lazy val duckDocsV2: String =
    """v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' (rev2)'
      |      ELSE text END AS text,
      |    lang, source,
      |    CASE WHEN doc_id % 11 = 0 THEN n_chars + 7
      |      ELSE n_chars END AS n_chars
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 5000000, 'new ' || text, lang, source, n_chars
      |  FROM documents WHERE doc_id % 19 = 0)""".stripMargin

  /** The four-column any-difference predicate shared by both
    * reconciliation oracles (the IS DISTINCT FROM formulation of the
    * engine's row-hash short-circuit).
    */
  private[graft] lazy val duckDocsChangedPred: String =
    """(o.text IS DISTINCT FROM n.text)
      |    OR (o.lang IS DISTINCT FROM n.lang)
      |    OR (o.source IS DISTINCT FROM n.source)
      |    OR (o.n_chars IS DISTINCT FROM n.n_chars)""".stripMargin
}
