package graft.oracle

import graft.ext.{Sampling, Similarity, TextAnalysis}
import graft.parse.Parsers

import DuckSql._
import Fixtures.{LangmixPlanted, SplitWeights, Bm25Terms}

/** The static oracle map — DuckDB SQL for every harness query whose
  * oracle does not depend on fitted models (those live in
  * [[DynamicOracles]]). Extracted verbatim from SparkEntry (round-5
  * split); entry semantics unchanged.
  */
private[graft] object StaticOracles {

  /** DuckDB twins of `queries` — identical column names and ordering. */
  val sql: Map[String, String] = Map(
    "x_dedup_minhash" ->
      s"""WITH $duckMinhashPairCtes
        |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "x_decontaminate" -> decontaminateOracle,
    // same SQL on purpose: the bloom variant must be lossless
    "x_decontaminate_bloom" -> decontaminateOracle,
    "x_dedup_apply" ->
      s"""WITH RECURSIVE $duckMinhashPairCtes,
        |p AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.5),
        |nodes AS (SELECT id_a AS id FROM p UNION SELECT id_b FROM p),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.dst AS id, reach.r FROM reach JOIN e ON e.src = reach.id),
        |clusters AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT b.id FROM bothd b
        |WHERE b.id NOT IN
        |  (SELECT id FROM clusters WHERE id <> cluster_id)
        |ORDER BY b.id""".stripMargin,
    "x_text_langmix" -> {
      // same stopword lists, weights (|w|+2 for the pads), summation
      // order, and tie-break CASE as TextAnalysis.langId, rendered per
      // half
      def scores(sfx: String): String = Seq(
        "en" -> TextAnalysis.StopwordsEn,
        "es" -> TextAnalysis.StopwordsEs,
        "fr" -> TextAnalysis.StopwordsFr,
        "de" -> TextAnalysis.StopwordsDe)
        .map { case (l, ws) =>
          ws.map(w => s"(length(p$sfx)-length(replace(p$sfx," +
            s"' $w ','')))/${w.length + 2}")
            .mkString("    ", "\n      + ", s" AS s_${l}_$sfx")
        }.mkString(",\n")
      def langCase(sfx: String): String =
        s"""CASE WHEN regexp_matches(p$sfx, '[\\x{4E00}-\\x{9FFF}]')
           |         THEN 'zh'
           |       WHEN regexp_matches(p$sfx, '[\\x{0400}-\\x{04FF}]')
           |         THEN 'ru'
           |       WHEN s_en_$sfx >= s_es_$sfx AND s_en_$sfx >= s_fr_$sfx
           |         AND s_en_$sfx >= s_de_$sfx THEN 'en'
           |       WHEN s_es_$sfx >= s_fr_$sfx AND s_es_$sfx >= s_de_$sfx
           |         THEN 'es'
           |       WHEN s_fr_$sfx >= s_de_$sfx THEN 'fr'
           |       ELSE 'de' END""".stripMargin
      s"""WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT 5000000 AS doc_id, '$LangmixPlanted' AS text),
        |tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
        |      AS toks
        |  FROM base),
        |hv AS (
        |  SELECT doc_id,
        |    ' ' || array_to_string(list_slice(toks, 1,
        |      CAST(len(toks) // 2 AS INTEGER)), ' ') || ' ' AS pa,
        |    ' ' || array_to_string(list_slice(toks,
        |      CAST(len(toks) // 2 + 1 AS INTEGER), len(toks)), ' ')
        |      || ' ' AS pb
        |  FROM tok),
        |sc AS (
        |  SELECT doc_id, pa, pb,
        |${scores("a")},
        |${scores("b")}
        |  FROM hv),
        |langs AS (
        |  SELECT doc_id,
        |    ${langCase("a")} AS lang_a,
        |    ${langCase("b")} AS lang_b
        |  FROM sc)
        |SELECT doc_id, lang_a, lang_b, lang_a = lang_b AS consistent
        |FROM langs ORDER BY doc_id""".stripMargin
    },
    "x_profile_join_size" ->
      """WITH l AS (SELECT l_orderkey AS k, count(*) AS ln
        |           FROM lineitem GROUP BY 1),
        |r AS (SELECT o_orderkey AS k, count(*) AS rn
        |      FROM orders GROUP BY 1),
        |j AS (SELECT l.k, ln * rn AS p FROM l JOIN r ON l.k = r.k),
        |hot AS (SELECT k, p FROM j ORDER BY p DESC, k LIMIT 1)
        |SELECT (SELECT CAST(sum(p) AS BIGINT) FROM j) AS predicted_rows,
        |  (SELECT k FROM hot) AS hottest_key,
        |  (SELECT CAST(p AS BIGINT) FROM hot) AS hottest_rows,
        |  (SELECT count(*) FROM lineitem
        |   JOIN orders ON l_orderkey = o_orderkey) AS actual_rows""".stripMargin,
    "x_profile_window_quantiles" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  count(*) AS n,
        |  quantile_cont(CAST(value AS DOUBLE), 0.5) AS p50,
        |  quantile_cont(CAST(value AS DOUBLE), 0.95) AS p95
        |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin,
    "x_text_vocab_by_source" ->
      """WITH tok AS (
        |  SELECT source,
        |    unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, count(*) AS cnt FROM tok
        |      GROUP BY source, tok)
        |SELECT source, tok, cnt, rank FROM (
        |  SELECT source, tok, cnt,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY cnt DESC, tok) AS rank
        |  FROM c)
        |WHERE rank <= 3 ORDER BY source, rank""".stripMargin,
    "x_stream_distinct" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin,
    "x_feature_rolling" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_trail,
        |  CAST(sum(cents) OVER w AS BIGINT) AS sum_trail
        |FROM (SELECT event_id, user_id,
        |        CAST(floor(value * 100) AS BIGINT) AS cents,
        |        epoch_us(ts) AS tus
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "x_text_entropy" -> {
      val spamText = ("ha " * 40).trim
      s"""WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT 4000000 AS doc_id, '$spamText' AS text),
        |bg AS (SELECT doc_id,
        |    unnest(list_transform(range(1, length(text)),
        |      i -> substr(text, CAST(i AS INTEGER), 2))) AS b
        |  FROM base WHERE length(text) >= 2),
        |c AS (SELECT doc_id, b, count(*) AS cnt FROM bg
        |      GROUP BY doc_id, b),
        |l AS (SELECT doc_id, list(cnt ORDER BY b) AS cnts,
        |        CAST(sum(cnt) AS DOUBLE) AS n
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id,
        |  ln(n) - list_sum(list_transform(cnts, c -> c * ln(c))) / n
        |    AS entropy
        |FROM l ORDER BY doc_id""".stripMargin
    },
    "x_text_normalize" ->
      s"""WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, upper(text) || ' !!' AS text
        |  FROM documents WHERE doc_id < 50),
        |n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
        |  FROM base)
        |SELECT ${duckHash48("norm")} AS norm_hash,
        |  count(*) AS n_members, min(doc_id) AS min_id,
        |  max(doc_id) AS max_id
        |FROM n GROUP BY 1 HAVING count(*) > 1
        |ORDER BY norm_hash""".stripMargin,
    "x_sim_rproj" -> {
      val scale = 1.0 / math.sqrt(8.0)
      val rows = (0 until 8).map { j =>
        s"($j, " + Similarity.projectionSigns(64, j, scale)
          .map(_.toString).mkString("[", ",", "]") + ")"
      }.mkString(",\n        ")
      s"""WITH s AS (SELECT CAST(j AS INTEGER) AS dim,
        |    list_transform(sv, x -> CAST(x AS DOUBLE)) AS sv
        |  FROM (VALUES
        |        $rows) AS t(j, sv)),
        |v AS (SELECT vec_id AS id,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |      FROM embeddings WHERE len(embedding) = 64)
        |SELECT id, dim,
        |  list_sum(list_transform(range(1, 65), i -> vec[i] * sv[i]))
        |    AS proj
        |FROM v, s ORDER BY id, dim""".stripMargin
    },
    "x_layout_zorder" ->
      """WITH m AS (
        |  SELECT l_partkey % 256 AS pk, l_suppkey % 256 AS sk
        |  FROM lineitem),
        |z AS (
        |  SELECT pk, sk,
        |    CAST(list_sum(list_transform(range(0, 8), b ->
        |      (((pk >> b) & 1) << (2 * b)) +
        |      (((sk >> b) & 1) << (2 * b + 1)))) AS BIGINT) AS zval
        |  FROM m)
        |SELECT zval >> 10 AS zbucket, count(*) AS n,
        |  min(pk) AS min_part, max(pk) AS max_part,
        |  min(sk) AS min_supp, max(sk) AS max_supp
        |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin,
    "x_sample_shuffle" ->
      s"""SELECT doc_id,
        |  row_number() OVER (ORDER BY h, doc_id) - 1 AS idx
        |FROM (SELECT doc_id,
        |  ${duckHash48("('shuf1' || CAST(doc_id AS VARCHAR))")} AS h
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "x_sample_curriculum" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS idx
        |  FROM documents)
        |SELECT doc_id, idx,
        |  CAST(floor(idx * 4 / (SELECT count(*) FROM r)) AS INTEGER)
        |    AS shard
        |FROM r ORDER BY doc_id""".stripMargin,
    "x_decontaminate_semantic" ->
      """WITH v0 AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |v AS (SELECT id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS nvec
        |      FROM v0 WHERE nrm > 0),
        |tr AS (SELECT id AS train_id, nvec AS tvec FROM v WHERE id >= 50),
        |ev AS (SELECT id AS eval_id, nvec AS evec FROM v WHERE id < 50),
        |s AS (SELECT train_id, eval_id,
        |        list_sum(list_transform(range(1, len(tvec) + 1),
        |          i -> tvec[i] * evec[i])) AS sim
        |      FROM tr, ev),
        |f AS (SELECT train_id, eval_id, sim,
        |        row_number() OVER (PARTITION BY train_id
        |          ORDER BY sim DESC, eval_id) AS rn
        |      FROM s WHERE sim >= 0.4)
        |SELECT train_id, eval_id, sim FROM f WHERE rn = 1
        |ORDER BY train_id""".stripMargin,
    "x_sample_split" -> {
      val Seq(cTrain, cValid) = Sampling.cumThresholds(SplitWeights)
      s"""SELECT doc_id,
        |  CASE WHEN u < $cTrain THEN 'train'
        |       WHEN u < $cValid THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  ${duckHash48("('split1' || CAST(doc_id AS VARCHAR))")}
        |    / 281474976710656.0 AS u
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin
    },
    "x_text_pii" ->
      s"""SELECT doc_id,
        |  len(regexp_extract_all(raw, '${TextAnalysis.EmailRe}'))
        |    AS n_email,
        |  len(regexp_extract_all(raw, '${TextAnalysis.PhoneRe}'))
        |    AS n_phone,
        |  len(regexp_extract_all(raw, '${TextAnalysis.Ipv4Re}'))
        |    AS n_ipv4
        |FROM (SELECT doc_id, CASE
        |    WHEN doc_id % 5 = 0
        |      THEN text || ' reach me at alice.smith@example.com'
        |    WHEN doc_id % 5 = 1 THEN text || ' or call 555-867-5309 today'
        |    WHEN doc_id % 5 = 2
        |      THEN text || ' server at 192.168.10.42 responded'
        |    ELSE text END AS raw FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "x_text_corpus_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> ''))) AS BIGINT) AS total_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "x_stream_dedup" ->
      """SELECT event_type, count(*) AS n_unique
        |FROM (SELECT DISTINCT event_id, user_id, event_type, ts
        |      FROM (SELECT event_id, user_id, event_type, ts FROM events
        |            UNION ALL
        |            SELECT event_id, user_id, event_type, ts FROM events))
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // quantile_cont demands CONSTANT probabilities in DuckDB, so the
    // long form is one generated block per (column, probability)
    // per-source frequency CDF + pooled quantile_cont grid + the same
    // integral grid-index expression — both engines pick the identical
    // grid point for every (source, value)
    "x_profile_quantile_norm" -> {
      val probs = (1 until 20).map(i => (i.toDouble / 20).toString)
        .mkString("[", ", ", "]")
      s"""WITH freq AS (
        |  SELECT CAST(source AS VARCHAR) AS g,
        |    CAST(n_chars AS BIGINT) AS v, count(*) AS c
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, v, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM freq),
        |grid AS (
        |  SELECT quantile_cont(CAST(n_chars AS DOUBLE), $probs) AS gr
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL)
        |SELECT g AS group_id, v, CAST(c AS BIGINT) AS n,
        |  round(CAST(2 * cum - c AS DOUBLE) / (2 * n), 12) AS q,
        |  round(gr[CAST(least(greatest(
        |    (2 * cum - c) * 20 // (2 * n), 1), 19) AS INTEGER)], 12)
        |    AS v_norm
        |FROM cum, grid
        |ORDER BY group_id, v""".stripMargin
    },
    "x_profile_quantiles" -> {
      val blocks = for {
        c <- Seq("l_quantity", "l_discount", "l_linenumber")
        (p, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex
      } yield
        s"  SELECT '$c' AS column_name, CAST($i AS INTEGER) AS prob_idx," +
          s"\n    quantile_cont(CAST($c AS DOUBLE), $p) AS quantile" +
          s"\n  FROM lineitem"
      blocks.mkString("SELECT * FROM (\n", "\n  UNION ALL\n",
        ")\nORDER BY column_name, prob_idx")
    },
    "x_sample_mix" ->
      s"""SELECT source, count(*) AS n_kept
        |FROM (SELECT source,
        |  ${duckHash48("('mix1' || CAST(doc_id AS VARCHAR))")}
        |    / 281474976710656.0 AS u
        |  FROM documents)
        |WHERE u < CASE source WHEN 'src0' THEN 0.9 WHEN 'src1' THEN 0.5
        |  WHEN 'src2' THEN 0.25 ELSE 0.1 END
        |GROUP BY source ORDER BY source""".stripMargin,
    "x_dedup_clusters" ->
      s"""WITH RECURSIVE $duckMinhashPairCtes,
        |p AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.5),
        |nodes AS (SELECT id_a AS id FROM p UNION SELECT id_b FROM p),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.dst AS id, reach.r FROM reach JOIN e ON e.src = reach.id)
        |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
        |ORDER BY id""".stripMargin,
    "x_dedup_simhash" ->
      s"""WITH tokh AS (
        |  SELECT doc_id, list_transform(
        |    list_distinct(list_filter(regexp_split_to_array(text, '\\s+'),
        |      x -> x <> '')),
        |    t -> ${duckHash48("t")}) AS hs
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(coalesce(list_sum(list_transform(range(0, 48), b ->
        |    CASE WHEN 2 * coalesce(list_sum(list_transform(hs,
        |             x -> (x >> b) & 1)), 0) > len(hs)
        |         THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
        |         ELSE 0 END)), 0) AS BIGINT) AS simhash
        |FROM tokh ORDER BY doc_id""".stripMargin,
    "x_sim_lsh_pairs" ->
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
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    list_sum(list_transform(range(1, len(a.nvec) + 1),
        |      i -> a.nvec[i] * b.nvec[i])) AS sim
        |  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.id < b.id)
        |SELECT id_a, id_b FROM s WHERE sim >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "x_sim_ivf_topk" ->
      """WITH v0 AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |v AS (SELECT id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS nvec
        |      FROM v0 WHERE nrm > 0),
        |cents AS (SELECT id AS list_id, nvec AS cvec FROM v
        |          ORDER BY id LIMIT 16),
        |assigned AS (
        |  SELECT id, nvec, list_id FROM (
        |    SELECT vv.id, vv.nvec, c.list_id,
        |      row_number() OVER (PARTITION BY vv.id ORDER BY
        |        list_sum(list_transform(range(1, len(vv.nvec) + 1),
        |          i -> vv.nvec[i] * c.cvec[i])) DESC, c.list_id) AS rn
        |    FROM v vv, cents c) WHERE rn = 1),
        |q AS (SELECT id AS query_id, nvec AS qvec FROM v WHERE id < 5),
        |probes AS (
        |  SELECT query_id, qvec, list_id FROM (
        |    SELECT qq.query_id, qq.qvec, c.list_id,
        |      row_number() OVER (PARTITION BY qq.query_id ORDER BY
        |        list_sum(list_transform(range(1, len(qq.qvec) + 1),
        |          i -> qq.qvec[i] * c.cvec[i])) DESC, c.list_id) AS rn
        |    FROM q qq, cents c) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.id AS neighbor_id,
        |    list_sum(list_transform(range(1, len(p.qvec) + 1),
        |      i -> p.qvec[i] * a.nvec[i])) AS sim
        |  FROM probes p JOIN assigned a ON p.list_id = a.list_id
        |  WHERE p.query_id <> a.id),
        |r AS (SELECT query_id, neighbor_id,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY sim DESC, neighbor_id) AS rank
        |      FROM scored)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM r
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // versioned-IVF time travel: version 1 indexed only the even ids,
    // so its serve recomputes with the corpus ASSIGNED from evens only;
    // centroids — the model, written once — stay the full-corpus
    // first-16 literals, exactly what version 1 persisted
    "x_sim_ivf_time_travel" ->
      """WITH v0 AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |v AS (SELECT id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS nvec
        |      FROM v0 WHERE nrm > 0),
        |cents AS (SELECT id AS list_id, nvec AS cvec FROM v
        |          ORDER BY id LIMIT 16),
        |assigned AS (
        |  SELECT id, nvec, list_id FROM (
        |    SELECT vv.id, vv.nvec, c.list_id,
        |      row_number() OVER (PARTITION BY vv.id ORDER BY
        |        list_sum(list_transform(range(1, len(vv.nvec) + 1),
        |          i -> vv.nvec[i] * c.cvec[i])) DESC, c.list_id) AS rn
        |    FROM v vv, cents c) WHERE rn = 1 AND id % 2 = 0),
        |q AS (SELECT id AS query_id, nvec AS qvec FROM v WHERE id < 5),
        |probes AS (
        |  SELECT query_id, qvec, list_id FROM (
        |    SELECT qq.query_id, qq.qvec, c.list_id,
        |      row_number() OVER (PARTITION BY qq.query_id ORDER BY
        |        list_sum(list_transform(range(1, len(qq.qvec) + 1),
        |          i -> qq.qvec[i] * c.cvec[i])) DESC, c.list_id) AS rn
        |    FROM q qq, cents c) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.id AS neighbor_id,
        |    list_sum(list_transform(range(1, len(p.qvec) + 1),
        |      i -> p.qvec[i] * a.nvec[i])) AS sim
        |  FROM probes p JOIN assigned a ON p.list_id = a.list_id
        |  WHERE p.query_id <> a.id),
        |r AS (SELECT query_id, neighbor_id,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY sim DESC, neighbor_id) AS rank
        |      FROM scored)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM r
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // IVF tombstone deletion: the probe-restricted top-10 recomputed
    // with the deleted ids excluded from the ASSIGNED corpus before
    // ranking (next-best neighbors promote in); centroids — the
    // routing model — keep every original vector
    "x_sim_ivf_delete" ->
      """WITH v0 AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |v AS (SELECT id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS nvec
        |      FROM v0 WHERE nrm > 0),
        |cents AS (SELECT id AS list_id, nvec AS cvec FROM v
        |          ORDER BY id LIMIT 16),
        |assigned AS (
        |  SELECT id, nvec, list_id FROM (
        |    SELECT vv.id, vv.nvec, c.list_id,
        |      row_number() OVER (PARTITION BY vv.id ORDER BY
        |        list_sum(list_transform(range(1, len(vv.nvec) + 1),
        |          i -> vv.nvec[i] * c.cvec[i])) DESC, c.list_id) AS rn
        |    FROM v vv, cents c) WHERE rn = 1 AND id % 7 <> 3),
        |q AS (SELECT id AS query_id, nvec AS qvec FROM v WHERE id < 5),
        |probes AS (
        |  SELECT query_id, qvec, list_id FROM (
        |    SELECT qq.query_id, qq.qvec, c.list_id,
        |      row_number() OVER (PARTITION BY qq.query_id ORDER BY
        |        list_sum(list_transform(range(1, len(qq.qvec) + 1),
        |          i -> qq.qvec[i] * c.cvec[i])) DESC, c.list_id) AS rn
        |    FROM q qq, cents c) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.id AS neighbor_id,
        |    list_sum(list_transform(range(1, len(p.qvec) + 1),
        |      i -> p.qvec[i] * a.nvec[i])) AS sim
        |  FROM probes p JOIN assigned a ON p.list_id = a.list_id
        |  WHERE p.query_id <> a.id),
        |r AS (SELECT query_id, neighbor_id,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY sim DESC, neighbor_id) AS rank
        |      FROM scored)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM r
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "p10_yearmonth" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_full_match(raw, '[0-9]{4}-(0[1-9]|1[0-2])')
        |       THEN CAST(strptime(raw || '-01', '%Y-%m-%d') AS DATE)
        |  END AS parsed
        |FROM (SELECT CASE WHEN l_linenumber % 4 = 0 THEN '2026-13'
        |        WHEN l_linenumber % 4 = 1 THEN '202605'
        |        ELSE strftime(l_shipdate, '%Y-%m') END AS raw
        |      FROM lineitem)
        |ORDER BY raw""".stripMargin,
    "p11_object" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_matches(raw, '^\s*\{') AND json_valid(raw)
        |       THEN raw END AS parsed
        |FROM (SELECT CASE WHEN event_id % 5 = 0 THEN substr(props, 1, 8)
        |        WHEN event_id % 5 = 1 THEN '[1,2,3]'
        |        ELSE props END AS raw FROM events)
        |ORDER BY raw""".stripMargin,
    "p12_array" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_matches(raw, '^\s*\[') AND json_valid(raw)
        |       THEN raw END AS parsed
        |FROM (SELECT CASE WHEN event_id % 4 = 0 THEN props
        |        WHEN event_id % 4 = 1
        |          THEN '[' || CAST(event_id % 100 AS VARCHAR) || ','
        |        ELSE '[' || CAST(event_id % 100 AS VARCHAR) || ','
        |          || CAST(event_id % 100 + 1 AS VARCHAR) || ']'
        |        END AS raw FROM events)
        |ORDER BY raw""".stripMargin,
    "p13_duration" ->
      s"""SELECT DISTINCT raw,
        |  CASE WHEN regexp_full_match(raw, '${Parsers.DurationRe}')
        |       THEN raw END AS parsed
        |FROM (SELECT CASE
        |        WHEN l_linenumber % 5 = 0 THEN 'P'
        |        WHEN l_linenumber % 5 = 1 THEN '1D'
        |        WHEN l_linenumber % 5 = 2 THEN 'PT'
        |        WHEN l_linenumber % 5 = 3
        |          THEN 'PT' || CAST(l_suppkey % 24 AS VARCHAR) || 'H'
        |        ELSE 'P' || CAST(l_linenumber AS VARCHAR) || 'DT'
        |          || CAST(l_suppkey % 24 AS VARCHAR) || 'H'
        |        END AS raw FROM lineitem)
        |ORDER BY raw""".stripMargin,
    "p14_geojson" ->
      s"""SELECT DISTINCT raw,
        |  CASE WHEN regexp_matches(raw, '^\\s*\\{')
        |    AND json_extract_string(TRY_CAST(raw AS JSON), '$$.type') IN
        |      (${Parsers.GeoJsonTypes.map(t => s"'$t'").mkString(", ")})
        |    THEN raw
        |  END AS parsed
        |FROM (SELECT CASE
        |    WHEN p_partkey % 7 = 0 THEN '{"coordinates": [1, 2]}'
        |    WHEN p_partkey % 7 = 1 THEN '{"type": "Circle"}'
        |    WHEN p_partkey % 7 = 2 THEN 'not json'
        |    ELSE '{"type": "Point", "coordinates": ['
        |      || CAST(p_partkey % 361 - 180 AS VARCHAR) || ', '
        |      || CAST(p_size % 181 - 90 AS VARCHAR) || ']}'
        |    END AS raw FROM part)
        |ORDER BY raw""".stripMargin,
    // format="any": the oracle mirrors the parser's regex gates
    // FORM-FOR-FORM — first matching gate claims the value, unclaimed
    // shapes (MM-dd-yyyy) stay NULL on both engines
    "p15_date_any" ->
      """SELECT DISTINCT raw,
        |  CAST(CASE
        |    WHEN regexp_full_match(raw, '\d{4}-\d{2}-\d{2}')
        |      THEN try_strptime(raw, '%Y-%m-%d')
        |    WHEN regexp_full_match(raw, '\d{4}/\d{2}/\d{2}')
        |      THEN try_strptime(raw, '%Y/%m/%d')
        |    WHEN regexp_full_match(raw, '\d{8}')
        |      THEN try_strptime(raw, '%Y%m%d')
        |    WHEN regexp_full_match(raw, '\d{2}\.\d{2}\.\d{4}')
        |      THEN try_strptime(raw, '%d.%m.%Y')
        |    END AS DATE) AS parsed
        |FROM (SELECT CASE l_linenumber % 6
        |    WHEN 0 THEN '2026-13-01'
        |    WHEN 1 THEN strftime(l_shipdate, '%Y/%m/%d')
        |    WHEN 2 THEN strftime(l_shipdate, '%Y%m%d')
        |    WHEN 3 THEN strftime(l_shipdate, '%d.%m.%Y')
        |    WHEN 4 THEN strftime(l_shipdate, '%m-%d-%Y')
        |    ELSE strftime(l_shipdate, '%Y-%m-%d') END AS raw
        |  FROM lineitem)
        |ORDER BY raw""".stripMargin,
    // offsets normalize through %z then cast to UTC wall time — the
    // same result Spark's XXX produces under the UTC session zone;
    // DuckDB's %z does not accept literal 'Z', hence the replace
    "p16_datetime_any" ->
      """SELECT DISTINCT raw,
        |  CAST(CASE
        |    WHEN regexp_full_match(raw,
        |        '\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}')
        |      THEN try_strptime(raw, '%Y-%m-%dT%H:%M:%S')
        |    WHEN regexp_full_match(raw,
        |        '\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}')
        |      THEN try_strptime(raw, '%Y-%m-%dT%H:%M:%S.%f')
        |    WHEN regexp_full_match(raw,
        |        '\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(Z|[+-]\d{2}:\d{2})')
        |      THEN CAST(try_strptime(replace(raw, 'Z', '+00:00'),
        |        '%Y-%m-%dT%H:%M:%S%z') AS TIMESTAMP)
        |    WHEN regexp_full_match(raw,
        |        '\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}(Z|[+-]\d{2}:\d{2})')
        |      THEN CAST(try_strptime(replace(raw, 'Z', '+00:00'),
        |        '%Y-%m-%dT%H:%M:%S.%f%z') AS TIMESTAMP)
        |    WHEN regexp_full_match(raw, '\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}')
        |      THEN try_strptime(raw, '%Y-%m-%d %H:%M:%S')
        |    WHEN regexp_full_match(raw,
        |        '\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{6}')
        |      THEN try_strptime(raw, '%Y-%m-%d %H:%M:%S.%f')
        |    WHEN regexp_full_match(raw, '\d{4}-\d{2}-\d{2}')
        |      THEN try_strptime(raw, '%Y-%m-%d')
        |    END AS TIMESTAMP) AS parsed
        |FROM (SELECT CASE event_id % 7
        |    WHEN 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
        |    WHEN 1 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S.%f')
        |    WHEN 2 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
        |    WHEN 3 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+02:00'
        |    WHEN 4 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z'
        |    WHEN 5 THEN strftime(ts, '%Y-%m-%d')
        |    ELSE '2026-01-01T25:00:00' END AS raw FROM events)
        |ORDER BY raw""".stripMargin,
    "p17_time_any" ->
      """SELECT DISTINCT raw,
        |  CASE
        |    WHEN regexp_full_match(raw,
        |        '([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9]') THEN raw
        |    WHEN regexp_full_match(raw, '([01][0-9]|2[0-3]):[0-5][0-9]')
        |      THEN raw || ':00'
        |    END AS parsed
        |FROM (SELECT CASE event_id % 4
        |    WHEN 0 THEN '25:61:00'
        |    WHEN 1 THEN strftime(ts, '%H:%M')
        |    WHEN 2 THEN '7:05'
        |    ELSE strftime(ts, '%H:%M:%S') END AS raw FROM events)
        |ORDER BY raw""".stripMargin,
    "x_dedup_keep_first" ->
      """SELECT user_id, event_type, min(ts) AS first_ts,
        |  count(*) AS n_dups
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "x_dedup_embed" ->
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
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    list_sum(list_transform(range(1, len(a.nvec) + 1),
        |      i -> a.nvec[i] * b.nvec[i])) AS sim
        |  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.id < b.id)
        |SELECT id_b AS dup_id, min(id_a) AS canonical_id
        |FROM s WHERE sim >= 0.3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_stream_sliding" ->
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
        |    event_type FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts)
        |    - INTERVAL '30 minutes', event_type FROM events)
        |SELECT window_start, event_type, count(*) AS cnt
        |FROM w GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "x_mm_frames" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |    to_base64(encode(text)) AS b64 FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CAST(ii.i * greatest(n // 3, 1) AS BIGINT) AS "offset",
        |    substr(b64, 1, 16) AS frame_head, n
        |  FROM b, (SELECT unnest(range(0, 3)) AS i) ii)
        |SELECT doc_id, "offset", frame_head FROM f WHERE "offset" < n
        |ORDER BY doc_id, "offset" """.stripMargin,
    "x_mm_decode" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    doc_id % 13 + 1 AS w, doc_id % 7 + 1 AS h
        |  FROM documents)
        |SELECT id,
        |  CAST(54 + ((24 * w + 31) // 32) * 4 * h AS INTEGER)
        |    AS n_bytes,
        |  'bmp' AS format,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels, CAST(1 AS INTEGER) AS n_frames,
        |  CAST(h * list_sum(list_transform(range(0, w),
        |    x -> (id + x) % 256)) AS BIGINT) AS sum_red,
        |  CAST(w * h * (id % 256) AS BIGINT) AS sum_green,
        |  CAST(w * list_sum(list_transform(range(0, h),
        |    y -> (id * 3 + y) % 256)) AS BIGINT) AS sum_blue
        |FROM d ORDER BY id""".stripMargin,
    "x_mm_decode_png" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    doc_id % 13 + 1 AS w, doc_id % 7 + 1 AS h
        |  FROM documents)
        |SELECT id,
        |  'png' AS format,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels, CAST(1 AS INTEGER) AS n_frames,
        |  CAST(h * list_sum(list_transform(range(0, w),
        |    x -> (id + x) % 256)) AS BIGINT) AS sum_red,
        |  CAST(w * h * (id % 256) AS BIGINT) AS sum_green,
        |  CAST(w * list_sum(list_transform(range(0, h),
        |    y -> (id * 3 + y) % 256)) AS BIGINT) AS sum_blue
        |FROM d ORDER BY id""".stripMargin,
    // JPEG is lossy: only container facts are compared — dims are a
    // pure function of doc_id, format/channels/frames are constants
    "x_mm_decode_jpeg" ->
      """SELECT doc_id AS id,
        |  'jpeg' AS format,
        |  CAST(doc_id % 13 + 1 AS INTEGER) AS width,
        |  CAST(doc_id % 7 + 1 AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels, CAST(1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY id""".stripMargin,
    // dHash re-derivation: the synthetic pixel at (x,y) of doc id is
    // r=(id+x)%256, g=id%256, b=(id*3+y)%256; the hash samples the
    // 8x8 grid at (sx,sy)=(x*w/8, y*h/8) (integer floor), takes luma
    // (299r+587g+114b)//1000, and sets bit y*7+x iff the right
    // neighbor's luma exceeds the left's. Pure integer arithmetic, so
    // DuckDB reproduces every bit; hamming_bmp_png is pinned 0 (the
    // decoded pixels are identical across containers).
    "x_mm_phash" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    doc_id % 13 + 1 AS w, doc_id % 7 + 1 AS h
        |  FROM documents),
        |g AS (
        |  SELECT id, w, h,
        |    list_transform(range(0, 64), i ->
        |      (((id + ((i % 8) * w // 8)) % 256) * 299
        |        + (id % 256) * 587
        |        + (((id * 3 + ((i // 8) * h // 8)) % 256) * 114))
        |        // 1000) AS luma
        |  FROM d)
        |SELECT id,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(list_sum(list_transform(range(0, 56), b ->
        |    CASE WHEN luma[(b // 7) * 8 + (b % 7) + 2]
        |           > luma[(b // 7) * 8 + (b % 7) + 1]
        |      THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END))
        |    AS BIGINT) AS dhash,
        |  CAST(0 AS INTEGER) AS hamming_bmp_png
        |FROM g ORDER BY id""".stripMargin,
    // brute-force twin of the banded-LSH near-dup join: re-derives
    // every item's dHash arithmetically (originals + the perturbed
    // twins, whose (0,0) green sample is +128 — the CASE arm fires on
    // exactly the luma cells whose 8x8 grid sample aliases onto pixel
    // (0,0)), then compares ALL pairs; the Spark side's pigeonhole
    // completeness (maxDist 7 < 8 bands) makes the two sets equal
    "x_mm_phash_neardup" ->
      s"""WITH $phashItemHashCtes
        |SELECT a.item_id AS id_a, b.item_id AS id_b,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
        |FROM hh a JOIN hh b ON a.item_id < b.item_id
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
        |ORDER BY id_a, id_b""".stripMargin,
    // probes (odd item ids, the perturbed twins) vs corpus (even item
    // ids) — the answer the bucketed phash index must serve
    "x_mm_phash_served" ->
      s"""WITH $phashItemHashCtes
        |SELECT a.item_id AS new_id, b.item_id AS corpus_id,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
        |FROM hh a JOIN hh b ON a.item_id % 2 = 1 AND b.item_id % 2 = 0
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
        |ORDER BY new_id, corpus_id""".stripMargin,
    // tombstone deletion for the phash index: the served answer minus
    // every deleted corpus item id's pairs
    "x_mm_phash_delete" ->
      s"""WITH $phashItemHashCtes
        |SELECT a.item_id AS new_id, b.item_id AS corpus_id,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
        |FROM hh a JOIN hh b ON a.item_id % 2 = 1 AND b.item_id % 2 = 0
        |  AND b.item_id % 4 <> 0
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
        |ORDER BY new_id, corpus_id""".stripMargin,
    // exact-arithmetic twin of the WAV decode: the synthetic PCM is a
    // pure function of (id, i), so loudness and clip counts re-derive
    "x_mm_audio" ->
      """WITH d AS (
        |  SELECT doc_id AS id, doc_id % 50 + 20 AS n FROM documents),
        |v AS (
        |  SELECT id, n, ((id * 31 + i * 17) % 65536) - 32768 AS smp
        |  FROM d, unnest(range(0, n)) t(i))
        |SELECT id,
        |  CAST(44 + 2 * any_value(n) AS INTEGER) AS n_bytes,
        |  'wav' AS format,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(16 AS INTEGER) AS bits,
        |  CAST(any_value(n) AS BIGINT) AS n_samples,
        |  CAST(any_value(n) * 125 AS BIGINT) AS duration_us,
        |  CAST(sum(abs(smp)) AS BIGINT) AS sum_abs,
        |  CAST(sum(CASE WHEN abs(smp) >= 32000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clipped
        |FROM v GROUP BY id ORDER BY id""".stripMargin,
    "x_mm_audio_invalid" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
        |  CAST(coalesce(octet_length(encode(text)), 0) AS INTEGER)
        |    AS n_bytes,
        |  'unknown' AS format,
        |  CAST(0 AS INTEGER) AS sample_rate,
        |  CAST(0 AS INTEGER) AS channels, CAST(0 AS INTEGER) AS bits,
        |  CAST(0 AS BIGINT) AS n_samples, CAST(0 AS BIGINT) AS duration_us,
        |  CAST(0 AS BIGINT) AS sum_abs, CAST(0 AS BIGINT) AS n_clipped
        |FROM documents ORDER BY id""".stripMargin,
    "x_mm_decode_invalid" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
        |  CAST(coalesce(octet_length(encode(text)), 0) AS INTEGER)
        |    AS n_bytes,
        |  'unknown' AS format,
        |  CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
        |  CAST(0 AS INTEGER) AS channels, CAST(0 AS INTEGER) AS n_frames,
        |  CAST(0 AS BIGINT) AS sum_red, CAST(0 AS BIGINT) AS sum_green,
        |  CAST(0 AS BIGINT) AS sum_blue
        |FROM documents ORDER BY id""".stripMargin,
    "k1_pk_lineitem" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |count(*) AS cnt FROM lineitem
        |GROUP BY 1,2 HAVING count(*) > 1 ORDER BY 1,2""".stripMargin,
    "k1_pk_degraded" ->
      """SELECT l_orderkey, CAST(l_linenumber % 2 AS BIGINT) AS l_parity,
        |count(*) AS cnt FROM lineitem
        |GROUP BY 1,2 HAVING count(*) > 1 ORDER BY 1,2""".stripMargin,
    "c2_unique_custkey" ->
      """SELECT o_custkey, count(*) AS cnt FROM orders
        |WHERE o_custkey IS NOT NULL
        |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    "k3_fk_orders_customer" ->
      """SELECT o.o_custkey, count(*) AS cnt FROM orders o
        |LEFT JOIN (SELECT DISTINCT c_custkey FROM customer
        |           WHERE c_custkey % 10 <> 0) c
        |ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "k3_fk_lineitem_orders" ->
      """SELECT l.l_orderkey, count(*) AS cnt FROM lineitem l
        |LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IS NULL AND l.l_orderkey IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c1_required" ->
      """SELECT count(*) AS violations FROM orders
        |WHERE o_orderpriority = '4-NOT SPECIFIED'""".stripMargin,
    "c3_minlength" ->
      """SELECT p_name, count(*) AS cnt FROM part
        |WHERE p_name IS NOT NULL AND length(p_name) < 9
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c4_maxlength" ->
      """SELECT p_name, count(*) AS cnt FROM part
        |WHERE p_name IS NOT NULL AND length(p_name) > 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c5_minimum" ->
      """SELECT l_quantity, count(*) AS cnt FROM lineitem
        |WHERE l_quantity IS NOT NULL AND l_quantity < 10.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c6_maximum" ->
      """SELECT l_discount, count(*) AS cnt FROM lineitem
        |WHERE l_discount IS NOT NULL AND l_discount > 0.05
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c7_pattern" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |WHERE o_orderpriority IS NOT NULL
        |  AND NOT regexp_full_match(o_orderpriority, '[1-5]-[A-Z]+')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c8_enum" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p3_integer" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_full_match(raw, '[+-]?[0-9]+')
        |       THEN CAST(raw AS BIGINT) END AS parsed
        |FROM (SELECT CASE
        |        WHEN l_linenumber % 3 = 0
        |          THEN CAST(l_orderkey % 10000 AS VARCHAR)
        |        WHEN l_linenumber % 3 = 1 THEN '1e3'
        |        ELSE 'x12' END AS raw FROM lineitem)
        |ORDER BY raw""".stripMargin,
    "p4_boolean" ->
      """SELECT o_orderstatus AS raw,
        |  CASE WHEN o_orderstatus = 'O' THEN true
        |       WHEN o_orderstatus = 'F' THEN false END AS parsed,
        |  o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F')
        |    AS invalid,
        |  count(*) AS cnt
        |FROM orders GROUP BY 1,2,3 ORDER BY raw""".stripMargin,
    "p1_string" ->
      """SELECT source AS raw, source AS parsed, count(*) AS cnt
        |FROM documents GROUP BY 1,2 ORDER BY raw""".stripMargin,
    "p1a_email" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_full_match(raw, '[^@\s]+@[^@\s]+\.[^@\s]+')
        |       THEN raw END AS parsed
        |FROM (SELECT CASE WHEN c_custkey % 7 = 0
        |          THEN 'bad mail ' || CAST(c_custkey % 100 AS VARCHAR)
        |        ELSE 'u' || CAST(c_custkey % 10000 AS VARCHAR)
        |          || '@ex.com' END AS raw FROM customer)
        |ORDER BY raw""".stripMargin,
    "p1b_uri" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_full_match(raw, '[A-Za-z][A-Za-z0-9+.-]*:\S+')
        |       THEN raw END AS parsed
        |FROM (SELECT CASE WHEN p_partkey % 5 = 0 THEN p_name
        |        ELSE 'https://ex.org/p/' || CAST(p_partkey AS VARCHAR) END
        |        AS raw FROM part)
        |ORDER BY raw""".stripMargin,
    "p1c_uuid" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_full_match(raw,
        |    '(?i)[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}')
        |       THEN raw END AS parsed
        |FROM (
        |  SELECT CASE WHEN c_custkey % 5 = 0 THEN substr(fulluuid, 1, 8)
        |              ELSE fulluuid END AS raw
        |  FROM (SELECT lower(lpad(hex(c_custkey % 4096), 8, '0')
        |          || '-0000-4000-8000-'
        |          || lpad(hex(c_nationkey), 12, '0')) AS fulluuid,
        |          c_custkey FROM customer))
        |ORDER BY raw""".stripMargin,
    "p1d_binary" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_full_match(raw,
        |    '(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{4})')
        |       THEN raw END AS parsed
        |FROM (SELECT CASE WHEN doc_id % 4 = 0 THEN 'a!!!'
        |        ELSE to_base64(encode(source)) END AS raw FROM documents)
        |ORDER BY raw""".stripMargin,
    "p2_number" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN upper(raw) = 'NAN' THEN CAST('NaN' AS DOUBLE)
        |       WHEN upper(raw) IN ('INF','INFINITY','+INF','+INFINITY')
        |         THEN CAST('Infinity' AS DOUBLE)
        |       WHEN upper(raw) IN ('-INF','-INFINITY')
        |         THEN CAST('-Infinity' AS DOUBLE)
        |       WHEN regexp_full_match(raw,
        |         '[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?')
        |         THEN TRY_CAST(raw AS DOUBLE) END AS parsed
        |FROM (SELECT CASE
        |        WHEN l_linenumber % 7 = 0 THEN 'NaN'
        |        WHEN l_linenumber % 7 = 1 THEN 'INF'
        |        WHEN l_linenumber % 7 = 2 THEN '-INF'
        |        WHEN l_linenumber % 7 = 3 THEN 'abc'
        |        ELSE CAST(l_orderkey % 1000 AS VARCHAR) || '.'
        |          || CAST(l_partkey % 100 AS VARCHAR) END AS raw
        |      FROM lineitem)
        |ORDER BY raw""".stripMargin,
    "p2_number_eu" ->
      """SELECT DISTINCT raw,
        |  TRY_CAST(replace(replace(raw, '.', ''), ',', '.') AS DOUBLE)
        |    AS parsed
        |FROM (SELECT CAST(l_suppkey % 10 AS VARCHAR) || '.'
        |        || lpad(CAST(l_partkey % 100 AS VARCHAR), 3, '0') || ','
        |        || lpad(CAST(l_orderkey % 100 AS VARCHAR), 2, '0') AS raw
        |      FROM lineitem)
        |ORDER BY raw""".stripMargin,
    "p2_number_affix" ->
      """SELECT DISTINCT raw,
        |  TRY_CAST(regexp_extract(raw, '[0-9]+', 0) AS DOUBLE) AS parsed
        |FROM (SELECT CASE WHEN l_suppkey % 2 = 0
        |          THEN '$' || CAST(l_suppkey AS VARCHAR)
        |          ELSE CAST(l_suppkey AS VARCHAR) || '%' END AS raw
        |      FROM lineitem)
        |ORDER BY raw""".stripMargin,
    "p5_date" ->
      """SELECT DISTINCT raw,
        |  CAST(try_strptime(raw, '%Y-%m-%d') AS DATE) AS parsed
        |FROM (SELECT CASE WHEN l_linenumber % 5 = 0 THEN '2026-13-01'
        |        ELSE strftime(l_shipdate, '%Y-%m-%d') END AS raw
        |      FROM lineitem)
        |ORDER BY raw""".stripMargin,
    "p5_date_fmt" ->
      """SELECT DISTINCT raw,
        |  CAST(try_strptime(raw, '%d/%m/%Y') AS DATE) AS parsed
        |FROM (SELECT CASE WHEN l_linenumber % 5 = 0
        |          THEN strftime(l_shipdate, '%Y-%m-%d')
        |          ELSE strftime(l_shipdate, '%d/%m/%Y') END AS raw
        |      FROM lineitem)
        |ORDER BY raw""".stripMargin,
    "p6_datetime" ->
      """SELECT DISTINCT raw,
        |  try_strptime(raw, '%Y-%m-%dT%H:%M:%S') AS parsed
        |FROM (SELECT CASE WHEN o_orderkey % 5 = 0
        |          THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
        |          ELSE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') END AS raw
        |      FROM orders)
        |ORDER BY raw""".stripMargin,
    "p7_time" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_full_match(raw,
        |    '([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9]') THEN raw END
        |    AS parsed
        |FROM (SELECT CASE WHEN event_id % 5 = 0 THEN '25:61:00'
        |        ELSE strftime(ts, '%H:%M:%S') END AS raw FROM events)
        |ORDER BY raw""".stripMargin,
    "p8_year" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN regexp_full_match(raw, '-?[0-9]{4}')
        |       THEN CAST(raw AS BIGINT) END AS parsed
        |FROM (SELECT CASE WHEN l_linenumber % 6 = 0 THEN '26'
        |        WHEN l_linenumber % 6 = 1 THEN '20260'
        |        ELSE CAST(year(l_shipdate) AS VARCHAR) END AS raw
        |      FROM lineitem)
        |ORDER BY raw""".stripMargin,
    "p9_geopoint" ->
      """SELECT DISTINCT raw,
        |  CASE WHEN ok AND abs(lon0) <= 180 AND abs(lat0) <= 90
        |       THEN lon0 END AS lon,
        |  CASE WHEN ok AND abs(lon0) <= 180 AND abs(lat0) <= 90
        |       THEN lat0 END AS lat
        |FROM (
        |  SELECT raw,
        |    regexp_full_match(raw,
        |      '\s*[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)\s*,\s*[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)\s*')
        |      AS ok,
        |    TRY_CAST(trim(split_part(raw, ',', 1)) AS DOUBLE) AS lon0,
        |    TRY_CAST(trim(split_part(raw, ',', 2)) AS DOUBLE) AS lat0
        |  FROM (SELECT CASE WHEN p_partkey % 11 = 0 THEN '200, 100'
        |          WHEN p_partkey % 13 = 0 THEN 'x,y'
        |          ELSE CAST(p_partkey % 361 - 180 AS VARCHAR) || ', '
        |            || CAST(p_size % 181 - 90 AS VARCHAR) END AS raw
        |        FROM part))
        |ORDER BY raw""".stripMargin,
    "x_dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS cnt
        |FROM (SELECT text FROM documents UNION ALL
        |      SELECT text FROM documents WHERE doc_id < 50)
        |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    // the end-to-end training pipeline: dedup (keep lowest id per
    // exact text over the degraded corpus) → quality gate ≥ 0.7 →
    // langid = 'en' → ≥ 10 tokens → hash-shard; per-shard counts,
    // token sums and a doc-id checksum pin WHICH rows survived
    "x_pipeline_train" ->
      s"""WITH src AS (
        |  SELECT doc_id, text FROM documents UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
        |dedup AS (
        |  SELECT min(doc_id) AS doc_id, text FROM src GROUP BY text),
        |feat AS (
        |  SELECT doc_id, text, ' ' || text || ' ' AS p,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g'))
        |        AS DOUBLE) / length(text) ELSE 0.0 END AS alpha_ratio,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^[:punct:]]', '',
        |        'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS punct_ratio,
        |    len(list_filter(regexp_split_to_array(text, '\\s+'),
        |      x -> x <> '')) AS n_toks
        |  FROM dedup),
        |sc AS (
        |  SELECT doc_id, text, n_toks,
        |    round((least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
        |      + alpha_ratio
        |      + greatest(0.0, 1.0 - punct_ratio * 10.0)) / 3.0, 6)
        |      AS quality,
        |    (length(p)-length(replace(p,' the ','')))/5
        |      + (length(p)-length(replace(p,' and ','')))/5
        |      + (length(p)-length(replace(p,' of ','')))/4
        |      + (length(p)-length(replace(p,' to ','')))/4
        |      + (length(p)-length(replace(p,' a ','')))/3 AS s_en,
        |    (length(p)-length(replace(p,' el ','')))/4
        |      + (length(p)-length(replace(p,' la ','')))/4
        |      + (length(p)-length(replace(p,' de ','')))/4
        |      + (length(p)-length(replace(p,' que ','')))/5
        |      + (length(p)-length(replace(p,' y ','')))/3 AS s_es,
        |    (length(p)-length(replace(p,' le ','')))/4
        |      + (length(p)-length(replace(p,' et ','')))/4
        |      + (length(p)-length(replace(p,' les ','')))/5
        |      + (length(p)-length(replace(p,' des ','')))/5
        |      + (length(p)-length(replace(p,' un ','')))/4 AS s_fr,
        |    (length(p)-length(replace(p,' der ','')))/5
        |      + (length(p)-length(replace(p,' und ','')))/5
        |      + (length(p)-length(replace(p,' die ','')))/5
        |      + (length(p)-length(replace(p,' das ','')))/5
        |      + (length(p)-length(replace(p,' ist ','')))/5 AS s_de
        |  FROM feat),
        |gated AS (
        |  SELECT doc_id, CAST(n_toks AS BIGINT) AS n_tokens,
        |    ${duckHash48("('pipe1' || CAST(doc_id AS VARCHAR))")} % 8
        |      AS shard
        |  FROM sc
        |  WHERE quality >= 0.7 AND n_toks >= 10
        |    AND NOT regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]')
        |    AND NOT regexp_matches(text, '[\\x{0400}-\\x{04FF}]')
        |    AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |  CAST(sum(doc_id) AS BIGINT) AS docid_checksum
        |FROM gated GROUP BY 1 ORDER BY 1""".stripMargin,
    // the gated streaming ingest: even-id corpus indexed, the stream
    // (odd docs + exact copies of even ids < 50 at +1000000) screened
    // by MinHash against it, quality/lang/length gated, survivors
    // shard-rolled-up with a doc-id checksum
    "x_stream_pipeline" ->
      s"""WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |bothd AS (
        |  SELECT doc_id AS id, toks FROM tok WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id AS id, toks FROM tok WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS id, toks FROM tok
        |  WHERE doc_id % 2 = 0 AND doc_id < 50),
        |$duckMinhashSigCtes,
        |cand AS (
        |  SELECT DISTINCT b.id AS new_id, a.id AS corpus_id
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.id % 2 = 0 AND a.id < 1000000
        |    AND (b.id % 2 = 1 OR b.id >= 1000000)),
        |jp AS (
        |  SELECT c.new_id,
        |    CASE WHEN len(list_distinct(list_concat(sn.sh, sc.sh))) > 0
        |      THEN CAST(len(list_intersect(sn.sh, sc.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(sn.sh, sc.sh)))
        |      ELSE 0.0 END AS jaccard
        |  FROM cand c
        |  JOIN shd sn ON c.new_id = sn.id
        |  JOIN shd sc ON c.corpus_id = sc.id),
        |dup AS (SELECT DISTINCT new_id FROM jp WHERE jaccard >= 0.5),
        |stream_docs AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS id, text FROM documents
        |  WHERE doc_id % 2 = 0 AND doc_id < 50),
        |feat AS (
        |  SELECT id, text, ' ' || text || ' ' AS p,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g'))
        |        AS DOUBLE) / length(text) ELSE 0.0 END AS alpha_ratio,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^[:punct:]]', '',
        |        'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS punct_ratio,
        |    len(list_filter(regexp_split_to_array(text, '\\s+'),
        |      x -> x <> '')) AS n_toks
        |  FROM stream_docs),
        |sc AS (
        |  SELECT id, text, n_toks,
        |    round((least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
        |      + alpha_ratio
        |      + greatest(0.0, 1.0 - punct_ratio * 10.0)) / 3.0, 6)
        |      AS quality,
        |    (length(p)-length(replace(p,' the ','')))/5
        |      + (length(p)-length(replace(p,' and ','')))/5
        |      + (length(p)-length(replace(p,' of ','')))/4
        |      + (length(p)-length(replace(p,' to ','')))/4
        |      + (length(p)-length(replace(p,' a ','')))/3 AS s_en,
        |    (length(p)-length(replace(p,' el ','')))/4
        |      + (length(p)-length(replace(p,' la ','')))/4
        |      + (length(p)-length(replace(p,' de ','')))/4
        |      + (length(p)-length(replace(p,' que ','')))/5
        |      + (length(p)-length(replace(p,' y ','')))/3 AS s_es,
        |    (length(p)-length(replace(p,' le ','')))/4
        |      + (length(p)-length(replace(p,' et ','')))/4
        |      + (length(p)-length(replace(p,' les ','')))/5
        |      + (length(p)-length(replace(p,' des ','')))/5
        |      + (length(p)-length(replace(p,' un ','')))/4 AS s_fr,
        |    (length(p)-length(replace(p,' der ','')))/5
        |      + (length(p)-length(replace(p,' und ','')))/5
        |      + (length(p)-length(replace(p,' die ','')))/5
        |      + (length(p)-length(replace(p,' das ','')))/5
        |      + (length(p)-length(replace(p,' ist ','')))/5 AS s_de
        |  FROM feat),
        |gated AS (
        |  SELECT id, CAST(n_toks AS BIGINT) AS n_tokens,
        |    ${duckHash48("('spipe1' || CAST(id AS VARCHAR))")} % 8
        |      AS shard
        |  FROM sc
        |  WHERE id NOT IN (SELECT new_id FROM dup)
        |    AND quality >= 0.7 AND n_toks >= 10
        |    AND NOT regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]')
        |    AND NOT regexp_matches(text, '[\\x{0400}-\\x{04FF}]')
        |    AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |  CAST(sum(id) AS BIGINT) AS docid_checksum
        |FROM gated GROUP BY 1 ORDER BY 1""".stripMargin,
    // the gated pipeline with a GROWING index: run 1 admits file A's
    // survivors (screened vs the even corpus + gated), run 2 screens
    // file B (the %4=3 docs + copies of early A docs at +2000000)
    // against corpus ∪ A-survivors — the oracle re-derives BOTH
    // admission sets and the final shard rollup
    "x_stream_pipeline_admit" ->
      s"""WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |bothd AS (
        |  SELECT doc_id AS id, toks FROM tok WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id AS id, toks FROM tok WHERE doc_id % 4 = 1
        |  UNION ALL
        |  SELECT doc_id AS id, toks FROM tok WHERE doc_id % 4 = 3
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS id, toks FROM tok
        |  WHERE doc_id % 4 = 1 AND doc_id < 40),
        |$duckMinhashSigCtes,
        |stream_docs AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 4 = 1
        |  UNION ALL
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 4 = 3
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS id, text FROM documents
        |  WHERE doc_id % 4 = 1 AND doc_id < 40),
        |feat AS (
        |  SELECT id, text, ' ' || text || ' ' AS p,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g'))
        |        AS DOUBLE) / length(text) ELSE 0.0 END AS alpha_ratio,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^[:punct:]]', '',
        |        'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS punct_ratio,
        |    len(list_filter(regexp_split_to_array(text, '\\s+'),
        |      x -> x <> '')) AS n_toks
        |  FROM stream_docs),
        |sc AS (
        |  SELECT id, text, n_toks,
        |    round((least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
        |      + alpha_ratio
        |      + greatest(0.0, 1.0 - punct_ratio * 10.0)) / 3.0, 6)
        |      AS quality,
        |    (length(p)-length(replace(p,' the ','')))/5
        |      + (length(p)-length(replace(p,' and ','')))/5
        |      + (length(p)-length(replace(p,' of ','')))/4
        |      + (length(p)-length(replace(p,' to ','')))/4
        |      + (length(p)-length(replace(p,' a ','')))/3 AS s_en,
        |    (length(p)-length(replace(p,' el ','')))/4
        |      + (length(p)-length(replace(p,' la ','')))/4
        |      + (length(p)-length(replace(p,' de ','')))/4
        |      + (length(p)-length(replace(p,' que ','')))/5
        |      + (length(p)-length(replace(p,' y ','')))/3 AS s_es,
        |    (length(p)-length(replace(p,' le ','')))/4
        |      + (length(p)-length(replace(p,' et ','')))/4
        |      + (length(p)-length(replace(p,' les ','')))/5
        |      + (length(p)-length(replace(p,' des ','')))/5
        |      + (length(p)-length(replace(p,' un ','')))/4 AS s_fr,
        |    (length(p)-length(replace(p,' der ','')))/5
        |      + (length(p)-length(replace(p,' und ','')))/5
        |      + (length(p)-length(replace(p,' die ','')))/5
        |      + (length(p)-length(replace(p,' das ','')))/5
        |      + (length(p)-length(replace(p,' ist ','')))/5 AS s_de
        |  FROM feat),
        |gt AS (
        |  SELECT id, CAST(n_toks AS BIGINT) AS n_tokens FROM sc
        |  WHERE quality >= 0.7 AND n_toks >= 10
        |    AND NOT regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]')
        |    AND NOT regexp_matches(text, '[\\x{0400}-\\x{04FF}]')
        |    AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de),
        |candA AS (
        |  SELECT DISTINCT b.id AS new_id, a.id AS corpus_id
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.id % 2 = 0 AND a.id < 2000000
        |    AND b.id % 4 = 1 AND b.id < 2000000),
        |jA AS (
        |  SELECT c.new_id,
        |    CASE WHEN len(list_distinct(list_concat(sn.sh, sc2.sh))) > 0
        |      THEN CAST(len(list_intersect(sn.sh, sc2.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(sn.sh, sc2.sh)))
        |      ELSE 0.0 END AS jaccard
        |  FROM candA c
        |  JOIN shd sn ON c.new_id = sn.id
        |  JOIN shd sc2 ON c.corpus_id = sc2.id),
        |dupA AS (SELECT DISTINCT new_id FROM jA WHERE jaccard >= 0.5),
        |admA AS (
        |  SELECT id FROM gt
        |  WHERE id % 4 = 1 AND id < 2000000
        |    AND id NOT IN (SELECT new_id FROM dupA)),
        |candB AS (
        |  SELECT DISTINCT b.id AS new_id, a.id AS corpus_id
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE (a.id % 2 = 0 AND a.id < 2000000
        |         OR a.id IN (SELECT id FROM admA))
        |    AND (b.id % 4 = 3 AND b.id < 2000000 OR b.id >= 2000000)),
        |jB AS (
        |  SELECT c.new_id,
        |    CASE WHEN len(list_distinct(list_concat(sn.sh, sc2.sh))) > 0
        |      THEN CAST(len(list_intersect(sn.sh, sc2.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(sn.sh, sc2.sh)))
        |      ELSE 0.0 END AS jaccard
        |  FROM candB c
        |  JOIN shd sn ON c.new_id = sn.id
        |  JOIN shd sc2 ON c.corpus_id = sc2.id),
        |dupB AS (SELECT DISTINCT new_id FROM jB WHERE jaccard >= 0.5),
        |admB AS (
        |  SELECT id FROM gt
        |  WHERE (id % 4 = 3 AND id < 2000000 OR id >= 2000000)
        |    AND id NOT IN (SELECT new_id FROM dupB)),
        |adm AS (
        |  SELECT gt.id, gt.n_tokens,
        |    ${duckHash48("('spadm1' || CAST(gt.id AS VARCHAR))")} % 8
        |      AS shard
        |  FROM gt
        |  WHERE gt.id IN (SELECT id FROM admA
        |                  UNION ALL SELECT id FROM admB))
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |  CAST(sum(id) AS BIGINT) AS docid_checksum
        |FROM adm GROUP BY 1 ORDER BY 1""".stripMargin,
    // the MULTI-INDEX pipeline: x_stream_pipeline_admit's two-batch
    // gate replay WITHOUT the offset-copy arm, plus the identity-gate
    // claim — batch 2's planted re-fetches (corpus ids % 4 = 0 < 80
    // re-sent with the id+3 neighbor's fresh text) are rejected by id,
    // so they appear NOWHERE below, and idx_total must equal
    // corpus + admissions exactly (an admitted re-fetch would shift
    // both the shard aggregate and the key total)
    "x_stream_pipeline_multi" ->
      s"""WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |bothd AS (
        |  SELECT doc_id AS id, toks FROM tok WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id AS id, toks FROM tok WHERE doc_id % 4 = 1
        |  UNION ALL
        |  SELECT doc_id AS id, toks FROM tok WHERE doc_id % 4 = 3),
        |$duckMinhashSigCtes,
        |stream_docs AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 4 = 1
        |  UNION ALL
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 4 = 3),
        |feat AS (
        |  SELECT id, text, ' ' || text || ' ' AS p,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g'))
        |        AS DOUBLE) / length(text) ELSE 0.0 END AS alpha_ratio,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^[:punct:]]', '',
        |        'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS punct_ratio,
        |    len(list_filter(regexp_split_to_array(text, '\\s+'),
        |      x -> x <> '')) AS n_toks
        |  FROM stream_docs),
        |sc AS (
        |  SELECT id, text, n_toks,
        |    round((least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
        |      + alpha_ratio
        |      + greatest(0.0, 1.0 - punct_ratio * 10.0)) / 3.0, 6)
        |      AS quality,
        |    (length(p)-length(replace(p,' the ','')))/5
        |      + (length(p)-length(replace(p,' and ','')))/5
        |      + (length(p)-length(replace(p,' of ','')))/4
        |      + (length(p)-length(replace(p,' to ','')))/4
        |      + (length(p)-length(replace(p,' a ','')))/3 AS s_en,
        |    (length(p)-length(replace(p,' el ','')))/4
        |      + (length(p)-length(replace(p,' la ','')))/4
        |      + (length(p)-length(replace(p,' de ','')))/4
        |      + (length(p)-length(replace(p,' que ','')))/5
        |      + (length(p)-length(replace(p,' y ','')))/3 AS s_es,
        |    (length(p)-length(replace(p,' le ','')))/4
        |      + (length(p)-length(replace(p,' et ','')))/4
        |      + (length(p)-length(replace(p,' les ','')))/5
        |      + (length(p)-length(replace(p,' des ','')))/5
        |      + (length(p)-length(replace(p,' un ','')))/4 AS s_fr,
        |    (length(p)-length(replace(p,' der ','')))/5
        |      + (length(p)-length(replace(p,' und ','')))/5
        |      + (length(p)-length(replace(p,' die ','')))/5
        |      + (length(p)-length(replace(p,' das ','')))/5
        |      + (length(p)-length(replace(p,' ist ','')))/5 AS s_de
        |  FROM feat),
        |gt AS (
        |  SELECT id, CAST(n_toks AS BIGINT) AS n_tokens FROM sc
        |  WHERE quality >= 0.7 AND n_toks >= 10
        |    AND NOT regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]')
        |    AND NOT regexp_matches(text, '[\\x{0400}-\\x{04FF}]')
        |    AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de),
        |candA AS (
        |  SELECT DISTINCT b.id AS new_id, a.id AS corpus_id
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.id % 2 = 0 AND b.id % 4 = 1),
        |jA AS (
        |  SELECT c.new_id,
        |    CASE WHEN len(list_distinct(list_concat(sn.sh, sc2.sh))) > 0
        |      THEN CAST(len(list_intersect(sn.sh, sc2.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(sn.sh, sc2.sh)))
        |      ELSE 0.0 END AS jaccard
        |  FROM candA c
        |  JOIN shd sn ON c.new_id = sn.id
        |  JOIN shd sc2 ON c.corpus_id = sc2.id),
        |dupA AS (SELECT DISTINCT new_id FROM jA WHERE jaccard >= 0.5),
        |admA AS (
        |  SELECT id FROM gt
        |  WHERE id % 4 = 1
        |    AND id NOT IN (SELECT new_id FROM dupA)),
        |candB AS (
        |  SELECT DISTINCT b.id AS new_id, a.id AS corpus_id
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE (a.id % 2 = 0 OR a.id IN (SELECT id FROM admA))
        |    AND b.id % 4 = 3),
        |jB AS (
        |  SELECT c.new_id,
        |    CASE WHEN len(list_distinct(list_concat(sn.sh, sc2.sh))) > 0
        |      THEN CAST(len(list_intersect(sn.sh, sc2.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(sn.sh, sc2.sh)))
        |      ELSE 0.0 END AS jaccard
        |  FROM candB c
        |  JOIN shd sn ON c.new_id = sn.id
        |  JOIN shd sc2 ON c.corpus_id = sc2.id),
        |dupB AS (SELECT DISTINCT new_id FROM jB WHERE jaccard >= 0.5),
        |admB AS (
        |  SELECT id FROM gt
        |  WHERE id % 4 = 3
        |    AND id NOT IN (SELECT new_id FROM dupB)),
        |adm AS (
        |  SELECT gt.id, gt.n_tokens,
        |    ${duckHash48("('spadm1' || CAST(gt.id AS VARCHAR))")} % 8
        |      AS shard
        |  FROM gt
        |  WHERE gt.id IN (SELECT id FROM admA
        |                  UNION ALL SELECT id FROM admB))
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |  CAST(sum(id) AS BIGINT) AS docid_checksum,
        |  (SELECT count(*) FROM documents WHERE doc_id % 2 = 0)
        |    + (SELECT count(*) FROM adm) AS idx_total
        |FROM adm GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_dedup_prefix" ->
      """SELECT array_to_string(list_slice(
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''),
        |    1, 3), ' ') AS prefix_key, count(*) AS cnt
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    "x_dedup_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, toks,
        |    list_slice(toks, 1, CAST(floor(len(toks) * 0.8) AS INTEGER))
        |      AS ttoks
        |  FROM tok WHERE len(toks) >= 10),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |      AS sa,
        |    CASE WHEN len(ttoks) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ttoks) - 1),
        |        i -> array_to_string(list_slice(ttoks, i, i + 2), ' ')))
        |      ELSE [array_to_string(ttoks, ' ')] END AS sb
        |  FROM base)
        |SELECT doc_id,
        |  CASE WHEN len(list_distinct(list_concat(sa, sb))) > 0
        |    THEN CAST(len(list_intersect(sa, sb)) AS DOUBLE)
        |      / len(list_distinct(list_concat(sa, sb)))
        |    ELSE 0.0 END AS jaccard
        |FROM sh ORDER BY doc_id""".stripMargin,
    "x_sim_topk" ->
      """WITH nq AS (
        |  SELECT vec_id AS query_id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings WHERE vec_id < 5),
        |q AS (SELECT query_id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS qv
        |      FROM nq WHERE nrm > 0),
        |nc AS (
        |  SELECT vec_id AS neighbor_id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |c AS (SELECT neighbor_id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS cv
        |      FROM nc WHERE nrm > 0),
        |s AS (
        |  SELECT query_id, neighbor_id,
        |    list_sum(list_transform(range(1, len(qv) + 1),
        |      i -> qv[i] * cv[i])) AS sim
        |  FROM q, c WHERE query_id <> neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "x_sim_pairs" ->
      """WITH v0 AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings WHERE vec_id < 300),
        |v AS (SELECT id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS nvec
        |      FROM v0 WHERE nrm > 0),
        |s AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    list_sum(list_transform(range(1, len(a.nvec) + 1),
        |      i -> a.nvec[i] * b.nvec[i])) AS sim
        |  FROM v a, v b WHERE a.id < b.id)
        |SELECT id_a, id_b FROM s WHERE sim >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "x_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')) AS BIGINT) AS n_word_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text, n_chars,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
        |      AS toks,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g'))
        |        AS DOUBLE) / length(text) ELSE 0.0 END AS alpha_ratio,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
        |        AS DOUBLE) / length(text) ELSE 0.0 END AS punct_ratio
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) = n_chars AS n_chars_ok,
        |  alpha_ratio,
        |  CASE WHEN len(toks) > 0
        |    THEN CAST(list_sum(list_transform(toks, x -> length(x)))
        |      AS DOUBLE) / len(toks) ELSE 0.0 END AS avg_token_len,
        |  round((least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
        |    + alpha_ratio
        |    + greatest(0.0, 1.0 - punct_ratio * 10.0)) / 3.0, 6)
        |    AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    // numeric-profile drift (round-17 #5): per-column decile bounds
    // fitted on the full base via quantile_cont (the interpolated-
    // percentile parity basis every profile row shares), both sides
    // bucketed by bounds reached, cross-multiplied integer deviation
    // per (column, bucket) — every value exact
    "x_profile_drift" -> {
      val probs = (1 until 10).map(i => (i.toDouble / 10).toString)
        .mkString("[", ", ", "]")
      val binExpr = (1 until 10).map(i =>
        s"CASE WHEN v >= b[$i] THEN 1 ELSE 0 END").mkString(" + ")
      def one(c: String) =
        s"""SELECT '$c' AS column_name, s.bucket,
          |  COALESCE(bh.base_n, 0) AS base_n,
          |  COALESCE(ch.batch_n, 0) AS batch_n
          |FROM (SELECT unnest(generate_series(0, 9)) AS bucket) s
          |LEFT JOIN (
          |  SELECT ($binExpr) AS bucket,
          |    CAST(count(*) AS BIGINT) AS base_n
          |  FROM (SELECT CAST($c AS DOUBLE) AS v FROM lineitem
          |        WHERE $c IS NOT NULL),
          |       (SELECT quantile_cont(CAST($c AS DOUBLE), $probs) AS b
          |        FROM lineitem) GROUP BY 1) bh USING (bucket)
          |LEFT JOIN (
          |  SELECT ($binExpr) AS bucket,
          |    CAST(count(*) AS BIGINT) AS batch_n
          |  FROM (SELECT CAST($c AS DOUBLE) AS v FROM lineitem
          |        WHERE l_discount >= 0.05 AND $c IS NOT NULL),
          |       (SELECT quantile_cont(CAST($c AS DOUBLE), $probs) AS b
          |        FROM lineitem) GROUP BY 1) ch USING (bucket)"""
          .stripMargin
      s"""WITH j AS (${one("l_quantity")}
        |UNION ALL ${one("l_extendedprice")}
        |UNION ALL ${one("l_discount")}),
        |tot AS (SELECT column_name,
        |  CAST(sum(base_n) AS BIGINT) AS n_base,
        |  CAST(sum(batch_n) AS BIGINT) AS n_batch FROM j GROUP BY 1)
        |SELECT j.column_name, CAST(j.bucket AS BIGINT) AS bucket,
        |  j.base_n, j.batch_n,
        |  CAST(abs(j.base_n * tot.n_batch - j.batch_n * tot.n_base)
        |    AS BIGINT) AS dev,
        |  tot.n_base, tot.n_batch
        |FROM j JOIN tot USING (column_name)
        |ORDER BY column_name, bucket""".stripMargin
    },
    "x_text_drift" ->
      """WITH btoks AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS tok FROM documents),
        |base AS (SELECT tok, CAST(count(*) AS BIGINT) AS base_n
        |  FROM btoks GROUP BY tok),
        |topk AS (SELECT tok, base_n FROM base
        |  ORDER BY base_n DESC, tok LIMIT 50),
        |ktoks AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS tok FROM documents WHERE n_chars <= 300),
        |batch AS (SELECT tok, CAST(count(*) AS BIGINT) AS batch_n
        |  FROM ktoks GROUP BY tok),
        |j AS (SELECT t.tok, t.base_n, COALESCE(b.batch_n, 0) AS batch_n
        |  FROM topk t LEFT JOIN batch b USING (tok)),
        |tot AS (SELECT CAST(sum(base_n) AS BIGINT) AS n_base,
        |  CAST(sum(batch_n) AS BIGINT) AS n_batch FROM j)
        |SELECT j.tok, j.base_n, j.batch_n,
        |  CAST(abs(j.base_n * tot.n_batch - j.batch_n * tot.n_base)
        |    AS BIGINT) AS dev,
        |  tot.n_base, tot.n_batch
        |FROM j, tot ORDER BY tok""".stripMargin,
    "x_stream_token_drift" ->
      """WITH btoks AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS tok FROM documents),
        |base AS (SELECT tok, CAST(count(*) AS BIGINT) AS base_n
        |  FROM btoks GROUP BY tok),
        |topk AS (SELECT tok, base_n FROM base
        |  ORDER BY base_n DESC, tok LIMIT 50),
        |ta_toks AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS tok FROM documents WHERE n_chars <= 300),
        |ta_cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS batch_n
        |  FROM ta_toks GROUP BY tok),
        |ja AS (SELECT t.tok, t.base_n, COALESCE(b.batch_n, 0) AS batch_n
        |  FROM topk t LEFT JOIN ta_cnt b USING (tok)),
        |tota AS (SELECT CAST(sum(base_n) AS BIGINT) AS n_base,
        |  CAST(sum(batch_n) AS BIGINT) AS n_batch FROM ja),
        |tb_toks AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS tok FROM documents WHERE doc_id % 5 = 0),
        |tb_cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS batch_n
        |  FROM tb_toks GROUP BY tok),
        |jb AS (SELECT t.tok, t.base_n, COALESCE(b.batch_n, 0) AS batch_n
        |  FROM topk t LEFT JOIN tb_cnt b USING (tok)),
        |totb AS (SELECT CAST(sum(base_n) AS BIGINT) AS n_base,
        |  CAST(sum(batch_n) AS BIGINT) AS n_batch FROM jb)
        |SELECT * FROM (
        |  SELECT ja.tok, ja.base_n, ja.batch_n,
        |    CAST(abs(ja.base_n * tota.n_batch - ja.batch_n * tota.n_base)
        |      AS BIGINT) AS dev,
        |    tota.n_base, tota.n_batch
        |  FROM ja, tota
        |  UNION ALL
        |  SELECT jb.tok, jb.base_n, jb.batch_n,
        |    CAST(abs(jb.base_n * totb.n_batch - jb.batch_n * totb.n_base)
        |      AS BIGINT) AS dev,
        |    totb.n_base, totb.n_batch
        |  FROM jb, totb)
        |ORDER BY tok, n_batch, batch_n""".stripMargin,
    "x_text_langid" ->
      """WITH sc AS (
        |  SELECT doc_id, text,
        |    (length(p)-length(replace(p,' the ','')))/5
        |      + (length(p)-length(replace(p,' and ','')))/5
        |      + (length(p)-length(replace(p,' of ','')))/4
        |      + (length(p)-length(replace(p,' to ','')))/4
        |      + (length(p)-length(replace(p,' a ','')))/3 AS s_en,
        |    (length(p)-length(replace(p,' el ','')))/4
        |      + (length(p)-length(replace(p,' la ','')))/4
        |      + (length(p)-length(replace(p,' de ','')))/4
        |      + (length(p)-length(replace(p,' que ','')))/5
        |      + (length(p)-length(replace(p,' y ','')))/3 AS s_es,
        |    (length(p)-length(replace(p,' le ','')))/4
        |      + (length(p)-length(replace(p,' et ','')))/4
        |      + (length(p)-length(replace(p,' les ','')))/5
        |      + (length(p)-length(replace(p,' des ','')))/5
        |      + (length(p)-length(replace(p,' un ','')))/4 AS s_fr,
        |    (length(p)-length(replace(p,' der ','')))/5
        |      + (length(p)-length(replace(p,' und ','')))/5
        |      + (length(p)-length(replace(p,' die ','')))/5
        |      + (length(p)-length(replace(p,' das ','')))/5
        |      + (length(p)-length(replace(p,' ist ','')))/5 AS s_de
        |  FROM (SELECT doc_id, text, ' ' || text || ' ' AS p
        |        FROM documents))
        |SELECT doc_id,
        |  CASE WHEN regexp_matches(text, '[\x{4E00}-\x{9FFF}]') THEN 'zh'
        |       WHEN regexp_matches(text, '[\x{0400}-\x{04FF}]') THEN 'ru'
        |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de
        |         THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
        |       WHEN s_fr >= s_de THEN 'fr'
        |       ELSE 'de' END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin,
    "x_text_stopwords" ->
      """WITH sc AS (
        |  SELECT doc_id,
        |    (length(p)-length(replace(p,' the ','')))/5
        |      + (length(p)-length(replace(p,' and ','')))/5
        |      + (length(p)-length(replace(p,' of ','')))/4
        |      + (length(p)-length(replace(p,' to ','')))/4
        |      + (length(p)-length(replace(p,' a ','')))/3 AS hits,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS toks
        |  FROM (SELECT doc_id, text, ' ' || text || ' ' AS p
        |        FROM documents))
        |SELECT doc_id, CAST(hits AS BIGINT) AS en_hits,
        |  round(hits / greatest(toks, 1), 6) AS stopword_ratio
        |FROM sc ORDER BY doc_id""".stripMargin,
    "x_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_mm_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "x_mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_stream_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |  event_type, count(*) AS cnt, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "r1_error_sample" ->
      """SELECT list_slice(list_sort(list(DISTINCT o_orderpriority)),
        |  1, 3) AS sample_values FROM orders""".stripMargin,
    "k2_uniquekeys" ->
      """SELECT l_partkey, l_suppkey, count(*) AS cnt FROM lineitem
        |WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
        |GROUP BY 1,2 HAVING count(*) > 1 ORDER BY 1,2""".stripMargin,
    "x_profile" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS column_name, count(*) AS n_rows,
        |    count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_nulls,
        |    count(DISTINCT l_orderkey) AS n_distinct,
        |    CAST(min(l_orderkey) AS VARCHAR) AS min_value,
        |    CAST(max(l_orderkey) AS VARCHAR) AS max_value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', count(*),
        |    count(CASE WHEN l_quantity IS NULL THEN 1 END),
        |    count(DISTINCT l_quantity),
        |    CAST(min(l_quantity) AS VARCHAR),
        |    CAST(max(l_quantity) AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*),
        |    count(CASE WHEN l_returnflag IS NULL THEN 1 END),
        |    count(DISTINCT l_returnflag),
        |    CAST(min(l_returnflag) AS VARCHAR),
        |    CAST(max(l_returnflag) AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', count(*),
        |    count(CASE WHEN l_shipdate IS NULL THEN 1 END),
        |    count(DISTINCT l_shipdate),
        |    CAST(min(l_shipdate) AS VARCHAR),
        |    CAST(max(l_shipdate) AS VARCHAR) FROM lineitem)
        |ORDER BY column_name""".stripMargin,
    "k3_fk_salted" ->
      """SELECT o.o_custkey, count(*) AS cnt FROM orders o
        |LEFT JOIN (SELECT DISTINCT c_custkey FROM customer
        |           WHERE c_custkey % 10 <> 0) c
        |ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_stream_sessionize_native" ->
      """WITH d AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "x_stream_sessionize" ->
      """WITH d AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // x_sim_ivf_kmeans: oracle generated per-dataset by
    // dynamicOracleSql (the centroid FIT is driver-side Lloyd, not
    // SQL-expressible, but the fitted centroids are deterministic
    // constants — embedded as literals, the assignment + probe + rank
    // pipeline is plain SQL). Verify merges it into oracle_sql.json.
    "x_profile_approx" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS column_name, count(*) AS n_rows,
        |    count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_nulls,
        |    CAST(min(l_orderkey) AS VARCHAR) AS min_value,
        |    CAST(max(l_orderkey) AS VARCHAR) AS max_value,
        |    TRUE AS distinct_sane FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', count(*),
        |    count(CASE WHEN l_quantity IS NULL THEN 1 END),
        |    CAST(min(l_quantity) AS VARCHAR),
        |    CAST(max(l_quantity) AS VARCHAR), TRUE FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*),
        |    count(CASE WHEN l_returnflag IS NULL THEN 1 END),
        |    CAST(min(l_returnflag) AS VARCHAR),
        |    CAST(max(l_returnflag) AS VARCHAR), TRUE FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', count(*),
        |    count(CASE WHEN l_shipdate IS NULL THEN 1 END),
        |    CAST(min(l_shipdate) AS VARCHAR),
        |    CAST(max(l_shipdate) AS VARCHAR), TRUE FROM lineitem)
        |ORDER BY column_name""".stripMargin,
    "x_unique_screen" ->
      """SELECT * FROM (
        |  SELECT 'lineitem_pk' AS key_set, count(*) AS n_rows,
        |    TRUE AS definitely_has_duplicates
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
        |  UNION ALL
        |  SELECT 'nation_pk', count(*), FALSE
        |  FROM nation WHERE n_nationkey IS NOT NULL)
        |ORDER BY key_set""".stripMargin,
    "x_hot_buckets" ->
      s"""WITH tok AS (
        |  SELECT doc_id AS id,
        |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |shd AS (
        |  SELECT id, list_transform(
        |    list_distinct(CASE WHEN len(toks) >= 5
        |      THEN list_transform(range(1, len(toks) - 3),
        |        i -> array_to_string(list_slice(toks, i, i + 4), ' '))
        |      ELSE [array_to_string(toks, ' ')] END),
        |    s -> ${duckHash48("s")}) AS sh
        |  FROM tok),
        |sigd AS (
        |  SELECT id, list_transform(range(0, 32),
        |    i -> list_min(list_transform(sh, h -> ${duckPerm("h", "i")})))
        |    AS sig
        |  FROM shd),
        |banded AS (
        |  SELECT id, bb.b AS band,
        |    array_to_string(list_slice(sig, bb.b * 2 + 1, bb.b * 2 + 2), '_')
        |      AS bucket
        |  FROM sigd, (SELECT unnest(range(0, 16)) AS b) bb)
        |SELECT band, bucket, count(*) AS bcnt FROM banded
        |GROUP BY band, bucket HAVING count(*) > 2
        |ORDER BY band, bucket""".stripMargin,
    "x_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        |      FROM events WHERE event_type = 'click')
        |SELECT event_id, user_id, ts, click_id, click_ts FROM (
        |  SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
        |  FROM p LEFT JOIN c
        |    ON c.user_id = p.user_id AND c.click_ts <= p.ts) t
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "x_range_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
        |      FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts, count(c.c_id) AS n_clicks
        |FROM p LEFT JOIN c ON c.c_user = p.user_id
        |  AND c.c_ts >= p.ts AND c.c_ts < p.ts + INTERVAL 6 HOUR
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "x_range_join_binned" ->
      """WITH w(w_name, w_start, w_end) AS (VALUES
        |  ('w1', TIMESTAMP '2024-01-03 00:00:00',
        |         TIMESTAMP '2024-01-04 12:00:00'),
        |  ('w2', TIMESTAMP '2024-01-08 06:00:00',
        |         TIMESTAMP '2024-01-09 00:00:00'),
        |  ('w3', TIMESTAMP '2024-01-15 00:00:00',
        |         TIMESTAMP '2024-01-18 00:00:00'),
        |  ('w4', TIMESTAMP '2024-01-22 18:00:00',
        |         TIMESTAMP '2024-01-23 06:00:00'),
        |  ('w5', TIMESTAMP '2024-01-29 00:00:00',
        |         TIMESTAMP '2024-01-31 00:00:00'))
        |SELECT w_name, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM w JOIN events e ON e.ts >= w_start AND e.ts < w_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_text_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
        |      AS ws
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, len(ws) AS n_words,
        |    CASE WHEN len(ws) > 0 THEN
        |      CAST(list_max(list_transform(list_distinct(ws),
        |        w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE) / len(ws)
        |      ELSE 0.0 END AS twf,
        |    CASE WHEN len(ws) >= 2 THEN
        |      list_transform(range(1, len(ws)),
        |        i -> ws[CAST(i AS INTEGER)] || ' ' ||
        |             ws[CAST(i + 1 AS INTEGER)])
        |      ELSE [] END AS bg,
        |    CASE WHEN len(ws) >= 3 THEN
        |      list_transform(range(1, len(ws) - 1),
        |        i -> ws[CAST(i AS INTEGER)] || ' ' ||
        |             ws[CAST(i + 1 AS INTEGER)] || ' ' ||
        |             ws[CAST(i + 2 AS INTEGER)])
        |      ELSE [] END AS tg
        |  FROM tok)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(twf, 6) AS top_word_frac,
        |  round(CASE WHEN len(bg) > 0 THEN
        |    1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
        |    ELSE 0.0 END, 6) AS dup_bigram_frac,
        |  round(CASE WHEN len(tg) > 0 THEN
        |    1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
        |    ELSE 0.0 END, 6) AS dup_trigram_frac
        |FROM m ORDER BY doc_id""".stripMargin,
    "x_text_vocab" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 50""".stripMargin,
    "x_dedup_semantic" ->
      """WITH v0 AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |v AS (SELECT id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS nvec
        |      FROM v0 WHERE nrm > 0),
        |cents AS (SELECT id AS list_id, nvec AS cvec FROM v
        |          ORDER BY id LIMIT 16),
        |assigned AS (
        |  SELECT id, nvec, list_id FROM (
        |    SELECT vv.id, vv.nvec, c.list_id,
        |      row_number() OVER (PARTITION BY vv.id ORDER BY
        |        list_sum(list_transform(range(1, len(vv.nvec) + 1),
        |          i -> vv.nvec[i] * c.cvec[i])) DESC, c.list_id) AS rn
        |    FROM v vv, cents c) WHERE rn = 1),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    list_sum(list_transform(range(1, len(a.nvec) + 1),
        |      i -> a.nvec[i] * b.nvec[i])) AS sim
        |  FROM assigned a JOIN assigned b
        |    ON a.list_id = b.list_id AND a.id < b.id)
        |SELECT id_b AS dup_id, min(id_a) AS canonical_id
        |FROM pairs WHERE sim >= 0.35
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_sample_shards" ->
      s"""SELECT ${duckHash48("('shard1' || CAST(doc_id AS VARCHAR))")} % 8
        |    AS shard,
        |  count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // target-grid bins + exact integral quotas + per-bin smallest-hash
    // winners (the x_sample_cap ranking discipline, quota per bin)
    "x_sample_match_dist" -> {
      val probs = (1 until 5).map(i => (i.toDouble / 5).toString)
        .mkString("[", ", ", "]")
      val binExpr = (1 until 5).map(i =>
        s"CASE WHEN v >= b[$i] THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH tv AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE source = 'src0' AND n_chars IS NOT NULL),
        |grid AS (SELECT quantile_cont(v, $probs) AS b FROM tv),
        |th AS (SELECT ($binExpr) AS bin, count(*) AS ct
        |  FROM tv, grid GROUP BY 1),
        |nt AS (SELECT sum(ct) AS n_t FROM th),
        |q AS (SELECT bin, (100 * ct) // n_t AS quota FROM th, nt),
        |sb AS (SELECT doc_id, ($binExpr) AS bin
        |  FROM (SELECT doc_id, CAST(n_chars AS DOUBLE) AS v
        |        FROM documents WHERE n_chars IS NOT NULL), grid),
        |r AS (SELECT doc_id, bin,
        |    row_number() OVER (PARTITION BY bin ORDER BY
        |      ${duckHash48("('md1' || CAST(doc_id AS VARCHAR))")} ASC,
        |      doc_id ASC) AS rn
        |  FROM sb)
        |SELECT r.doc_id, CAST(r.bin AS BIGINT) AS bin
        |FROM r JOIN q USING (bin) WHERE rn <= quota
        |ORDER BY doc_id""".stripMargin
    },
    "x_sample_cap" ->
      s"""SELECT event_type, count(*) AS n_kept,
        |  CAST(sum(event_id) AS BIGINT) AS sum_kept_ids FROM (
        |  SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type ORDER BY
        |      ${duckHash48("('cap1' || CAST(event_id AS VARCHAR))")} ASC,
        |      event_id ASC) AS rn
        |  FROM events) t WHERE rn <= 500
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_pipeline_clean" ->
      s"""WITH base AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, source FROM documents
        |  WHERE doc_id < 50),
        |q AS (
        |  SELECT * FROM base
        |  WHERE round((least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
        |    + CASE WHEN length(text) > 0
        |        THEN CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g'))
        |          AS DOUBLE) / length(text) ELSE 0.0 END
        |    + greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
        |        THEN CAST(length(regexp_replace(text, '[^[:punct:]]', '',
        |          'g')) AS DOUBLE) / length(text) ELSE 0.0 END) * 10.0))
        |    / 3.0, 6) >= 0.9),
        |l AS (
        |  SELECT doc_id, text, source FROM (
        |    SELECT doc_id, text, source,
        |      list_filter(regexp_split_to_array(text, '\\s+'),
        |        x -> x <> '') AS ws
        |    FROM q)
        |  WHERE CASE WHEN len(ws) > 0
        |    THEN CAST(list_max(list_transform(list_distinct(ws),
        |      w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE) / len(ws)
        |    ELSE 0.0 END <= 0.12),
        |surv AS (
        |  SELECT doc_id, source FROM (
        |    SELECT doc_id, source,
        |      row_number() OVER (PARTITION BY md5(text)
        |        ORDER BY doc_id) AS drn
        |    FROM l) WHERE drn = 1),
        |cap AS (
        |  SELECT source, doc_id FROM (
        |    SELECT source, doc_id,
        |      row_number() OVER (PARTITION BY source ORDER BY
        |        ${duckHash48("('fcap' || CAST(doc_id AS VARCHAR))")} ASC,
        |        doc_id ASC) AS crn
        |    FROM surv) WHERE crn <= 10)
        |SELECT * FROM (
        |  SELECT 0 AS stage_idx, 's0_raw' AS stage, count(*) AS n_rows
        |  FROM base
        |  UNION ALL SELECT 1, 's1_quality', count(*) FROM q
        |  UNION ALL SELECT 2, 's2_repetition', count(*) FROM l
        |  UNION ALL SELECT 3, 's3_exact_dedup', count(*) FROM surv
        |  UNION ALL SELECT 4, 's4_cap_per_source', count(*) FROM cap)
        |ORDER BY stage_idx""".stripMargin,
    "x_stream_enrich" ->
      """SELECT time_bucket(INTERVAL '1 day', e.ts) AS window_start,
        |  c.c_mktsegment, count(*) AS cnt
        |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_stream_anomaly" ->
      """WITH hourly AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |    event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(cnt) AS DOUBLE) AS s1,
        |    CAST(sum(cnt * cnt) AS DOUBLE) AS s2
        |  FROM hourly GROUP BY 1 HAVING count(*) > 1)
        |SELECT window_start, event_type, cnt, round(z, 6) AS z FROM (
        |  SELECT h.window_start, h.event_type, h.cnt,
        |    (h.cnt - s.s1 / s.n) /
        |      sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS z
        |  FROM hourly h JOIN stats s ON h.event_type = s.event_type)
        |WHERE abs(z) >= 2.0 ORDER BY window_start, event_type""".stripMargin,
    "x_text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |       FROM terms GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    CAST(tf.tf AS DOUBLE) / d.df AS score
        |  FROM tf JOIN dfreq d ON tf.term = d.term)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rank, term,
        |  round(score, 6) AS score
        |FROM (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term DESC) AS rn
        |  FROM scored) t
        |WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,
    "x_profile_histogram" ->
      """SELECT CAST(floor((CAST(l_quantity AS DOUBLE) - 1.0) / 5.0)
        |    AS BIGINT) AS bin,
        |  count(*) AS cnt,
        |  min(CAST(l_quantity AS DOUBLE)) AS bin_min,
        |  max(CAST(l_quantity AS DOUBLE)) AS bin_max
        |FROM lineitem
        |WHERE CAST(l_quantity AS DOUBLE) >= 1.0
        |  AND CAST(l_quantity AS DOUBLE) < 51.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_dedup_corpus_sim" ->
      s"""WITH tok AS (
        |  SELECT doc_id AS id,
        |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |shd AS (
        |  SELECT id, list_transform(
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |        i -> array_to_string(list_slice(toks, i, i + 2), ' '))
        |      ELSE [array_to_string(toks, ' ')] END),
        |    s -> ${duckHash48("s")}) AS sh
        |  FROM tok),
        |sigd AS (
        |  SELECT id, list_transform(range(0, 32),
        |    i -> list_min(list_transform(sh, h -> ${duckPerm("h", "i")})))
        |    AS sig
        |  FROM shd),
        |slots AS (
        |  SELECT id, ss.i AS slot, sig[CAST(ss.i + 1 AS INTEGER)] AS h
        |  FROM sigd, (SELECT unnest(range(0, 32)) AS i) ss),
        |ca AS (SELECT slot, min(h) AS min_h FROM slots
        |       WHERE id % 2 = 0 GROUP BY 1),
        |cb AS (SELECT slot, min(h) AS min_h_b FROM slots
        |       WHERE id % 2 = 1 GROUP BY 1)
        |SELECT count(*) AS n_slots,
        |  CAST(sum(CASE WHEN min_h = min_h_b THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_equal,
        |  CAST(sum(CASE WHEN min_h = min_h_b THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS est_jaccard
        |FROM ca JOIN cb USING (slot)""".stripMargin,
    "x_text_classifier" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS DOUBLE) AS toks,
        |    (length(p)-length(replace(p,' the ','')))/5
        |      + (length(p)-length(replace(p,' and ','')))/5
        |      + (length(p)-length(replace(p,' of ','')))/4
        |      + (length(p)-length(replace(p,' to ','')))/4
        |      + (length(p)-length(replace(p,' a ','')))/3 AS hits,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g'))
        |        AS DOUBLE) / length(text) ELSE 0.0 END AS alpha,
        |    CASE WHEN length(text) > 0
        |      THEN CAST(length(regexp_replace(text, '[^[:punct:]]', '',
        |        'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS punct,
        |    CASE WHEN len(ws) > 0
        |      THEN CAST(list_max(list_transform(list_distinct(ws),
        |        w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE)
        |        / len(ws) ELSE 0.0 END AS twf
        |  FROM (SELECT doc_id, text, ' ' || text || ' ' AS p,
        |          list_filter(regexp_split_to_array(text, '\s+'),
        |            x -> x <> '') AS ws
        |        FROM documents)),
        |s AS (
        |  SELECT doc_id,
        |    -1.0 + least(toks / 100.0, 1.0) * 1.5 + alpha * 1.0
        |      + (hits / greatest(toks, 1.0)) * 4.0
        |      - twf * 3.0 - punct * 2.0 AS score
        |  FROM f)
        |SELECT doc_id, round(score, 6) AS score, score >= 0.9 AS label
        |FROM s ORDER BY doc_id""".stripMargin,
    "x_stream_anomaly_trailing" ->
      """WITH hourly AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |    event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT window_start, event_type, cnt,
        |    CAST(count(cnt) OVER w AS DOUBLE) AS n,
        |    CAST(sum(cnt) OVER w AS DOUBLE) AS s1,
        |    CAST(sum(cnt * cnt) OVER w AS DOUBLE) AS s2
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY window_start
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT window_start, event_type, cnt, round(z, 6) AS z FROM (
        |  SELECT window_start, event_type, cnt,
        |    (cnt - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS z
        |  FROM t WHERE n > 1 AND s2 - s1 * s1 / n > 0)
        |WHERE abs(z) >= 2.5
        |ORDER BY window_start, event_type""".stripMargin,
    // re-learns the 16 merges from scratch, then re-derives the greedy
    // segmentation orbit over the learned pieces — the whole learn →
    // apply arc recomputed independently
    "x_text_bpe" ->
      s"""WITH RECURSIVE ${bpeLearnCtes(16, 2L)},
        |${bpeSegCtes("SELECT DISTINCT merged AS v FROM learned")}
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(bcnt.n_pieces) AS BIGINT) AS n_bpe_tokens
        |FROM btok JOIN bcnt USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_text_bpe_learn" ->
      s"""WITH RECURSIVE ${bpeLearnCtes(16, 2L)}
        |SELECT merge_rank, lhs, rhs, merged, cnt FROM learned
        |ORDER BY merge_rank""".stripMargin,
    // packs on the REAL BPE token counts (bcnt join), mirroring the
    // re-based Spark row
    "x_sample_pack" ->
      s"""WITH RECURSIVE $bpeCntCtes,
        |tk AS (
        |  SELECT doc_id,
        |    CAST(sum(bcnt.n_pieces) AS BIGINT) AS n_tokens,
        |    ${duckHash48("('pack1' || CAST(doc_id AS VARCHAR))")} % 8
        |      AS shard,
        |    ${duckHash48("('pack1' || CAST(doc_id AS VARCHAR))")}
        |      / 281474976710656.0 AS u
        |  FROM btok JOIN bcnt USING (w)
        |  GROUP BY doc_id),
        |c AS (
        |  SELECT shard, doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (PARTITION BY shard
        |      ORDER BY u, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum
        |  FROM tk),
        |b AS (
        |  SELECT shard, CAST(floor(cum / 2000.0) AS BIGINT) AS bin,
        |    doc_id, n_tokens
        |  FROM c),
        |per_bin AS (
        |  SELECT shard, bin, count(*) AS n_docs,
        |    sum(n_tokens) AS bin_tokens
        |  FROM b GROUP BY 1, 2)
        |SELECT shard, count(*) AS n_bins,
        |  CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs
        |FROM per_bin GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_dedup_source_matrix" ->
      s"""WITH tok AS (
        |  SELECT source,
        |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |shd AS (
        |  SELECT source, list_transform(
        |    list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |        i -> array_to_string(list_slice(toks, i, i + 2), ' '))
        |      ELSE [array_to_string(toks, ' ')] END),
        |    s -> ${duckHash48("s")}) AS sh
        |  FROM tok),
        |flat AS (SELECT source, unnest(sh) AS h FROM shd),
        |sig AS (
        |  SELECT source, sl.slot AS slot,
        |    min(${duckPerm("h", "sl.slot")}) AS min_h
        |  FROM flat, (SELECT unnest(range(0, 32)) AS slot) sl
        |  GROUP BY source, sl.slot),
        |pairs AS (
        |  SELECT a.source AS grp_a, b.source AS grp_b,
        |    CASE WHEN a.min_h = b.min_h THEN 1 ELSE 0 END AS eq
        |  FROM sig a JOIN sig b
        |    ON a.slot = b.slot AND a.source < b.source)
        |SELECT grp_a, grp_b, count(*) AS n_slots,
        |  CAST(sum(eq) AS BIGINT) AS n_equal,
        |  CAST(sum(eq) AS DOUBLE) / count(*) AS est_jaccard
        |FROM pairs GROUP BY grp_a, grp_b
        |ORDER BY grp_a, grp_b""".stripMargin,
    "x_dedup_incremental" ->
      s"""WITH $duckMinhashIncrementalCtes
        |SELECT new_id, corpus_id, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY new_id, corpus_id""".stripMargin,
    // tombstone deletion: the incremental answer minus every deleted
    // corpus id's pairs — per-document banding is independent, so
    // removal touches nothing else
    "x_dedup_index_delete" ->
      s"""WITH $duckMinhashIncrementalCtes
        |SELECT new_id, corpus_id, jaccard FROM j
        |WHERE jaccard >= 0.5 AND corpus_id % 3 <> 0
        |ORDER BY new_id, corpus_id""".stripMargin,
    // from-scratch rebuild over base ∪ appended delta — the answer the
    // APPENDED bucketed index must serve byte-for-byte
    "x_dedup_index_append" ->
      s"""WITH ${duckMinhashAppendCtes(1000000L, 1000000000000L)}
        |SELECT new_id, corpus_id, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY new_id, corpus_id""".stripMargin,
    // brute-force edit-distance ground truth: length-filtered
    // all-pairs levenshtein (the quadratic plan the Spark side exists
    // to avoid — affordable here because the row restricts to
    // n_chars <= 250)
    "x_dedup_editdist" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE n_chars <= 250),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |        levenshtein(a.text, b.text) AS dist
        |      FROM d a JOIN d b ON a.doc_id < b.doc_id
        |        AND abs(length(a.text) - length(b.text)) <= 4)
        |SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist FROM p
        |WHERE dist <= 4 ORDER BY id_a, id_b""".stripMargin,
    // brute-force batch×corpus levenshtein from the same deterministic
    // one-char mutation — the answer the persisted PassJoin index must
    // serve
    "x_dedup_editdist_served" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE n_chars <= 250),
        |batch AS (SELECT doc_id + 7000000 AS new_id,
        |    substr(text, 1, 9) || 'X' || substr(text, 11) AS s FROM d),
        |p AS (SELECT b.new_id, c.doc_id AS corpus_id,
        |        levenshtein(b.s, c.text) AS dist
        |      FROM batch b JOIN d c
        |        ON abs(length(b.s) - length(c.text)) <= 4)
        |SELECT new_id, corpus_id, CAST(dist AS BIGINT) AS dist FROM p
        |WHERE dist <= 4 ORDER BY new_id, corpus_id""".stripMargin,
    // tombstone deletion for the edit index: the served answer minus
    // every deleted corpus id's pairs
    "x_dedup_editdist_delete" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE n_chars <= 250),
        |batch AS (SELECT doc_id + 7000000 AS new_id,
        |    substr(text, 1, 9) || 'X' || substr(text, 11) AS s FROM d),
        |p AS (SELECT b.new_id, c.doc_id AS corpus_id,
        |        levenshtein(b.s, c.text) AS dist
        |      FROM batch b JOIN d c
        |        ON abs(length(b.s) - length(c.text)) <= 4
        |        AND c.doc_id % 3 <> 0)
        |SELECT new_id, corpus_id, CAST(dist AS BIGINT) AS dist FROM p
        |WHERE dist <= 4 ORDER BY new_id, corpus_id""".stripMargin,
    // typo-chain clusters: brute-force d<=2 pairs (endpoints at
    // distance 4 deliberately do NOT pair) + recursive min-label
    // fixpoint — clusters must form transitively via the middle
    // variant
    "x_dedup_editdist_clusters" ->
      """WITH RECURSIVE d0 AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE n_chars <= 250 AND doc_id % 4 = 1),
        |m2 AS (SELECT doc_id,
        |    substr(text, 1, 19) || 'X' || substr(text, 21) AS text
        |  FROM (SELECT doc_id,
        |      substr(text, 1, 9) || 'X' || substr(text, 11) AS text
        |    FROM d0)),
        |m4 AS (SELECT doc_id,
        |    substr(text, 1, 39) || 'X' || substr(text, 41) AS text
        |  FROM (SELECT doc_id,
        |      substr(text, 1, 29) || 'X' || substr(text, 31) AS text
        |    FROM m2)),
        |corpus AS (
        |  SELECT doc_id, text FROM d0
        |  UNION ALL SELECT doc_id + 7000000, text FROM m2
        |  UNION ALL SELECT doc_id + 14000000, text FROM m4),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |      FROM corpus a JOIN corpus b
        |        ON a.doc_id < b.doc_id
        |        AND abs(length(a.text) - length(b.text)) <= 2
        |      WHERE levenshtein(a.text, b.text) <= 2),
        |nodes AS (SELECT id_a AS id FROM p UNION SELECT id_b FROM p),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.dst AS id, reach.r FROM reach JOIN e ON e.src = reach.id)
        |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
        |ORDER BY id""".stripMargin,
    // batch × (base ∪ appended delta) from scratch — the answer the
    // APPENDED edit index must serve: every probe finds its base
    // source (dist 1) AND the appended position-20 variant (dist 2)
    "x_dedup_editdist_append" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE n_chars <= 250),
        |corpus AS (
        |  SELECT doc_id, text FROM d
        |  UNION ALL
        |  SELECT doc_id + 8000000,
        |    substr(text, 1, 19) || 'X' || substr(text, 21) FROM d),
        |batch AS (SELECT doc_id + 7000000 AS new_id,
        |    substr(text, 1, 9) || 'X' || substr(text, 11) AS s FROM d),
        |p AS (SELECT b.new_id, c.doc_id AS corpus_id,
        |        levenshtein(b.s, c.text) AS dist
        |      FROM batch b JOIN corpus c
        |        ON abs(length(b.s) - length(c.text)) <= 4)
        |SELECT new_id, corpus_id, CAST(dist AS BIGINT) AS dist FROM p
        |WHERE dist <= 4 ORDER BY new_id, corpus_id""".stripMargin,
    // source-format round-trips: the PARQUET-source cells the
    // JSONL/ORC encode→decode cycle must reproduce exactly (free-text
    // length included — the escaping-sensitive column)
    "x_source_jsonl" ->
      """SELECT doc_id, length(text) AS text_len, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_source_orc" ->
      """SELECT doc_id, length(text) AS text_len, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the partition-pruned read must lose no rows vs the
    // unpartitioned source
    "x_layout_partition_prune" ->
      """SELECT user_id, count(*) AS n_events,
        |  min(event_id) AS min_event_id
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // from-scratch aggregate over first-load ∪ late batch — the answer
    // the dynamically-overwritten partitioned table must serve
    "x_layout_partition_overwrite" ->
      """WITH allr AS (
        |  SELECT user_id, event_id, event_type FROM events
        |  WHERE event_id % 3 <> 0
        |  UNION ALL
        |  SELECT user_id, event_id, event_type FROM events
        |  WHERE event_id % 3 = 0 AND event_type IN ('click', 'view'))
        |SELECT event_type, user_id, count(*) AS n,
        |  min(event_id) AS min_id
        |FROM allr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // schema evolution: old half has no quality column (must surface
    // as NULL under mergeSchema — counted absent, not zero)
    "x_source_evolution" ->
      """WITH u AS (
        |  SELECT doc_id, lang, NULL AS quality FROM documents
        |  WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars % 100 FROM documents
        |  WHERE doc_id % 2 = 1)
        |SELECT lang, count(*) AS n, count(quality) AS n_with_quality,
        |  CAST(sum(quality) AS BIGINT) AS sum_quality
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    // tombstone deletion: history counts recomputed WITHOUT the
    // deleted keys — a failed deletion reports their counts and
    // misses this hash
    "x_unique_index_delete" ->
      """WITH batch AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 6 = 0
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 6 = 0
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 1),
        |b AS (SELECT o_orderkey, count(*) AS n_new FROM batch
        |  WHERE o_orderkey IS NOT NULL GROUP BY 1),
        |h AS (SELECT o_orderkey, count(*) AS n_existing FROM orders
        |  WHERE o_orderkey IS NOT NULL AND o_orderkey % 6 <> 0
        |  GROUP BY 1)
        |SELECT b.o_orderkey, b.n_new,
        |  coalesce(h.n_existing, 0) AS n_existing
        |FROM b LEFT JOIN h ON b.o_orderkey = h.o_orderkey
        |WHERE b.n_new + coalesce(h.n_existing, 0) > 1
        |ORDER BY 1""".stripMargin,
    // late-arriving dimension: orphans against dim0 ∪ late — the
    // %20 = 0 half of the dropped customers arrived late and must
    // RESOLVE their facts; only the %10 = 0, %20 ≠ 0 half stays orphan
    "x_fk_index_append" ->
      """SELECT o.o_custkey, count(*) AS cnt FROM orders o
        |LEFT JOIN (
        |  SELECT DISTINCT c_custkey FROM customer
        |  WHERE c_custkey % 10 <> 0 OR c_custkey % 20 = 0) c
        |ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // key-index serve: every count recomputed from scratch — batch
    // built from the same deterministic filters as the Spark side
    // (every-5th re-ingest, the %15 subset twice, fresh offset keys
    // twice; singleton fresh %7=3 keys must filter OUT)
    "x_unique_incremental" ->
      """WITH batch AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 15 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000 FROM orders
        |  WHERE o_orderkey % 7 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000 FROM orders
        |  WHERE o_orderkey % 7 = 3),
        |b AS (SELECT o_orderkey, count(*) AS n_new FROM batch
        |  WHERE o_orderkey IS NOT NULL GROUP BY 1),
        |h AS (SELECT o_orderkey, count(*) AS n_existing FROM orders
        |  WHERE o_orderkey IS NOT NULL GROUP BY 1)
        |SELECT b.o_orderkey, b.n_new,
        |  coalesce(h.n_existing, 0) AS n_existing
        |FROM b LEFT JOIN h ON b.o_orderkey = h.o_orderkey
        |WHERE b.n_new + coalesce(h.n_existing, 0) > 1
        |ORDER BY 1""".stripMargin,
    // from-scratch recompute over history ∪ admitted batch1 — the
    // answer the appended-then-merge-compacted key index must serve
    "x_unique_index_append" ->
      """WITH hist AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL
        |  UNION ALL
        |  SELECT o_orderkey + 2000000000 FROM orders
        |  WHERE o_orderkey % 3 = 0),
        |batch AS (
        |  SELECT o_orderkey + 2000000000 AS o_orderkey FROM orders
        |  WHERE o_orderkey % 6 = 0
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 1),
        |b AS (SELECT o_orderkey, count(*) AS n_new FROM batch
        |  WHERE o_orderkey IS NOT NULL GROUP BY 1),
        |h AS (SELECT o_orderkey, count(*) AS n_existing FROM hist
        |  GROUP BY 1)
        |SELECT b.o_orderkey, b.n_new,
        |  coalesce(h.n_existing, 0) AS n_existing
        |FROM b LEFT JOIN h ON b.o_orderkey = h.o_orderkey
        |WHERE b.n_new + coalesce(h.n_existing, 0) > 1
        |ORDER BY 1""".stripMargin,
    // batchless recompute of the streamed check-then-admit uniqueness:
    // total counts over history ∪ stream for every key the stream
    // touched — micro-batch boundaries must be invisible
    "x_stream_unique_index" ->
      """WITH stream AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 1
        |  UNION ALL
        |  SELECT o_orderkey + 3000000000 FROM orders
        |  WHERE o_orderkey % 6 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 3000000000 FROM orders
        |  WHERE o_orderkey % 6 = 0),
        |s AS (SELECT o_orderkey, count(*) AS c FROM stream
        |  WHERE o_orderkey IS NOT NULL GROUP BY 1),
        |h AS (SELECT o_orderkey, count(*) AS c FROM orders
        |  WHERE o_orderkey IS NOT NULL GROUP BY 1)
        |SELECT s.o_orderkey, s.c + coalesce(h.c, 0) AS n_total
        |FROM s LEFT JOIN h ON s.o_orderkey = h.o_orderkey
        |WHERE s.c + coalesce(h.c, 0) > 1
        |ORDER BY 1""".stripMargin,
    // batchless recompute over the TWO-RUN checkpointed stream: a
    // re-processed (already-admitted) file A would inflate its keys'
    // cumulative counts and fail this hash
    "x_stream_unique_resume" ->
      """WITH stream AS (
        |  SELECT o_orderkey + 4000000000 AS o_orderkey FROM orders
        |  WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 4000000000 FROM orders
        |  WHERE o_orderkey % 8 = 0
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 3),
        |s AS (SELECT o_orderkey, count(*) AS c FROM stream
        |  WHERE o_orderkey IS NOT NULL GROUP BY 1),
        |h AS (SELECT o_orderkey, count(*) AS c FROM orders
        |  WHERE o_orderkey IS NOT NULL GROUP BY 1)
        |SELECT s.o_orderkey, s.c + coalesce(h.c, 0) AS n_total
        |FROM s LEFT JOIN h ON s.o_orderkey = h.o_orderkey
        |WHERE s.c + coalesce(h.c, 0) > 1
        |ORDER BY 1""".stripMargin,
    "x_sample_exact_n" ->
      s"""SELECT doc_id, source FROM (
        |  SELECT doc_id, source FROM documents
        |  ORDER BY ${duckHash48("('ev1' || CAST(doc_id AS VARCHAR))")},
        |    doc_id
        |  LIMIT 100)
        |ORDER BY doc_id""".stripMargin,
    "x_stream_join" ->
      """SELECT user_id, count(*) AS n_pairs,
        |  min(epoch_us(c_ts) - epoch_us(v_ts)) AS min_lag_us,
        |  max(epoch_us(c_ts) - epoch_us(v_ts)) AS max_lag_us
        |FROM (
        |  SELECT v.user_id AS user_id, v.ts AS v_ts, c.ts AS c_ts
        |  FROM (SELECT user_id, ts FROM events
        |        WHERE event_type = 'view') v
        |  JOIN (SELECT user_id, ts FROM events
        |        WHERE event_type = 'click') c
        |    ON v.user_id = c.user_id
        |   AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '10 minutes')
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "x_dedup_containment" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, toks,
        |    list_slice(toks, 1, CAST(floor(len(toks) * 0.5) AS INTEGER))
        |      AS ttoks
        |  FROM tok WHERE len(toks) >= 10),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |      AS sa,
        |    CASE WHEN len(ttoks) >= 3
        |      THEN list_distinct(list_transform(range(1, len(ttoks) - 1),
        |        i -> array_to_string(list_slice(ttoks, i, i + 2), ' ')))
        |      ELSE [array_to_string(ttoks, ' ')] END AS sb
        |  FROM base)
        |SELECT doc_id,
        |  CASE WHEN len(sb) > 0
        |    THEN CAST(len(list_intersect(sb, sa)) AS DOUBLE) / len(sb)
        |    ELSE 0.0 END AS containment,
        |  CASE WHEN len(list_distinct(list_concat(sa, sb))) > 0
        |    THEN CAST(len(list_intersect(sa, sb)) AS DOUBLE)
        |      / len(list_distinct(list_concat(sa, sb)))
        |    ELSE 0.0 END AS jaccard
        |FROM sh ORDER BY doc_id""".stripMargin,
    "x_profile_group_quantiles" -> {
      val blocks = for {
        c <- Seq("l_quantity", "l_discount")
        (p, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex
      } yield
        s"  SELECT l_returnflag, '$c' AS column_name," +
          s" CAST($i AS INTEGER) AS prob_idx," +
          s"\n    quantile_cont(CAST($c AS DOUBLE), $p) AS quantile" +
          s"\n  FROM lineitem GROUP BY l_returnflag"
      blocks.mkString("SELECT * FROM (\n", "\n  UNION ALL\n",
        ")\nORDER BY l_returnflag, column_name, prob_idx")
    },
    "x_dedup_spans" ->
      """WITH docs2 AS (
        |  SELECT doc_id,
        |    text || chr(10)
        |      || 'all rights reserved contact us for more information'
        |      || chr(10)
        |      || 'subscribe to our newsletter for weekly updates' AS text
        |  FROM documents WHERE doc_id < 500
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id < 30),
        |sp AS (
        |  SELECT doc_id,
        |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos,
        |    unnest(string_split(text, chr(10))) AS span
        |  FROM docs2),
        |ranked AS (
        |  SELECT doc_id, pos, span,
        |    row_number() OVER (PARTITION BY md5(span)
        |                       ORDER BY doc_id, pos) AS rn
        |  FROM sp)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(length(string_agg(span, chr(10) ORDER BY pos)) AS BIGINT)
        |    AS text_len
        |FROM ranked WHERE rn = 1
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // brute-force twin of the seed-and-extend engine: ALL gram-sharing
    // diagonals (no anchor sampling — exactness of the sampling is the
    // thing under test), chained with a per-(pair, diag) row_number
    "x_dedup_substring" ->
      s"""WITH $substringCtes
        |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_runs,
        |  CAST(max(run_len) AS BIGINT) AS max_run,
        |  CAST(sum(run_len) AS BIGINT) AS overlap_tokens
        |FROM runs GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,
    // train grams × eval grams brute force, chained per (pair, diag)
    "x_decontaminate_substring" ->
      """WITH base AS (
        |  SELECT doc_id AS id,
        |    list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |ev AS (
        |  SELECT id + 2000000 AS id,
        |    list_slice(toks, 1,
        |      CAST(floor(len(toks) * 0.8) AS INTEGER)) AS toks
        |  FROM base WHERE id % 50 = 0),
        |gt AS (SELECT id, i AS pos,
        |        array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |      FROM base,
        |        unnest(range(1, greatest(len(toks) - 7, 0) + 1)) t(i)),
        |ge AS (SELECT id, i AS pos,
        |        array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |      FROM ev,
        |        unnest(range(1, greatest(len(toks) - 7, 0) + 1)) t(i)),
        |m AS (SELECT DISTINCT t.id AS train_id, e.id AS eval_id,
        |        t.pos - e.pos AS diag, t.pos AS pos
        |      FROM gt t JOIN ge e ON t.gram = e.gram),
        |r AS (SELECT train_id, eval_id, diag, pos,
        |        pos - row_number() OVER (PARTITION BY train_id, eval_id,
        |          diag ORDER BY pos) AS chain
        |      FROM m),
        |runs AS (SELECT train_id, eval_id, diag, chain,
        |           count(*) + 7 AS run_len
        |         FROM r GROUP BY 1, 2, 3, 4 HAVING count(*) + 7 >= 30)
        |SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n_runs,
        |  CAST(max(run_len) AS BIGINT) AS max_run,
        |  CAST(sum(run_len) AS BIGINT) AS overlap_tokens
        |FROM runs GROUP BY 1, 2 ORDER BY train_id, eval_id""".stripMargin,
    // keep-first apply: run intervals land on the LATER (id_b) side;
    // covered token positions anti-join away; survivors reassemble
    "x_dedup_substring_apply" ->
      s"""WITH $substringCtes,
        |iv AS (SELECT id_b AS id, sa - diag AS s,
        |         sa - diag + run_len - 1 AS e FROM runs),
        |tok AS (SELECT id, len(toks) AS n_total, p,
        |          toks[CAST(p AS INTEGER)] AS t
        |        FROM allt, unnest(range(1, len(toks) + 1)) u(p)),
        |kept AS (SELECT tok.* FROM tok ANTI JOIN iv
        |         ON iv.id = tok.id AND tok.p >= iv.s AND tok.p <= iv.e)
        |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(any_value(n_total) - count(*) AS BIGINT) AS n_removed,
        |  CAST(length(string_agg(t, ' ' ORDER BY p)) AS BIGINT)
        |    AS text_len
        |FROM kept GROUP BY id ORDER BY doc_id""".stripMargin,
    // batch-vs-corpus twin: ALL gram-sharing diagonals between the
    // planted batch and the corpus (no anchor sampling, no index —
    // matching the served row proves both the sampling and the
    // persisted-artifact round-trip)
    "x_dedup_substring_served" ->
      """WITH base AS (
        |  SELECT doc_id AS id,
        |    list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |planted AS (
        |  SELECT a.id + 7000000 AS id,
        |    list_concat(list_slice(a.toks, 7, 41),
        |      list_slice(b.toks, 1, 12)) AS toks
        |  FROM base a JOIN base b ON b.id = a.id + 100 WHERE a.id < 40),
        |gc AS (SELECT id, i AS pos,
        |        array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |      FROM base,
        |        unnest(range(1, greatest(len(toks) - 7, 0) + 1)) t(i)),
        |gn AS (SELECT id, i AS pos,
        |        array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |      FROM planted,
        |        unnest(range(1, greatest(len(toks) - 7, 0) + 1)) t(i)),
        |m AS (SELECT DISTINCT n.id AS new_id, c.id AS corpus_id,
        |        n.pos - c.pos AS diag, n.pos AS pos
        |      FROM gn n JOIN gc c ON n.gram = c.gram),
        |r AS (SELECT new_id, corpus_id, diag, pos,
        |        pos - row_number() OVER (PARTITION BY new_id, corpus_id,
        |          diag ORDER BY pos) AS chain
        |      FROM m),
        |runs AS (SELECT new_id, corpus_id, diag, chain,
        |           count(*) + 7 AS run_len
        |         FROM r GROUP BY 1, 2, 3, 4 HAVING count(*) + 7 >= 30)
        |SELECT new_id, corpus_id, CAST(count(*) AS BIGINT) AS n_runs,
        |  CAST(max(run_len) AS BIGINT) AS max_run,
        |  CAST(sum(run_len) AS BIGINT) AS overlap_tokens
        |FROM runs GROUP BY 1, 2 ORDER BY new_id, corpus_id""".stripMargin,
    // tombstone deletion for the gram index: the served answer minus
    // every deleted corpus id's runs — per-document grams are
    // independent, so removal touches nothing else; a failed exclusion
    // reports the dead ids' runs and misses this hash
    "x_dedup_substring_delete" ->
      """WITH base AS (
        |  SELECT doc_id AS id,
        |    list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |planted AS (
        |  SELECT a.id + 7000000 AS id,
        |    list_concat(list_slice(a.toks, 7, 41),
        |      list_slice(b.toks, 1, 12)) AS toks
        |  FROM base a JOIN base b ON b.id = a.id + 100 WHERE a.id < 40),
        |gc AS (SELECT id, i AS pos,
        |        array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |      FROM base,
        |        unnest(range(1, greatest(len(toks) - 7, 0) + 1)) t(i)),
        |gn AS (SELECT id, i AS pos,
        |        array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |      FROM planted,
        |        unnest(range(1, greatest(len(toks) - 7, 0) + 1)) t(i)),
        |m AS (SELECT DISTINCT n.id AS new_id, c.id AS corpus_id,
        |        n.pos - c.pos AS diag, n.pos AS pos
        |      FROM gn n JOIN gc c ON n.gram = c.gram),
        |r AS (SELECT new_id, corpus_id, diag, pos,
        |        pos - row_number() OVER (PARTITION BY new_id, corpus_id,
        |          diag ORDER BY pos) AS chain
        |      FROM m),
        |runs AS (SELECT new_id, corpus_id, diag, chain,
        |           count(*) + 7 AS run_len
        |         FROM r GROUP BY 1, 2, 3, 4 HAVING count(*) + 7 >= 30)
        |SELECT new_id, corpus_id, CAST(count(*) AS BIGINT) AS n_runs,
        |  CAST(max(run_len) AS BIGINT) AS max_run,
        |  CAST(sum(run_len) AS BIGINT) AS overlap_tokens
        |FROM runs WHERE corpus_id % 3 <> 0
        |GROUP BY 1, 2 ORDER BY new_id, corpus_id""".stripMargin,
    // from-scratch rebuild over base ∪ appended 80%-prefix delta — the
    // answer the APPENDED bucketed gram index must serve byte-for-byte
    // (append(build(base), delta) ≡ build(base ∪ delta))
    "x_dedup_substring_append" ->
      """WITH base AS (
        |  SELECT doc_id AS id,
        |    list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |delta AS (
        |  SELECT id + 8000000 AS id,
        |    list_slice(toks, 1,
        |      CAST(floor(len(toks) * 0.8) AS INTEGER)) AS toks
        |  FROM base WHERE id < 40),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM delta),
        |planted AS (
        |  SELECT a.id + 7000000 AS id,
        |    list_concat(list_slice(a.toks, 7, 41),
        |      list_slice(b.toks, 1, 12)) AS toks
        |  FROM base a JOIN base b ON b.id = a.id + 100 WHERE a.id < 40),
        |gc AS (SELECT id, i AS pos,
        |        array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |      FROM corpus,
        |        unnest(range(1, greatest(len(toks) - 7, 0) + 1)) t(i)),
        |gn AS (SELECT id, i AS pos,
        |        array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |      FROM planted,
        |        unnest(range(1, greatest(len(toks) - 7, 0) + 1)) t(i)),
        |m AS (SELECT DISTINCT n.id AS new_id, c.id AS corpus_id,
        |        n.pos - c.pos AS diag, n.pos AS pos
        |      FROM gn n JOIN gc c ON n.gram = c.gram),
        |r AS (SELECT new_id, corpus_id, diag, pos,
        |        pos - row_number() OVER (PARTITION BY new_id, corpus_id,
        |          diag ORDER BY pos) AS chain
        |      FROM m),
        |runs AS (SELECT new_id, corpus_id, diag, chain,
        |           count(*) + 7 AS run_len
        |         FROM r GROUP BY 1, 2, 3, 4 HAVING count(*) + 7 >= 30)
        |SELECT new_id, corpus_id, CAST(count(*) AS BIGINT) AS n_runs,
        |  CAST(max(run_len) AS BIGINT) AS max_run,
        |  CAST(sum(run_len) AS BIGINT) AS overlap_tokens
        |FROM runs GROUP BY 1, 2 ORDER BY new_id, corpus_id""".stripMargin,
    "x_text_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |vocab AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM vocab)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(sum(tf * ln(CAST(cnt AS DOUBLE) / total)) / sum(tf), 6)
        |    AS avg_logprob
        |FROM tf JOIN vocab USING (term), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_sim_quantized" ->
      """WITH nq AS (
        |  SELECT vec_id AS query_id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings WHERE vec_id < 5),
        |q0 AS (SELECT query_id,
        |         list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS qv
        |       FROM nq WHERE nrm > 0),
        |q1 AS (SELECT query_id, qv,
        |         list_max(list_transform(qv, x -> abs(x))) / 127.0 AS qs
        |       FROM q0),
        |q AS (SELECT query_id, qs,
        |        list_transform(qv, x -> floor(x / qs + 0.5)) AS qa
        |      FROM q1),
        |nc AS (
        |  SELECT vec_id AS neighbor_id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |c0 AS (SELECT neighbor_id,
        |         list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS cv
        |       FROM nc WHERE nrm > 0),
        |c1 AS (SELECT neighbor_id, cv,
        |         list_max(list_transform(cv, x -> abs(x))) / 127.0 AS cs
        |       FROM c0),
        |c AS (SELECT neighbor_id, cs,
        |        list_transform(cv, x -> floor(x / cs + 0.5)) AS ca
        |      FROM c1),
        |s AS (
        |  SELECT query_id, neighbor_id,
        |    list_sum(list_transform(range(1, len(qa) + 1),
        |      i -> qa[i] * ca[i])) * qs * cs AS sim
        |  FROM q, c WHERE query_id <> neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // int8 tombstone deletion: the quantized top-10 recomputed with
    // the deleted ids excluded from the CORPUS side before ranking
    "x_sim_quantized_delete" ->
      """WITH nq AS (
        |  SELECT vec_id AS query_id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings WHERE vec_id < 5),
        |q0 AS (SELECT query_id,
        |         list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS qv
        |       FROM nq WHERE nrm > 0),
        |q1 AS (SELECT query_id, qv,
        |         list_max(list_transform(qv, x -> abs(x))) / 127.0 AS qs
        |       FROM q0),
        |q AS (SELECT query_id, qs,
        |        list_transform(qv, x -> floor(x / qs + 0.5)) AS qa
        |      FROM q1),
        |nc AS (
        |  SELECT vec_id AS neighbor_id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings WHERE vec_id % 7 <> 3),
        |c0 AS (SELECT neighbor_id,
        |         list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS cv
        |       FROM nc WHERE nrm > 0),
        |c1 AS (SELECT neighbor_id, cv,
        |         list_max(list_transform(cv, x -> abs(x))) / 127.0 AS cs
        |       FROM c0),
        |c AS (SELECT neighbor_id, cs,
        |        list_transform(cv, x -> floor(x / cs + 0.5)) AS ca
        |      FROM c1),
        |s AS (
        |  SELECT query_id, neighbor_id,
        |    list_sum(list_transform(range(1, len(qa) + 1),
        |      i -> qa[i] * ca[i])) * qs * cs AS sim
        |  FROM q, c WHERE query_id <> neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // ranking-eval: re-derive the cosine run, the label-graded
    // judgments, and every snapped DCG/RR term (mirrored operand
    // order: (gain / log2) * 1e12 then round)
    "x_eval_ranking" ->
      """WITH nq AS (
        |  SELECT vec_id AS query_id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings WHERE vec_id < 5),
        |q AS (SELECT query_id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS qv
        |      FROM nq WHERE nrm > 0),
        |nc AS (
        |  SELECT vec_id AS neighbor_id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |c AS (SELECT neighbor_id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS cv
        |      FROM nc WHERE nrm > 0),
        |s AS (
        |  SELECT query_id, neighbor_id,
        |    list_sum(list_transform(range(1, len(qv) + 1),
        |      i -> qv[i] * cv[i])) AS sim
        |  FROM q, c WHERE query_id <> neighbor_id),
        |r0 AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM s),
        |run AS (SELECT query_id, neighbor_id AS doc_id, rank
        |        FROM r0 WHERE rank <= 10),
        |ql AS (SELECT vec_id AS query_id, label FROM embeddings
        |       WHERE vec_id < 5),
        |qr AS (SELECT ql.query_id, e.vec_id AS doc_id,
        |    CASE WHEN e.vec_id % 3 = 0 THEN 2 ELSE 1 END AS rel
        |  FROM embeddings e JOIN ql
        |    ON e.label = ql.label AND e.vec_id <> ql.query_id),
        |nrel AS (SELECT query_id, count(*) AS n_rel FROM qr GROUP BY 1),
        |ip AS (SELECT query_id, rel,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY rel DESC, doc_id) AS p
        |  FROM qr),
        |idcg AS (SELECT query_id,
        |    sum(CAST(round(((pow(2, rel) - 1.0) / log2(p + 1.0))
        |      * 1e12) AS BIGINT)) AS idcg12
        |  FROM ip WHERE p <= 10 GROUP BY 1),
        |hits AS (SELECT run.query_id, run.rank, qr.rel
        |  FROM run JOIN qr ON run.query_id = qr.query_id
        |    AND run.doc_id = qr.doc_id),
        |ph AS (SELECT query_id, count(*) AS n_hits,
        |    max(CAST(round((1.0 / rank) * 1e12) AS BIGINT)) AS rr12,
        |    sum(CAST(round(((pow(2, rel) - 1.0) / log2(rank + 1.0))
        |      * 1e12) AS BIGINT)) AS dcg12
        |  FROM hits GROUP BY 1),
        |nret AS (SELECT query_id, count(*) AS n_ret FROM run GROUP BY 1)
        |SELECT nret.query_id,
        |  coalesce(nrel.n_rel, 0) AS n_rel, nret.n_ret,
        |  coalesce(ph.n_hits, 0) AS n_hits,
        |  round(CAST(coalesce(ph.n_hits, 0) AS DOUBLE) / 10, 12)
        |    AS p_at_k,
        |  CASE WHEN nrel.n_rel > 0 THEN
        |    round(CAST(coalesce(ph.n_hits, 0) AS DOUBLE)
        |      / CAST(nrel.n_rel AS DOUBLE), 12) END AS recall_at_k,
        |  round(CAST(coalesce(ph.rr12, 0) AS DOUBLE) / 1e12, 12) AS rr,
        |  CASE WHEN idcg.idcg12 > 0 THEN
        |    round(CAST(coalesce(ph.dcg12, 0) AS DOUBLE)
        |      / CAST(idcg.idcg12 AS DOUBLE), 12) END AS ndcg
        |FROM nret
        |LEFT JOIN nrel ON nrel.query_id = nret.query_id
        |LEFT JOIN idcg ON idcg.query_id = nret.query_id
        |LEFT JOIN ph ON ph.query_id = nret.query_id
        |ORDER BY nret.query_id""".stripMargin,
    // hybrid RRF fusion: both legs re-derived (float cosine + int8
    // quantized), fused 1/(60 + rank) contributions, re-ranked
    "x_sim_rrf" ->
      s"""WITH $cosineRunLegsCte,
        |f AS (SELECT coalesce(ra.query_id, rb.query_id) AS query_id,
        |    coalesce(ra.doc_id, rb.doc_id) AS doc_id,
        |    coalesce(1.0 / (ra.rank + 60), 0.0)
        |      + coalesce(1.0 / (rb.rank + 60), 0.0) AS s
        |  FROM ra FULL OUTER JOIN rb
        |    ON ra.query_id = rb.query_id AND ra.doc_id = rb.doc_id),
        |fr AS (SELECT query_id, doc_id, s,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY s DESC, doc_id) AS rank
        |  FROM f)
        |SELECT query_id, doc_id, round(s, 12) AS rrf_score,
        |  CAST(rank AS BIGINT) AS rank
        |FROM fr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // truncated RBO over the same two runs: per common doc the depth
    // sum collapses to W(max(rank_a, rank_b)) from the exact integer
    // weight table SHARED with the Spark side (rboWeights — the
    // constants are operator contract, like PQ codebooks); anchored
    // on ra ∪ rb query ids
    "x_eval_rbo" -> {
      val (w, d) = graft.ext.Experiment.rboWeights(10, 9L, 10L)
      val vals = w.zipWithIndex
        .map { case (wm, i) => s"(${i + 1}, ${wm})" }.mkString(", ")
      s"""WITH $cosineRunLegsCte,
        |mm AS (SELECT ra.query_id AS query_id,
        |    greatest(ra.rank, rb.rank) AS m
        |  FROM ra JOIN rb
        |    ON ra.query_id = rb.query_id AND ra.doc_id = rb.doc_id),
        |wt(m, w) AS (VALUES $vals),
        |agg AS (SELECT query_id, count(*) AS n_common, sum(w) AS wsum
        |  FROM mm JOIN wt ON mm.m = wt.m GROUP BY 1),
        |qs AS (SELECT DISTINCT query_id FROM ra
        |  UNION SELECT DISTINCT query_id FROM rb)
        |SELECT qs.query_id,
        |  CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
        |  round(CAST(coalesce(wsum, 0) AS DOUBLE) / ${d}, 12) AS rbo_min
        |FROM qs LEFT JOIN agg ON qs.query_id = agg.query_id
        |ORDER BY qs.query_id""".stripMargin
    },
    // unweighted order agreement over the same two runs: inversions
    // counted by pair self-join; (C − D) = P − 2D, P = n(n−1)/2
    "x_eval_kendall" ->
      s"""WITH $cosineRunLegsCte,
        |m AS (SELECT ra.query_id AS query_id, ra.rank AS rka,
        |    rb.rank AS rkb
        |  FROM ra JOIN rb
        |    ON ra.query_id = rb.query_id AND ra.doc_id = rb.doc_id),
        |agg AS (SELECT query_id, count(*) AS n_common
        |  FROM m GROUP BY 1),
        |dd AS (SELECT x.query_id AS query_id, count(*) AS d
        |  FROM m x JOIN m y ON x.query_id = y.query_id
        |    AND x.rka < y.rka AND x.rkb > y.rkb
        |  GROUP BY 1),
        |qs AS (SELECT DISTINCT query_id FROM ra
        |  UNION SELECT DISTINCT query_id FROM rb)
        |SELECT qs.query_id,
        |  CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
        |  CAST(coalesce(n_common, 0) * (coalesce(n_common, 0) - 1) // 2
        |    - coalesce(d, 0) AS BIGINT) AS concordant,
        |  CAST(coalesce(d, 0) AS BIGINT) AS discordant,
        |  CASE WHEN coalesce(n_common, 0) >= 2 THEN
        |    round(CAST(n_common * (n_common - 1) // 2
        |        - 2 * coalesce(d, 0) AS DOUBLE)
        |      / (n_common * (n_common - 1) // 2), 12) END AS tau
        |FROM qs LEFT JOIN agg ON qs.query_id = agg.query_id
        |LEFT JOIN dd ON qs.query_id = dd.query_id
        |ORDER BY qs.query_id""".stripMargin,
    "x_text_bigram_lp" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
        |    unnest(list_slice(toks, 2, len(toks))) AS w2
        |  FROM tok WHERE len(toks) >= 2),
        |tf AS (SELECT doc_id, w1, w2, count(*) AS tf
        |       FROM bg GROUP BY 1, 2, 3),
        |c2 AS (SELECT w1, w2, count(*) AS cnt2 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(cnt2) AS cnt1 FROM c2 GROUP BY 1)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |  round(sum(tf * ln(CAST(cnt2 AS DOUBLE) / cnt1)) / sum(tf), 6)
        |    AS avg_logprob
        |FROM tf JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_profile_keyskew" ->
      """SELECT user_id, cnt, CAST(cnt AS DOUBLE) / total AS share
        |FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |     (SELECT count(*) AS total FROM events)
        |ORDER BY cnt DESC, user_id LIMIT 20""".stripMargin,
    "x_sample_weighted" ->
      s"""SELECT doc_id, source FROM (
        |  SELECT doc_id, source
        |  FROM (SELECT doc_id, source,
        |      ln((${duckHash48("('wx1' || CAST(doc_id AS VARCHAR))")}
        |          + 0.5) / 281474976710656.0) / n_chars AS k
        |    FROM documents WHERE n_chars > 0)
        |  ORDER BY k DESC, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,
    "x_sample_pack_seq" ->
      s"""WITH tk AS (
        |  SELECT doc_id, text,
        |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
        |      x -> x <> '')) AS BIGINT) AS n_tokens,
        |    ${duckHash48("('pack1' || CAST(doc_id AS VARCHAR))")} % 8
        |      AS shard,
        |    ${duckHash48("('pack1' || CAST(doc_id AS VARCHAR))")}
        |      / 281474976710656.0 AS u
        |  FROM documents),
        |c AS (
        |  SELECT shard, doc_id, text, n_tokens, u,
        |    COALESCE(sum(n_tokens) OVER (PARTITION BY shard
        |      ORDER BY u, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum
        |  FROM tk)
        |SELECT shard, CAST(floor(cum / 2000.0) AS BIGINT) AS bin,
        |  md5(string_agg(text, chr(10) ORDER BY u, doc_id))
        |    AS content_hash,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_weight
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_stream_anomaly_robust" ->
      """WITH hourly AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |    event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type,
        |    quantile_cont(CAST(cnt AS DOUBLE), 0.5) AS med
        |  FROM hourly GROUP BY 1),
        |dev AS (
        |  SELECT h.window_start, h.event_type, h.cnt,
        |    CAST(h.cnt AS DOUBLE) - m.med AS d
        |  FROM hourly h JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(abs(d), 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT window_start, event_type, cnt, round(d / mad, 6) AS z_mad
        |FROM dev JOIN mad USING (event_type)
        |WHERE mad > 0 AND abs(d) >= 3.0 * mad
        |ORDER BY window_start, event_type""".stripMargin,
    "x_profile_vectors" ->
      """WITH v AS (
        |  SELECT unnest(range(1, len(embedding) + 1)) AS i,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE)))
        |      AS v
        |  FROM embeddings)
        |SELECT CAST(i - 1 AS INTEGER) AS dim, count(*) AS n,
        |  CAST(sum(CASE WHEN isnan(v) OR v IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_bad,
        |  round(avg(v) FILTER (WHERE NOT isnan(v)), 6) AS mean,
        |  min(v) FILTER (WHERE NOT isnan(v)) AS min_value,
        |  max(v) FILTER (WHERE NOT isnan(v)) AS max_value
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_sim_knn_graph" ->
      s"""$duckKnnGraphCore
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "x_sim_graph_degree" ->
      s"""$duckKnnGraphCore,
        |deg AS (SELECT neighbor_id, count(*) AS in_degree
        |        FROM r WHERE rank <= 3 GROUP BY neighbor_id)
        |SELECT in_degree, count(*) AS n_vectors
        |FROM deg GROUP BY 1 ORDER BY in_degree""".stripMargin,
    "x_sim_lsh_probe" ->
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
        |pr AS (
        |  SELECT id AS query_id, nvec AS nvec_a,
        |    unnest([bucket, xor(bucket, 1), xor(bucket, 2),
        |      xor(bucket, 4), xor(bucket, 8), xor(bucket, 16),
        |      xor(bucket, 32), xor(bucket, 64), xor(bucket, 128)])
        |      AS probe
        |  FROM bkt),
        |s AS (
        |  SELECT pr.query_id, b.id AS neighbor_id,
        |    list_sum(list_transform(range(1, len(pr.nvec_a) + 1),
        |      i -> pr.nvec_a[i] * b.nvec[i])) AS sim
        |  FROM pr JOIN bkt b
        |    ON pr.probe = b.bucket AND pr.query_id <> b.id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "x_sample_budget" ->
      s"""SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    COALESCE(CAST(sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY ${duckHash48("('tb1' || CAST(doc_id AS VARCHAR))")}
        |        / 281474976710656.0, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS DOUBLE), 0.0) AS cum
        |  FROM documents)
        |WHERE cum < CASE source WHEN 'src0' THEN 3000.0
        |  WHEN 'src1' THEN 1500.0 WHEN 'src2' THEN 800.0 END
        |ORDER BY doc_id""".stripMargin,
    "x_sim_knn_multi" ->
      s"""WITH v0 AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |v AS (SELECT id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS nvec
        |      FROM v0 WHERE nrm > 0),
        |p0 AS (SELECT ${duckPlanes(8, 64)} AS m),
        |p1 AS (SELECT ${duckPlanes(8, 64, 8)} AS m),
        |b0 AS (
        |  SELECT id, nvec, 0 AS tbl,
        |    CAST(list_sum(list_transform(range(0, 8), p ->
        |      CASE WHEN list_sum(list_transform(range(1, len(nvec) + 1),
        |          d -> nvec[d] * m[CAST(p + 1 AS INTEGER)][CAST(d AS INTEGER)]))
        |          > 0
        |        THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
        |        ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM v, p0),
        |b1 AS (
        |  SELECT id, nvec, 1 AS tbl,
        |    CAST(list_sum(list_transform(range(0, 8), p ->
        |      CASE WHEN list_sum(list_transform(range(1, len(nvec) + 1),
        |          d -> nvec[d] * m[CAST(p + 1 AS INTEGER)][CAST(d AS INTEGER)]))
        |          > 0
        |        THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
        |        ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM v, p1),
        |bkt AS (SELECT * FROM b0 UNION ALL SELECT * FROM b1),
        |s AS (
        |  SELECT DISTINCT a.id AS query_id, b.id AS neighbor_id,
        |    list_sum(list_transform(range(1, len(a.nvec) + 1),
        |      i -> a.nvec[i] * b.nvec[i])) AS sim
        |  FROM bkt a JOIN bkt b
        |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id <> b.id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "x_text_chunks" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
        |      AS toks
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, toks,
        |    unnest(range(1, len(toks) + 1, 20)) AS s
        |  FROM tok WHERE len(toks) > 0)
        |SELECT doc_id,
        |  CAST(floor((s - 1) / 20.0) AS INTEGER) AS chunk_idx,
        |  md5(array_to_string(list_slice(toks, s, s + 29), ' '))
        |    AS chunk_hash,
        |  CAST(len(list_slice(toks, s, s + 29)) AS BIGINT) AS n_tokens
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    // KMV: (k-1)·2^48 for k = 64 is 63·281474976710656 =
    // 17732923532771328 — 6 significant bits, exactly representable as
    // DOUBLE on both engines; one division per estimate, operand order
    // mirrored in the Spark expressions (Sketches.kmvEstimate).
    "x_sketch_kmv" ->
      s"""WITH tok AS (
        |  SELECT DISTINCT source,
        |    unnest(list_filter(regexp_split_to_array(text, '\\s+'),
        |      x -> x <> '')) AS tok
        |  FROM documents),
        |hd AS (SELECT DISTINCT source, ${duckHash48("tok")} AS h FROM tok),
        |r AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |  FROM hd),
        |agg AS (
        |  SELECT source, count(*) AS n_distinct,
        |    max(CASE WHEN rn = 64 THEN h END) AS k64
        |  FROM r GROUP BY source)
        |SELECT source, n_distinct,
        |  CASE WHEN n_distinct >= 64 THEN k64 END AS k_small,
        |  CASE WHEN n_distinct >= 64
        |    THEN CAST(17732923532771328 AS DOUBLE) / CAST(k64 AS DOUBLE)
        |    ELSE CAST(n_distinct AS DOUBLE) END AS est_distinct
        |FROM agg ORDER BY source""".stripMargin,
    "x_sketch_kmv_setops" ->
      s"""WITH tok AS (
        |  SELECT DISTINCT source,
        |    unnest(list_filter(regexp_split_to_array(text, '\\s+'),
        |      x -> x <> '')) AS tok
        |  FROM documents),
        |hd AS (SELECT DISTINCT source, ${duckHash48("tok")} AS h FROM tok),
        |r AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |  FROM hd),
        |sk AS (SELECT source, h FROM r WHERE rn <= 64),
        |srcs AS (SELECT DISTINCT source FROM sk),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b
        |  FROM srcs a, srcs b WHERE a.source < b.source),
        |u AS (
        |  SELECT src_a, src_b, h,
        |    max(CASE WHEN sk.source = src_a THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN sk.source = src_b THEN 1 ELSE 0 END) AS in_b
        |  FROM pairs JOIN sk
        |    ON sk.source = src_a OR sk.source = src_b
        |  GROUP BY 1, 2, 3),
        |m AS (
        |  SELECT *, row_number() OVER (PARTITION BY src_a, src_b
        |                               ORDER BY h) AS rn
        |  FROM u),
        |agg AS (
        |  SELECT src_a, src_b, count(*) AS n_merged,
        |    CAST(sum(in_a * in_b) AS BIGINT) AS n_common,
        |    max(h) AS max_merged
        |  FROM m WHERE rn <= 64 GROUP BY 1, 2)
        |SELECT src_a, src_b, n_common,
        |  CAST(n_common AS DOUBLE) / CAST(n_merged AS DOUBLE)
        |    AS jaccard_est,
        |  CASE WHEN n_merged < 64 THEN CAST(n_merged AS DOUBLE)
        |    ELSE CAST(17732923532771328 AS DOUBLE)
        |      / CAST(max_merged AS DOUBLE) END AS union_est,
        |  jaccard_est * union_est AS inter_est
        |FROM agg ORDER BY src_a, src_b""".stripMargin,
    "x_reconcile_counts" ->
      s"""WITH $duckDocsV2,
        |d AS (
        |  SELECT CASE WHEN n.doc_id IS NULL THEN 'removed'
        |    WHEN o.doc_id IS NULL THEN 'added'
        |    WHEN $duckDocsChangedPred
        |    THEN 'changed' ELSE 'unchanged' END AS status
        |  FROM documents o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id)
        |SELECT status, count(*) AS n_rows
        |FROM d GROUP BY status ORDER BY status""".stripMargin,
    "x_reconcile_drift" ->
      s"""WITH $duckDocsV2,
        |ch AS (
        |  SELECT o.text AS ot, n.text AS nt, o.lang AS ol, n.lang AS nl,
        |    o.source AS os, n.source AS ns,
        |    o.n_chars AS oc, n.n_chars AS nc
        |  FROM documents o JOIN v2 n ON o.doc_id = n.doc_id
        |  WHERE $duckDocsChangedPred)
        |SELECT column_name, n_changed FROM (
        |  SELECT 'text' AS column_name, CAST(coalesce(sum(
        |    CASE WHEN ot IS DISTINCT FROM nt THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_changed FROM ch
        |  UNION ALL
        |  SELECT 'lang', CAST(coalesce(sum(
        |    CASE WHEN ol IS DISTINCT FROM nl THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) FROM ch
        |  UNION ALL
        |  SELECT 'source', CAST(coalesce(sum(
        |    CASE WHEN os IS DISTINCT FROM ns THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) FROM ch
        |  UNION ALL
        |  SELECT 'n_chars', CAST(coalesce(sum(
        |    CASE WHEN oc IS DISTINCT FROM nc THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) FROM ch)
        |ORDER BY column_name""".stripMargin,
    "x_privacy_kanon" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS group_size
        |FROM customer GROUP BY 1, 2 HAVING count(*) < 7
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "x_privacy_kanon_stats" ->
      """WITH g AS (
        |  SELECT count(*) AS n FROM customer
        |  GROUP BY c_nationkey, c_mktsegment)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(coalesce(sum(CASE WHEN n < 7 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_violating,
        |  CAST(coalesce(sum(CASE WHEN n < 7 THEN n ELSE 0 END), 0)
        |    AS BIGINT) AS n_rows_at_risk,
        |  CAST(coalesce(sum(CASE WHEN n < 7 THEN n ELSE 0 END), 0)
        |      AS DOUBLE)
        |    / CAST(coalesce(sum(n), 0) AS DOUBLE) AS at_risk_rate
        |FROM g""".stripMargin,
    "x_text_redact" -> {
      import graft.ext.TextAnalysis.{EmailRe, PhoneRe, Ipv4Re}
      s"""WITH raw AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 5 = 0
        |      THEN text || ' reach me at alice.smith@example.com'
        |    WHEN doc_id % 5 = 1 THEN text || ' or call 555-867-5309 today'
        |    WHEN doc_id % 5 = 2
        |      THEN text || ' server at 192.168.10.42 responded'
        |    ELSE text END AS raw FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw, '$EmailRe'))
        |    + len(regexp_extract_all(raw, '$PhoneRe'))
        |    + len(regexp_extract_all(raw, '$Ipv4Re')) AS BIGINT)
        |    AS n_redacted,
        |  md5(regexp_replace(regexp_replace(regexp_replace(raw,
        |    '$EmailRe', '<EMAIL>', 'g'),
        |    '$PhoneRe', '<PHONE>', 'g'),
        |    '$Ipv4Re', '<IP>', 'g')) AS red_hash
        |FROM raw
        |WHERE len(regexp_extract_all(raw, '$EmailRe'))
        |    + len(regexp_extract_all(raw, '$PhoneRe'))
        |    + len(regexp_extract_all(raw, '$Ipv4Re')) > 0
        |ORDER BY doc_id""".stripMargin
    },
    "x_linkage_fuzzy" ->
      """WITH m AS (
        |  SELECT p_partkey + 9000000 AS m_id,
        |    substr(p_name, 1, length(p_name) - 1) AS m_name
        |  FROM part WHERE p_partkey % 5 = 0),
        |lb AS (SELECT m_id, m_name,
        |         split_part(m_name, ' ', 1) AS bk FROM m),
        |rb AS (SELECT p_partkey, p_name,
        |         split_part(p_name, ' ', 1) AS bk FROM part)
        |SELECT lb.m_id AS left_id, rb.p_partkey AS right_id,
        |  CAST(levenshtein(lb.m_name, rb.p_name) AS INTEGER) AS dist
        |FROM lb JOIN rb USING (bk)
        |WHERE levenshtein(lb.m_name, rb.p_name) <= 2
        |ORDER BY left_id, right_id""".stripMargin,
    "x_linkage_best" ->
      """WITH m AS (
        |  SELECT p_partkey + 9000000 AS m_id,
        |    substr(p_name, 1, length(p_name) - 1) AS m_name
        |  FROM part WHERE p_partkey % 5 = 0),
        |lb AS (SELECT m_id, m_name,
        |         split_part(m_name, ' ', 1) AS bk FROM m),
        |rb AS (SELECT p_partkey, p_name,
        |         split_part(p_name, ' ', 1) AS bk FROM part),
        |pairs AS (
        |  SELECT lb.m_id AS left_id, rb.p_partkey AS right_id,
        |    levenshtein(lb.m_name, rb.p_name) AS d
        |  FROM lb JOIN rb USING (bk)
        |  WHERE levenshtein(lb.m_name, rb.p_name) <= 2),
        |r AS (
        |  SELECT left_id, right_id, d,
        |    row_number() OVER (PARTITION BY left_id
        |                       ORDER BY d, right_id) AS rn
        |  FROM pairs)
        |SELECT left_id, right_id, CAST(d AS INTEGER) AS dist
        |FROM r WHERE rn = 1 ORDER BY left_id""".stripMargin,
    "x_privacy_ldiv" ->
      """WITH d AS (
        |  SELECT DISTINCT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS s
        |  FROM customer)
        |SELECT c_nationkey, c_mktsegment,
        |  count(*) AS n_distinct_sensitive
        |FROM d GROUP BY 1, 2 HAVING count(*) < 5
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    // 6-hour gap = 21 600 000 000 µs (SparkEntry.SessionGapUs); the
    // strictly-greater compare matches Sessions.assign — gap-equal
    // arrivals extend the session
    "x_session_assign" ->
      s"""WITH f AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |a AS (
        |  SELECT event_id, user_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > $duckSessionGapUs
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM f
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT event_id, user_id,
        |  CAST(sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS session_idx
        |FROM a ORDER BY event_id""".stripMargin,
    "x_session_stats" ->
      s"""WITH f AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |a AS (
        |  SELECT event_id, user_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > $duckSessionGapUs
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM f
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS session_idx
        |  FROM a)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  max(ts_us) - min(ts_us) AS duration_us
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,
    // CMS cells mirror Sketches.cmsCells: bucket_r(key) =
    // hash48('cms_r' || chr(1) || key) % 64, d=4 (SparkEntry.CmsDepth/
    // CmsWidth)
    "x_sketch_cms" -> {
      val h = duckHash48(
        "'cms_' || CAST(r AS VARCHAR) || chr(1) || CAST(user_id AS VARCHAR)")
      s"""WITH ds AS (SELECT r FROM range(0, 4) t(r)),
        |ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        |cells AS (
        |  SELECT r, $h % 64 AS bucket, count(*) AS cnt
        |  FROM ev CROSS JOIN ds GROUP BY 1, 2),
        |probes AS (
        |  SELECT DISTINCT user_id, r, $h % 64 AS bucket
        |  FROM ev CROSS JOIN ds),
        |est AS (
        |  SELECT p.user_id, min(coalesce(c.cnt, 0)) AS cms_est
        |  FROM probes p
        |  LEFT JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
        |  GROUP BY 1),
        |exact AS (SELECT user_id, count(*) AS n_exact FROM ev GROUP BY 1)
        |SELECT user_id, CAST(cms_est AS BIGINT) AS cms_est, n_exact
        |FROM est JOIN exact USING (user_id)
        |ORDER BY user_id""".stripMargin
    },
    // mirrors Graph.pageRank's fixed-point update exactly: init =
    // 10^12 // N, base = (15·init) // 100, r' = base +
    // (85·Σ(r // deg)) // 100, dangling mass leaked, 3 iterations
    "x_graph_pagerank" -> pageRankOracle(3, dangling = false),
    "x_graph_ppr" -> pprOracle(3, Fixtures.PprSeeds),
    // neighbor Jaccard via the NAIVE wedge self-join — the engine's
    // basket-array fan-out must reproduce it exactly
    "x_graph_neighbor_jaccard" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |  WHERE l_orderkey % 3 = 0),
        |und AS (SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |sym AS (SELECT a, b FROM und
        |  UNION ALL SELECT b AS a, a AS b FROM und),
        |deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY 1),
        |ctr AS (SELECT a FROM deg WHERE deg <= 30),
        |w AS (SELECT s1.b AS u, s2.b AS v
        |  FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
        |  JOIN ctr ON s1.a = ctr.a),
        |c AS (SELECT u, v, count(*) AS common FROM w GROUP BY 1, 2)
        |SELECT u, v, common,
        |  round(CAST(common AS DOUBLE)
        |    / CAST(du.deg + dv.deg - common AS DOUBLE), 12) AS jaccard
        |FROM c JOIN deg du ON c.u = du.a JOIN deg dv ON c.v = dv.a
        |ORDER BY jaccard DESC, u, v LIMIT 20""".stripMargin,
    // HUGEINT endpoint-degree moments over the symmetric edge list,
    // the corrOracle final expression verbatim
    "x_graph_assortativity" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |  WHERE l_orderkey % 3 = 0),
        |und AS (SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |sym AS (SELECT a, b FROM und
        |  UNION ALL SELECT b AS a, a AS b FROM und),
        |deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY 1),
        |pr AS (SELECT CAST(da.deg AS HUGEINT) AS x,
        |    CAST(db.deg AS HUGEINT) AS y
        |  FROM sym s JOIN deg da ON s.a = da.a JOIN deg db ON s.b = db.a),
        |m AS (SELECT sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        |    sum(y * y) AS syy, sum(x * y) AS sxy, count(*) AS n
        |  FROM pr)
        |SELECT CAST(n AS BIGINT) AS n_pairs,
        |  round(CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |    AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    END, 12) AS assortativity
        |FROM m""".stripMargin,
    // naive wedge self-join with the SAME snapped 1/ln(deg) center
    // weights — the basket fan-out must reach the identical exact sums
    "x_graph_adamic_adar" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |  WHERE l_orderkey % 3 = 0),
        |und AS (SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |sym AS (SELECT a, b FROM und
        |  UNION ALL SELECT b AS a, a AS b FROM und),
        |deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY 1),
        |ctr AS (SELECT a FROM deg WHERE deg <= 30),
        |w AS (SELECT s1.b AS u, s2.b AS v, s1.a AS c
        |  FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
        |  JOIN ctr ON s1.a = ctr.a),
        |wt AS (SELECT w.u, w.v,
        |    CAST(round(1e12 / ln(CAST(deg.deg AS DOUBLE))) AS BIGINT)
        |      AS w12
        |  FROM w JOIN deg ON w.c = deg.a),
        |c AS (SELECT u, v, CAST(count(*) AS BIGINT) AS common,
        |    sum(w12) AS aa12
        |  FROM wt GROUP BY 1, 2)
        |SELECT u, v, common,
        |  round(CAST(aa12 AS DOUBLE) / 1e12, 12) AS aa_score
        |FROM c ORDER BY aa12 DESC, u, v LIMIT 20""".stripMargin,
    // exact integer CDF cross-multiplication over the union dollar
    // domain — no libm, no snapping, bit-identical supremum
    "x_drift_ks" -> ksDriftSql(None),
    // per-monitoring-window KS of the same cohorts — one block per
    // window id, recomputed in batch; the streamed union must match
    "x_stream_drift" -> (0 to 2).map(w => ksDriftSql(Some(w)))
      .mkString("\nUNION ALL\n"),
    // SAME SQL on purpose: the throughput twin (no files-per-trigger
    // cap — one AvailableNow batch over the backlog) must produce the
    // identical per-window rows; batching is invisible in the result
    "x_stream_drift_batched" -> (0 to 2).map(w => ksDriftSql(Some(w)))
      .mkString("\nUNION ALL\n"),
    // same sync rounds unrolled as CTEs with the identical
    // (count desc, label asc) tie-break via row_number
    "x_graph_lpa" -> lpaOracle(4),
    // 10 unrolled rounds — proves LPA's per-round localCheckpoint
    // truncation path (rounds > DeepIterThreshold) stays bit-stable
    "x_graph_lpa_deep" -> lpaOracle(10),
    // same snapped per-token ½(p·ln(2p/(p+q)) + q·ln(2q/(p+q))) terms
    // over the per-pair union vocabulary; ln 2 normalizer embedded as
    // the identical JVM double literal
    "x_text_js_divergence" ->
      s"""WITH toks AS (SELECT source AS k,
        |    unnest(list_filter(regexp_split_to_array(text, '\\s+'),
        |      x -> x <> '')) AS v
        |  FROM documents),
        |cl AS (SELECT k, v, count(*) AS c FROM toks GROUP BY 1, 2),
        |tot AS (SELECT k, sum(c) AS n FROM cl GROUP BY 1),
        |pairs AS (SELECT a.k AS ka, a.n AS na, b.k AS kb, b.n AS nb
        |  FROM tot a JOIN tot b ON a.k < b.k),
        |dom AS (SELECT p.ka, p.kb, cl.v,
        |    coalesce(sum(CASE WHEN cl.k = p.ka THEN c END), 0) AS ca,
        |    coalesce(sum(CASE WHEN cl.k = p.kb THEN c END), 0) AS cb,
        |    any_value(p.na) AS na, any_value(p.nb) AS nb
        |  FROM cl JOIN pairs p ON cl.k = p.ka OR cl.k = p.kb
        |  GROUP BY 1, 2, 3),
        |terms AS (SELECT ka, kb, na, nb,
        |    CAST(round(
        |      (CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / na)
        |         * ln(2.0 * (CAST(ca AS DOUBLE) / na)
        |           / (CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb))
        |       ELSE 0.0 END
        |     + CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / nb)
        |         * ln(2.0 * (CAST(cb AS DOUBLE) / nb)
        |           / (CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb))
        |       ELSE 0.0 END) / 2 * 1e12) AS BIGINT) AS t12
        |  FROM dom)
        |SELECT ka AS key_a, kb AS key_b, CAST(na AS BIGINT) AS n_a,
        |  CAST(nb AS BIGINT) AS n_b,
        |  round(CAST(sum(t12) AS DOUBLE) / 1e12, 12) AS js,
        |  round(CAST(sum(t12) AS DOUBLE)
        |    / (${math.log(2.0)} * 1e12), 12) AS js_norm
        |FROM terms GROUP BY ka, kb, na, nb
        |ORDER BY key_a, key_b""".stripMargin,
    // full-outer join with IS NOT DISTINCT FROM payload comparison —
    // the null-safe <=> reduction must match exactly
    "x_cdc_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p,
        |    o_orderstatus AS st
        |  FROM orders WHERE o_orderkey % 5 <> 4),
        |nw AS (SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1
        |         ELSE o_totalprice END AS p,
        |    o_orderstatus AS st
        |  FROM orders WHERE o_orderkey % 7 <> 3),
        |d AS (SELECT
        |    CASE WHEN o.k IS NULL THEN 'added'
        |         WHEN nw.k IS NULL THEN 'removed'
        |         WHEN NOT (o.p IS NOT DISTINCT FROM nw.p
        |               AND o.st IS NOT DISTINCT FROM nw.st)
        |           THEN 'changed'
        |         ELSE 'unchanged' END AS change
        |  FROM o FULL OUTER JOIN nw ON o.k = nw.k)
        |SELECT change, CAST(count(*) AS BIGINT) AS n FROM d
        |WHERE change <> 'unchanged' GROUP BY 1 ORDER BY change""".stripMargin,
    // naive inequality cross filter — the binned join's canonical-bin
    // dedup must reproduce these counts exactly
    "x_join_interval_overlap" ->
      """WITH l AS (SELECT
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS ls,
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(l_shipdate AS DATE)) AS BIGINT)
        |      + 1 + (l_orderkey + l_linenumber) % 21 AS le
        |  FROM lineitem WHERE l_orderkey % 7 = 0),
        |r AS (SELECT o_orderkey AS okey,
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS rs,
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) + 30 AS re
        |  FROM orders WHERE o_orderkey % 251 = 0)
        |SELECT okey, CAST(count(*) AS BIGINT) AS n_overlap
        |FROM l, r WHERE greatest(ls, rs) < least(le, re)
        |GROUP BY 1 ORDER BY okey""".stripMargin,
    // two CTE-unrolled mutual-reinforcement rounds with HUGEINT //
    // normalization — exact-integer L1 HITS
    "x_graph_hits" -> hitsOracle(2),
    // same update unrolled to 10 CTE rounds — proves the per-round
    // localCheckpoint truncation path stays bit-stable over a deep chain
    "x_graph_pagerank_deep" -> pageRankOracle(10, dangling = false),
    // redistribute variant: each round adds (Σ rank over out-degree-0
    // nodes) // N to every node's incoming mass before damping
    "x_graph_pagerank_dangling" -> pageRankOracle(3, dangling = true),
    // LWW semantics, window formulation: the Spark side is one latest_by
    // hash agg; rn = 1 over (ts DESC, event_id DESC) is the same winner
    "x_cdc_merge" -> cdcMergeOracle,
    // SAME SQL on purpose: applyChanges(snapshot(≤cut), delta(>cut))
    // must equal batch LWW over the whole log — the incremental ≡ batch
    // invariant IS the oracle
    "x_cdc_upsert" -> cdcMergeOracle,
    "x_cdc_pit" ->
      """WITH hist AS (
        |  SELECT user_id, event_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS valid_to
        |  FROM events WHERE event_type <> 'purchase'),
        |f AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT f.event_id AS purchase_id, f.user_id,
        |  h.event_id AS state_event_id, h.event_type AS state_type
        |FROM f LEFT JOIN hist h ON h.user_id = f.user_id
        |  AND h.valid_from <= f.ts
        |  AND (h.valid_to IS NULL OR f.ts < h.valid_to)
        |ORDER BY purchase_id""".stripMargin,
    "x_funnel_times" -> {
      val steps = Fixtures.FunnelSteps
      val ctes = steps.indices.map { i =>
        if (i == 0)
          s"""s0 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
             |  WHERE event_type = '${steps(0)}' GROUP BY user_id)"""
            .stripMargin
        else
          s"""s$i AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t,
             |    max(p.t) AS tp
             |  FROM events e JOIN s${i - 1} p ON e.user_id = p.user_id
             |  WHERE e.event_type = '${steps(i)}'
             |    AND epoch_us(e.ts) > p.t
             |  GROUP BY e.user_id)""".stripMargin
      }.mkString(",\n")
      val rows = (1 until steps.length).map { i =>
        val alias = (c: String) => if (i == 1) s" AS $c" else ""
        s"""SELECT $i${alias("step_idx")}, '${steps(i)}'${alias("step")},
           |  (SELECT count(*) FROM s$i)${alias("users")},
           |  (SELECT CAST(coalesce(sum(t - tp), 0) AS BIGINT) FROM s$i)${alias("sum_us")},
           |  (SELECT CASE WHEN count(*) > 0
           |     THEN CAST(sum(t - tp) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           |   END FROM s$i)${alias("avg_us")}""".stripMargin
      }.mkString("\nUNION ALL ")
      s"WITH $ctes\n$rows\nORDER BY step_idx"
    },
    "x_bin_quantile" ->
      """WITH b AS (
        |  SELECT
        |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS b1,
        |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS b2,
        |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS b3
        |  FROM lineitem)
        |SELECT CAST(
        |    (CASE WHEN v >= b1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v >= b2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v >= b3 THEN 1 ELSE 0 END) AS BIGINT) AS bucket,
        |  count(*) AS cnt, min(v) AS bin_min, max(v) AS bin_max
        |FROM (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        |  WHERE l_quantity IS NOT NULL) CROSS JOIN b
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_profile_bootstrap" -> {
      // weights from the SAME threshold literals the Spark plan embeds
      // (Profile.PoissonCdf) — no cross-engine libm in the compare
      val w = graft.ext.Profile.PoissonCdf
        .map(t => s"(CASE WHEN u > $t THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH base AS (
        |  SELECT CAST(l_orderkey AS VARCHAR) || '|' ||
        |      CAST(l_linenumber AS VARCHAR) AS id,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |  FROM lineitem),
        |rep AS (SELECT id, c, unnest(generate_series(0, 31)) AS b
        |  FROM base),
        |uu AS (SELECT b, c,
        |    ${duckHash48("'bs' || id || '_' || CAST(b AS VARCHAR)")}
        |      / 281474976710656.0 AS u
        |  FROM rep),
        |wt AS (SELECT b, c, $w AS w FROM uu),
        |agg AS (SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
        |    CAST(sum(w * c) AS BIGINT) AS sum_cents
        |  FROM wt GROUP BY b)
        |SELECT b, n_eff, sum_cents,
        |  CASE WHEN n_eff > 0 THEN
        |    CAST(sum_cents AS DOUBLE) / 100.0 / CAST(n_eff AS DOUBLE)
        |  END AS mean
        |FROM agg ORDER BY b""".stripMargin
    },
    "x_infer_schema" -> {
      // one UNION ALL branch per orders column, generated so the
      // column list and type mapping can't drift from the Spark side's
      // parquet-schema-derived facts
      val cols = Seq(
        ("o_orderkey", "integer", true),
        ("o_custkey", "integer", true),
        ("o_orderstatus", "string", false),
        ("o_totalprice", "number", true),
        ("o_orderdate", "datetime", false),
        ("o_orderpriority", "string", false))
      val branches = cols.map { case (c, t, num) =>
        val alias0 = cols.head._1 == c
        def a(n: String) = if (alias0) s" AS $n" else ""
        val mn = if (num) s"CAST(min($c) AS DOUBLE)" else "NULL"
        val mx = if (num) s"CAST(max($c) AS DOUBLE)" else "NULL"
        s"""SELECT '$c'${a("field")}, '$t'${a("ftype")},
           |  count(*)${a("n_rows")},
           |  count(*) FILTER (WHERE $c IS NULL)${a("n_nulls")},
           |  count(DISTINCT $c)${a("n_distinct")},
           |  count(*) FILTER (WHERE $c IS NULL) = 0${a("required")},
           |  (count(*) FILTER (WHERE $c IS NULL) = 0
           |    AND count(DISTINCT $c) = count(*))${a("unique")},
           |  CASE WHEN count(DISTINCT $c) <= 8 THEN
           |    string_agg(DISTINCT CAST($c AS VARCHAR), ','
           |      ORDER BY CAST($c AS VARCHAR)) END${a("enum_csv")},
           |  $mn${a("min_value")}, $mx${a("max_value")}
           |FROM orders""".stripMargin
      }
      branches.mkString("\nUNION ALL ") + "\nORDER BY field"
    },
    "x_profile_benford" ->
      """WITH v AS (SELECT abs(CAST(l_extendedprice AS DOUBLE)) AS v
        |  FROM lineitem
        |  WHERE abs(CAST(l_extendedprice AS DOUBLE)) > 0.0),
        |d AS (SELECT CAST(floor(v / power(10.0, floor(log10(v))))
        |    AS BIGINT) AS digit FROM v),
        |n AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM n)
        |SELECT digit, n, CAST(n AS DOUBLE) / tot AS share,
        |  log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS expected
        |FROM n CROSS JOIN t ORDER BY digit""".stripMargin,
    // unnest(generate_series(lo, hi)) — the scalar-list form takes
    // column args; the table function would demand constants
    "x_ts_resample" ->
      """WITH b AS (SELECT epoch_us(ts) // 300000000 AS bk FROM events),
        |agg AS (SELECT bk, count(*) AS n FROM b GROUP BY bk),
        |bounds AS (SELECT min(bk) AS lo, max(bk) AS hi FROM b),
        |rng AS (SELECT unnest(generate_series(lo, hi)) AS bucket
        |  FROM bounds)
        |SELECT r.bucket,
        |  make_timestamp(r.bucket * 300000000) AS bucket_start,
        |  CAST(coalesce(a.n, 0) AS BIGINT) AS n_events
        |FROM rng r LEFT JOIN agg a ON a.bk = r.bucket
        |ORDER BY r.bucket""".stripMargin,
    // bin width (105000-900)/10 = 10410 is integer-exact, so the
    // histogram's least() clamp never fires and the SQL can omit it
    "x_drift_psi" ->
      """WITH ho AS (
        |  SELECT CAST(floor((CAST(l_extendedprice AS DOUBLE) - 900.0)
        |      / 10410.0) AS BIGINT) AS bin, count(*) AS n_old
        |  FROM lineitem
        |  WHERE l_linestatus = 'F'
        |    AND CAST(l_extendedprice AS DOUBLE) >= 900.0
        |    AND CAST(l_extendedprice AS DOUBLE) < 105000.0
        |  GROUP BY 1),
        |hn AS (
        |  SELECT CAST(floor((CAST(l_extendedprice AS DOUBLE) - 900.0)
        |      / 10410.0) AS BIGINT) AS bin, count(*) AS n_new
        |  FROM lineitem
        |  WHERE l_linestatus = 'O'
        |    AND CAST(l_extendedprice AS DOUBLE) >= 900.0
        |    AND CAST(l_extendedprice AS DOUBLE) < 105000.0
        |  GROUP BY 1),
        |j AS (SELECT coalesce(ho.bin, hn.bin) AS bin,
        |    CAST(coalesce(ho.n_old, 0) AS BIGINT) AS n_old,
        |    CAST(coalesce(hn.n_new, 0) AS BIGINT) AS n_new
        |  FROM ho FULL OUTER JOIN hn ON ho.bin = hn.bin),
        |tt AS (SELECT CAST(sum(n_old) AS DOUBLE) AS t_old,
        |    CAST(sum(n_new) AS DOUBLE) AS t_new FROM j)
        |SELECT bin, n_old, n_new,
        |  round((greatest(CAST(n_old AS DOUBLE) / t_old, 0.000001)
        |     - greatest(CAST(n_new AS DOUBLE) / t_new, 0.000001))
        |  * ln(greatest(CAST(n_old AS DOUBLE) / t_old, 0.000001)
        |     / greatest(CAST(n_new AS DOUBLE) / t_new, 0.000001)), 12)
        |    AS psi_term
        |FROM j CROSS JOIN tt ORDER BY bin""".stripMargin,
    "x_cdc_scd2" ->
      """SELECT user_id, event_id, event_type,
        |  ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS valid_to,
        |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    IS NULL) AS is_current
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "x_funnel" -> {
      // chained CTEs mirror Behavior.funnel's earliest-transition
      // joins step by step, over the shared Fixtures.FunnelSteps
      val steps = Fixtures.FunnelSteps
      val ctes = steps.indices.map { i =>
        if (i == 0)
          s"""s0 AS (SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type = '${steps(0)}' GROUP BY user_id)"""
            .stripMargin
        else
          s"""s$i AS (SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN s${i - 1} p ON e.user_id = p.user_id
             |  WHERE e.event_type = '${steps(i)}' AND e.ts > p.t
             |  GROUP BY e.user_id)""".stripMargin
      }.mkString(",\n")
      val rows = steps.indices.map { i =>
        val head = if (i == 0)
          s"SELECT $i AS step_idx, '${steps(i)}' AS step, " +
            s"(SELECT count(*) FROM s$i) AS users"
        else
          s"SELECT $i, '${steps(i)}', (SELECT count(*) FROM s$i)"
        head
      }.mkString("\nUNION ALL ")
      s"WITH $ctes\n$rows\nORDER BY step_idx"
    },
    // week bucket = epoch-µs integer division — the exact arithmetic
    // Behavior.weekIndex performs (subtract-mod form, provably equal)
    "x_cohort" ->
      """WITH wk AS (
        |  SELECT user_id AS u, epoch_us(ts) // 604800000000 AS w
        |  FROM events),
        |f AS (SELECT u, min(w) AS cw FROM wk GROUP BY u)
        |SELECT f.cw AS cohort_week, wk.w - f.cw AS week_offset,
        |  count(DISTINCT wk.u) AS users
        |FROM wk JOIN f ON wk.u = f.u
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_basket_lift" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id AS u, event_type AS i FROM events
        |  WHERE event_type IS NOT NULL),
        |n AS (SELECT i, count(*) AS n FROM d GROUP BY i),
        |tot AS (SELECT count(DISTINCT u) AS nt FROM d),
        |p AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_ab
        |  FROM d a JOIN d b ON a.u = b.u AND a.i < b.i GROUP BY 1, 2)
        |SELECT p.item_a, p.item_b, p.n_ab, na.n AS n_a, nb.n AS n_b,
        |  CAST(p.n_ab * tot.nt AS DOUBLE) / CAST(na.n * nb.n AS DOUBLE)
        |    AS lift
        |FROM p
        |JOIN n na ON na.i = p.item_a
        |JOIN n nb ON nb.i = p.item_b
        |CROSS JOIN tot
        |ORDER BY item_a, item_b""".stripMargin,
    "x_profile_winsorize" ->
      """WITH b AS (
        |  SELECT quantile_cont(l_extendedprice, 0.01) AS p_lo,
        |         quantile_cont(l_extendedprice, 0.99) AS p_hi
        |  FROM lineitem)
        |SELECT 'l_extendedprice' AS column_name, b.p_lo, b.p_hi,
        |  count(*) FILTER (WHERE l_extendedprice < b.p_lo) AS n_below,
        |  count(*) FILTER (WHERE l_extendedprice > b.p_hi) AS n_above,
        |  count(*) AS n_total
        |FROM lineitem CROSS JOIN b
        |GROUP BY b.p_lo, b.p_hi""".stripMargin,
    // the same triangle set the degree-oriented Spark plan emits, from
    // the canonical a<b<c three-way join (each triangle once)
    "x_graph_triangles" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |  WHERE l_orderkey % 3 = 0),
        |e AS (SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |tr AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (SELECT id, count(*) AS n_triangles FROM (
        |  SELECT x AS id FROM tr UNION ALL SELECT y FROM tr
        |  UNION ALL SELECT z FROM tr) GROUP BY id)
        |SELECT id AS part_id, CAST(n_triangles AS BIGINT) AS n_triangles
        |FROM pn ORDER BY n_triangles DESC, part_id LIMIT 20""".stripMargin,
    "x_behavior_transitions" ->
      """WITH st AS (
        |  SELECT event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_state
        |  FROM events),
        |m AS (SELECT from_state, to_state, count(*) AS n FROM st
        |  WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT from_state, sum(n) AS rn FROM m GROUP BY 1)
        |SELECT m.from_state, m.to_state, n,
        |  CAST(n AS DOUBLE) / CAST(rn AS DOUBLE) AS p
        |FROM m JOIN r USING (from_state)
        |ORDER BY from_state, to_state""".stripMargin,
    "x_behavior_paths" ->
      s"""WITH f AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS ts_us FROM events),
        |a AS (SELECT user_id, event_id, event_type, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > $duckSessionGapUs
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM f WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |s AS (SELECT user_id, event_type, ts_us, event_id,
        |    sum(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM a),
        |p AS (SELECT user_id, sess,
        |    string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    // survivorship winner via the row_number formulation of the same
    // (n_chars DESC, doc_id ASC) argmax latest_by computes in one agg
    "x_linkage_golden" ->
      """WITH inp AS (
        |  SELECT doc_id, text, source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, 'mirror',
        |    n_chars + CASE WHEN doc_id % 10 = 0 THEN 3 ELSE 0 END
        |  FROM documents WHERE doc_id < 50),
        |g AS (SELECT md5(text) AS text_md5, count(*) AS n_members,
        |  count(DISTINCT source) AS n_sources FROM inp GROUP BY 1),
        |w AS (SELECT md5(text) AS text_md5, doc_id AS rep_id,
        |  source AS rep_source, n_chars AS rep_chars FROM inp
        |  QUALIFY row_number() OVER (PARTITION BY md5(text)
        |    ORDER BY n_chars DESC, doc_id) = 1)
        |SELECT g.text_md5, n_members, n_sources, rep_id, rep_source,
        |  rep_chars
        |FROM g JOIN w USING (text_md5) WHERE n_members > 1
        |ORDER BY text_md5""".stripMargin,
    "x_layout_zonemap" -> zonemapOracle,
    "x_profile_corr" -> corrOracle,
    // tie-block rank identity in HUGEINT: T = Σ_v v·(2c·cum_<v +
    // c(c+1)), G = (T − (n+1)S)/(nS) — one double division at the end
    "x_profile_gini" ->
      """WITH freq AS (
        |  SELECT CAST(source AS VARCHAR) AS g,
        |    CAST(n_chars AS BIGINT) AS v, count(*) AS c
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, v, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM freq),
        |agg AS (
        |  SELECT g, sum(c) AS n,
        |    sum(CAST(v AS HUGEINT) * c) AS s,
        |    sum(CAST(v AS HUGEINT) *
        |      (2 * CAST(c AS HUGEINT) * (cum - c)
        |        + CAST(c AS HUGEINT) * (c + 1))) AS t
        |  FROM cum GROUP BY 1)
        |SELECT g AS group_id, CAST(n AS BIGINT) AS n,
        |  CAST(s AS BIGINT) AS total,
        |  CASE WHEN s > 0 THEN
        |    round(CAST(t - (n + 1) * s AS DOUBLE)
        |      / CAST(n * s AS DOUBLE), 12) END AS gini
        |FROM agg ORDER BY group_id""".stripMargin,
    // integer mid-ranks (2·cum − cnt) per column via frequency-CDF
    // windows, then the corrOracle moment/double discipline verbatim
    "x_profile_spearman" ->
      """WITH cc AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |fx AS (SELECT x, count(*) AS c FROM cc GROUP BY 1),
        |fxr AS (SELECT x,
        |  2 * sum(c) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS rx
        |  FROM fx),
        |fy AS (SELECT y, count(*) AS c FROM cc GROUP BY 1),
        |fyr AS (SELECT y,
        |  2 * sum(c) OVER (ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS ry
        |  FROM fy),
        |j AS (SELECT rx, ry FROM cc
        |  JOIN fxr USING (x) JOIN fyr USING (y)),
        |s AS (SELECT count(*) AS n,
        |    sum(CAST(rx AS HUGEINT)) AS sx,
        |    sum(CAST(ry AS HUGEINT)) AS sy,
        |    sum(CAST(rx AS HUGEINT) * rx) AS sxx,
        |    sum(CAST(ry AS HUGEINT) * ry) AS syy,
        |    sum(CAST(rx AS HUGEINT) * ry) AS sxy
        |  FROM j),
        |m AS (SELECT n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS va,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vb
        |  FROM s)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(CASE WHEN va > 0 AND vb > 0
        |    THEN cov / (sqrt(va) * sqrt(vb)) END, 12) AS rho
        |FROM m""".stripMargin,
    "x_privacy_tclose" ->
      """WITH base AS (SELECT c_nationkey AS q, c_mktsegment AS s
        |  FROM customer WHERE c_mktsegment IS NOT NULL),
        |gv AS (SELECT q, s, count(*) AS ngv FROM base GROUP BY 1, 2),
        |gl AS (SELECT s, count(*) AS nv FROM base GROUP BY 1),
        |tt AS (SELECT count(*) AS nt FROM base),
        |g AS (SELECT q, sum(ngv) AS ng FROM gv GROUP BY 1),
        |a AS (
        |  SELECT gv.q, g.ng, tt.nt,
        |    sum(abs(gv.ngv * tt.nt - gl.nv * g.ng)) AS bad_present,
        |    sum(gl.nv) AS covered
        |  FROM gv JOIN gl USING (s) JOIN g USING (q) CROSS JOIN tt
        |  GROUP BY 1, 2, 3)
        |SELECT q AS c_nationkey, CAST(ng AS BIGINT) AS n_rows,
        |  CAST(bad_present + (nt - covered) * ng AS BIGINT) AS t_num,
        |  CAST(bad_present + (nt - covered) * ng AS DOUBLE)
        |    / (2.0 * CAST(ng AS DOUBLE) * CAST(nt AS DOUBLE)) AS t,
        |  (bad_present + (nt - covered) * ng) * 10 > 2 * 1 * ng * nt
        |    AS violates
        |FROM a ORDER BY c_nationkey""".stripMargin,
    // the zone-map files folded into ≈12k-row bins by the offset rule
    // (cum − size) // target over the same z-bucket metadata
    "x_layout_compaction" ->
      s"""$zonemapCore
        |SELECT file_id, n_rows,
        |  CAST((sum(n_rows) OVER (ORDER BY file_id
        |     ROWS UNBOUNDED PRECEDING) - n_rows) // 12000 AS BIGINT)
        |    AS bin
        |FROM f ORDER BY file_id""".stripMargin,
    "x_text_cooc" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) AS w
        |  FROM documents),
        |dw AS (SELECT DISTINCT doc_id, w FROM tok),
        |voc AS (SELECT w FROM (SELECT w, count(*) AS df FROM dw
        |  GROUP BY 1 ORDER BY df DESC, w LIMIT 50)),
        |r AS (SELECT dw.doc_id, dw.w FROM dw JOIN voc USING (w)),
        |tot AS (SELECT count(DISTINCT doc_id) AS n FROM r),
        |pi AS (SELECT w, count(*) AS cnt FROM r GROUP BY 1),
        |pr AS (SELECT a.w AS item_a, b.w AS item_b, count(*) AS n_ab
        |  FROM r a JOIN r b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, n_ab, pa.cnt AS n_a, pb.cnt AS n_b,
        |  CAST(n_ab * tot.n AS DOUBLE) / CAST(pa.cnt * pb.cnt AS DOUBLE)
        |    AS lift
        |FROM pr, tot
        |JOIN pi pa ON pa.w = item_a
        |JOIN pi pb ON pb.w = item_b
        |ORDER BY item_a, item_b""".stripMargin,
    // the trailing-30 frame as a list() window, folded with the same
    // Σ cents·2^(p−1) / (2^n − 1) exact-long arithmetic
    "x_ts_ewma" ->
      """WITH f AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |a AS (SELECT event_id, user_id,
        |    list(cents) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS arr
        |  FROM f),
        |e AS (SELECT event_id, user_id, len(arr) AS n,
        |    list_sum(list_transform(range(1, len(arr) + 1),
        |      p -> arr[CAST(p AS INTEGER)]
        |        * (CAST(1 AS BIGINT) << CAST(p - 1 AS INTEGER)))) AS num
        |  FROM a)
        |SELECT event_id, user_id, CAST(n AS BIGINT) AS ewma_n,
        |  CAST(num AS BIGINT) AS ewma_num,
        |  CAST((CAST(1 AS BIGINT) << CAST(n AS INTEGER)) - 1 AS BIGINT)
        |    AS ewma_den,
        |  CAST(num AS DOUBLE)
        |    / CAST((CAST(1 AS BIGINT) << CAST(n AS INTEGER)) - 1
        |        AS DOUBLE) AS ewma
        |FROM e ORDER BY event_id""".stripMargin,
    // the hash-match doubles as the cross-engine assertion that Spark
    // grouping_id() and DuckDB GROUPING() agree on MSB-first bit order
    "x_olap_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS sum_price_c
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "x_olap_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
        |    AS gid,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS sum_total_c
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,
    "x_olap_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_o,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_f,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // brute-force NOT EXISTS dominance — the oracle may go quadratic;
    // the engine must not
    "x_olap_skyline" ->
      """WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
        |  FROM part)
        |SELECT p_partkey, p_size, price_c FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p b
        |  WHERE b.p_size >= a.p_size AND b.price_c <= a.price_c
        |    AND (b.p_size > a.p_size OR b.price_c < a.price_c))
        |ORDER BY p_partkey""".stripMargin,
    // HUGEINT moments, slope/intercept double ops mirrored
    // op-for-op; round 12 absorbs the HUGEINT→DOUBLE double-rounding
    "x_profile_ols" ->
      """WITH c AS (SELECT l_returnflag,
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS x,
        |    CAST(round(l_discount * 100) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_shipdate IS NOT NULL AND l_discount IS NOT NULL),
        |s AS (SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        |  FROM c GROUP BY 1),
        |d AS (SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM s)
        |SELECT l_returnflag, n,
        |  round(CASE WHEN den > 0 THEN num / den END, 12) AS slope,
        |  round(CASE WHEN den > 0
        |    THEN (syd - (num / den) * sxd) / CAST(n AS DOUBLE) END, 12)
        |    AS intercept
        |FROM d ORDER BY l_returnflag""".stripMargin,
    // exact integer contingency + 1e-9 fixed-point term fold — the
    // absent grid cells contribute their expected mass, same as Spark
    "x_profile_chisq" ->
      """WITH base AS (SELECT c_mktsegment AS a, c_nationkey AS b
        |  FROM customer
        |  WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS o FROM base GROUP BY 1, 2),
        |ra AS (SELECT a, sum(o) AS r FROM cells GROUP BY 1),
        |cb AS (SELECT b, sum(o) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT sum(o) AS nt FROM cells),
        |grid AS (SELECT ra.a, cb.b, ra.r, cb.c, tot.nt,
        |    coalesce(cells.o, 0) AS o
        |  FROM ra CROSS JOIN cb CROSS JOIN tot
        |  LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b),
        |terms AS (SELECT nt, CAST(round(
        |    CAST(o * nt - r * c AS DOUBLE) * CAST(o * nt - r * c AS DOUBLE)
        |      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
        |        * CAST(nt AS DOUBLE)) * 1e9) AS BIGINT) AS t9
        |  FROM grid),
        |sm AS (SELECT nt, sum(t9) AS s9 FROM terms GROUP BY nt),
        |na AS (SELECT count(*) AS n_a FROM ra),
        |nb AS (SELECT count(*) AS n_b FROM cb)
        |SELECT CAST(sm.nt AS BIGINT) AS n, na.n_a, nb.n_b,
        |  (na.n_a - 1) * (nb.n_b - 1) AS dof,
        |  round(CAST(sm.s9 AS DOUBLE) / 1e9, 9) AS chi2,
        |  round(sqrt(CAST(sm.s9 AS DOUBLE) / 1e9
        |    / (CAST(sm.nt AS DOUBLE)
        |      * CAST(least(na.n_a - 1, nb.n_b - 1) AS DOUBLE))), 12)
        |    AS cramers_v
        |FROM sm, na, nb""".stripMargin,
    "x_quality_fd" ->
      """WITH p AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS d,
        |    count(*) AS n
        |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1, 2)
        |SELECT l_orderkey, CAST(sum(n) AS BIGINT) AS n_rows,
        |  count(*) AS n_distinct_rhs,
        |  min(d) AS rhs_min, max(d) AS rhs_max
        |FROM p GROUP BY 1 HAVING count(*) > 1
        |ORDER BY l_orderkey""".stripMargin,
    // two-window sweep mirrored frame-for-frame; tie order within
    // equal starts provably cannot change the segmentation
    "x_ts_interval_union" ->
      """WITH iv AS (SELECT l_suppkey,
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS s,
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(l_shipdate AS DATE))
        |      + CAST(l_quantity AS BIGINT) AS BIGINT) AS e
        |  FROM lineitem),
        |m AS (SELECT l_suppkey, s, e,
        |    max(e) OVER (PARTITION BY l_suppkey ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv),
        |isl AS (SELECT l_suppkey, s, e,
        |    sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY l_suppkey ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island
        |  FROM m)
        |SELECT l_suppkey, CAST(island AS BIGINT) AS island,
        |  min(s) AS island_start, max(e) AS island_end,
        |  count(*) AS n_intervals,
        |  max(e) - min(s) AS covered
        |FROM isl GROUP BY 1, 2
        |ORDER BY l_suppkey, island""".stripMargin,
    // prefix-sum − running-min identity mirrored window-for-window;
    // x_stream_cusum (the flatMapGroupsWithState recursion) must land
    // on the SAME rows — one oracle, two implementations
    "x_stream_cusum" -> cusumOracle,
    "x_ts_cusum" -> cusumOracle,
    // recursive-CTE BFS: UNION dedup on (id, d) bounds the working
    // set; min over the accumulated rows = first-reach hop count
    "x_graph_khop" ->
      """WITH RECURSIVE
        |e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
        |    l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM e0
        |  UNION SELECT dst, src FROM e0),
        |srcs AS (SELECT c_custkey * 2 AS id FROM customer
        |  WHERE c_custkey % 500 = 0),
        |r(id, d) AS (
        |  SELECT id, 0 FROM srcs
        |  UNION
        |  SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id
        |  WHERE r.d < 4)
        |SELECT id AS node_id, CAST(min(d) AS BIGINT) AS hops
        |FROM r GROUP BY 1 ORDER BY node_id""".stripMargin,
    // brute-force every token-sharing pair; the engine must reach the
    // SAME pairs through prefix filtering (exactness is the contract)
    "x_dedup_ppjoin" ->
      """WITH sub AS (SELECT doc_id AS id,
        |    list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 16 = 0),
        |tw AS (SELECT id + 1000000 AS id,
        |    list_slice(toks, 1, CAST(floor(len(toks) * 0.8) AS INTEGER))
        |      AS toks
        |  FROM sub),
        |au AS (SELECT * FROM sub UNION ALL SELECT * FROM tw),
        |sets AS (SELECT id, list_distinct(toks) AS ts FROM au),
        |sz AS (SELECT id, CAST(len(ts) AS BIGINT) AS s FROM sets
        |  WHERE len(ts) >= 1),
        |tok AS (SELECT id, unnest(ts) AS w FROM sets),
        |pair AS (SELECT a.id AS id_a, b.id AS id_b,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM tok a JOIN tok b ON a.w = b.w AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, inter, sa.s AS size_a, sb.s AS size_b,
        |  CAST(inter AS DOUBLE)
        |    / CAST(sa.s + sb.s - inter AS DOUBLE) AS jaccard
        |FROM pair
        |JOIN sz sa ON sa.id = pair.id_a
        |JOIN sz sb ON sb.id = pair.id_b
        |WHERE inter * 10 >= (sa.s + sb.s - inter) * 7
        |ORDER BY id_a, id_b""".stripMargin,
    "x_layout_bloomskip" -> bloomskipOracle,
    // the oracle recomputes the FULL rollup; the engine merged two
    // partial rollups — hash-match proves the maintenance identity
    "x_olap_rollup_incr" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS sum_price_c
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    // exact lower-median order statistics via cumulative counts over
    // value frequencies; 3*MAD verdict on cross-multiplied integers.
    // Value pre-binned to whole dollars (cents // 100): the official
    // row runs the operator the way its bounded-domain contract says
    // to run it at scale — the raw-cents stress shape lives in
    // ProfileSpec with the maxDomain guard
    "x_profile_mad" ->
      """WITH b AS (SELECT l_returnflag AS k,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |c1 AS (SELECT k, v, count(*) AS c FROM b GROUP BY 1, 2),
        |w1 AS (SELECT k, v,
        |    sum(c) OVER (PARTITION BY k ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum,
        |    sum(c) OVER (PARTITION BY k) AS tot FROM c1),
        |m1 AS (SELECT k, min(v) AS median FROM w1
        |  WHERE cum * 2 >= tot GROUP BY 1),
        |d AS (SELECT b.k, abs(b.v - m1.median) AS dev, m1.median
        |  FROM b JOIN m1 USING (k)),
        |c2 AS (SELECT k, dev, count(*) AS c FROM d GROUP BY 1, 2),
        |w2 AS (SELECT k, dev,
        |    sum(c) OVER (PARTITION BY k ORDER BY dev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum,
        |    sum(c) OVER (PARTITION BY k) AS tot FROM c2),
        |m2 AS (SELECT k, min(dev) AS mad FROM w2
        |  WHERE cum * 2 >= tot GROUP BY 1)
        |SELECT d.k AS l_returnflag, count(*) AS n_rows,
        |  CAST(max(d.median) AS BIGINT) AS median,
        |  CAST(max(m2.mad) AS BIGINT) AS mad,
        |  CAST(sum(CASE WHEN d.dev * 1 > m2.mad * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN m2 USING (k) GROUP BY 1 ORDER BY 1""".stripMargin,
    // Mann–Whitney rank AUC over the distinct score domain: negatives
    // strictly below via cumulative window, ties count half
    // (pos·(2·cnegBelow + neg) / 2PN); HUGEINT tie products mirror the
    // Spark decimal(38,0) accumulator, both → nearest double → round 12
    "x_eval_auc" ->
      """WITH b AS (SELECT n_chars AS s, (lang = 'en') AS l
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |g AS (SELECT s,
        |    sum(CASE WHEN l THEN 1 ELSE 0 END) AS pos,
        |    sum(CASE WHEN l THEN 0 ELSE 1 END) AS neg
        |  FROM b GROUP BY 1),
        |c AS (SELECT pos, neg,
        |    coalesce(sum(neg) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cneg
        |  FROM g)
        |SELECT CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
        |    round(CAST(sum(CAST(pos AS HUGEINT) * (2 * cneg + neg))
        |        AS DOUBLE) /
        |      (CAST(sum(pos) AS DOUBLE) * CAST(sum(neg) AS DOUBLE)
        |        * 2.0), 12)
        |  END AS auc,
        |  CAST(sum(pos) AS BIGINT) AS positives,
        |  CAST(sum(neg) AS BIGINT) AS negatives
        |FROM c""".stripMargin,
    // fixed-width bins clamped to [0, 9]; exact integer floor division
    // mirrors the Spark side: subtract the positive remainder so the
    // quotient is exact under any integer-division rounding mode —
    // neither engine's truncation direction for negatives can matter
    "x_eval_calibration" ->
      """WITH b AS (SELECT n_chars AS s, (lang = 'en') AS l
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL)
        |SELECT least(greatest(
        |    (s - ((s % 64 + 64) % 64)) // 64, 0), 9) AS bin,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |  round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 12)
        |    AS mean_score,
        |  round(CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE), 12) AS pos_rate
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // slice audit: the explode-map mirrored as UNION ALL branches per
    // dimension; z from exact counts through the same fixed double
    // chain (p−g)/√(g(1−g)/n), round 12
    "x_eval_slices" ->
      """WITH b AS (
        |  SELECT 'lang' AS slice,
        |    coalesce(CAST(lang AS VARCHAR), 'null') AS value,
        |    (n_chars > 256) AS l
        |  FROM documents WHERE n_chars IS NOT NULL
        |  UNION ALL
        |  SELECT 'source',
        |    coalesce(CAST(source AS VARCHAR), 'null'),
        |    (n_chars > 256)
        |  FROM documents WHERE n_chars IS NOT NULL),
        |g AS (SELECT count(*) AS gn,
        |    sum(CASE WHEN l THEN 1 ELSE 0 END) AS gpos
        |  FROM b)
        |SELECT slice, value, count(*) AS n,
        |  CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |  round(CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 12) AS rate,
        |  round(CAST(gpos AS DOUBLE) / CAST(gn AS DOUBLE), 12)
        |    AS global_rate,
        |  CASE WHEN gpos > 0 AND gpos < gn THEN
        |    round((CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE)
        |      - CAST(gpos AS DOUBLE) / CAST(gn AS DOUBLE))
        |      / sqrt((CAST(gpos AS DOUBLE) / CAST(gn AS DOUBLE))
        |        * (1.0 - CAST(gpos AS DOUBLE) / CAST(gn AS DOUBLE))
        |        / CAST(count(*) AS DOUBLE)), 12)
        |  END AS z
        |FROM b CROSS JOIN g
        |GROUP BY slice, value, gn, gpos ORDER BY 1, 2""".stripMargin,
    // Cohen's κ from the exact 2×2 contingency: agree = n−a1−b1+2·both1,
    // chance = a1·b1+(n−a1)(n−b1); κ = (n·agree − chance)/(n² − chance)
    // — HUGEINT mirrors the Spark decimal(38,0) cross-multiplication,
    // one double division each, round 12
    "x_eval_kappa" ->
      """WITH g AS (SELECT count(*) AS n,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a1,
        |    sum(CASE WHEN n_chars > 256 THEN 1 ELSE 0 END) AS b1,
        |    sum(CASE WHEN lang = 'en' AND n_chars > 256
        |      THEN 1 ELSE 0 END) AS both1
        |  FROM documents
        |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL)
        |SELECT n,
        |  CASE WHEN n > 0 THEN
        |    round(CAST(n - a1 - b1 + 2 * both1 AS DOUBLE)
        |      / CAST(n AS DOUBLE), 12) END AS po,
        |  CASE WHEN CAST(n AS HUGEINT) * n
        |      - (CAST(a1 AS HUGEINT) * b1
        |        + CAST(n - a1 AS HUGEINT) * (n - b1)) <> 0 THEN
        |    round(CAST(CAST(n AS HUGEINT) * (n - a1 - b1 + 2 * both1)
        |        - (CAST(a1 AS HUGEINT) * b1
        |          + CAST(n - a1 AS HUGEINT) * (n - b1)) AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n
        |        - (CAST(a1 AS HUGEINT) * b1
        |          + CAST(n - a1 AS HUGEINT) * (n - b1)) AS DOUBLE), 12)
        |  END AS kappa
        |FROM g""".stripMargin,
    "x_text_bm25" -> bm25Oracle(Bm25Terms, 10),
    // equal-frequency calibration: quantile_cont quintile edges,
    // threshold-count bin, HUGEINT score sums → double, round 12
    "x_eval_calibration_quantile" -> {
      val qs = (1 to 4).map(i =>
        s"quantile_cont(CAST(s AS DOUBLE), 0.${2 * i}) AS t$i")
        .mkString(", ")
      val bin = (1 to 4).map(i =>
        s"(CASE WHEN CAST(s AS DOUBLE) >= t$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH b0 AS (SELECT n_chars AS s, (lang = 'en') AS l
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |t AS (SELECT $qs FROM b0)
        |SELECT CAST($bin AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |  round(CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 12)
        |    AS mean_score,
        |  round(CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE), 12) AS pos_rate
        |FROM b0 CROSS JOIN t GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // Neyman: exact decimal moments → double sigma (fixed chain),
    // 1e-6 fixed-point weights, integer floor-division quotas and
    // largest-remainder top-up — apportionment is pure integer math
    "x_sample_neyman" ->
      """WITH st AS (SELECT l_returnflag AS stratum, count(*) AS n_rows,
        |    sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      AS HUGEINT)) AS s,
        |    sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
        |        AS HUGEINT)
        |      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS ss
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL
        |    AND l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |sg AS (SELECT stratum, n_rows,
        |    sqrt(greatest((CAST(n_rows AS DOUBLE) * CAST(ss AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |      / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)),
        |      0.0)) AS sigma
        |  FROM st),
        |wf AS (SELECT stratum, n_rows, sigma,
        |    CAST(floor(CAST(n_rows AS DOUBLE) * sigma * 1e6)
        |      AS BIGINT) AS w
        |  FROM sg),
        |ww AS (SELECT stratum, n_rows, sigma, w,
        |    sum(CAST(w AS HUGEINT)) OVER () AS wtot,
        |    sum(CAST(n_rows AS HUGEINT)) OVER () AS ntot
        |  FROM wf),
        |qq AS (SELECT stratum, n_rows, sigma,
        |    CASE WHEN wtot > 0 THEN 1000 * CAST(w AS HUGEINT)
        |         ELSE 1000 * CAST(n_rows AS HUGEINT) END AS q,
        |    CASE WHEN wtot > 0 THEN wtot ELSE ntot END AS den
        |  FROM ww),
        |bb AS (SELECT stratum, n_rows, sigma,
        |    CAST((q - (((q % den) + den) % den)) // den AS BIGINT)
        |      AS base,
        |    (((q % den) + den) % den) AS rem
        |  FROM qq),
        |rr AS (SELECT stratum, n_rows, sigma, base,
        |    row_number() OVER (ORDER BY rem DESC, stratum) AS rk,
        |    sum(base) OVER () AS bsum
        |  FROM bb)
        |SELECT stratum, n_rows, round(sigma, 12) AS sigma,
        |  CAST(base + (CASE WHEN rk <= 1000 - bsum THEN 1 ELSE 0 END)
        |    AS BIGINT) AS alloc
        |FROM rr ORDER BY stratum""".stripMargin,
    // RFM quintiles: exact integer user metrics, quantile_cont
    // thresholds mirroring Spark's exact percentile, threshold-count
    // scoring (5 − exceeded for recency, 1 + exceeded otherwise)
    "x_behavior_rfm" -> {
      def q(v: String, as: String): String =
        (1 to 4).map(i =>
          s"quantile_cont(CAST($v AS DOUBLE), 0.${2 * i}) AS $as$i")
          .mkString(", ")
      def sc(v: String, b: String, invert: Boolean): String = {
        val exceeded = (1 to 4).map(i =>
          s"(CASE WHEN CAST($v AS DOUBLE) >= $b$i THEN 1 ELSE 0 END)")
          .mkString(" + ")
        if (invert) s"CAST(5 - ($exceeded) AS BIGINT)"
        else s"CAST(1 + ($exceeded) AS BIGINT)"
      }
      s"""WITH u AS (
        |  SELECT user_id AS u, max(epoch_us(ts)) AS last,
        |    count(*) AS f,
        |    CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
        |      AS BIGINT) AS m
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT u, ((SELECT max(last) FROM u) - last)
        |    // 86400000000 AS r, f, m FROM u),
        |b AS (SELECT ${q("r", "br")}, ${q("f", "bf")}, ${q("m", "bm")}
        |  FROM w)
        |SELECT ${sc("r", "br", invert = true)} AS r_score,
        |  ${sc("f", "bf", invert = false)} AS f_score,
        |  ${sc("m", "bm", invert = false)} AS m_score,
        |  count(*) AS n_users,
        |  CAST(sum(CAST(m AS HUGEINT)) AS BIGINT) AS m_total_cents
        |FROM w CROSS JOIN b
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },
    // recall@10 of IVF-vs-brute: composes the x_sim_topk and
    // x_sim_ivf_topk oracle bodies (same normalization, same
    // first-16-ids centroids, same nProbe=4 routing), then a per-query
    // bounded left join counts hits
    "x_sim_ivf_recall" ->
      """WITH v0 AS (
        |  SELECT vec_id AS id, embedding AS vec,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |v AS (SELECT id,
        |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS nvec
        |      FROM v0 WHERE nrm > 0),
        |cents AS (SELECT id AS list_id, nvec AS cvec FROM v
        |          ORDER BY id LIMIT 16),
        |assigned AS (
        |  SELECT id, nvec, list_id FROM (
        |    SELECT vv.id, vv.nvec, c.list_id,
        |      row_number() OVER (PARTITION BY vv.id ORDER BY
        |        list_sum(list_transform(range(1, len(vv.nvec) + 1),
        |          i -> vv.nvec[i] * c.cvec[i])) DESC, c.list_id) AS rn
        |    FROM v vv, cents c) WHERE rn = 1),
        |q AS (SELECT id AS query_id, nvec AS qvec FROM v WHERE id < 5),
        |probes AS (
        |  SELECT query_id, qvec, list_id FROM (
        |    SELECT qq.query_id, qq.qvec, c.list_id,
        |      row_number() OVER (PARTITION BY qq.query_id ORDER BY
        |        list_sum(list_transform(range(1, len(qq.qvec) + 1),
        |          i -> qq.qvec[i] * c.cvec[i])) DESC, c.list_id) AS rn
        |    FROM q qq, cents c) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.id AS neighbor_id,
        |    list_sum(list_transform(range(1, len(p.qvec) + 1),
        |      i -> p.qvec[i] * a.nvec[i])) AS sim
        |  FROM probes p JOIN assigned a ON p.list_id = a.list_id
        |  WHERE p.query_id <> a.id),
        |rivf AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rank
        |    FROM scored) WHERE rank <= 10),
        |sb AS (
        |  SELECT a.query_id, b.id AS neighbor_id,
        |    list_sum(list_transform(range(1, len(a.qvec) + 1),
        |      i -> a.qvec[i] * b.nvec[i])) AS sim
        |  FROM q a, v b WHERE a.query_id <> b.id),
        |rb AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rank
        |    FROM sb) WHERE rank <= 10)
        |SELECT b.query_id,
        |  CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  round(CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL
        |      THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 12) AS recall
        |FROM rb b LEFT JOIN rivf i ON b.query_id = i.query_id
        |  AND b.neighbor_id = i.neighbor_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_graph_kcore" -> kCoreOracle(25, 3),
    "x_sample_group_split" -> {
      val Seq(cTrain, cValid) = Sampling.cumThresholds(SplitWeights)
      s"""SELECT split,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  count(*) AS n_events
        |FROM (SELECT user_id,
        |    CASE WHEN u < $cTrain THEN 'train'
        |         WHEN u < $cValid THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM (SELECT user_id,
        |    ${duckHash48("('gs1' || CAST(user_id AS VARCHAR))")}
        |      / 281474976710656.0 AS u
        |  FROM events))
        |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // lag-1 autocorrelation: daily exact totals, Pearson over the
    // (day, day+1) pairs mirrored double-op-for-double-op against
    // corrMatrix (cast moments to DOUBLE, then multiply/subtract/
    // divide/sqrt); unrounded like x_profile_corr
    "x_ts_autocorr" ->
      """WITH s0 AS (SELECT
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS t,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
        |s AS (SELECT t, CAST(sum(CAST(v AS HUGEINT)) AS BIGINT) AS v
        |  FROM s0 GROUP BY 1),
        |p AS (SELECT a.v AS x, b.v AS y
        |  FROM s a JOIN s b ON b.t = a.t + 1),
        |m AS (SELECT count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM p)
        |SELECT n AS n_pairs,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |    AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |  END AS autocorr
        |FROM m""".stripMargin,
    // hour-of-day seasonality: one aggregate, 24 rows
    "x_ts_seasonality" ->
      """SELECT (epoch_us(ts) // 3600000000) % 24 AS phase,
        |  count(*) AS n,
        |  CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
        |    AS BIGINT) AS v_total,
        |  round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
        |      END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 12)
        |    AS flag_rate
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // KM product in log space: each ln snapped to 1e-12 fixed point,
    // cumulated as exact ints; d = n sends the curve to an exact 0
    "x_ts_kaplan_meier" ->
      """WITH life AS (SELECT user_id,
        |    (max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000
        |      AS dur,
        |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 1
        |      AS ev
        |  FROM events GROUP BY 1),
        |g AS (SELECT dur,
        |    sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN ev THEN 0 ELSE 1 END) AS c
        |  FROM life GROUP BY 1),
        |w AS (SELECT dur, d, c, sum(d + c) OVER () AS tot,
        |    coalesce(sum(d + c) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS rem
        |  FROM g),
        |t AS (SELECT dur, d, c, tot - rem AS nr FROM w),
        |s AS (SELECT dur, d, c, nr,
        |    CASE WHEN d > 0 AND d < nr
        |      THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE)
        |        / CAST(nr AS DOUBLE)) * 1e12) AS BIGINT)
        |      ELSE 0 END AS t12,
        |    CASE WHEN d = nr THEN 1 ELSE 0 END AS z
        |  FROM t),
        |f AS (SELECT dur, nr, d, c,
        |    sum(t12) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum12,
        |    max(z) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zz
        |  FROM s)
        |SELECT dur AS duration, CAST(nr AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_events,
        |  CAST(c AS BIGINT) AS n_censored,
        |  round(CASE WHEN zz = 1 THEN 0.0
        |    ELSE exp(CAST(cum12 AS DOUBLE) / 1e12) END, 12)
        |    AS survival
        |FROM f ORDER BY duration""".stripMargin,
    // brute-force cosine kNN (the established list_sum dot — bitwise
    // equal to Spark's HOF fold) → label-consistency counting
    "x_quality_labelnoise" ->
      """WITH v0 AS (SELECT vec_id AS id, embedding AS vec, label,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |v AS (SELECT id, label,
        |    list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS nvec
        |  FROM v0 WHERE nrm > 0),
        |q AS (SELECT * FROM v WHERE id < 500),
        |scored AS (SELECT q.id AS query_id, c.id AS neighbor_id,
        |    list_sum(list_transform(range(1, len(q.nvec) + 1),
        |      i -> q.nvec[i] * c.nvec[i])) AS sim
        |  FROM q, v c WHERE q.id <> c.id),
        |r AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM scored),
        |nn AS (SELECT query_id, neighbor_id FROM r WHERE rn <= 5),
        |ag AS (SELECT nn.query_id, lq.label AS own_label,
        |    count(*) AS n_neighbors,
        |    sum(CASE WHEN lc.label <> lq.label THEN 1 ELSE 0 END)
        |      AS n_disagree
        |  FROM nn
        |  JOIN v0 lq ON lq.id = nn.query_id
        |  JOIN v0 lc ON lc.id = nn.neighbor_id
        |  GROUP BY 1, 2)
        |SELECT query_id, own_label,
        |  CAST(n_neighbors AS BIGINT) AS n_neighbors,
        |  CAST(n_disagree AS BIGINT) AS n_disagree,
        |  round(CAST(n_disagree AS DOUBLE)
        |    / CAST(n_neighbors AS DOUBLE), 12) AS disagree_rate,
        |  n_disagree * 2 > n_neighbors AS suspect
        |FROM ag ORDER BY query_id""".stripMargin,
    // same md5 hash48 draw, same shift-past-the-positive bijection
    "x_sample_negatives" ->
      s"""WITH pos AS (SELECT DISTINCT o_custkey AS user_id,
        |    l_partkey AS pos_item
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |mx AS (SELECT CAST(max(p_partkey) AS BIGINT) AS m FROM part),
        |s AS (SELECT user_id, pos_item, CAST(t.k AS BIGINT) AS slot, m
        |  FROM pos, mx, range(1, 4) t(k)),
        |h AS (SELECT user_id, pos_item, slot, m,
        |    (${DuckSql.duckHash48("'neg_' || CAST(user_id AS VARCHAR)" +
            " || '_' || CAST(pos_item AS VARCHAR) || '_' ||" +
            " CAST(slot AS VARCHAR)")}) % (m - 1) + 1 AS n0
        |  FROM s)
        |SELECT CAST(user_id AS BIGINT) AS user_id,
        |  CAST(pos_item AS BIGINT) AS pos_item, slot,
        |  CAST(CASE WHEN n0 >= pos_item THEN n0 + 1 ELSE n0 END
        |    AS BIGINT) AS neg_item
        |FROM h ORDER BY user_id, pos_item, slot""".stripMargin,
    // exact per-dim HUGEINT moments; cosine/shift identities mirrored
    "x_drift_embedding" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE len(embedding) = 64),
        |x AS (SELECT vec_id % 2 AS side, CAST(t.d AS INTEGER) AS dim,
        |    CAST(floor(CAST(embedding[CAST(t.d AS INTEGER)] AS DOUBLE)
        |      * 1000000) AS BIGINT) AS c
        |  FROM e, range(1, 65) t(d)),
        |m AS (SELECT side, dim, sum(CAST(c AS HUGEINT)) AS s,
        |    count(*) AS n FROM x GROUP BY 1, 2),
        |j AS (SELECT r.dim, r.s AS sr, r.n AS nr, c2.s AS sc,
        |    c2.n AS nc
        |  FROM (SELECT * FROM m WHERE side = 0) r
        |  JOIN (SELECT * FROM m WHERE side = 1) c2 USING (dim)),
        |a AS (SELECT max(nr) AS fnr, max(nc) AS fnc, count(*) AS dims,
        |    sum(sr * sc) AS rc, sum(sr * sr) AS rr,
        |    sum(sc * sc) AS cc,
        |    sum((sr * nc - sc * nr) * (sr * nc - sc * nr)) AS sh
        |  FROM j)
        |SELECT CAST(fnr AS BIGINT) AS n_ref, CAST(fnc AS BIGINT)
        |    AS n_cur, CAST(dims AS BIGINT) AS dims,
        |  round(CASE WHEN rr > 0 AND cc > 0
        |    THEN CAST(rc AS DOUBLE)
        |      / (sqrt(CAST(rr AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE)))
        |    END, 12) AS centroid_cos,
        |  round(sqrt(CAST(sh AS DOUBLE))
        |    / (CAST(fnr AS DOUBLE) * CAST(fnc AS DOUBLE) * 1000000.0),
        |    12) AS mean_shift_l2
        |FROM a""".stripMargin,
    // present-cells-only MI; every ln() term snapped to 1e-12 fixed
    // point before the exact integer sum (the PSI libm absorption)
    "x_profile_mi" ->
      """WITH base AS (SELECT c_mktsegment AS a, c_nationkey AS b
        |  FROM customer
        |  WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS o FROM base GROUP BY 1, 2),
        |ra AS (SELECT a, sum(o) AS r FROM cells GROUP BY 1),
        |cb AS (SELECT b, sum(o) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT sum(o) AS nt, count(*) AS ncells FROM cells),
        |mi AS (SELECT sum(CAST(round(
        |    (CAST(o AS DOUBLE) / CAST(nt AS DOUBLE))
        |    * ln(CAST(o AS DOUBLE) * CAST(nt AS DOUBLE)
        |      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
        |    * 1e12) AS BIGINT)) AS mi12
        |  FROM cells JOIN ra USING (a) JOIN cb USING (b)
        |  CROSS JOIN tot),
        |ha AS (SELECT sum(CAST(round(
        |    -(CAST(r AS DOUBLE) / CAST(nt AS DOUBLE))
        |    * ln(CAST(r AS DOUBLE) / CAST(nt AS DOUBLE))
        |    * 1e12) AS BIGINT)) AS ha12 FROM ra CROSS JOIN tot),
        |hb AS (SELECT sum(CAST(round(
        |    -(CAST(c AS DOUBLE) / CAST(nt AS DOUBLE))
        |    * ln(CAST(c AS DOUBLE) / CAST(nt AS DOUBLE))
        |    * 1e12) AS BIGINT)) AS hb12 FROM cb CROSS JOIN tot)
        |SELECT CAST(tot.nt AS BIGINT) AS n,
        |  CAST(tot.ncells AS BIGINT) AS n_cells,
        |  round(CAST(mi12 AS DOUBLE) / 1e12, 12) AS mi,
        |  round(CAST(ha12 AS DOUBLE) / 1e12, 12) AS h_a,
        |  round(CAST(hb12 AS DOUBLE) / 1e12, 12) AS h_b,
        |  round(CASE WHEN least(ha12, hb12) > 0
        |    THEN CAST(mi12 AS DOUBLE) / CAST(least(ha12, hb12)
        |      AS DOUBLE) END, 12) AS mi_norm
        |FROM mi, ha, hb, tot""".stripMargin,
    // per-arm HUGEINT moments; θ, adjusted mean, and variance identities
    // mirrored double-op-for-double-op (see Experiment.cuped)
    "x_ab_cuped" ->
      """WITH f AS (SELECT user_id, epoch_us(ts) AS tu,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |u AS (SELECT user_id,
        |    sum(CASE WHEN tu < 1705363200000000 THEN cents
        |      ELSE 0 END) AS x,
        |    sum(CASE WHEN tu >= 1705363200000000 THEN cents
        |      ELSE 0 END) AS y
        |  FROM f GROUP BY 1),
        |a AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'control'
        |      ELSE 'treat' END AS arm,
        |    CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y FROM u),
        |m AS (SELECT arm, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM a GROUP BY 1),
        |p AS (SELECT sum(n) AS pn, sum(sx) AS psx, sum(sy) AS psy,
        |    sum(sxx) AS psxx, sum(sxy) AS psxy FROM m),
        |c AS (SELECT m.arm, m.n, m.sx, m.sy, m.sxx, m.syy, m.sxy,
        |    p.pn, p.psx,
        |    CASE WHEN CAST(pn AS DOUBLE) * CAST(psxx AS DOUBLE)
        |        - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE) > 0
        |      THEN (CAST(pn AS DOUBLE) * CAST(psxy AS DOUBLE)
        |          - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE))
        |        / (CAST(pn AS DOUBLE) * CAST(psxx AS DOUBLE)
        |          - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE))
        |      ELSE 0 END AS th
        |  FROM m CROSS JOIN p)
        |SELECT arm, CAST(n AS BIGINT) AS n,
        |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 12)
        |    AS mean_post,
        |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        |    - th * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST(psx AS DOUBLE) / CAST(pn AS DOUBLE)), 12)
        |    AS mean_adj,
        |  round((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 12) AS var_post,
        |  round((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |    - 2 * th * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |    + th * th * ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 12) AS var_adj
        |FROM c ORDER BY arm""".stripMargin
  )

  /** Mirrors the SparkEntry zone-map layout bit-for-bit: 6-bit lanes
    * (quantity, ship-day >> 6), file id = z-value >> 6, stats at full
    * resolution, skip test for q ∈ [10,20] ∧ d ∈ [100,400]. The
    * interleave terms are generated from the SAME (bits, lane) loop as
    * Layout.zValue.
    */
  /** Shared CUSUM oracle (x_ts_cusum and x_stream_cusum): the
    * prefix-sum − running-min identity, mirrored window-for-window.
    */
  /** Shared CTE chain of the substring-dedup oracles: the corpus +
    * planted fixture, all 8-gram occurrences, every gram-sharing
    * diagonal position between ordered doc pairs, and the maximal
    * chained runs ≥ 30 tokens (sa = a-side start). Extracted so the
    * detect and apply rows cannot drift from each other.
    */
  private def substringCtes: String =
    """base AS (
      |  SELECT doc_id AS id,
      |    list_filter(regexp_split_to_array(text, '\s+'),
      |      x -> x <> '') AS toks
      |  FROM documents),
      |planted AS (
      |  SELECT a.id + 7000000 AS id,
      |    list_concat(list_slice(a.toks, 7, 41),
      |      list_slice(b.toks, 1, 12)) AS toks
      |  FROM base a JOIN base b ON b.id = a.id + 100 WHERE a.id < 40),
      |allt AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
      |g AS (SELECT id, i AS pos,
      |        array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
      |      FROM allt,
      |        unnest(range(1, greatest(len(toks) - 7, 0) + 1)) t(i)),
      |m AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
      |        a.pos - b.pos AS diag, a.pos AS pos
      |      FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id),
      |r AS (SELECT id_a, id_b, diag, pos,
      |        pos - row_number() OVER (PARTITION BY id_a, id_b, diag
      |                                 ORDER BY pos) AS chain
      |      FROM m),
      |runs AS (SELECT id_a, id_b, diag, chain, min(pos) AS sa,
      |           count(*) + 7 AS run_len
      |         FROM r GROUP BY 1, 2, 3, 4 HAVING count(*) + 7 >= 30)"""
      .stripMargin

  /** Shared CTE chain computing per-distinct-word greedy BPE piece
    * counts over Fixtures.BpeVocab (embedded as a list literal so the
    * two engines cannot drift): `words` (distinct corpus words) →
    * `bpos` (every in-word position) → `bm` (longest matching piece
    * length at each position; 1 = single-char fallback) → `brec` (the
    * recursive greedy orbit pos → pos + step) → `bcnt` (w, n_pieces).
    * Callers must open with WITH RECURSIVE.
    */
  private def bpeCntCtes: String = {
    val vs = Fixtures.BpeVocab.map(v => s"'$v'").mkString(", ")
    bpeSegCtes(s"SELECT unnest([$vs]) AS v")
  }

  /** [[bpeCntCtes]] with the piece set supplied as a CTE body — the
    * round-12 learned-vocab twin plugs `SELECT DISTINCT merged AS v
    * FROM learned` in here.
    */
  private def bpeSegCtes(bvocabSql: String): String = {
    s"""words AS (
      |  SELECT DISTINCT unnest(list_filter(
      |    regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS w
      |  FROM documents),
      |bpos AS (
      |  SELECT w, unnest(range(1, len(w) + 1)) AS p FROM words),
      |bvocab AS ($bvocabSql),
      |bm AS (
      |  SELECT bpos.w, bpos.p, coalesce(max(len(v)), 1) AS step
      |  FROM bpos LEFT JOIN bvocab
      |    ON substr(bpos.w, CAST(bpos.p AS INTEGER), len(v)) = v
      |  GROUP BY 1, 2),
      |brec AS (
      |  SELECT w, CAST(1 AS BIGINT) AS p, CAST(0 AS BIGINT) AS n
      |  FROM words
      |  UNION ALL
      |  SELECT r.w, r.p + bm.step, r.n + 1
      |  FROM brec r JOIN bm ON bm.w = r.w AND bm.p = r.p),
      |bcnt AS (SELECT w, max(n) AS n_pieces FROM brec GROUP BY w),
      |btok AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS w
      |  FROM documents)""".stripMargin
  }

  /** DuckDB re-learn of [[graft.ext.BpeTrainer]]'s merge sequence —
    * one CTE block per step i: `p{i}` adjacent-pair counts over the
    * current symbol state, `b{i}` the deterministic argmax
    * (count desc, pair lexicographic; a chr(1) sentinel row keeps the
    * chain alive after learning stops — chr(1) can never equal a
    * corpus symbol, so the step's apply is the identity), `a{i}` the
    * recursive leftmost-first merge orbit (pos += 2 on a match, += 1
    * otherwise, accumulator list is the new symbol array), `s{i}` the
    * next state. Every multiply-referenced CTE is MATERIALIZED — the
    * chain references each state twice (pair counts + apply), so the
    * default inlining would re-evaluate the corpus scan 2^n times.
    * Ends with `learned` = the executed merges. Callers must open
    * with WITH RECURSIVE.
    */
  private def bpeLearnCtes(nSteps: Int, minCount: Long): String = {
    val steps = (1 to nSteps).map { i =>
      s"""p$i AS MATERIALIZED (
      |  SELECT syms[CAST(j AS INTEGER)] AS l,
      |    syms[CAST(j AS INTEGER) + 1] AS r, sum(cnt) AS c
      |  FROM s${i - 1}, unnest(range(1, len(syms))) t(j) GROUP BY 1, 2),
      |b$i AS MATERIALIZED (
      |  SELECT l, r, c FROM (
      |    SELECT l, r, c, 0 AS pri FROM (
      |      SELECT l, r, c FROM p$i WHERE c >= $minCount
      |      ORDER BY c DESC, l, r LIMIT 1)
      |    UNION ALL SELECT chr(1), chr(1), 0, 1)
      |  ORDER BY pri LIMIT 1),
      |a$i AS (
      |  SELECT w, cnt, syms, CAST(1 AS BIGINT) AS p,
      |    CAST([] AS VARCHAR[]) AS acc
      |  FROM s${i - 1}
      |  UNION ALL
      |  SELECT a.w, a.cnt, a.syms,
      |    a.p + CASE WHEN a.p < len(a.syms)
      |      AND a.syms[CAST(a.p AS INTEGER)] = b.l
      |      AND a.syms[CAST(a.p AS INTEGER) + 1] = b.r THEN 2 ELSE 1 END,
      |    list_append(a.acc, CASE WHEN a.p < len(a.syms)
      |      AND a.syms[CAST(a.p AS INTEGER)] = b.l
      |      AND a.syms[CAST(a.p AS INTEGER) + 1] = b.r THEN b.l || b.r
      |      ELSE a.syms[CAST(a.p AS INTEGER)] END)
      |  FROM a$i a, b$i b WHERE a.p <= len(a.syms)),
      |s$i AS MATERIALIZED (
      |  SELECT w, cnt, acc AS syms FROM a$i WHERE p > len(syms))"""
        .stripMargin
    }.mkString(",\n")
    val learned = (1 to nSteps).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS merge_rank, l AS lhs, r AS rhs,
      |    l || r AS merged, CAST(c AS BIGINT) AS cnt
      |  FROM b$i WHERE l <> chr(1)""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""w0 AS MATERIALIZED (
    |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    |    SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
    |      x -> x <> '')) AS w
    |    FROM documents)
    |  GROUP BY w),
    |s0 AS MATERIALIZED (
    |  SELECT w, cnt, list_transform(range(1, len(w) + 1),
    |    i -> substr(w, CAST(i AS INTEGER), 1)) AS syms
    |  FROM w0),
    |$steps,
    |learned AS MATERIALIZED (
    |  $learned)""".stripMargin
  }

  private def cusumOracle: String =
    """WITH f AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
      |p AS (SELECT event_id, user_id, ts_us,
      |    sum(cents - 15000) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
      |  FROM f),
      |m AS (SELECT event_id, user_id, pp,
      |    least(0, min(pp) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS mn
      |  FROM p)
      |SELECT event_id, user_id, CAST(pp - mn AS BIGINT) AS cusum,
      |  (pp - mn) > 1000000 AS flagged
      |FROM m ORDER BY event_id""".stripMargin

  /** Shared z-bucket file-stats CTE chain (ends at `f`) for the
    * zone-map and compaction oracles — the interleave terms come from
    * the SAME (bits, lane) loop as Layout.zValue.
    */
  private def zonemapCore: String = {
    val terms = (0 until 6).map { b =>
      s"(((q >> $b) & 1) << ${2 * b}) + (((dc >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")
    s"""WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS q,
      |    CAST(date_diff('day', DATE '1995-01-01',
      |      CAST(l_shipdate AS DATE)) AS BIGINT) AS d FROM lineitem),
      |z AS (SELECT q, d, d >> 6 AS dc FROM li),
      |zz AS (SELECT q, d, ($terms) AS zv FROM z),
      |f AS (SELECT zv >> 6 AS file_id, min(q) AS min_q, max(q) AS max_q,
      |  min(d) AS min_d, max(d) AS max_d, count(*) AS n_rows
      |  FROM zz GROUP BY 1)""".stripMargin
  }

  /** DuckDB twin of the bloom-skip pipeline: same z-file assignment as
    * [[zonemapCore]] (terms from the identical (bits, lane) loop), the
    * per-file 512-bit blocked bloom rebuilt from the SAME md5 hash48,
    * word = p // 64, mask = 1 << (p % 64), probes {1, 777, 5555}.
    */
  private def bloomskipOracle: String = {
    val terms = (0 until 6).map { b =>
      s"(((q >> $b) & 1) << ${2 * b}) + (((dc >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")
    s"""WITH li AS (SELECT l_orderkey AS ok,
      |    CAST(l_quantity AS BIGINT) AS q,
      |    CAST(date_diff('day', DATE '1995-01-01',
      |      CAST(l_shipdate AS DATE)) AS BIGINT) AS d FROM lineitem),
      |z AS (SELECT ok, q, d >> 6 AS dc FROM li),
      |zz AS (SELECT ok, ($terms) AS zv FROM z),
      |f AS (SELECT zv >> 6 AS file_id, ok FROM zz),
      |hh AS (SELECT file_id,
      |    ${DuckSql.duckHash48("CAST(ok AS VARCHAR)")} AS h FROM f),
      |pos AS (SELECT file_id, h % 512 AS p FROM hh
      |  UNION ALL SELECT file_id, (h // 512) % 512 AS p FROM hh),
      |wb AS (SELECT file_id, CAST(p // 64 AS BIGINT) AS word,
      |    bit_or(CAST(1 AS HUGEINT) << CAST(p % 64 AS INTEGER)) AS bits
      |  FROM pos GROUP BY 1, 2),
      |pr AS (SELECT CAST(pk AS VARCHAR) AS v
      |  FROM (VALUES (1), (777), (5555)) t(pk)),
      |ph AS (SELECT ${DuckSql.duckHash48("v")} AS h FROM pr),
      |pp AS (SELECT h % 512 AS p1, (h // 512) % 512 AS p2 FROM ph),
      |h1 AS (SELECT DISTINCT wb.file_id, pp.p1, pp.p2
      |  FROM wb JOIN pp ON wb.word = pp.p1 // 64
      |  WHERE (wb.bits
      |    & (CAST(1 AS HUGEINT) << CAST(pp.p1 % 64 AS INTEGER))) <> 0),
      |h2 AS (SELECT DISTINCT h1.file_id
      |  FROM h1 JOIN wb ON wb.file_id = h1.file_id
      |    AND wb.word = h1.p2 // 64
      |  WHERE (wb.bits
      |    & (CAST(1 AS HUGEINT) << CAST(h1.p2 % 64 AS INTEGER))) <> 0)
      |SELECT f2.file_id, (h2.file_id IS NOT NULL) AS scanned
      |FROM (SELECT DISTINCT file_id FROM wb) f2
      |LEFT JOIN h2 ON h2.file_id = f2.file_id
      |ORDER BY f2.file_id""".stripMargin
  }

  private def zonemapOracle: String =
    s"""$zonemapCore
      |SELECT file_id, min_q, max_q, min_d, max_d, n_rows,
      |  (max_q >= 10 AND min_q <= 20 AND max_d >= 100 AND min_d <= 400)
      |    AS scanned
      |FROM f ORDER BY file_id""".stripMargin

  /** DuckDB twin of Profile.corrMatrix over the lineitem cent columns:
    * HUGEINT moments (exact, order-free), the r assembly mirrored
    * double-op-for-double-op (cast sums to DOUBLE first, then
    * multiply/subtract/divide/sqrt — all IEEE correctly rounded).
    */
  private def corrOracle: String = {
    val cols = Seq(
      "qty" -> "CAST(l_quantity AS BIGINT)",
      "price_c" -> "CAST(round(l_extendedprice * 100) AS BIGINT)",
      "disc_c" -> "CAST(round(l_discount * 100) AS BIGINT)",
      "tax_c" -> "CAST(round(l_tax * 100) AS BIGINT)")
    val names = cols.map(_._1)
    val pairs = for {
      (a, i) <- names.zipWithIndex; (b, j) <- names.zipWithIndex if i < j
    } yield (a, b)
    val sel = cols.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val notNull = names.map(n => s"$n IS NOT NULL").mkString(" AND ")
    def h(n: String) = s"CAST($n AS HUGEINT)"
    val sums = (names.map(n => s"sum(${h(n)}) AS s_$n") ++
      names.map(n => s"sum(${h(n)} * ${h(n)}) AS ss_$n") ++
      pairs.map { case (a, b) =>
        s"sum(${h(a)} * ${h(b)}) AS sp_${a}__$b" } :+
      "count(*) AS n").mkString(",\n    ")
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val rows = pairs.map { case (a, b) =>
      s"""  SELECT '$a' AS col_a, '$b' AS col_b, n,
         |    ${d("n")} * ${d(s"sp_${a}__$b")}
         |      - ${d(s"s_$a")} * ${d(s"s_$b")} AS cov,
         |    ${d("n")} * ${d(s"ss_$a")} - ${d(s"s_$a")} * ${d(s"s_$a")}
         |      AS va,
         |    ${d("n")} * ${d(s"ss_$b")} - ${d(s"s_$b")} * ${d(s"s_$b")}
         |      AS vb
         |  FROM s""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH c AS (SELECT $sel FROM lineitem),
      |cc AS (SELECT * FROM c WHERE $notNull),
      |s AS (SELECT
      |    $sums
      |  FROM cc)
      |SELECT col_a, col_b, n,
      |  round(CASE WHEN va > 0 AND vb > 0
      |    THEN cov / (sqrt(va) * sqrt(vb)) END, 12) AS corr
      |FROM (
      |$rows)
      |ORDER BY col_a, col_b""".stripMargin
  }

  /** Mirrors SparkEntry.SessionGapUs. A `def`: `sql` above interpolates
    * it during object init, and a forward-referenced `val` would still
    * be 0 at that point.
    */
  private def duckSessionGapUs: Long = 6L * 3600L * 1000000L

  /** The fixed-point PageRank oracle, unrolled to `iters` CTE rounds
    * over the customer→supplier purchase graph. Exact-integer mirror of
    * Graph.pageRank (init = 10¹² // N, base = (15·init) // 100,
    * r' = base + (85·Σ(r // deg) [+ dang // N]) // 100); `dangling`
    * adds the redistribute term — the Σ of the previous round's rank
    * over nodes with no out-edges, shared uniformly.
    */
  /** Personalized-PageRank twin of
    * [[graft.ext.Graph.personalizedPageRank]] on the purchase graph:
    * init and per-round base mass go to the SEED nodes only
    * (Scale div |S|), everything else identical to [[pageRankOracle]]
    * without the dangling term.
    */
  private def pprOracle(iters: Int, seeds: Seq[Long]): String = {
    val seedList = seeds.mkString(", ")
    def iterCte(prev: String, cur: String): String =
      s"""$cur AS (
        |  SELECT n.id,
        |    (CASE WHEN n.id IN ($seedList)
        |       THEN (SELECT base FROM cst) ELSE 0 END)
        |      + (85 * coalesce(s.sc, 0)) // 100 AS r
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS id, sum(r.r // e.deg) AS sc
        |    FROM ed e JOIN $prev r ON r.id = e.src
        |    GROUP BY 1) s ON n.id = s.id)""".stripMargin
    val rounds = (1 to iters)
      .map(i => iterCte(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH e0 AS (
      |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |nodes AS (SELECT src AS id FROM e0 UNION SELECT dst FROM e0),
      |cst AS (SELECT 1000000000000 // ${seeds.size} AS init,
      |    (15 * (1000000000000 // ${seeds.size})) // 100 AS base),
      |deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
      |ed AS (SELECT e.src, e.dst, d.deg FROM e0 e JOIN deg d USING (src)),
      |r0 AS (SELECT id,
      |    CASE WHEN id IN ($seedList) THEN (SELECT init FROM cst)
      |      ELSE 0 END AS r
      |  FROM nodes),
      |$rounds
      |SELECT id AS node_id,
      |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
      |    AS node_type,
      |  CAST(r AS BIGINT) AS rank_scaled
      |FROM r$iters
      |ORDER BY rank_scaled DESC, node_id LIMIT 20""".stripMargin
  }

  /** Exact two-sample KS between the R cohort's whole-dollar prices
    * (optionally one monitoring window `l_orderkey % 3 = w` of it)
    * and the N cohort — the [[graft.ext.Profile.ksTwoSample]] twin:
    * integer CDF cross-multiplication, HUGEINT products mirroring
    * decimal(38,0), min-v tie-break on the supremum. `w = None` emits
    * the plain row (x_drift_ks); `Some(w)` prefixes a window_id
    * column for the streamed monitor's per-window blocks.
    */
  /** Shared CTE block deriving the two retrieval runs the rank-fusion
    * and rank-overlap oracles compare: `ra` = float-cosine top-10 of
    * the 5 query vectors against the corpus, `rb` = the int8
    * symmetric-quantized top-10 (the x_sim_topk / x_sim_quantized
    * derivations verbatim). Emitted pre-stripped (no margin pipes) so
    * callers splice it into their own stripMargin strings.
    */
  private def cosineRunLegsCte: String =
    """nq AS (
      |  SELECT vec_id AS query_id, embedding AS vec,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings WHERE vec_id < 5),
      |q AS (SELECT query_id,
      |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS qv
      |      FROM nq WHERE nrm > 0),
      |nc AS (
      |  SELECT vec_id AS neighbor_id, embedding AS vec,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings),
      |c AS (SELECT neighbor_id,
      |        list_transform(vec, x -> CAST(x AS DOUBLE) / nrm) AS cv
      |      FROM nc WHERE nrm > 0),
      |sa AS (
      |  SELECT query_id, neighbor_id,
      |    list_sum(list_transform(range(1, len(qv) + 1),
      |      i -> qv[i] * cv[i])) AS sim
      |  FROM q, c WHERE query_id <> neighbor_id),
      |ra0 AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM sa),
      |ra AS (SELECT query_id, neighbor_id AS doc_id, rank
      |       FROM ra0 WHERE rank <= 10),
      |q1 AS (SELECT query_id, qv,
      |         list_max(list_transform(qv, x -> abs(x))) / 127.0 AS qs
      |       FROM q),
      |qq AS (SELECT query_id, qs,
      |        list_transform(qv, x -> floor(x / qs + 0.5)) AS qa
      |      FROM q1),
      |c1 AS (SELECT neighbor_id, cv,
      |         list_max(list_transform(cv, x -> abs(x))) / 127.0 AS cs
      |       FROM c),
      |cc AS (SELECT neighbor_id, cs,
      |        list_transform(cv, x -> floor(x / cs + 0.5)) AS ca
      |      FROM c1),
      |sb AS (
      |  SELECT query_id, neighbor_id,
      |    list_sum(list_transform(range(1, len(qa) + 1),
      |      i -> qa[i] * ca[i])) * qs * cs AS sim
      |  FROM qq, cc WHERE query_id <> neighbor_id),
      |rb0 AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM sb),
      |rb AS (SELECT query_id, neighbor_id AS doc_id, rank
      |       FROM rb0 WHERE rank <= 10)""".stripMargin

  private def ksDriftSql(w: Option[Int]): String = {
    val widCol = w.map(i => s"CAST($i AS BIGINT) AS window_id,\n  ")
      .getOrElse("")
    val wFilter = w.map(i => s" AND l_orderkey % 3 = $i").getOrElse("")
    s"""SELECT * FROM (
      |WITH pa AS (SELECT
      |    CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS v
      |  FROM lineitem WHERE l_returnflag = 'R'$wFilter),
      |pb AS (SELECT
      |    CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS v
      |  FROM lineitem WHERE l_returnflag = 'N'),
      |fa AS (SELECT v, count(*) AS ca FROM pa GROUP BY 1),
      |fb AS (SELECT v, count(*) AS cb FROM pb GROUP BY 1),
      |m AS (SELECT coalesce(fa.v, fb.v) AS v,
      |    coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      |  FROM fa FULL OUTER JOIN fb ON fa.v = fb.v),
      |cu AS (SELECT v,
      |    sum(ca) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    sum(cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      |  FROM m),
      |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM m),
      |sc AS (SELECT v, na, nb,
      |    abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
      |      AS d
      |  FROM cu, t),
      |mx AS (SELECT max(d) AS dmax FROM sc)
      |SELECT $widCol""".stripMargin +
    s"""CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  round(CAST(dmax AS DOUBLE)
      |    / CAST(CAST(na AS HUGEINT) * nb AS DOUBLE), 12) AS ks,
      |  min(v) AS ks_at
      |FROM sc, mx WHERE d = dmax GROUP BY na, nb, dmax) ksq""".stripMargin
  }

  /** Unrolled sync label-propagation twin of
    * [[graft.ext.Graph.labelPropagation]] on the thinned co-purchase
    * graph: each round's argmax is a row_number over the grouped
    * neighbor-label counts with the same (count desc, label asc)
    * tie-break the Spark side encodes as max(struct(cnt, -label)).
    */
  private def lpaOracle(iters: Int): String = {
    def iterCte(prev: String, cur: String): String =
      s"""$cur AS (SELECT a AS id, lbl FROM (
        |    SELECT a, lbl,
        |      row_number() OVER (PARTITION BY a
        |        ORDER BY cnt DESC, lbl) AS rn
        |    FROM (SELECT s.a, r.lbl, count(*) AS cnt
        |          FROM sym s JOIN $prev r ON s.b = r.id
        |          GROUP BY 1, 2))
        |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters)
      .map(i => iterCte(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH li AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
      |  WHERE l_orderkey % 3 = 0),
      |und AS (SELECT DISTINCT a.p AS a, b.p AS b
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      |sym AS (SELECT a, b FROM und
      |  UNION ALL SELECT b AS a, a AS b FROM und),
      |r0 AS (SELECT DISTINCT a AS id, a AS lbl FROM sym),
      |$rounds
      |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS size
      |FROM r$iters GROUP BY 1
      |ORDER BY size DESC, community LIMIT 20""".stripMargin
  }

  /** CTE-unrolled HITS twin of [[graft.ext.Graph.hits]] on the same
    * purchase graph as [[pageRankOracle]]: per round an authority sum
    * + L1 normalization, then a hub sum + L1 normalization, every
    * product HUGEINT (mirroring decimal(38,0)) and every
    * normalization a floor division of nonnegative integers —
    * identical to Spark's `div` truncation.
    */
  private def hitsOracle(iters: Int): String = {
    def round(i: Int): String =
      s"""a$i AS (SELECT n.id, CAST(coalesce(s.ar, 0) AS HUGEINT) AS ar
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS id, sum(p.h) AS ar
        |    FROM e0 e JOIN h${i - 1}n p ON p.id = e.src
        |    GROUP BY 1) s ON n.id = s.id),
        |a${i}n AS (SELECT id,
        |  (ar * 1000000000) // (SELECT sum(ar) FROM a$i) AS a FROM a$i),
        |h$i AS (SELECT n.id, CAST(coalesce(s.hr, 0) AS HUGEINT) AS hr
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.src AS id, sum(p.a) AS hr
        |    FROM e0 e JOIN a${i}n p ON p.id = e.dst
        |    GROUP BY 1) s ON n.id = s.id),
        |h${i}n AS (SELECT id,
        |  (hr * 1000000000) // (SELECT sum(hr) FROM h$i) AS h
        |  FROM h$i)""".stripMargin
    val rounds = (1 to iters).map(round).mkString(",\n")
    s"""WITH e0 AS (
      |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |nodes AS (SELECT src AS id FROM e0 UNION SELECT dst FROM e0),
      |h0n AS (SELECT id, CAST(1000000000 AS HUGEINT) AS h FROM nodes),
      |$rounds
      |SELECT h.id AS node_id, CAST(h.h AS BIGINT) AS hub_scaled,
      |  CAST(a.a AS BIGINT) AS auth_scaled
      |FROM h${iters}n h JOIN a${iters}n a ON h.id = a.id
      |ORDER BY auth_scaled DESC, node_id LIMIT 20""".stripMargin
  }

  private def pageRankOracle(iters: Int, dangling: Boolean): String = {
    def iterCte(prev: String, cur: String): String = {
      val dang =
        if (!dangling) ""
        else s""" +
          |      (SELECT coalesce(sum(p.r), 0) FROM $prev p
          |       WHERE p.id NOT IN (SELECT src FROM deg))
          |        // (SELECT n FROM cst)""".stripMargin
      s"""$cur AS (
        |  SELECT n.id,
        |    (SELECT base FROM cst)
        |      + (85 * (coalesce(s.sc, 0)$dang)) // 100 AS r
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS id, sum(r.r // e.deg) AS sc
        |    FROM ed e JOIN $prev r ON r.id = e.src
        |    GROUP BY 1) s ON n.id = s.id)""".stripMargin
    }
    val rounds = (1 to iters)
      .map(i => iterCte(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH e0 AS (
      |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |nodes AS (SELECT src AS id FROM e0 UNION SELECT dst FROM e0),
      |cst AS (SELECT 1000000000000 // count(*) AS init,
      |    (15 * (1000000000000 // count(*))) // 100 AS base,
      |    count(*) AS n
      |  FROM nodes),
      |deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
      |ed AS (SELECT e.src, e.dst, d.deg FROM e0 e JOIN deg d USING (src)),
      |r0 AS (SELECT id, (SELECT init FROM cst) AS r FROM nodes),
      |$rounds
      |SELECT id AS node_id,
      |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
      |    AS node_type,
      |  CAST(r AS BIGINT) AS rank_scaled
      |FROM r$iters ORDER BY rank_scaled DESC, node_id LIMIT 20""".stripMargin
  }

  /** Shared by x_cdc_merge and x_cdc_upsert (a `def` for the same
    * object-init reason as [[duckSessionGapUs]]): the window
    * formulation of events-as-change-log LWW with 'error' tombstones.
    */
  /** BM25 twin of [[graft.ext.TextAnalysis.bm25TopK]] — the rational
    * Robertson idf and the 10·L-cross-multiplied tf saturation, per-
    * term CASE contributions added in the same fixed order as the
    * Spark `reduce`, HUGEINT products mirroring decimal(38,0).
    */
  private[oracle] def bm25Oracle(terms: Seq[String], topN: Int,
      from: String = "documents"): String = {
    val tfCols = terms.indices.map(i =>
      s"CAST(len(list_filter(toks, x -> x = '${terms(i)}')) AS BIGINT)" +
        s" AS tf$i").mkString(",\n    ")
    val dfCols = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
      .mkString(", ")
    val contribs = terms.indices.map(i =>
      s"""(CASE WHEN tf$i > 0 THEN
         |    (CAST(2 * n - 2 * df$i + 1 AS DOUBLE)
         |      / CAST(2 * df$i + 1 AS DOUBLE))
         |    * (CAST(22 * (CAST(tf$i AS HUGEINT) * l) AS DOUBLE)
         |      / CAST(10 * (CAST(tf$i AS HUGEINT) * l) + 3 * l
         |        + 9 * (CAST(len AS HUGEINT) * n) AS DOUBLE))
         |    ELSE 0.0 END)""".stripMargin).mkString("\n  + ")
    s"""WITH t AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
      |      AS toks
      |  FROM $from),
      |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len,
      |    $tfCols
      |  FROM t),
      |s AS (SELECT count(*) AS n, CAST(sum(len) AS HUGEINT) AS l,
      |    $dfCols
      |  FROM d),
      |sc AS (SELECT doc_id,
      |  $contribs AS score
      |  FROM d CROSS JOIN s),
      |r AS (SELECT doc_id, score,
      |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      |  FROM sc WHERE score > 0)
      |SELECT doc_id, round(score, 12) AS score,
      |  CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= $topN ORDER BY rank""".stripMargin
  }

  /** k-core twin of [[graft.ext.Graph.kCorePeel]] on the co-purchase
    * part graph: the same `rounds` synchronous peels unrolled as CTE
    * pairs (degree filter, both-endpoint edge prune).
    */
  /** Shared synthetic-image hash recompute (x_mm_phash_neardup /
    * x_mm_phash_served): every luma byte of the BMP fixtures and every
    * dHash bit re-derived arithmetically — `hh` is (item_id, dhash).
    */
  // a def, not a val: the `sql` map initializes first and would
  // interpolate a null
  private def phashItemHashCtes: String =
    """d AS (
      |  SELECT doc_id AS src, doc_id % 13 + 1 AS w, doc_id % 7 + 1 AS h
      |  FROM documents),
      |items AS (
      |  SELECT src, src * 2 AS item_id, 0 AS pert, w, h FROM d
      |  UNION ALL
      |  SELECT src, src * 2 + 1, 1, w, h FROM d WHERE src % 5 = 0),
      |g AS (
      |  SELECT item_id,
      |    list_transform(range(0, 64), i ->
      |      ((((src + ((i % 8) * w // 8)) % 256) * 299
      |        + (CASE WHEN pert = 1 AND ((i % 8) * w // 8) = 0
      |                AND ((i // 8) * h // 8) = 0
      |           THEN (src % 256 + 128) % 256 ELSE src % 256 END) * 587
      |        + (((src * 3 + ((i // 8) * h // 8)) % 256) * 114))
      |        // 1000)) AS luma
      |  FROM items),
      |hh AS (
      |  SELECT item_id,
      |    CAST(list_sum(list_transform(range(0, 56), b ->
      |      CASE WHEN luma[(b // 7) * 8 + (b % 7) + 2]
      |             > luma[(b // 7) * 8 + (b % 7) + 1]
      |        THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END))
      |      AS BIGINT) AS dhash
      |  FROM g)""".stripMargin

  private def kCoreOracle(k: Int, rounds: Int): String = {
    val ctes = (1 to rounds).map(i =>
      s"""a$i AS (SELECT a FROM e${i - 1} GROUP BY a
         |  HAVING count(*) >= $k),
         |e$i AS (SELECT e.a, e.b FROM e${i - 1} e
         |  JOIN a$i x ON e.a = x.a JOIN a$i y ON e.b = y.a)"""
        .stripMargin).mkString(",\n")
    s"""WITH li AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
      |  WHERE l_orderkey % 3 = 0),
      |und AS (SELECT DISTINCT a.p AS a, b.p AS b
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      |e0 AS (SELECT a, b FROM und
      |  UNION ALL SELECT b AS a, a AS b FROM und),
      |$ctes
      |SELECT a AS id, count(*) AS deg FROM e$rounds GROUP BY 1
      |ORDER BY deg DESC, id LIMIT 50""".stripMargin
  }

  private def cdcMergeOracle: String =
    """WITH last AS (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_id AS last_event_id,
      |  event_type AS last_type, value AS last_value
      |FROM last WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin
}
