package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, IntegerType, TimestampType}

import graft.core.{Converters, DateSpan, Nm}
import graft.functions.{Dedup, Layout, Packing, Pii, Sampling, TextAnalysis, Vectors}
import graft.sources.Sources
import graft.tables._


/** DuckDB oracle SQL for the gate queries, chunk B (stable
  * entry order; split for compile-unit size only). */
private[graft] object OracleSqlB {
  import EntryOracleDefs._
  def m: Map[String, String] = Map(
    "join_nearest" ->
      """WITH c AS (
           SELECT user_id, event_id AS click_id, epoch_us(ts) AS cts
           FROM events WHERE event_type = 'click'),
         p AS (
           SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pts
           FROM events WHERE event_type = 'purchase'),
         j AS (
           SELECT c.user_id, click_id, purchase_id, abs(cts - pts) AS distance,
             row_number() OVER (PARTITION BY c.user_id, click_id
               ORDER BY abs(cts - pts), purchase_id) AS rn
           FROM c JOIN p ON c.user_id = p.user_id
           WHERE abs(cts - pts) <= 3600000000)
         SELECT user_id, click_id, purchase_id, distance
         FROM j WHERE rn = 1 ORDER BY user_id, click_id""",

    // as-of replay: the same union-tag + user-keyed IGNORE NULLS carry
    // window (quotes sort before probes at equal ts, largest click id wins
    // ties), the same 2h staleness void
    "join_asof" ->
      """WITH un AS (
           SELECT user_id, ts, 0 AS tag, event_id AS ord,
             CAST(NULL AS BIGINT) AS pid, event_id AS q_id, value AS q_val,
             ts AS q_ts
           FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts, 1 AS tag, CAST(NULL AS BIGINT) AS ord,
             event_id AS pid, NULL, NULL, NULL
           FROM events WHERE event_type = 'purchase'),
         w AS (
           SELECT *,
             last_value(q_id IGNORE NULLS) OVER win AS c_id,
             last_value(q_val IGNORE NULLS) OVER win AS c_val,
             last_value(q_ts IGNORE NULLS) OVER win AS c_ts
           FROM un
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, tag, ord
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         f AS (
           SELECT *, c_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(c_ts) <= 7200::BIGINT * 1000000 AS ok
           FROM w WHERE tag = 1)
         SELECT pid AS event_id, user_id, ts,
           CASE WHEN ok THEN c_id END AS click_id,
           CASE WHEN ok THEN c_val END AS click_value,
           CASE WHEN ok THEN c_ts END AS quote_time
         FROM f ORDER BY event_id""",

    // via the absent-predecessor anti-join, nearest-start assignment, then
    // the plain inequality join DuckDB can afford at oracle scale
    "join_interval" ->
      """WITH b AS (
           SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin, count(*) AS cnt
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total, count(*) AS nb
           FROM b GROUP BY 1),
         hot AS (
           SELECT b.event_type, bin FROM b JOIN tot USING (event_type)
           WHERE cnt * 10 * nb >= 12 * total),
         starts AS (
           SELECT h.event_type, h.bin FROM hot h
           LEFT JOIN hot p ON p.event_type = h.event_type AND p.bin = h.bin - 1
           WHERE p.bin IS NULL),
         assigned AS (
           SELECT h.event_type, h.bin, max(s.bin) AS s
           FROM hot h JOIN starts s
             ON s.event_type = h.event_type AND s.bin <= h.bin
           GROUP BY h.event_type, h.bin),
         bands AS (
           SELECT event_type AS band_type,
             s * CAST(10.0 AS DOUBLE) + CAST(2.5 AS DOUBLE) AS lo,
             (max(bin) + 1) * CAST(10.0 AS DOUBLE) - CAST(2.5 AS DOUBLE) AS hi
           FROM assigned GROUP BY event_type, s)
         SELECT e.event_id, e.event_type, e.value, band_type, lo, hi
         FROM events e JOIN bands ON e.value >= lo AND e.value < hi
         ORDER BY event_id, band_type""",

    // overlap replay: per-user daily spans, then the plain overlap theta
    // join DuckDB can afford at oracle scale
    "join_overlap" ->
      """WITH c AS (
           SELECT user_id, CAST(ts AS DATE) AS c_day,
             min(epoch_us(ts)) AS c_lo, max(epoch_us(ts)) + 1 AS c_hi
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         v AS (
           SELECT user_id, CAST(ts AS DATE) AS v_day,
             min(epoch_us(ts)) AS v_lo, max(epoch_us(ts)) + 1 AS v_hi
           FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT c.user_id, c_day, v_day, c_lo, c_hi, v_lo, v_hi
         FROM c JOIN v ON c.user_id = v.user_id
           AND c_lo < v_hi AND v_lo < c_hi
         ORDER BY c.user_id, c_day, v_day""",

    // CCNet bucket replay: the text_lm_score chain, then per-language
    // histogram tercile bins and integer-bin head/middle/tail labels
    "curate_ppl_buckets" ->
      s"""WITH d AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         tk AS (
           SELECT doc_id, tok FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
           WHERE tok <> ''),
         c AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
         st AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS v FROM c),
         sc AS (
           SELECT doc_id, count(*) AS n_tokens,
             round(CAST(CAST(sum(lp) AS DOUBLE) / count(*) AS DECIMAL(18,8)), 4)::DOUBLE
               AS avg_logprob
           FROM (
             SELECT doc_id,
               CAST(ln((CAST(c AS DOUBLE) + 1.0) / (CAST(t AS DOUBLE) + v))
                 AS DECIMAL(18,8)) AS lp
             FROM tk JOIN c USING (tok) CROSS JOIN st) GROUP BY doc_id),
         scg AS (
           SELECT sc.doc_id, dd.lang, sc.n_tokens, sc.avg_logprob,
             CAST(floor(sc.avg_logprob / 0.005) AS BIGINT) AS bin
           FROM sc JOIN documents dd USING (doc_id)),
         b AS (SELECT lang, bin, count(*) AS cnt FROM scg GROUP BY 1, 2),
         cum AS (
           SELECT a.lang, a.bin, CAST(sum(b2.cnt) AS BIGINT) AS cum_count
           FROM b a JOIN b b2 ON b2.lang = a.lang AND b2.bin <= a.bin
           GROUP BY a.lang, a.bin),
         tot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS total FROM b GROUP BY 1),
         qs(q) AS (VALUES (CAST(0.33 AS DOUBLE)), (CAST(0.66 AS DOUBLE))),
         pick AS (
           SELECT lang, q, bin FROM (
             SELECT e.lang, q, bin,
               row_number() OVER (PARTITION BY e.lang, q ORDER BY bin ASC) AS rn
             FROM qs JOIN (SELECT cum.lang, bin, cum_count, total
                           FROM cum JOIN tot ON cum.lang = tot.lang) e
               ON CAST(cum_count AS DOUBLE) >= q * total) WHERE rn = 1),
         th AS (
           SELECT lang,
             min(CASE WHEN q = CAST(0.33 AS DOUBLE) THEN bin END) AS b_lo,
             min(CASE WHEN q = CAST(0.66 AS DOUBLE) THEN bin END) AS b_hi
           FROM pick GROUP BY lang)
         SELECT scg.doc_id, scg.lang, scg.n_tokens, scg.avg_logprob,
           CASE WHEN scg.bin <= th.b_lo THEN 'tail'
                WHEN scg.bin <= th.b_hi THEN 'middle'
                ELSE 'head' END AS bucket
         FROM scg JOIN th USING (lang) ORDER BY scg.doc_id""",

    "text_repetition" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         g AS (
           SELECT doc_id, toks, list_transform(range(0, greatest(len(toks)-1, 0)),
             i -> array_to_string(toks[i+1:i+2], ' ')) AS bg FROM norm),
         m AS (
           SELECT doc_id, toks, bg,
             list_max(list_transform(list_distinct(bg),
               b -> len(list_filter(bg, x -> x = b)))) AS mx FROM g)
         SELECT doc_id,
           round(CAST(CASE WHEN len(bg) < 2 THEN 0 ELSE (mx - 1) / (len(bg) - 1) END
             AS DECIMAL(18,8)), 4)::DOUBLE AS top_bigram_frac,
           round(CAST(CASE WHEN len(toks) = 0 THEN 0
             ELSE 1 - len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) END
             AS DECIMAL(18,8)), 4)::DOUBLE AS dup_token_frac
         FROM m ORDER BY doc_id""",

    "dedup_simhash" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         h AS (
           SELECT doc_id,
             list_transform(toks, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
           FROM norm),
         fp AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60), j ->
               CASE WHEN list_sum(list_transform(hs, hh ->
                      CASE WHEN (hh >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                    THEN (1::BIGINT << j::INTEGER) ELSE 0::BIGINT END)) AS BIGINT) AS f
           FROM h)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.f, b.f)) <= 3
         ORDER BY id_a, id_b""",

    "dedup_cosine_lsh" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         w AS (
           SELECT p, list_transform(range(0, (SELECT len(v) FROM e LIMIT 1)), d ->
             ((('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT % 10000)
               / 10000.0 - 0.5)) AS wv
           FROM range(0, 4) t(p)),
         b AS (
           SELECT vec_id, v,
             (SELECT CAST(sum(CASE WHEN list_dot_product(e2.v, w.wv) >= 0
                          THEN (1::BIGINT << (3 - w.p)::INTEGER) ELSE 0::BIGINT END) AS BIGINT)
              FROM w) AS bucket
           FROM e e2),
         p AS (
           SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             list_dot_product(a.v, b2.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))) AS cos
           FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
         SELECT id_a, id_b, round(CAST(cos AS DECIMAL(18,8)), 4)::DOUBLE AS cosine
         FROM p WHERE cos >= 0.4 ORDER BY id_a, id_b""",

    "sim_ann_lsh" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         w AS (
           SELECT p, list_transform(range(0, (SELECT len(v) FROM e LIMIT 1)), d ->
             ((('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT % 10000)
               / 10000.0 - 0.5)) AS wv
           FROM range(0, 8) t(p)),
         cb AS (
           SELECT e2.vec_id, e2.v, tt.t,
             (SELECT CAST(sum(CASE WHEN list_dot_product(e2.v, w.wv) >= 0
                          THEN (1::BIGINT << (3 - (w.p - tt.t * 4))::INTEGER) ELSE 0::BIGINT END) AS BIGINT)
              FROM w WHERE w.p >= tt.t * 4 AND w.p < tt.t * 4 + 4) AS bucket
           FROM e e2 CROSS JOIN range(0, 2) tt(t)),
         probes AS (
           SELECT q.vec_id, q.v, q.t,
             unnest(list_distinct(list_concat([q.bucket],
               list_transform(range(0, 4), i -> xor(q.bucket, (1::BIGINT << i::INTEGER)))))) AS bucket
           FROM cb q WHERE q.vec_id < 10),
         j AS (
           SELECT DISTINCT p2.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(p2.v, c.v)
               / (sqrt(list_dot_product(p2.v, p2.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM probes p2 JOIN cb c ON p2.t = c.t AND p2.bucket = c.bucket AND p2.vec_id != c.vec_id)
         SELECT query_id, neighbor_id, round(CAST(cos AS DECIMAL(18,8)), 4)::DOUBLE AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         FROM j QUALIFY rank <= 5 ORDER BY query_id, rank""",

    "sim_ann_recall" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         w AS (
           SELECT p, list_transform(range(0, (SELECT len(v) FROM e LIMIT 1)), d ->
             ((('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT % 10000)
               / 10000.0 - 0.5)) AS wv
           FROM range(0, 8) t(p)),
         cb AS (
           SELECT e2.vec_id, e2.v, tt.t,
             (SELECT CAST(sum(CASE WHEN list_dot_product(e2.v, w.wv) >= 0
                          THEN (1::BIGINT << (3 - (w.p - tt.t * 4))::INTEGER) ELSE 0::BIGINT END) AS BIGINT)
              FROM w WHERE w.p >= tt.t * 4 AND w.p < tt.t * 4 + 4) AS bucket
           FROM e e2 CROSS JOIN range(0, 2) tt(t)),
         probes AS (
           SELECT q.vec_id, q.v, q.t,
             unnest(list_distinct(list_concat([q.bucket],
               list_transform(range(0, 4), i -> xor(q.bucket, (1::BIGINT << i::INTEGER)))))) AS bucket
           FROM cb q WHERE q.vec_id < 10),
         j AS (
           SELECT DISTINCT p2.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(p2.v, c.v)
               / (sqrt(list_dot_product(p2.v, p2.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM probes p2 JOIN cb c ON p2.t = c.t AND p2.bucket = c.bucket AND p2.vec_id != c.vec_id),
         ann AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           FROM j QUALIFY rank <= 5),
         bp AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM (SELECT * FROM e WHERE vec_id < 10) q CROSS JOIN e c WHERE q.vec_id != c.vec_id),
         brute AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           FROM bp QUALIFY rank <= 5),
         h AS (
           SELECT b.query_id, count(*) AS hits
           FROM brute b JOIN ann a
             ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
           GROUP BY b.query_id)
         SELECT q.vec_id AS query_id,
           CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           round(CAST(coalesce(h.hits, 0) / 5.0 AS DECIMAL(18,8)), 4)::DOUBLE AS recall
         FROM (SELECT DISTINCT vec_id FROM e WHERE vec_id < 10) q
         LEFT JOIN h ON q.vec_id = h.query_id
         ORDER BY query_id""",

    "sim_kmeans" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         c0 AS (SELECT vec_id AS cluster, v AS cv FROM e ORDER BY vec_id LIMIT 8),
         a1 AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c0.cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c0.cv)
                   + list_dot_product(c0.cv, c0.cv) ASC, c0.cluster ASC) AS rn
             FROM e CROSS JOIN c0) WHERE rn = 1),
         c1 AS (
           SELECT cluster, list(cx ORDER BY dim) AS cv FROM (
             SELECT cluster, dim, sum(x::DECIMAL(30,10))::DOUBLE / count(*) AS cx
             FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a1)
             GROUP BY cluster, dim) GROUP BY cluster),
         a2 AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c1.cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c1.cv)
                   + list_dot_product(c1.cv, c1.cv) ASC, c1.cluster ASC) AS rn
             FROM e CROSS JOIN c1) WHERE rn = 1),
         c2 AS (
           SELECT cluster, list(cx ORDER BY dim) AS cv FROM (
             SELECT cluster, dim, sum(x::DECIMAL(30,10))::DOUBLE / count(*) AS cx
             FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a2)
             GROUP BY cluster, dim) GROUP BY cluster)
         SELECT vec_id, cluster, round(CAST(d2 AS DECIMAL(18,8)), 4)::DOUBLE AS d2 FROM (
           SELECT e.vec_id, c2.cluster,
             list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c2.cv)
               + list_dot_product(c2.cv, c2.cv) AS d2,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c2.cv)
                 + list_dot_product(c2.cv, c2.cv) ASC, c2.cluster ASC) AS rn
           FROM e CROSS JOIN c2) WHERE rn = 1 ORDER BY vec_id""",

    // cluster-quality replay: the sim_kmeans training chain, assignment
    // with the same rounded d², decimal-staged cohesion mean, and the k×k
    // separation scan with the identical (d², cluster) tie-break
    "sim_cluster_quality" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         c0 AS (SELECT vec_id AS cluster, v AS cv FROM e ORDER BY vec_id LIMIT 8),
         a1 AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c0.cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c0.cv)
                   + list_dot_product(c0.cv, c0.cv) ASC, c0.cluster ASC) AS rn
             FROM e CROSS JOIN c0) WHERE rn = 1),
         c1 AS (
           SELECT cluster, list(cx ORDER BY dim) AS cv FROM (
             SELECT cluster, dim, sum(x::DECIMAL(30,10))::DOUBLE / count(*) AS cx
             FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a1)
             GROUP BY cluster, dim) GROUP BY cluster),
         a2 AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c1.cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c1.cv)
                   + list_dot_product(c1.cv, c1.cv) ASC, c1.cluster ASC) AS rn
             FROM e CROSS JOIN c1) WHERE rn = 1),
         c2 AS (
           SELECT cluster, list(cx ORDER BY dim) AS cv FROM (
             SELECT cluster, dim, sum(x::DECIMAL(30,10))::DOUBLE / count(*) AS cx
             FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a2)
             GROUP BY cluster, dim) GROUP BY cluster),
         asg AS (
           SELECT vec_id, cluster, round(CAST(d2 AS DECIMAL(18,8)), 4)::DOUBLE AS d2 FROM (
             SELECT e.vec_id, c2.cluster,
               list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c2.cv)
                 + list_dot_product(c2.cv, c2.cv) AS d2,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c2.cv)
                   + list_dot_product(c2.cv, c2.cv) ASC, c2.cluster ASC) AS rn
             FROM e CROSS JOIN c2) WHERE rn = 1),
         coh AS (
           SELECT cluster, count(*) AS n,
             round(CAST(sum(d2::DECIMAL(18,4))::DOUBLE / count(*)
               AS DECIMAL(18,8)), 4)::DOUBLE AS mean_d2
           FROM asg GROUP BY cluster),
         sep AS (
           SELECT cluster, nn_cluster,
             round(CAST(d2 AS DECIMAL(18,8)), 4)::DOUBLE AS nn_d2 FROM (
             SELECT a.cluster, b.cluster AS nn_cluster,
               list_dot_product(a.cv, a.cv) - 2*list_dot_product(a.cv, b.cv)
                 + list_dot_product(b.cv, b.cv) AS d2,
               row_number() OVER (PARTITION BY a.cluster ORDER BY
                 list_dot_product(a.cv, a.cv) - 2*list_dot_product(a.cv, b.cv)
                   + list_dot_product(b.cv, b.cv) ASC, b.cluster ASC) AS rn
             FROM c2 a JOIN c2 b ON a.cluster <> b.cluster) WHERE rn = 1)
         SELECT coh.cluster, n, mean_d2, nn_cluster, nn_d2
         FROM coh JOIN sep ON coh.cluster = sep.cluster ORDER BY coh.cluster""",

    "sim_quantize" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         s AS (
           SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127 AS scale FROM e),
         q AS (
           SELECT vec_id, v, scale, list_transform(v,
             x -> CASE WHEN scale = 0 THEN 0
                  ELSE CAST(floor(x/scale + 0.5) AS INT) END) AS qi
           FROM s),
         r AS (
           SELECT vec_id, scale, qi,
             list_transform(range(1, len(v)+1), i -> v[i] - qi[i]*scale) AS res
           FROM q)
         SELECT vec_id, scale,
           md5(array_to_string(list_transform(qi, x -> x::VARCHAR), ',')) AS q_fp,
           round(CAST(list_dot_product(res, res) AS DECIMAL(18,8)), 6)::DOUBLE AS err
         FROM r ORDER BY vec_id""",

    "sim_ann_pq" -> pqOracleSql,

    "sim_ann_ivfpq" -> ivfPqOracleSql,
    "sim_ann_rerank" -> pqRerankOracleSql,

    "text_classifier" ->
      s"""WITH norm AS (
           SELECT doc_id, $normSql AS nt FROM documents),
         toks AS (
           SELECT doc_id, unnest(list_filter(string_split(nt, ' '), t -> len(t) > 0)) AS tok
           FROM norm),
         w AS (
           SELECT doc_id,
             CAST(sum(('0x'||substr(md5(tok || 'clf-v1'),1,15))::BIGINT % 2000001 - 1000000)
               AS BIGINT) AS micro_sum,
             count(*) AS n
           FROM toks GROUP BY doc_id)
         SELECT norm.doc_id,
           coalesce(w.micro_sum, 0) AS micro_sum,
           round(CAST(CASE WHEN w.n IS NULL THEN 0.0
             ELSE w.micro_sum::DOUBLE / (w.n::DOUBLE * 1000000.0::DOUBLE) END
             AS DECIMAL(18,8)), 6)::DOUBLE AS margin,
           coalesce(w.micro_sum, 0) > 0 AS keep
         FROM norm LEFT JOIN w ON norm.doc_id = w.doc_id
         ORDER BY norm.doc_id""",

    // PMI replay: same unigram/bigram counts, the identical
    // (cnt·Nu²)/(Nbi·ca·cb) operation order through ln, same cut
    "text_pmi" ->
      s"""WITH norm AS (
           SELECT doc_id, list_filter(string_split($normSql, ' '), t -> len(t) > 0) AS toks
           FROM documents),
         tok AS (
           SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
           FROM norm),
         uni AS (SELECT tok, count(*) AS cu FROM tok GROUP BY tok),
         nu AS (SELECT CAST(sum(cu) AS BIGINT) AS nu FROM uni),
         bi0 AS (
           SELECT a.tok AS ta, b.tok AS tb, a.tok || ' ' || b.tok AS pair
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         nb AS (SELECT count(*) AS nb FROM bi0),
         bi AS (
           SELECT pair, min(ta) AS ta, min(tb) AS tb, count(*) AS cnt
           FROM bi0 GROUP BY pair HAVING count(*) >= 5)
         SELECT pair, cnt,
           round(CAST(ln((cnt::DOUBLE * nu.nu * nu.nu)
               / (nb.nb::DOUBLE * ua.cu * ub.cu)) AS DECIMAL(18,8)), 4)::DOUBLE
             AS pmi
         FROM bi JOIN uni ua ON bi.ta = ua.tok
                 JOIN uni ub ON bi.tb = ub.tok
                 CROSS JOIN nu CROSS JOIN nb
         ORDER BY pmi DESC, pair LIMIT 50""",

    "text_bpe_pairs" ->
      s"""WITH norm AS (
           SELECT doc_id, list_filter(string_split($normSql, ' '), t -> len(t) > 0) AS toks
           FROM documents),
         tok AS (
           SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
           FROM norm),
         p AS (
           SELECT a.tok || ' ' || b.tok AS pair
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
         SELECT pair, count(*) AS cnt FROM p
         GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50""",

    "text_bpe_train" -> bpeTrainOracleSql(6),
    "text_bpe_apply" -> bpeApplyOracleSql(6),

    // host-cap replay: same per-source ranking by token count
    "curate_host_cap" ->
      s"""WITH t AS (
           SELECT doc_id, source,
             len(list_filter(string_split($normSql, ' '), x -> x <> ''))
               AS n_toks
           FROM documents),
         r AS (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY n_toks DESC, doc_id) AS rank
           FROM t)
         SELECT doc_id, source, CAST(rank AS INTEGER) AS rank
         FROM r WHERE rank <= 20 ORDER BY doc_id""",

    // lang-mismatch replay: the langid CASE per doc with its declared
    // label, matrix rollup, per-declared totals
    "curate_lang_mismatch" ->
      s"""WITH norm AS (
           SELECT lang AS declared, string_split($normSql, ' ') AS toks
           FROM documents),
         sc AS (
           SELECT declared,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS s_en,
             len(list_filter(toks, w -> w IN ('der','und','das','ist','nicht'))) AS s_de,
             len(list_filter(toks, w -> w IN ('le','et','les','des','une'))) AS s_fr,
             len(list_filter(toks, w -> w IN ('el','los','y','las','una'))) AS s_es
           FROM norm),
         det AS (
           SELECT declared,
             CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                  ELSE 'fr' END AS detected
           FROM sc),
         pairs AS (
           SELECT declared, detected, count(*) AS n FROM det GROUP BY 1, 2),
         tot AS (
           SELECT declared, CAST(sum(n) AS BIGINT) AS tot FROM pairs GROUP BY 1)
         SELECT declared, detected, n,
           round(CAST(n::DOUBLE / tot AS DECIMAL(18,8)), 4)::DOUBLE AS frac,
           declared = detected AS agree
         FROM pairs JOIN tot USING (declared)
         ORDER BY declared, detected""",

    // null-profile replay: one wide aggregation over the doctored frame,
    // stacked per column; counters are additive so the streaming twin
    // shares it verbatim
    "stats_null_profile" -> nullProfileOracleSql,
    "stream_null_profile" -> nullProfileOracleSql,

    // data-card replay: the text_quality chain per doc plus md5 content
    // fingerprints, corpus-wide dup counts, then the slice rollup
    "curate_datacard" ->
      s"""WITH base AS (
           SELECT doc_id, source, lang,
             CASE WHEN doc_id % 17 = 0
               THEN 'standard boilerplate footer all rights reserved'
               ELSE text END AS text
           FROM documents),
         norm AS (
           SELECT doc_id, source, lang, text,
             string_split($normSql, ' ') AS toks, $normSql AS nt
           FROM base),
         c AS (
           SELECT doc_id, source, lang,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS nstop,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
               AS npunct,
             length(text) AS tl,
             md5(nt) AS fp
           FROM norm),
         q AS (
           SELECT doc_id, source, lang, ntok, fp,
             round(CAST(least(tl / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0
                  ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN tl = 0 THEN 1.0
                  ELSE npunct::DOUBLE / tl END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE AS quality
           FROM c),
         fpc AS (SELECT fp, count(*) AS n FROM q GROUP BY 1)
         SELECT source, lang, count(*) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS total_tokens,
           round(CAST(CAST(sum(ntok) AS DOUBLE) / count(*)
             AS DECIMAL(18,8)), 2)::DOUBLE AS avg_tokens,
           round(CAST(CAST(sum(CAST(quality AS DECIMAL(18,8))) AS DOUBLE)
             / count(*) AS DECIMAL(18,8)), 4)::DOUBLE AS mean_quality,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
           round(CAST(CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS DECIMAL(18,8)), 4)::DOUBLE AS dup_rate
         FROM q JOIN fpc USING (fp)
         GROUP BY source, lang ORDER BY source, lang""",

    // URL canonicalization replay: the same variant synthesis and the
    // same regex rewrites (RE2 syntax, \1-style backrefs are not needed)
    "curate_url_canon" ->
      """WITH u AS (
           SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN 'http://s' || ((doc_id // 5) % 20)::VARCHAR
                 || '.example.com/docs/' || (doc_id // 5)::VARCHAR
                 || '?id=' || (doc_id // 5)::VARCHAR
               WHEN 1 THEN 'HTTP://' || upper('s' || ((doc_id // 5) % 20)::VARCHAR
                 || '.example.com') || ':80/docs/' || (doc_id // 5)::VARCHAR
                 || '?id=' || (doc_id // 5)::VARCHAR
               WHEN 2 THEN 'http://s' || ((doc_id // 5) % 20)::VARCHAR
                 || '.example.com/docs/' || (doc_id // 5)::VARCHAR
                 || '/?id=' || (doc_id // 5)::VARCHAR || '#frag'
               WHEN 3 THEN 'http://s' || ((doc_id // 5) % 20)::VARCHAR
                 || '.example.com/docs/' || (doc_id // 5)::VARCHAR
                 || '?utm_source=feed&utm_campaign=x&id=' || (doc_id // 5)::VARCHAR
               ELSE 'https://s' || ((doc_id // 5) % 20)::VARCHAR
                 || '.example.com:443/docs/' || (doc_id // 5)::VARCHAR
                 || '?id=' || (doc_id // 5)::VARCHAR
             END AS url
           FROM documents),
         c AS (
           SELECT doc_id,
             regexp_replace(lower(regexp_extract(trim(url),
               '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)), ':(80|443)$', '')
             || regexp_replace(regexp_extract(regexp_replace(trim(url),
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '^([^?#]*)', 1), '/+$', '')
             || CASE WHEN regexp_extract(trim(url), '[?&]id=([0-9]+)', 1) = ''
                THEN '' ELSE '?id=' || regexp_extract(trim(url), '[?&]id=([0-9]+)', 1)
                END AS canonical_url
           FROM u)
         SELECT canonical_url, count(*) AS n_variants,
           min(doc_id) AS keep_id
         FROM c GROUP BY canonical_url ORDER BY canonical_url""",

    // boilerplate replay: same explode + two-level aggregation
    "curate_boilerplate" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         g AS (
           SELECT doc_id, unnest(CASE WHEN len(toks) < 3
               THEN CAST([] AS VARCHAR[])
               ELSE list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(toks[i+1:i+3], ' ')) END) AS ngram
           FROM norm),
         pd AS (SELECT ngram, doc_id, count(*) AS occ FROM g GROUP BY 1, 2),
         nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
         SELECT ngram, count(*) AS df, CAST(sum(occ) AS BIGINT) AS occ,
           round(CAST(count(*)::DOUBLE / n AS DECIMAL(18,8)), 4)::DOUBLE
             AS frac_docs
         FROM pd CROSS JOIN nd GROUP BY ngram, n
         HAVING count(*) >= 5 ORDER BY ngram""",

    // rule replay: the same first-violated CASE chain over the same
    // scan-speed signals
    "curate_rules" ->
      s"""WITH d AS (
           SELECT doc_id, lang, n_chars, $normSql AS nt FROM documents),
         t AS (
           SELECT doc_id, lang, n_chars,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS tok
           FROM d)
         SELECT doc_id,
           CASE WHEN tok = 0 THEN 'empty'
                WHEN tok < 25 THEN 'too_short'
                WHEN n_chars > 900 THEN 'too_long'
                WHEN lang = 'zh' THEN 'cjk_excluded'
                ELSE NULL END AS violated_rule,
           (CASE WHEN tok = 0 THEN 'empty'
                WHEN tok < 25 THEN 'too_short'
                WHEN n_chars > 900 THEN 'too_long'
                WHEN lang = 'zh' THEN 'cjk_excluded'
                ELSE NULL END) IS NULL AS kept
         FROM t ORDER BY doc_id""",

    // padding replay: same per-candidate clamp/pad sums and staged ratio
    "pack_padding_audit" ->
      s"""WITH d AS (
           SELECT CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS t
           FROM (SELECT $normSql AS nt FROM documents)),
         c(ctx) AS (VALUES (64), (128), (256)),
         agg AS (
           SELECT ctx, count(*) AS n_docs,
             CAST(sum(t) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN t <= 0 THEN 0
               ELSE ctx - least(t, ctx) END) AS BIGINT) AS padded_tokens,
             CAST(sum(CASE WHEN t <= 0 THEN 0
               ELSE least(t, ctx) END) AS BIGINT) AS kept
           FROM d CROSS JOIN c GROUP BY ctx)
         SELECT ctx AS ctx_len, n_docs, total_tokens, padded_tokens,
           round(CAST(padded_tokens::DOUBLE
               / greatest(kept + padded_tokens, 1) AS DECIMAL(18,8)), 6)::DOUBLE
             AS pad_frac
         FROM agg ORDER BY ctx_len""",

    // length-bucket replay: same bins, md5 shard + order, windowed batch
    // ordinals, per-batch padding arithmetic
    "pack_length_buckets" ->
      s"""WITH d AS (
           SELECT doc_id,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS n_tok
           FROM (SELECT doc_id, $normSql AS nt FROM documents)),
         b AS (
           SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, n_tok // 16 AS bin,
             ('0x'||substr(md5(doc_id::VARCHAR || 'lb'),1,15))::BIGINT % 4 AS shard,
             md5(doc_id::VARCHAR || 'lb') AS h
           FROM d),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY bin, shard
             ORDER BY h, doc_id) - 1 AS rn
           FROM b),
         p AS (SELECT n_tok, bin, shard, rn // 8 AS batch FROM r)
         SELECT CAST(bin AS BIGINT) AS bin, CAST(shard AS BIGINT) AS shard,
           CAST(batch AS BIGINT) AS batch, count(*) AS n_rows,
           CAST(max(n_tok) AS BIGINT) AS max_tok,
           CAST(sum(n_tok) AS BIGINT) AS sum_tok,
           CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_tokens,
           round(CAST(CASE WHEN count(*) * max(n_tok) = 0 THEN 0.0
             ELSE CAST(count(*) * max(n_tok) - sum(n_tok) AS DOUBLE)
               / (count(*) * max(n_tok)) END
             AS DECIMAL(18,8)), 4)::DOUBLE AS pad_frac
         FROM p GROUP BY bin, shard, batch ORDER BY bin, shard, batch""",

    // epoch-shuffle replay: the same md5-derived shard and order keys
    "sample_epoch_shuffle" ->
      """SELECT doc_id, 3 AS epoch,
           CAST(('0x'||substr(md5(doc_id::VARCHAR || 'epoch3-shard'),1,15))::BIGINT
             % 8 AS INTEGER) AS shard,
           ('0x'||substr(md5(doc_id::VARCHAR || 'epoch3-order'),1,15))::BIGINT
             AS sort_key
         FROM documents ORDER BY doc_id""",

    "sample_mixture" ->
      s"""WITH d AS (
           SELECT doc_id, lang,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS n_tokens
           FROM (SELECT doc_id, lang, $normSql AS nt FROM documents)),
         g AS (SELECT lang, sum(n_tokens) AS gt FROM d GROUP BY lang),
         t AS (SELECT sum(gt) AS tt FROM g),
         r AS (
           SELECT lang, CAST(floor(least(1.0::DOUBLE,
             0.5::DOUBLE * (CASE lang WHEN 'en' THEN 0.5::DOUBLE WHEN 'de' THEN 0.15::DOUBLE
               WHEN 'es' THEN 0.15::DOUBLE WHEN 'fr' THEN 0.1::DOUBLE
               WHEN 'zh' THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END)
             * tt::DOUBLE / gt::DOUBLE) * 10000 + 0.5::DOUBLE) AS BIGINT) AS rate_bp
           FROM g CROSS JOIN t)
         SELECT d.doc_id, d.lang, d.n_tokens, r.rate_bp,
           ('0x'||substr(md5(d.doc_id::VARCHAR || 'mix-v1'),1,15))::BIGINT % 10000 < r.rate_bp
             AS kept
         FROM d JOIN r ON d.lang = r.lang
         ORDER BY doc_id""",

    // kappa replay: the text_quality score replay and the token-count rule
    // feed the same 2×2 confusion row; po/pe round before κ forms
    "curate_kappa" -> kappaOracleSql,
    // additive confusion counts: the monitor's folded state equals the
    // one-pass row — identical replay
    "stream_kappa" -> kappaOracleSql,
    // McNemar replay: same confusion CTE, asymmetry readout
    "curate_mcnemar" -> mcnemarOracleSql,
    // Scott's pi / Gwet's AC1 replay: same confusion CTE, pooled-marginal
    // chance terms
    "curate_gwet" -> gwetOracleSql,
    "stream_gwet" -> gwetOracleSql,
    "stream_mcnemar" -> mcnemarOracleSql,
    // Cochran's Q replay: three-filter panel, exact-integer Q
    "curate_cochranq" -> cochranOracleSql,
    "stream_cochranq" -> cochranOracleSql,
    // Fleiss replay: same panel state, beyond-chance agreement
    "curate_fleiss" -> fleissOracleSql,
    "stream_fleiss" -> fleissOracleSql,

    // AUC replay: micro-sum and quality-label replays feed the same
    // per-score count table; cumulative window is fine at oracle scale,
    // HUGEINT keeps the doubled U exact
    "curate_auc" -> aucOracleSql,
    // additive per-score counts: the monitor's folded state equals the
    // one-pass table — identical replay
    "stream_auc" -> aucOracleSql,
    // gains/lift replay: same score+label counts, top-first cumulation,
    // decile boundary rows via conditional mins
    "curate_gains" -> gainsOracleSql,
    "stream_gains" -> gainsOracleSql,
    // confusion-metrics replay: same counts, four conditional sums at
    // the zero cut, exact MCC numerator
    "curate_confusion" -> confusionOracleSql,
    "stream_confusion" -> confusionOracleSql,
    // ECE replay: 4dp quality probability vs classifier verdict, decile
    // bins with staged sums
    "curate_ece" -> eceOracleSql,

    // P/R/F1 replay: same score and label replays, per-threshold
    // conditional sums unpivoted, integer-exact F1
    "curate_pr_curve" -> prCurveOracleSql,
    // same additive per-score state, same cuts — identical replay
    "stream_pr_curve" -> prCurveOracleSql,

    // reliability replay: same bins (IEEE floor of the exact micro-sum over
    // the width), same rate divide
    "curate_reliability" -> reliabilityOracleSql,
    // the same additive score-count state, binned — identical replay
    "stream_reliability" -> reliabilityOracleSql,

    // τ-sampling replay: same per-group token masses, pow staged in
    // DECIMAL(28,8) before the order-independent denominator sum, same
    // share/rate arithmetic and floor(x·bp + 0.5) threshold rounding
    "sample_temperature" ->
      s"""WITH d AS (
           SELECT doc_id, lang,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS n_tokens
           FROM (SELECT doc_id, lang, $normSql AS nt FROM documents)),
         g AS (SELECT lang, sum(n_tokens) AS gt FROM d GROUP BY lang),
         p AS (SELECT lang, gt,
             CAST(pow(gt::DOUBLE, 0.7::DOUBLE) AS DECIMAL(28,8)) AS pw FROM g),
         t AS (SELECT sum(gt) AS tt, sum(pw) AS pt FROM p),
         r AS (
           SELECT lang,
             CAST(floor((pw::DOUBLE / pt::DOUBLE) * 10000 + 0.5::DOUBLE)
               AS BIGINT) AS share_bp,
             CAST(floor(least(1.0::DOUBLE,
               0.5::DOUBLE * (pw::DOUBLE / pt::DOUBLE)
                 * tt::DOUBLE / gt::DOUBLE) * 10000 + 0.5::DOUBLE)
               AS BIGINT) AS rate_bp
           FROM p CROSS JOIN t)
         SELECT d.doc_id, d.lang, d.n_tokens, r.share_bp, r.rate_bp,
           ('0x'||substr(md5(d.doc_id::VARCHAR || 'temp-v1'),1,15))::BIGINT % 10000 < r.rate_bp
             AS kept
         FROM d JOIN r ON d.lang = r.lang
         ORDER BY doc_id""",

    // additive masses: the monitor's folded state feeds the same rate
    // arithmetic — group-level replay of the τ-sampling table
    "stream_mixture" ->
      s"""WITH d AS (
           SELECT doc_id, lang,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS n_tokens
           FROM (SELECT doc_id, lang, $normSql AS nt FROM documents)),
         g AS (SELECT lang, sum(n_tokens) AS gt FROM d GROUP BY lang),
         p AS (SELECT lang, gt,
             CAST(pow(gt::DOUBLE, 0.7::DOUBLE) AS DECIMAL(28,8)) AS pw FROM g),
         t AS (SELECT sum(gt) AS tt, sum(pw) AS pt FROM p)
         SELECT lang, CAST(gt AS BIGINT) AS mass,
           CAST(floor((pw::DOUBLE / pt::DOUBLE) * 10000 + 0.5::DOUBLE)
             AS BIGINT) AS share_bp,
           CAST(floor(least(1.0::DOUBLE,
             0.5::DOUBLE * (pw::DOUBLE / pt::DOUBLE)
               * tt::DOUBLE / gt::DOUBLE) * 10000 + 0.5::DOUBLE)
             AS BIGINT) AS rate_bp
         FROM p CROSS JOIN t
         ORDER BY lang""",

    "dedup_incremental" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(toks[i+1:i+3], ' ')) END) AS s
           FROM norm),
         pairs AS (
           SELECT n.doc_id AS new_id, c.doc_id AS match_id,
             len(list_intersect(n.s, c.s))::DOUBLE
               / len(list_distinct(list_concat(n.s, c.s))) AS jac
           FROM sh n JOIN sh c
             ON n.doc_id % 5 = 0 AND c.doc_id % 5 <> 0)
         SELECT new_id, match_id, round(jac, 4) AS jaccard
         FROM pairs WHERE jac >= 0.8 ORDER BY new_id, match_id""",

    // ordered-batch replay: a pair is found iff the match arrived in a
    // strictly earlier batch (batch = doc_id % 5) and exact jaccard >= 0.8
    "stream_dedup_index" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(toks[i+1:i+3], ' ')) END) AS s
           FROM norm),
         pairs AS (
           SELECT n.doc_id AS new_id, c.doc_id AS match_id,
             len(list_intersect(n.s, c.s))::DOUBLE
               / len(list_distinct(list_concat(n.s, c.s))) AS jac
           FROM sh n JOIN sh c
             ON (n.doc_id % 5) > (c.doc_id % 5))
         SELECT new_id, match_id, round(jac, 4) AS jaccard
         FROM pairs WHERE jac >= 0.8 ORDER BY new_id, match_id""",

    "layout_zorder" ->
      """WITH o AS (
           SELECT (o_custkey % 256)::BIGINT AS x,
             (date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 256)::BIGINT AS y
           FROM orders),
         z AS (
           SELECT x, y, list_sum(list_transform(range(0, 8), i ->
             (((x >> i::INTEGER) & 1) << (2*i)::INTEGER)
               + (((y >> i::INTEGER) & 1) << (2*i+1)::INTEGER)))::BIGINT AS zv
           FROM o)
         SELECT (zv >> 12)::BIGINT AS file_id, count(*) AS n_rows,
           min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
         FROM z GROUP BY file_id ORDER BY file_id""",

    "shard_balanced" ->
      s"""WITH d AS (
           SELECT doc_id,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS n_tokens
           FROM (SELECT doc_id, $normSql AS nt FROM documents)),
         o AS (
           SELECT n_tokens,
             row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS ord
           FROM d),
         a AS (
           SELECT n_tokens,
             CASE WHEN ord % 16 < 8 THEN ord % 16 ELSE 15 - (ord % 16) END AS shard
           FROM o)
         SELECT CAST(shard AS INTEGER) AS shard, count(*) AS n_rows,
           CAST(sum(n_tokens) AS BIGINT) AS total_size
         FROM a GROUP BY shard ORDER BY shard""",

    // compaction replay: small-file filter, ceil-divide group count off the
    // 1-row total, the same descending-size serpentine deal
    "layout_compaction" ->
      """WITH f AS (SELECT doc_id AS file_id, n_chars FROM documents),
         s AS (SELECT file_id, n_chars FROM f WHERE n_chars < 300),
         t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tot FROM s),
         g AS (SELECT greatest((tot + 2000 - 1) // 2000, 1) AS ng FROM t),
         o AS (
           SELECT file_id, n_chars,
             row_number() OVER (ORDER BY n_chars DESC, file_id) - 1 AS ord
           FROM s),
         p AS (
           SELECT file_id, CAST(n_chars AS BIGINT) AS bytes,
             CAST(CASE WHEN ord % (2*ng) < ng THEN ord % (2*ng)
                  ELSE 2*ng - 1 - (ord % (2*ng)) END AS INTEGER) AS group_id
           FROM o CROSS JOIN g)
         SELECT file_id, bytes, group_id FROM p
         UNION ALL
         SELECT file_id, CAST(n_chars AS BIGINT) AS bytes,
           CAST(-1 AS INTEGER) AS group_id
         FROM f WHERE n_chars >= 300
         ORDER BY file_id""",

    "sim_projection" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         w AS (
           SELECT p, list_transform(range(0, (SELECT len(v) FROM e LIMIT 1)), d ->
             ((('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT % 10000)
               / 10000.0 - 0.5)) AS wv
           FROM range(0, 16) t(p)),
         pr AS (
           SELECT vec_id, v,
             (SELECT list(list_dot_product(e2.v, w.wv) ORDER BY w.p) FROM w) AS proj
           FROM e e2)
         SELECT vec_id,
           md5(array_to_string(list_transform(proj,
             x -> CAST(CAST(floor(x*10000 + 0.5) AS BIGINT) AS VARCHAR)), ',')) AS p_fp,
           round(CAST(sqrt(12.0/16) * sqrt(list_dot_product(proj, proj))
             / sqrt(list_dot_product(v, v)) AS DECIMAL(18,8)), 4)::DOUBLE AS distortion
         FROM pr ORDER BY vec_id""",

    "text_docfreq" ->
      s"""WITH d AS (
           SELECT doc_id, list_distinct(string_split($normSql, ' ')) AS toks FROM documents),
         tkf AS (
           SELECT doc_id, tok FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
           WHERE tok <> ''),
         df AS (SELECT tok, count(*) AS df FROM tkf GROUP BY tok),
         sc AS (
           SELECT doc_id, count(*) AS n_distinct,
             round(CAST(CAST(sum(df.df) AS DOUBLE) / count(*) AS DECIMAL(18,8)), 4)::DOUBLE
               AS mean_df,
             CAST(sum(CASE WHEN df.df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
           FROM tkf JOIN df USING (tok) GROUP BY doc_id)
         SELECT d.doc_id, coalesce(sc.n_distinct, 0) AS n_distinct,
           coalesce(sc.mean_df, 0.0) AS mean_df, coalesce(sc.n_rare, 0) AS n_rare
         FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY d.doc_id""",

    // vocab-growth replay: same id buckets, first-bucket-per-type counts,
    // occurrence mass, and running totals over the bucket frame
    "text_vocab_growth" ->
      s"""WITH tk AS (
           SELECT CAST(floor(doc_id / 50) AS BIGINT) AS bucket, tok FROM (
             SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
             FROM documents)
           WHERE tok <> ''),
         firsts AS (SELECT tok, min(bucket) AS bucket FROM tk GROUP BY tok),
         nt AS (SELECT bucket, count(*) AS new_types FROM firsts GROUP BY 1),
         mass AS (SELECT bucket, count(*) AS n_tokens FROM tk GROUP BY 1)
         SELECT m.bucket, m.n_tokens,
           CAST(coalesce(nt.new_types, 0) AS BIGINT) AS new_types,
           CAST(sum(m.n_tokens) OVER (ORDER BY m.bucket) AS BIGINT) AS cum_tokens,
           CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY m.bucket) AS BIGINT)
             AS cum_types
         FROM mass m LEFT JOIN nt ON m.bucket = nt.bucket
         ORDER BY m.bucket""",

    // threshold-curve replay: the containment candidate/scoring chain with
    // the filters opened, swept over the threshold list
    "dedup_threshold_curve" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         sh0 AS (
           SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(toks[i+1:i+3], ' ')) END)) AS sh
           FROM norm),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh0 GROUP BY 1),
         dfreq AS (SELECT sh, count(*) AS df FROM sh0 GROUP BY 1),
         cand AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM sh0 a JOIN sh0 b ON a.sh = b.sh AND a.doc_id < b.doc_id
           JOIN dfreq d ON d.sh = a.sh
           WHERE d.df <= 64
           GROUP BY 1, 2),
         scored AS (
           SELECT id_a, id_b,
             round(CAST(shared::DOUBLE / (sa.sz + sb.sz - shared)
               AS DECIMAL(18,8)), 6)::DOUBLE AS jaccard
           FROM cand JOIN sizes sa ON id_a = sa.doc_id
                     JOIN sizes sb ON id_b = sb.doc_id),
         ths(t) AS (VALUES (CAST(0.3 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
           (CAST(0.7 AS DOUBLE)), (CAST(0.8 AS DOUBLE)), (CAST(0.9 AS DOUBLE))),
         p2 AS (
           SELECT ths.t, s.id_a AS pa, s.id_a AS d
           FROM ths LEFT JOIN scored s ON s.jaccard >= ths.t
           UNION ALL
           SELECT ths.t, s.id_a, s.id_b
           FROM ths LEFT JOIN scored s ON s.jaccard >= ths.t)
         SELECT t AS threshold, CAST(count(pa) // 2 AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT d) AS BIGINT) AS n_docs
         FROM p2 GROUP BY t ORDER BY t""",

    // minhash-eval replay: the threshold-curve truth CTEs over the SAME
    // deterministic half-sample, then md5 signatures (min over shingles
    // per seed), index-prefixed band keys, band-collision hits, and the
    // same decimal-staged rollup; the S-curve evaluates as the identical
    // left-assoc multiplication chain
    "dedup_minhash_eval" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents
           WHERE doc_id % 2 = 0),
         sh0 AS (
           SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(toks[i+1:i+3], ' ')) END)) AS sh
           FROM norm),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sh0 GROUP BY 1),
         dfreq AS (SELECT sh, count(*) AS df FROM sh0 GROUP BY 1),
         cand AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM sh0 a JOIN sh0 b ON a.sh = b.sh AND a.doc_id < b.doc_id
           JOIN dfreq d ON d.sh = a.sh
           WHERE d.df <= 64
           GROUP BY 1, 2
           HAVING count(*) >= 2),
         scored AS (
           SELECT id_a, id_b,
             round(CAST(shared::DOUBLE / (sa.sz + sb.sz - shared)
               AS DECIMAL(18,8)), 6)::DOUBLE AS jaccard
           FROM cand JOIN sizes sa ON id_a = sa.doc_id
                     JOIN sizes sb ON id_b = sb.doc_id),
         ids AS (
           SELECT id_a AS id FROM scored UNION SELECT id_b FROM scored),
         sig AS (
           SELECT s.doc_id, g.i,
             min(('0x'||substr(md5(s.sh || '#' || g.i::VARCHAR),1,15))::BIGINT)
               AS m
           FROM sh0 s JOIN ids ON s.doc_id = ids.id
           CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) g
           GROUP BY s.doc_id, g.i),
         bk AS (
           SELECT doc_id, (i // 4)::VARCHAR || ':' ||
             array_to_string(list(m::VARCHAR ORDER BY i), ',') AS bk
           FROM sig GROUP BY doc_id, i // 4),
         hits AS (
           SELECT DISTINCT s.id_a, s.id_b
           FROM scored s JOIN bk x ON x.doc_id = s.id_a
             JOIN bk y ON y.doc_id = s.id_b AND y.bk = x.bk),
         ev AS (
           SELECT s.id_a, s.id_b, s.jaccard,
             h.id_a IS NOT NULL AS caught,
             1.0 - s.jaccard * s.jaccard * s.jaccard * s.jaccard AS q
           FROM scored s LEFT JOIN hits h
             ON s.id_a = h.id_a AND s.id_b = h.id_b),
         ths(t) AS (VALUES (CAST(0.3 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
           (CAST(0.7 AS DOUBLE)), (CAST(0.8 AS DOUBLE))),
         roll AS (
           SELECT t,
             sum(CASE WHEN jaccard >= t THEN 1 ELSE 0 END) AS n_true,
             sum(CASE WHEN jaccard >= t AND caught THEN 1 ELSE 0 END) AS n_caught,
             sum(CASE WHEN caught THEN 1 ELSE 0 END) AS n_candidates,
             sum(CASE WHEN jaccard >= t
                 THEN CAST(1.0 - q * q * q * q AS DECIMAL(18,8)) END) AS se
           FROM ths CROSS JOIN ev GROUP BY t)
         SELECT t AS threshold,
           CAST(coalesce(n_true, 0) AS BIGINT) AS n_true,
           CAST(coalesce(n_caught, 0) AS BIGINT) AS n_caught,
           CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
           round(CAST(CASE WHEN coalesce(n_true, 0) = 0 THEN 0.0
             ELSE n_caught::DOUBLE / n_true END AS DECIMAL(18,8)), 4)::DOUBLE
             AS recall,
           round(CAST(CASE WHEN coalesce(n_candidates, 0) = 0 THEN 0.0
             ELSE n_caught::DOUBLE / n_candidates END AS DECIMAL(18,8)), 4)::DOUBLE
             AS precision,
           round(CAST(CASE WHEN coalesce(n_true, 0) = 0 THEN 0.0
             ELSE CAST(se AS DOUBLE) / n_true END AS DECIMAL(18,8)), 4)::DOUBLE
             AS exp_recall
         FROM roll ORDER BY t""",

    // keyness replay: one (token, target?) count table off the shared
    // normalization, Haldane-smoothed log odds, top-20 by (log_odds desc,
    // token); cnt_rest uses CASE WHEN NOT t so NULL targets mirror Spark's
    // negated `when` (excluded from BOTH arms)
    "text_keyness" ->
      s"""WITH tk AS (
           SELECT lang = 'en' AS t,
             unnest(string_split($normSql, ' ')) AS tok
           FROM documents),
         c AS (
           SELECT tok,
             CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS cnt_target,
             CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS cnt_rest
           FROM tk WHERE tok <> '' GROUP BY 1),
         tot AS (
           SELECT CAST(sum(cnt_target) AS BIGINT) AS ta,
             CAST(sum(cnt_rest) AS BIGINT) AS tb
           FROM c)
       SELECT token, cnt_target, cnt_rest, log_odds FROM (
           SELECT tok AS token, cnt_target, cnt_rest,
             round(CAST(
               ln((cnt_target::DOUBLE + 0.5) / ((ta - cnt_target)::DOUBLE + 0.5))
               - ln((cnt_rest::DOUBLE + 0.5) / ((tb - cnt_rest)::DOUBLE + 0.5))
               AS DECIMAL(18,8)), 6)::DOUBLE AS log_odds
           FROM c CROSS JOIN tot
           WHERE cnt_target + cnt_rest >= 5)
       ORDER BY log_odds DESC, token ASC LIMIT 20""",

    // OOV replay: same (lang, token, cnt) table, top-20 vocab, left join
    "text_oov" ->
      s"""WITH lt AS (
           SELECT lang, tok, count(*) AS cnt FROM (
             SELECT lang, unnest(string_split($normSql, ' ')) AS tok
             FROM documents)
           WHERE tok <> '' GROUP BY 1, 2),
         v AS (
           SELECT tok FROM (
             SELECT tok, sum(cnt) AS c FROM lt GROUP BY tok
             ORDER BY c DESC, tok LIMIT 20)),
         agg AS (
           SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN tok IN (SELECT tok FROM v) THEN 0 ELSE cnt END)
               AS BIGINT) AS n_oov
           FROM lt GROUP BY lang)
         SELECT lang, n_tokens, n_oov,
           round(CAST(n_oov::DOUBLE / n_tokens AS DECIMAL(18,8)), 6)::DOUBLE
             AS oov_rate
         FROM agg ORDER BY lang""",

    "sim_bruteforce" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         q AS (SELECT * FROM e WHERE vec_id < 10),
         p AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM q CROSS JOIN e c WHERE q.vec_id != c.vec_id)
         SELECT query_id, neighbor_id, round(CAST(cos AS DECIMAL(18,8)), 4)::DOUBLE AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         FROM p QUALIFY rank <= 5 ORDER BY query_id, rank""",

    // profile replay: decimal-staged dimension sums, the E[x^2]-E[x]^2
    // variance with the identical fixed operation order
    "stats_embedding_profile" ->
      """WITH e AS (
           SELECT list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         x AS (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM e)
         SELECT CAST(dim - 1 AS INTEGER) AS dim, count(*) AS n,
           round(CAST(sum(x::DECIMAL(30,10))::DOUBLE / count(*)
             AS DECIMAL(18,8)), 6)::DOUBLE AS mean,
           round(CAST(sqrt(greatest(
               sum((x*x)::DECIMAL(30,10))::DOUBLE / count(*)
                 - (sum(x::DECIMAL(30,10))::DOUBLE / count(*))
                   * (sum(x::DECIMAL(30,10))::DOUBLE / count(*)), 0.0))
             AS DECIMAL(18,8)), 6)::DOUBLE AS std,
           min(x) AS lo, max(x) AS hi
         FROM x GROUP BY dim ORDER BY dim""",

    // covariance replay: same per-pair exact decimal sums (generated by
    // the same dims loop the Spark side uses), same divide order
    "stats_embedding_cov" -> covOracleSql(0 to 7),

    // PCA replay: covariance replay, then 10 unrolled fixed-order
    // matvec+normalize chains — bit-identical IEEE on both engines
    "sim_pca" -> pcaOracleSql(0 to 7, iters = 10),

    // drift replay: the profile replay twice (old slice, perturbed new
    // snapshot), deltas on the already-rounded 6dp values
    "curate_embedding_drift" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         o AS (SELECT v FROM e WHERE vec_id % 10 <> 0),
         nw AS (
           SELECT CASE WHEN vec_id % 5 = 0
             THEN list_transform(v, x -> x * 1.1) ELSE v END AS v FROM e),
         po AS (
           SELECT CAST(dim - 1 AS INTEGER) AS dim,
             round(CAST(sum(x::DECIMAL(30,10))::DOUBLE / count(*)
               AS DECIMAL(18,8)), 6)::DOUBLE AS old_mean,
             round(CAST(sqrt(greatest(
                 sum((x*x)::DECIMAL(30,10))::DOUBLE / count(*)
                   - (sum(x::DECIMAL(30,10))::DOUBLE / count(*))
                     * (sum(x::DECIMAL(30,10))::DOUBLE / count(*)), 0.0))
               AS DECIMAL(18,8)), 6)::DOUBLE AS old_std
           FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM o)
           GROUP BY dim),
         pn AS (
           SELECT CAST(dim - 1 AS INTEGER) AS dim,
             round(CAST(sum(x::DECIMAL(30,10))::DOUBLE / count(*)
               AS DECIMAL(18,8)), 6)::DOUBLE AS new_mean,
             round(CAST(sqrt(greatest(
                 sum((x*x)::DECIMAL(30,10))::DOUBLE / count(*)
                   - (sum(x::DECIMAL(30,10))::DOUBLE / count(*))
                     * (sum(x::DECIMAL(30,10))::DOUBLE / count(*)), 0.0))
               AS DECIMAL(18,8)), 6)::DOUBLE AS new_std
           FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM nw)
           GROUP BY dim)
         SELECT po.dim, old_mean, new_mean,
           round(CAST(new_mean - old_mean AS DECIMAL(18,8)), 6)::DOUBLE AS mean_shift,
           old_std, new_std,
           CASE WHEN old_std = 0 THEN NULL
             ELSE round(CAST(new_std / old_std AS DECIMAL(18,8)), 6)::DOUBLE END
             AS std_ratio
         FROM po JOIN pn ON po.dim = pn.dim ORDER BY po.dim""",

    // semantic-sampling replay: the sim_kmeans assignment chain through the
    // trained centroids, then md5-ranked per-cluster quotas
    "sample_semantic" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         c0 AS (SELECT vec_id AS cluster, v AS cv FROM e ORDER BY vec_id LIMIT 8),
         a1 AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c0.cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c0.cv)
                   + list_dot_product(c0.cv, c0.cv) ASC, c0.cluster ASC) AS rn
             FROM e CROSS JOIN c0) WHERE rn = 1),
         c1 AS (
           SELECT cluster, list(cx ORDER BY dim) AS cv FROM (
             SELECT cluster, dim, sum(x::DECIMAL(30,10))::DOUBLE / count(*) AS cx
             FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a1)
             GROUP BY cluster, dim) GROUP BY cluster),
         a2 AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c1.cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c1.cv)
                   + list_dot_product(c1.cv, c1.cv) ASC, c1.cluster ASC) AS rn
             FROM e CROSS JOIN c1) WHERE rn = 1),
         c2 AS (
           SELECT cluster, list(cx ORDER BY dim) AS cv FROM (
             SELECT cluster, dim, sum(x::DECIMAL(30,10))::DOUBLE / count(*) AS cx
             FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a2)
             GROUP BY cluster, dim) GROUP BY cluster),
         fin AS (
           SELECT vec_id, cluster FROM (
             SELECT e.vec_id, c2.cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c2.cv)
                   + list_dot_product(c2.cv, c2.cv) ASC, c2.cluster ASC) AS rn
             FROM e CROSS JOIN c2) WHERE rn = 1),
         h AS (
           SELECT vec_id, cluster,
             ('0x'||substr(md5(vec_id::VARCHAR || 'sem'),1,15))::BIGINT AS hv
           FROM fin)
         SELECT vec_id, cluster FROM (
           SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY cluster ORDER BY hv, vec_id) AS rn
           FROM h) WHERE rn <= 10 ORDER BY cluster, vec_id""",

    // coreset replay: 3 unrolled Gonzalez rounds — min over the selected
    // set chains through least() (min is exact, so chaining equals the
    // fresh fold), farthest pick by (dmin DESC, vec_id)
    "sim_coreset" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
         d1 AS (
           SELECT e.vec_id, e.v,
             list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c0.v)
               + list_dot_product(c0.v, c0.v) AS dmin
           FROM e CROSS JOIN c0),
         c1 AS (SELECT vec_id, v, dmin FROM d1 ORDER BY dmin DESC, vec_id LIMIT 1),
         d2 AS (
           SELECT d1.vec_id, d1.v,
             least(d1.dmin,
               list_dot_product(d1.v, d1.v) - 2*list_dot_product(d1.v, c1.v)
                 + list_dot_product(c1.v, c1.v)) AS dmin
           FROM d1 CROSS JOIN c1),
         c2 AS (SELECT vec_id, v, dmin FROM d2 ORDER BY dmin DESC, vec_id LIMIT 1),
         d3 AS (
           SELECT d2.vec_id, d2.v,
             least(d2.dmin,
               list_dot_product(d2.v, d2.v) - 2*list_dot_product(d2.v, c2.v)
                 + list_dot_product(c2.v, c2.v)) AS dmin
           FROM d2 CROSS JOIN c2),
         c3 AS (SELECT vec_id, v, dmin FROM d3 ORDER BY dmin DESC, vec_id LIMIT 1)
         SELECT 1 AS "rank", vec_id, 0.0 AS d2 FROM c0
         UNION ALL SELECT 2, vec_id, round(CAST(dmin AS DECIMAL(18,8)), 4)::DOUBLE FROM c1
         UNION ALL SELECT 3, vec_id, round(CAST(dmin AS DECIMAL(18,8)), 4)::DOUBLE FROM c2
         UNION ALL SELECT 4, vec_id, round(CAST(dmin AS DECIMAL(18,8)), 4)::DOUBLE FROM c3
         ORDER BY "rank"""",

    // negatives replay: md5-bucketed per-query candidate pool (16 buckets,
    // 4 probes), pool-local top-5 cosine exclusion, md5-hash-ordered draw
    "sim_negatives" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         q AS (SELECT * FROM e WHERE vec_id < 10),
         cand AS (
           SELECT vec_id AS cid, v,
             ('0x'||substr(md5(vec_id::VARCHAR || 'neg-v1|b'),1,15))::BIGINT % 16 AS b
           FROM e),
         qp AS (
           SELECT q.vec_id AS qid, q.v,
             (('0x'||substr(md5(q.vec_id::VARCHAR || 'neg-v1|q'),1,15))::BIGINT % 16 + j) % 16 AS b
           FROM q CROSS JOIN range(0, 4) t(j)),
         pool AS (
           SELECT qp.qid, cand.cid,
             list_dot_product(qp.v, cand.v)
               / (sqrt(list_dot_product(qp.v, qp.v)) * sqrt(list_dot_product(cand.v, cand.v))) AS cos,
             ('0x'||substr(md5(qp.qid::VARCHAR || '_' || cand.cid::VARCHAR || 'neg-v1'),1,15))::BIGINT AS h
           FROM qp JOIN cand USING (b) WHERE qp.qid != cand.cid),
         kept AS (
           SELECT qid, cid, h FROM (
             SELECT qid, cid, h, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS nr
             FROM pool) WHERE nr > 5)
         SELECT qid AS query_id, cid AS negative_id, CAST(rn AS BIGINT) AS neg_rank
         FROM (
           SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY h ASC, cid ASC) AS rn
           FROM kept)
         WHERE rn <= 5 ORDER BY query_id, neg_rank""",

    // frame replay: video rows (doc_id%3=2), 4 frames each, frame BMP is
    // 246 bytes (8x8 24-bit + 54-byte header), pixels from the generation
    // rule the decoder provably inverts (MultimodalSpec)
    "mm_frames" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
         f AS (SELECT doc_id, unnest(range(0, 4)) AS frame_no FROM d),
         px AS (
           SELECT doc_id, frame_no, list_transform(range(0, 64),
             i -> (doc_id*31 + frame_no*17 + (i%8)*7 + (i//8)*13) % 256) AS g
           FROM f)
         SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no,
           246 AS n_bytes,
           list_sum(g) / 64.0 / 255.0 AS mean_px,
           list_max(g) / 255.0 AS max_px
         FROM px ORDER BY doc_id, frame_no""",

    // scene-cut replay: aHash bits from the pixel formula (exact integer
    // threshold px·64 ≥ Σpx), consecutive-frame self-join, bit_count(xor)
    "mm_scenecut" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
         f AS (SELECT doc_id, unnest(range(0, 4)) AS frame_no FROM d),
         px AS (
           SELECT doc_id, frame_no, list_transform(range(0, 64),
             i -> (doc_id*31 + frame_no*17 + (i%8)*7 + (i//8)*13) % 256) AS g
           FROM f),
         h AS (
           SELECT doc_id, frame_no,
             list_sum(list_transform(range(0, 32),
               i -> CASE WHEN g[i+1]*64 >= list_sum(g)
                 THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS lo,
             list_sum(list_transform(range(32, 64),
               i -> CASE WHEN g[i+1]*64 >= list_sum(g)
                 THEN (1::BIGINT << (i-32)) ELSE 0::BIGINT END))::BIGINT AS hi
           FROM px),
         p AS (
           SELECT a.doc_id, a.frame_no,
             bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS hamming
           FROM h a JOIN h b ON a.doc_id = b.doc_id AND b.frame_no = a.frame_no - 1)
         SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no,
           CAST(hamming AS INTEGER) AS hamming, hamming >= 16 AS is_cut
         FROM p ORDER BY doc_id, frame_no""",

    // shot-summary replay: the scene-cut replay's pair table rolled up per
    // video, mean as one exact-integer divide
    "mm_shot_summary" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
         f AS (SELECT doc_id, unnest(range(0, 4)) AS frame_no FROM d),
         px AS (
           SELECT doc_id, frame_no, list_transform(range(0, 64),
             i -> (doc_id*31 + frame_no*17 + (i%8)*7 + (i//8)*13) % 256) AS g
           FROM f),
         h AS (
           SELECT doc_id, frame_no,
             list_sum(list_transform(range(0, 32),
               i -> CASE WHEN g[i+1]*64 >= list_sum(g)
                 THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS lo,
             list_sum(list_transform(range(32, 64),
               i -> CASE WHEN g[i+1]*64 >= list_sum(g)
                 THEN (1::BIGINT << (i-32)) ELSE 0::BIGINT END))::BIGINT AS hi
           FROM px),
         p AS (
           SELECT a.doc_id,
             bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS hamming
           FROM h a JOIN h b ON a.doc_id = b.doc_id AND b.frame_no = a.frame_no - 1)
         SELECT doc_id, count(*) AS n_pairs,
           sum(CASE WHEN hamming >= 16 THEN 1 ELSE 0 END)::BIGINT AS n_cuts,
           round(CAST(sum(hamming)::DOUBLE / count(*)::DOUBLE
             AS DECIMAL(18,8)), 4)::DOUBLE AS mean_hamming
         FROM p GROUP BY doc_id ORDER BY doc_id""",

    "mm_features" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 AS m FROM documents),
         img AS (
           SELECT doc_id, list_transform(range(0, 64),
             i -> (doc_id*31 + (i%8)*7 + (i//8)*13) % 256) AS g
           FROM d WHERE m = 0),
         aud AS (
           SELECT doc_id, list_transform(range(0, 256),
             i -> (doc_id*7 + i*3) % 256) AS s
           FROM d WHERE m = 1 AND doc_id % 6 = 1),
         -- mu-law rows: replay G.711 encode->decode in exact integer
         -- arithmetic (AudioSystem's ULAW expansion is bit-identical to
         -- this closed form, probed over all 256 codes)
         audu AS (
           SELECT doc_id, sum(dec) AS sdec, max(dec) AS mdec FROM (
             SELECT doc_id,
               CASE WHEN pcm < 0 THEN -(((((mag >> (e+3)) % 16) * 8 + 132) << e) - 132)
                    ELSE ((((mag >> (e+3)) % 16) * 8 + 132) << e) - 132 END AS dec
             FROM (
               SELECT doc_id, pcm, mag,
                 CASE WHEN mag>=16384 THEN 7 WHEN mag>=8192 THEN 6
                      WHEN mag>=4096 THEN 5 WHEN mag>=2048 THEN 4
                      WHEN mag>=1024 THEN 3 WHEN mag>=512 THEN 2
                      WHEN mag>=256 THEN 1 ELSE 0 END AS e
               FROM (
                 SELECT doc_id, pcm, least(abs(pcm)+132, 32635) AS mag FROM (
                   SELECT doc_id, ((doc_id*7 + i*3) % 256 - 128) * 256 AS pcm
                   FROM (SELECT doc_id, unnest(range(0, 256)) AS i
                         FROM d WHERE m = 1 AND doc_id % 6 = 4)))))
           GROUP BY doc_id),
         vid AS (
           SELECT doc_id, list_transform(range(0, 4), f ->
             list_sum(list_transform(range(0, 64),
               i -> (doc_id*31 + f*17 + (i%8)*7 + (i//8)*13) % 256)) / 64.0 / 255.0) AS fm
           FROM d WHERE m = 2),
         u AS (
           -- image container alternates: BMP (246 bytes) for doc_id%6=0,
           -- stored-deflate PNG (closed-form 140 bytes at 8x8 gray) for
           -- doc_id%6=3; decoded pixels — and so f0..f3 — are identical
           SELECT doc_id, 'image' AS kind,
             CASE WHEN doc_id % 6 = 0 THEN 246 ELSE 140 END AS n_bytes,
             8.0 AS f0, 8.0 AS f1,
             list_sum(g)/64.0/255.0 AS f2, list_max(g)/255.0 AS f3 FROM img
           UNION ALL
           SELECT doc_id, 'audio', 300, 8000.0, 256.0,
             list_sum(s)/256.0/255.0, list_max(s)/255.0 FROM aud
           UNION ALL
           SELECT doc_id, 'audio', 302, 8000.0, 256.0,
             sdec/256.0/32768.0, mdec/32768.0 FROM audu
           UNION ALL
           SELECT doc_id, 'video', 1008, 4.0, 8.0,
             fm[1], (fm[1]+fm[2]+fm[3]+fm[4])/4.0 FROM vid)
         SELECT doc_id, kind, CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(f0 AS DOUBLE) AS f0, CAST(f1 AS DOUBLE) AS f1,
           CAST(f2 AS DOUBLE) AS f2, CAST(f3 AS DOUBLE) AS f3
         FROM u ORDER BY doc_id""",

    // VAD replay: synthesize both codec families' 16-bit sample streams
    // (PCM8 widened; µ-law encode→decode in exact integer arithmetic),
    // integer frame energies, floor-mean threshold, rising-edge segments
    "mm_audio_vad" ->
      """WITH a AS (
           SELECT doc_id, unnest(range(0, 256)) AS i FROM documents
           WHERE doc_id % 3 = 1),
         pcm AS (
           SELECT doc_id, i, ((doc_id*7 + i*3) % 256 - 128) * 256 AS pcm FROM a),
         ex AS (
           SELECT doc_id, i, pcm, mag,
             CASE WHEN mag>=16384 THEN 7 WHEN mag>=8192 THEN 6
                  WHEN mag>=4096 THEN 5 WHEN mag>=2048 THEN 4
                  WHEN mag>=1024 THEN 3 WHEN mag>=512 THEN 2
                  WHEN mag>=256 THEN 1 ELSE 0 END AS e
           FROM (SELECT doc_id, i, pcm, least(abs(pcm)+132, 32635) AS mag FROM pcm)),
         v AS (
           SELECT doc_id, i,
             CASE WHEN doc_id % 6 = 1 THEN pcm
                  WHEN pcm < 0 THEN -(((((mag >> (e+3)) % 16) * 8 + 132) << e) - 132)
                  ELSE ((((mag >> (e+3)) % 16) * 8 + 132) << e) - 132 END AS v
           FROM ex),
         fr AS (
           SELECT doc_id, i // 32 AS f, sum(v*v) AS en FROM v GROUP BY 1, 2),
         th AS (
           SELECT doc_id, sum(en) // count(*) AS theta, count(*) AS nf
           FROM fr GROUP BY 1),
         act AS (
           SELECT fr.doc_id, f, en > theta AS a,
             lag(en > theta) OVER (PARTITION BY fr.doc_id ORDER BY f) AS pa,
             nf
           FROM fr JOIN th USING (doc_id))
         SELECT doc_id, CAST(nf AS INTEGER) AS n_frames,
           CAST(count(*) FILTER (a) AS INTEGER) AS n_active,
           CAST(count(*) FILTER (a AND (pa IS NULL OR NOT pa)) AS INTEGER)
             AS n_segments,
           round(count(*) FILTER (a) / nf::DOUBLE, 4) AS speech_ratio
         FROM act GROUP BY doc_id, nf ORDER BY doc_id""",

    // resample replay: synthesis + companding + decimation, floor-division
    // requantize for the µ-law rows
    // aHash replay: the pixel generation rule (+128 shift on perturbed
    // copies), exact-integer mean threshold px·64 >= Σ, 64 bits into two
    // longs, the same 4-band candidates and bit_count(xor) verify
    "mm_image_dedup" ->
      """WITH ids AS (
           SELECT doc_id AS d, doc_id AS src, 0 AS pert FROM documents
           WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id + 1000000, doc_id, 1 FROM documents
           WHERE doc_id % 30 = 0),
         px AS (
           SELECT d, src, pert, unnest(generate_series(0, 63)) AS i FROM ids),
         v AS (
           SELECT d, i,
             CASE WHEN pert = 1 AND i = 0
               THEN ((src * 31 + (i % 8) * 7 + (i // 8) * 13) % 256 + 128) % 256
               ELSE (src * 31 + (i % 8) * 7 + (i // 8) * 13) % 256 END AS v
           FROM px),
         s AS (SELECT d, CAST(sum(v) AS BIGINT) AS tot FROM v GROUP BY d),
         bits AS (
           SELECT v.d, i, CASE WHEN v * 64 >= tot THEN 1 ELSE 0 END AS b
           FROM v JOIN s ON v.d = s.d),
         h AS (
           SELECT d,
             CAST(sum(CASE WHEN i >= 32 THEN b * (1::BIGINT << (i - 32))
               ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN i < 32 THEN b * (1::BIGINT << i)
               ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY d),
         bands AS (
           SELECT d, j,
             CASE j WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
                  WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS bv
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)),
         cand AS (
           SELECT DISTINCT a.d AS id_a, b.d AS id_b
           FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv AND a.d < b.d),
         pr AS (
           SELECT id_a, id_b,
             bit_count(xor(ha.hi, hb.hi)) + bit_count(xor(ha.lo, hb.lo)) AS hamming
           FROM cand JOIN h ha ON ha.d = id_a JOIN h hb ON hb.d = id_b)
         SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
         FROM pr WHERE hamming <= 3 ORDER BY id_a, id_b""",

    "mm_audio_resample" ->
      """WITH a AS (
           SELECT doc_id, unnest(range(0, 256)) AS i FROM documents
           WHERE doc_id % 3 = 1),
         k AS (
           SELECT doc_id, i, ((doc_id*7 + i*3) % 256) AS s8 FROM a
           WHERE i % 4 = 0),
         ex AS (
           SELECT doc_id, i, s8, pcm, mag,
             CASE WHEN mag>=16384 THEN 7 WHEN mag>=8192 THEN 6
                  WHEN mag>=4096 THEN 5 WHEN mag>=2048 THEN 4
                  WHEN mag>=1024 THEN 3 WHEN mag>=512 THEN 2
                  WHEN mag>=256 THEN 1 ELSE 0 END AS e
           FROM (SELECT doc_id, i, s8, (s8 - 128) * 256 AS pcm,
                   least(abs((s8 - 128) * 256)+132, 32635) AS mag FROM k)),
         dec AS (
           SELECT doc_id, s8, pcm,
             CASE WHEN pcm < 0 THEN
                    -(((((mag >> (e+3)) % 16) * 8 + 132) << e) - 132)
                  ELSE
                    ((((mag >> (e+3)) % 16) * 8 + 132) << e) - 132
             END AS d
           FROM ex),
         v AS (
           -- >> 8 is arithmetic shift = FLOOR division by 256; integer '//'
           -- truncates toward zero on negatives, so floor explicitly
           SELECT doc_id,
             CASE WHEN doc_id % 6 = 1 THEN s8
                  ELSE CAST(floor(d / 256.0) AS BIGINT) + 128 END AS v8
           FROM dec)
         SELECT doc_id, CAST(2000 AS INTEGER) AS out_rate,
           CAST(64 AS INTEGER) AS n_samples,
           sum(v8)/64.0/255.0 AS mean
         FROM v GROUP BY doc_id ORDER BY doc_id""",

    "sim_ann_ivf" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         cents AS (
           SELECT vec_id AS centid, v AS centv FROM e ORDER BY vec_id LIMIT 16),
         cassign AS (
           SELECT vec_id, v, centid AS cluster FROM (
             SELECT e.vec_id, e.v, c.centid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.centv)
                   / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.centv, c.centv))) DESC,
                 c.centid) AS cr
             FROM e CROSS JOIN cents c) WHERE cr = 1),
         qassign AS (
           SELECT vec_id, v, centid AS cluster FROM (
             SELECT e.vec_id, e.v, c.centid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.centv)
                   / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.centv, c.centv))) DESC,
                 c.centid) AS cr
             FROM e CROSS JOIN cents c WHERE e.vec_id < 10) WHERE cr <= 4),
         j AS (
           SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM qassign q JOIN cassign c ON q.cluster = c.cluster AND q.vec_id != c.vec_id)
         SELECT query_id, neighbor_id, round(CAST(cos AS DECIMAL(18,8)), 4)::DOUBLE AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         FROM j QUALIFY rank <= 5 ORDER BY query_id, rank""",

    // replay: quantizer = 16 lowest ids of the FIRST batch (vec_id % 4 = 0),
    // every vector cosine-routed to its nearest centroid, queries probe 4
    // Hamming replay: distance IS the count of sign mismatches, so the
    // oracle verifies from the definition without reproducing the packing
    "sim_hamming" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         j AS (
           SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
             CAST(len(list_filter(range(1, len(q.qv) + 1),
               i -> (q.qv[i] > 0) != (e.v[i] > 0))) AS BIGINT) AS hamming
           FROM q CROSS JOIN e WHERE q.qid != e.vec_id)
         SELECT query_id, neighbor_id, hamming,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY hamming, neighbor_id) AS INTEGER) AS rank
         FROM j QUALIFY rank <= 10 ORDER BY query_id, rank""",

    "sim_hamming_rerank" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         j AS (
           SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
             CAST(len(list_filter(range(1, len(q.qv) + 1),
               i -> (q.qv[i] > 0) != (e.v[i] > 0))) AS BIGINT) AS hamming
           FROM q CROSS JOIN e WHERE q.qid != e.vec_id),
         cand AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY hamming, neighbor_id) AS r
             FROM j) WHERE r <= 40),
         sc AS (
           SELECT c.query_id, c.neighbor_id,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
           FROM cand c JOIN e a ON a.vec_id = c.query_id
             JOIN e b ON b.vec_id = c.neighbor_id)
         SELECT query_id, neighbor_id,
           round(CAST(cos AS DECIMAL(18,8)), 4)::DOUBLE AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         FROM sc QUALIFY rank <= 10 ORDER BY query_id, rank""",

    "stream_ann_ingest" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         cents AS (
           SELECT vec_id AS centid, v AS centv FROM e
           WHERE vec_id % 4 = 0 ORDER BY vec_id LIMIT 16),
         cassign AS (
           SELECT vec_id, v, centid AS cluster FROM (
             SELECT e.vec_id, e.v, c.centid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.centv)
                   / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.centv, c.centv))) DESC,
                 c.centid) AS cr
             FROM e CROSS JOIN cents c) WHERE cr = 1),
         qassign AS (
           SELECT vec_id, v, centid AS cluster FROM (
             SELECT e.vec_id, e.v, c.centid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.centv)
                   / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.centv, c.centv))) DESC,
                 c.centid) AS cr
             FROM e CROSS JOIN cents c WHERE e.vec_id < 10) WHERE cr <= 4),
         j AS (
           SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM qassign q JOIN cassign c ON q.cluster = c.cluster AND q.vec_id != c.vec_id)
         SELECT query_id, neighbor_id, round(CAST(cos AS DECIMAL(18,8)), 4)::DOUBLE AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         FROM j QUALIFY rank <= 5 ORDER BY query_id, rank""",

    // compaction lifecycle closed form: the LAST batch always trips the
    // maxMeanList=4 threshold (n > 4*sqrt(n) for n > 16), and compaction
    // re-routes EVERYTHING onto the new quantizer, erasing all
    // intermediate routing — so the final index is every vector assigned
    // to the ceil(sqrt(n)) lowest-id vectors, exactly what this SQL
    // replays
    "stream_ann_compact" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         ranked AS (
           SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rn,
             count(*) OVER () AS n FROM e),
         cents AS (
           SELECT vec_id AS centid, v AS centv FROM ranked
           WHERE rn <= ceil(sqrt(n))),
         cassign AS (
           SELECT vec_id, v, centid AS cluster FROM (
             SELECT e.vec_id, e.v, c.centid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.centv)
                   / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.centv, c.centv))) DESC,
                 c.centid) AS cr
             FROM e CROSS JOIN cents c) WHERE cr = 1),
         qassign AS (
           SELECT vec_id, v, centid AS cluster FROM (
             SELECT e.vec_id, e.v, c.centid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, c.centv)
                   / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.centv, c.centv))) DESC,
                 c.centid) AS cr
             FROM e CROSS JOIN cents c WHERE e.vec_id < 10) WHERE cr <= 4),
         j AS (
           SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM qassign q JOIN cassign c ON q.cluster = c.cluster AND q.vec_id != c.vec_id)
         SELECT query_id, neighbor_id, round(CAST(cos AS DECIMAL(18,8)), 4)::DOUBLE AS cosine,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         FROM j QUALIFY rank <= 5 ORDER BY query_id, rank""",

    "mm_resize" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
         r AS (SELECT doc_id, list_transform(range(0, 16),
               i -> (doc_id*31 + ((i%4)*2)*7 + ((i//4)*2)*13) % 256) AS g FROM d)
         SELECT doc_id, CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
           list_sum(g)/16.0/255.0 AS mean_gray
         FROM r ORDER BY doc_id""",

    "text_langid" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         sc AS (
           SELECT doc_id,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS s_en,
             len(list_filter(toks, w -> w IN ('der','und','das','ist','nicht'))) AS s_de,
             len(list_filter(toks, w -> w IN ('le','et','les','des','une'))) AS s_fr,
             len(list_filter(toks, w -> w IN ('el','los','y','las','una'))) AS s_es
           FROM norm)
         SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                ELSE 'fr' END AS lang_pred
         FROM sc ORDER BY doc_id""",

    // confusion replay: the text_langid predictor CTE joined back to the
    // labeled truth, joint counts + per-truth share
    "text_lang_confusion" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         sc AS (
           SELECT doc_id,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS s_en,
             len(list_filter(toks, w -> w IN ('der','und','das','ist','nicht'))) AS s_de,
             len(list_filter(toks, w -> w IN ('le','et','les','des','une'))) AS s_fr,
             len(list_filter(toks, w -> w IN ('el','los','y','las','una'))) AS s_es
           FROM norm),
         pred AS (
           SELECT doc_id,
             CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                  ELSE 'fr' END AS lang_pred
           FROM sc),
         j AS (
           SELECT d.lang, p.lang_pred FROM documents d
           JOIN pred p USING (doc_id)),
         conf AS (
           SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
           FROM j GROUP BY 1, 2),
         tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS t FROM conf GROUP BY 1)
         SELECT conf.lang, lang_pred, n,
           round(CAST(n::DOUBLE / t::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE AS share
         FROM conf JOIN tot USING (lang) ORDER BY 1, 2""",

    "text_quality" ->
      s"""WITH norm AS (
           SELECT doc_id, text, string_split($normSql, ' ') AS toks,
             $normSql AS nt
           FROM documents),
         c AS (
           SELECT doc_id, text,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS nstop,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS npunct
           FROM norm)
         SELECT doc_id,
           round(CAST(least(length(text) / 500.0, 1.0) * 0.4
             + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
             + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                           ELSE npunct::DOUBLE / length(text) END) * 0.3 AS DECIMAL(18,8)), 4)::DOUBLE AS quality
         FROM c ORDER BY doc_id""",

    // readability replay: same token count, same [.!?]+ and vowel-group
    // counts, identical operation order through the Flesch formula
    "text_readability" ->
      s"""WITH norm AS (
           SELECT doc_id, text, $normSql AS nt FROM documents),
         c AS (
           SELECT doc_id,
             CAST(CASE WHEN length(nt) = 0 THEN 0
               ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS DOUBLE) AS w,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE) AS s,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS y
           FROM norm)
         SELECT doc_id,
           round(CAST(CASE WHEN w > 0
             THEN 206.835 - 1.015 * (w / s) - 84.6 * (y / w) END
             AS DECIMAL(18,8)), 3)::DOUBLE AS flesch
         FROM c ORDER BY doc_id""",

    // html-strip replay: the same wrapping, the same ordered regex chain
    // (script/style/comments before tags, entities after), same collapse
    "text_html_strip" ->
      """WITH p AS (
           SELECT doc_id,
             '<html><head><script type="text/javascript">var x = 1;</script><style>.a{color:red}</style></head><body><h1>Doc '
             || doc_id::VARCHAR || '</h1><p>' || text ||
             CASE WHEN doc_id % 3 = 0 THEN ' &amp; more &lt;tags&gt;' ELSE '' END
             || '</p><!-- trailer --></body></html>' AS h
           FROM documents),
         s AS (
           SELECT doc_id,
             len(regexp_extract_all(h, '<[A-Za-z/][^>]*>')) AS n_tags,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(h, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                       '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                     '(?s)<!--.*?-->', ' ', 'g'),
                   '<[^>]+>', ' ', 'g'),
                 '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                 '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '),
               '\s+', ' ', 'g')) AS t
           FROM p)
         SELECT doc_id, CAST(n_tags AS BIGINT) AS n_tags,
           CAST(length(t) AS BIGINT) AS n_chars_text, md5(t) AS text_fp
         FROM s ORDER BY doc_id""",

    // code-detect replay: same symbol strip count, keyword extraction, and
    // capped-density formula in the identical operation order
    "text_code" ->
      s"""WITH p AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 9 = 0
               THEN ' def load(x): return parse(x); var n = {}; import os'
               ELSE '' END AS text
           FROM documents),
         norm AS (
           SELECT doc_id, text, $normSql AS nt FROM p),
         c AS (
           SELECT doc_id,
             length(text) - length(regexp_replace(text, '[{}()\\[\\];=<>]', '', 'g'))
               AS n_sym,
             len(regexp_extract_all(text,
               '\\b(def|return|import|class|function|var|const|void|null|printf|lambda)\\b'))
               AS n_kw,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
             length(text) AS tl
           FROM norm),
         sc AS (
           SELECT doc_id, CAST(n_sym AS BIGINT) AS n_sym,
             CAST(n_kw AS BIGINT) AS n_kw,
             round(CAST(
               (CASE WHEN tl = 0 THEN 0.0
                 ELSE least(n_sym * 10.0 / tl, 1.0) END) * 0.6
               + (CASE WHEN ntok = 0 THEN 0.0
                 ELSE least(n_kw * 10.0 / ntok, 1.0) END) * 0.4
               AS DECIMAL(18,8)), 4)::DOUBLE AS code_score
           FROM c)
         SELECT doc_id, n_sym, n_kw, code_score,
           code_score >= 0.2 AS is_code
         FROM sc ORDER BY doc_id""",

    "text_tokens" ->
      s"""WITH norm AS (
           SELECT doc_id, text, $normSql AS nt FROM documents)
         SELECT doc_id,
           CASE WHEN length(nt) = 0 THEN 0
                ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS n_tokens,
           (length(text) - length(replace(text, ' ', ''))) +
             CAST(ceil(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) / 4.0) AS BIGINT) AS n_tokens_est
         FROM norm ORDER BY doc_id""",

    // fertility replay: langid CASE + token estimate + char length, rolled
    // up per predicted language with the same decimal-staged ratio
    "text_fertility" ->
      s"""WITH norm AS (
           SELECT doc_id, text, string_split($normSql, ' ') AS toks FROM documents),
         sc AS (
           SELECT doc_id, text,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS s_en,
             len(list_filter(toks, w -> w IN ('der','und','das','ist','nicht'))) AS s_de,
             len(list_filter(toks, w -> w IN ('le','et','les','des','une'))) AS s_fr,
             len(list_filter(toks, w -> w IN ('el','los','y','las','una'))) AS s_es
           FROM norm),
         l AS (
           SELECT
             CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                  ELSE 'fr' END AS lang_pred,
             (length(text) - length(replace(text, ' ', ''))) +
               CAST(ceil(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) / 4.0) AS BIGINT) AS tok,
             length(text) AS chars
           FROM sc)
         SELECT lang_pred, count(*) AS docs,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           CAST(sum(chars) AS BIGINT) AS total_chars,
           round(CAST(sum(tok)::DOUBLE / sum(chars) AS DECIMAL(18,8)), 6)::DOUBLE
             AS fertility
         FROM l GROUP BY 1 ORDER BY 1""",

    // SemDeDup: replay the full 2-round decimal-exact Lloyd training (the
    // sim_kmeans chain), assign every vector to its final centroid, then the
    // within-cluster exact-cosine pair scan
    "dedup_semantic" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         c0 AS (SELECT vec_id AS cluster, v AS cv FROM e ORDER BY vec_id LIMIT 8),
         a1 AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c0.cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c0.cv)
                   + list_dot_product(c0.cv, c0.cv) ASC, c0.cluster ASC) AS rn
             FROM e CROSS JOIN c0) WHERE rn = 1),
         c1 AS (
           SELECT cluster, list(cx ORDER BY dim) AS cv FROM (
             SELECT cluster, dim, sum(x::DECIMAL(30,10))::DOUBLE / count(*) AS cx
             FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a1)
             GROUP BY cluster, dim) GROUP BY cluster),
         a2 AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c1.cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c1.cv)
                   + list_dot_product(c1.cv, c1.cv) ASC, c1.cluster ASC) AS rn
             FROM e CROSS JOIN c1) WHERE rn = 1),
         c2 AS (
           SELECT cluster, list(cx ORDER BY dim) AS cv FROM (
             SELECT cluster, dim, sum(x::DECIMAL(30,10))::DOUBLE / count(*) AS cx
             FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a2)
             GROUP BY cluster, dim) GROUP BY cluster),
         a3 AS (
           SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c2.cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c2.cv)
                   + list_dot_product(c2.cv, c2.cv) ASC, c2.cluster ASC) AS rn
             FROM e CROSS JOIN c2) WHERE rn = 1)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
           round(CAST(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
             AS DECIMAL(18,8)), 4)::DOUBLE AS cosine
         FROM a3 a JOIN a3 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         WHERE list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
         ORDER BY id_a, id_b""",

    // BM25: tf filtered to the query terms, df over the tf table, Lucene
    // idf; every fractional literal that is INEXACT in binary (2.2, 1.2) is
    // CAST to DOUBLE so DuckDB's decimal literals don't diverge from
    // Spark's double arithmetic; per-term scores staged in DECIMAL(18,8)
    "search_bm25" ->
      s"""WITH d AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks, $normSql AS nt FROM documents),
         lens AS (
           SELECT doc_id, CASE WHEN length(nt) = 0 THEN 0 ELSE len(toks) END AS dl FROM d),
         stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl FROM lens),
         tf AS (
           SELECT doc_id, tok, count(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
           WHERE tok IN ('hash', 'join', 'merge') GROUP BY doc_id, tok),
         dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         per AS (
           SELECT tf.doc_id,
             CAST(ln((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * CAST(2.2 AS DOUBLE))
               / (tf + CAST(1.2 AS DOUBLE) * (0.25 + 0.75
                 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / n))))
               AS DECIMAL(18,8)) AS sd
           FROM tf JOIN lens USING (doc_id) JOIN dft USING (tok) CROSS JOIN stats),
         sc AS (
           SELECT doc_id, sum(sd) AS score, count(*) AS n_terms FROM per GROUP BY doc_id)
         SELECT doc_id, round(score, 4)::DOUBLE AS score, n_terms FROM (
           SELECT doc_id, score, n_terms FROM sc ORDER BY score DESC, doc_id LIMIT 20)
         ORDER BY score DESC, doc_id""",

    // query-likelihood replay: same tokenization as bm25, sparse Dirichlet
    // decomposition — per-present-term ln(1 + tf·T/(μ·cf)) decimal sums,
    // the 1-row query constant, and the −|q|·ln(dl+μ) length term, ranked
    // on the exact decimal score with id tie-break
    "search_query_likelihood" ->
      s"""WITH d AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks, $normSql AS nt FROM documents),
         lens AS (
           SELECT doc_id, CASE WHEN length(nt) = 0 THEN 0 ELSE len(toks) END AS dl FROM d),
         stats AS (SELECT CAST(sum(dl) AS BIGINT) AS tt FROM lens),
         qt AS (
           SELECT doc_id, tok
           FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
           WHERE tok IN ('hash', 'join', 'merge')),
         cf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cf FROM qt GROUP BY 1),
         qc AS (
           SELECT CAST(count(*) AS BIGINT) AS nq,
             coalesce(sum(CAST(ln(1000.0 * CAST(cf AS DOUBLE)
               / CAST(tt AS DOUBLE)) AS DECIMAL(18,8))),
               CAST(0 AS DECIMAL(18,8))) AS qc
           FROM cf CROSS JOIN stats),
         tf AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM qt GROUP BY 1, 2),
         per AS (
           SELECT tf.doc_id,
             CAST(ln(CAST(tf AS DOUBLE) * CAST(tt AS DOUBLE)
               / (1000.0 * CAST(cf AS DOUBLE)) + 1.0) AS DECIMAL(18,8)) AS sd
           FROM tf JOIN cf USING (tok) CROSS JOIN stats),
         mm AS (
           SELECT doc_id, sum(sd) AS m, CAST(count(*) AS BIGINT) AS nhit
           FROM per GROUP BY 1),
         sc AS (
           SELECT lens.doc_id,
             coalesce(mm.m, CAST(0 AS DECIMAL(18,8))) + qc.qc
               - CAST(CAST(nq AS DOUBLE) * ln(CAST(dl AS DOUBLE) + 1000.0)
                 AS DECIMAL(18,8)) AS score,
             coalesce(nhit, 0) AS n_hit
           FROM lens LEFT JOIN mm USING (doc_id) CROSS JOIN qc)
         SELECT doc_id, round(score, 4)::DOUBLE AS score,
           CAST(n_hit AS BIGINT) AS n_hit
         FROM (SELECT doc_id, score, n_hit FROM sc
               ORDER BY score DESC, doc_id LIMIT 20)
         ORDER BY score DESC, doc_id""",

    // hybrid fusion replay: the bm25 chain at k=50 ranked on its ROUNDED
    // output scores, the exact-cosine chain for query vector 0 at k=50,
    // then 1/(60+rank) reciprocal terms in the same fixed order
    // matryoshka replay: full-dim truth pool, FIRST-16-dims ranking, the
    // same ln-discount nDCG
    "sim_mrl_ndcg" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         q AS (SELECT * FROM e WHERE vec_id < 10),
         tp AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM q CROSS JOIN e c WHERE q.vec_id != c.vec_id),
         truth AS (
           SELECT query_id, neighbor_id,
             greatest(round(CAST(cos AS DECIMAL(18,8)), 4)::DOUBLE, 0.0) AS rel,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           FROM tp QUALIFY rnk <= 20),
         tr AS (SELECT vec_id, v[1:16] AS v FROM e),
         qt AS (SELECT * FROM tr WHERE vec_id < 10),
         rp AS (
           SELECT qt.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(qt.v, c.v)
               / (sqrt(list_dot_product(qt.v, qt.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM qt CROSS JOIN tr c WHERE qt.vec_id != c.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           FROM rp QUALIFY rnk <= 10),
         dcg AS (
           SELECT r.query_id,
             CAST(sum(CAST(coalesce(t.rel, 0.0) / ln(r.rnk + 1.0)
               AS DECIMAL(18,8))) AS DECIMAL(18,8)) AS d
           FROM ranked r LEFT JOIN truth t
             ON r.query_id = t.query_id AND r.neighbor_id = t.neighbor_id
           GROUP BY r.query_id),
         idcg AS (
           SELECT query_id,
             CAST(sum(CAST(rel / ln(rnk + 1.0) AS DECIMAL(18,8)))
               AS DECIMAL(18,8)) AS i
           FROM truth WHERE rnk <= 10 GROUP BY query_id)
         SELECT d.query_id, round(d.d, 4)::DOUBLE AS dcg,
           round(i.i, 4)::DOUBLE AS idcg,
           round(CAST(CASE WHEN i.i = 0 THEN 0.0
             ELSE CAST(d.d AS DOUBLE) / CAST(i.i AS DOUBLE) END
             AS DECIMAL(18,8)), 4)::DOUBLE AS ndcg
         FROM dcg d JOIN idcg i ON d.query_id = i.query_id
         ORDER BY d.query_id""",

    // nDCG replay: exact-cosine truth pool (top-20), int8 dequantized
    // ranking (top-10), the same ln-discount sums and one final divide
    "sim_ndcg" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         q AS (SELECT * FROM e WHERE vec_id < 10),
         tp AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM q CROSS JOIN e c WHERE q.vec_id != c.vec_id),
         truth AS (
           SELECT query_id, neighbor_id,
             greatest(round(CAST(cos AS DECIMAL(18,8)), 4)::DOUBLE, 0.0) AS rel,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           FROM tp QUALIFY rnk <= 20),
         dq AS (
           SELECT vec_id, list_transform(range(1, len(v)+1), i ->
             (CASE WHEN scale = 0 THEN 0
               ELSE CAST(floor(v[i]/scale + 0.5) AS INT) END)::DOUBLE * scale) AS v
           FROM (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127 AS scale FROM e)),
         rp AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM q CROSS JOIN dq c WHERE q.vec_id != c.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           FROM rp QUALIFY rnk <= 10),
         dcg AS (
           SELECT r.query_id,
             CAST(sum(CAST(coalesce(t.rel, 0.0) / ln(r.rnk + 1.0)
               AS DECIMAL(18,8))) AS DECIMAL(18,8)) AS d
           FROM ranked r LEFT JOIN truth t
             ON r.query_id = t.query_id AND r.neighbor_id = t.neighbor_id
           GROUP BY r.query_id),
         idcg AS (
           SELECT query_id,
             CAST(sum(CAST(rel / ln(rnk + 1.0) AS DECIMAL(18,8)))
               AS DECIMAL(18,8)) AS i
           FROM truth WHERE rnk <= 10 GROUP BY query_id)
         SELECT d.query_id, round(d.d, 4)::DOUBLE AS dcg,
           round(i.i, 4)::DOUBLE AS idcg,
           round(CAST(CASE WHEN i.i = 0 THEN 0.0
             ELSE CAST(d.d AS DOUBLE) / CAST(i.i AS DOUBLE) END
             AS DECIMAL(18,8)), 4)::DOUBLE AS ndcg
         FROM dcg d JOIN idcg i ON d.query_id = i.query_id
         ORDER BY d.query_id""",

    // budget-trim replay: the text_quality chain, one per-source running
    // window over the rounded-quality order, boundary-exact keep rule
    "curate_budget_trim" ->
      s"""WITH norm AS (
           SELECT doc_id, source, text, string_split($normSql, ' ') AS toks,
             $normSql AS nt
           FROM documents),
         c AS (
           SELECT doc_id, source, text,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS nstop,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS npunct
           FROM norm),
         sc AS (
           SELECT doc_id, source, CAST(ntok AS BIGINT) AS n_tokens,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                   ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE AS score
           FROM c),
         w AS (
           SELECT doc_id, source, n_tokens, score,
             (sum(n_tokens) OVER (PARTITION BY source
                ORDER BY score DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens)::BIGINT AS cum_before
           FROM sc)
         SELECT doc_id, source, n_tokens, score, cum_before,
           cum_before < 800 AS kept
         FROM w ORDER BY doc_id""",

    // MMR replay: brute-cosine top-20, then five unrolled selection
    // rounds — msim as max of per-selected ROUNDED cosines, the same
    // 0.7·rel − (1.0 − 0.7)·msim operation order, ties to smaller id
    "search_mmr" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         qv AS (SELECT v FROM e WHERE vec_id = 0),
         cand AS (
           SELECT e.vec_id, e.v,
             round(CAST(list_dot_product(e.v, qv.v)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qv.v, qv.v)))
               AS DECIMAL(18,8)), 6)::DOUBLE AS rel
           FROM e CROSS JOIN qv WHERE e.vec_id <> 0
           ORDER BY rel DESC, e.vec_id LIMIT 20),
         s1 AS (
           SELECT vec_id, v, rel,
             round(CAST(0.7 * rel AS DECIMAL(18,8)), 6)::DOUBLE AS score
           FROM cand ORDER BY score DESC, vec_id LIMIT 1),
         d2 AS (
           SELECT c.vec_id, any_value(c.v) AS v, c.rel,
             max(round(CAST(list_dot_product(c.v, s.v)
               / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(s.v, s.v)))
               AS DECIMAL(18,8)), 6)::DOUBLE) AS msim
           FROM cand c CROSS JOIN s1 s
           WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
           GROUP BY c.vec_id, c.rel),
         s2 AS (
           SELECT vec_id, v, rel,
             round(CAST(0.7 * rel - (1.0 - 0.7) * msim AS DECIMAL(18,8)), 6)::DOUBLE AS score
           FROM d2 ORDER BY score DESC, vec_id LIMIT 1),
         sel2 AS (SELECT vec_id, v FROM s1 UNION ALL SELECT vec_id, v FROM s2),
         d3 AS (
           SELECT c.vec_id, any_value(c.v) AS v, c.rel,
             max(round(CAST(list_dot_product(c.v, s.v)
               / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(s.v, s.v)))
               AS DECIMAL(18,8)), 6)::DOUBLE) AS msim
           FROM cand c CROSS JOIN sel2 s
           WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
           GROUP BY c.vec_id, c.rel),
         s3 AS (
           SELECT vec_id, v, rel,
             round(CAST(0.7 * rel - (1.0 - 0.7) * msim AS DECIMAL(18,8)), 6)::DOUBLE AS score
           FROM d3 ORDER BY score DESC, vec_id LIMIT 1),
         sel3 AS (SELECT vec_id, v FROM sel2 UNION ALL SELECT vec_id, v FROM s3),
         d4 AS (
           SELECT c.vec_id, any_value(c.v) AS v, c.rel,
             max(round(CAST(list_dot_product(c.v, s.v)
               / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(s.v, s.v)))
               AS DECIMAL(18,8)), 6)::DOUBLE) AS msim
           FROM cand c CROSS JOIN sel3 s
           WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
           GROUP BY c.vec_id, c.rel),
         s4 AS (
           SELECT vec_id, v, rel,
             round(CAST(0.7 * rel - (1.0 - 0.7) * msim AS DECIMAL(18,8)), 6)::DOUBLE AS score
           FROM d4 ORDER BY score DESC, vec_id LIMIT 1),
         sel4 AS (SELECT vec_id, v FROM sel3 UNION ALL SELECT vec_id, v FROM s4),
         d5 AS (
           SELECT c.vec_id, any_value(c.v) AS v, c.rel,
             max(round(CAST(list_dot_product(c.v, s.v)
               / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(s.v, s.v)))
               AS DECIMAL(18,8)), 6)::DOUBLE) AS msim
           FROM cand c CROSS JOIN sel4 s
           WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
           GROUP BY c.vec_id, c.rel),
         s5 AS (
           SELECT vec_id, v, rel,
             round(CAST(0.7 * rel - (1.0 - 0.7) * msim AS DECIMAL(18,8)), 6)::DOUBLE AS score
           FROM d5 ORDER BY score DESC, vec_id LIMIT 1)
         SELECT 1 AS "rank", vec_id, rel, score FROM s1
         UNION ALL SELECT 2, vec_id, rel, score FROM s2
         UNION ALL SELECT 3, vec_id, rel, score FROM s3
         UNION ALL SELECT 4, vec_id, rel, score FROM s4
         UNION ALL SELECT 5, vec_id, rel, score FROM s5
         ORDER BY "rank"""",

  )
}
