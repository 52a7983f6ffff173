package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, IntegerType, TimestampType}

import graft.core.{Converters, DateSpan, Nm}
import graft.functions.{Dedup, Layout, Packing, Pii, Sampling, TextAnalysis, Vectors}
import graft.sources.Sources
import graft.tables._


/** DuckDB oracle SQL for the gate queries, chunk C (stable
  * entry order; split for compile-unit size only). */
private[graft] object OracleSqlC {
  import EntryOracleDefs._
  def m: Map[String, String] = Map(
    "search_hybrid_rrf" ->
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
           SELECT doc_id, sum(sd) AS score FROM per GROUP BY doc_id),
         bm AS (
           SELECT doc_id, round(score, 4)::DOUBLE AS rscore FROM (
             SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 50)),
         bmr AS (
           SELECT doc_id, CAST(row_number() OVER (ORDER BY rscore DESC, doc_id)
             AS INTEGER) AS rank_text FROM bm),
         e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         q AS (SELECT * FROM e WHERE vec_id = 0),
         p AS (
           SELECT c.vec_id AS nid,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM q CROSS JOIN e c WHERE q.vec_id != c.vec_id),
         vr AS (
           SELECT nid, CAST(row_number() OVER (ORDER BY cos DESC, nid)
             AS INTEGER) AS rank_vec FROM p QUALIFY rank_vec <= 50)
         SELECT doc_id, rank_text, rank_vec, rrf FROM (
           SELECT coalesce(bmr.doc_id, vr.nid) AS doc_id, rank_text, rank_vec,
             round(CAST(
               (CASE WHEN rank_text IS NULL THEN 0.0
                     ELSE 1.0 / (60.0 + CAST(rank_text AS DOUBLE)) END)
               + (CASE WHEN rank_vec IS NULL THEN 0.0
                       ELSE 1.0 / (60.0 + CAST(rank_vec AS DOUBLE)) END)
               AS DECIMAL(18,8)), 6)::DOUBLE AS rrf
           FROM bmr FULL OUTER JOIN vr ON bmr.doc_id = vr.nid)
         ORDER BY rrf DESC, doc_id LIMIT 20""",

    // unigram LM scoring: add-one smoothed corpus counts, per-token ln
    // staged in DECIMAL(18,8) (ln is bit-identical across engines), exact
    // sum, one double division, decimal-staged rounding
    "text_lm_score" ->
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
             FROM tk JOIN c USING (tok) CROSS JOIN st) GROUP BY doc_id)
         SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens,
           coalesce(sc.avg_logprob, 0.0) AS avg_logprob
         FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY d.doc_id""",

    // histogram quantiles: fixed-width bins (one aggregation), cumulative
    // counts from the bounded bin self-join, first bin reaching q*N; the
    // inexact 0.99 is CAST to DOUBLE so both engines compare the same value
    "stats_quantile_hist" ->
      """WITH b AS (
           SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin, count(*) AS cnt
           FROM events GROUP BY 1),
         cum AS (
           SELECT a.bin, CAST(sum(b2.cnt) AS BIGINT) AS cum_count
           FROM b a JOIN b b2 ON b2.bin <= a.bin GROUP BY a.bin),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM b),
         e AS (SELECT bin, cum_count, total FROM cum CROSS JOIN tot),
         qs(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE)))
         SELECT q, bin, bin * CAST(10.0 AS DOUBLE) AS lo,
           (bin + 1) * CAST(10.0 AS DOUBLE) AS hi, cum_count, total
         FROM (
           SELECT q, bin, cum_count, total,
             row_number() OVER (PARTITION BY q ORDER BY bin ASC) AS rn
           FROM qs JOIN e ON CAST(cum_count AS DOUBLE) >= q * total) WHERE rn = 1
         ORDER BY q""",

    // key-skew replay: count table, totals, top-k cut; counts are
    // additive so the streaming twin shares it verbatim
    "stats_key_skew" -> keySkewOracleSql,
    "stream_key_skew" -> keySkewOracleSql,

    // linkage replay: same normalization, (nation, prefix) block, and
    // levenshtein similarity with the identical operation order (every
    // block is far under the cap, so the capped and uncapped plans
    // agree); the streaming twin shares it (dimension frozen, incoming
    // additive, scores pair-local)
    "link_customers" -> linkOracleSql,
    "stream_link" -> linkOracleSql,

    // resolution replay: the linkage chain over perturbed + brand-new
    // incoming rows, per-incoming argmax (ties to smallest key), left
    // join so unmatched rows resolve as new
    "link_resolve" ->
      """WITH l AS (
           SELECT c_custkey,
             trim(regexp_replace(lower(c_name), '[^a-z0-9]+', ' ', 'g')) AS n,
             c_nationkey
           FROM customer),
         rsrc AS (
           SELECT c_custkey + 1000000 AS in_id,
             CASE WHEN c_custkey % 8 = 0
               THEN substr(c_name, 1, length(c_name) - 1) || 'x'
               ELSE c_name END AS nm,
             c_nationkey AS in_nation
           FROM customer WHERE c_custkey % 4 = 0
           UNION ALL
           SELECT c_custkey + 2000000, 'Newco ' || c_custkey::VARCHAR,
             c_nationkey
           FROM customer WHERE c_custkey % 10 = 0),
         r AS (
           SELECT in_id,
             trim(regexp_replace(lower(nm), '[^a-z0-9]+', ' ', 'g')) AS n,
             in_nation
           FROM rsrc),
         j AS (
           SELECT l.c_custkey, r.in_id,
             round(CAST(1.0 - levenshtein(l.n, r.n)::DOUBLE
               / greatest(length(l.n), length(r.n), 1) AS DECIMAL(18,8)), 4)::DOUBLE
               AS name_sim
           FROM l JOIN r ON substr(l.n, 1, 3) = substr(r.n, 1, 3)
             AND l.c_nationkey = r.in_nation),
         best AS (
           SELECT in_id, c_custkey AS resolved_c_custkey, name_sim AS best_sim,
             row_number() OVER (PARTITION BY in_id
               ORDER BY name_sim DESC, c_custkey ASC) AS rn
           FROM j WHERE name_sim >= 0.9)
         SELECT r.in_id, b.resolved_c_custkey, b.best_sim,
           b.resolved_c_custkey IS NULL AS is_new
         FROM r LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (in_id)
         ORDER BY r.in_id""",

    // correlation replay: the same exact decimal moments from one pass,
    // the same fixed-order double formula; moments are additive so the
    // streaming twin shares it verbatim
    "stats_corr" -> corrOracleSql,
    "stats_cuped" -> cupedOracleSql,
    "stream_cuped" -> cupedOracleSql,
    "stream_corr" -> corrOracleSql,

    // Welch replay: same exact per-arm decimal moments, same fixed-order
    // t / dof formula; the stream side's moment state is additive
    "stats_welch" -> welchOracleSql,
    "stream_welch" -> welchOracleSql,
    // Cohen's d replay: same per-arm moments, pooled-variance effect size
    "stats_cohend" -> cohendOracleSql,
    "stream_cohend" -> cohendOracleSql,

    // OLS trend replay: same exact decimal regression moments, same
    // fixed-order slope/r²/t formulas; the moment state is additive
    "stats_trend" -> trendOracleSql,
    "stream_trend" -> trendOracleSql,

    // ANOVA replay: same per-group exact moments, same decimal-staged
    // within/between terms, same fixed-order F; state additive per group
    "stats_anova" -> anovaOracleSql,
    "stream_anova" -> anovaOracleSql,
    "stats_bartlett" -> bartlettOracleSql,
    "stream_bartlett" -> bartlettOracleSql,
    // Tukey replay: same group moments, pooled MSW, pairwise q
    "stats_tukey" -> tukeyOracleSql,
    "stream_tukey" -> tukeyOracleSql,

    // Mann–Whitney replay: same per-value counts and exact-integer U /
    // tie terms, same fixed-order z; the count state is additive
    "stats_mwu" -> mwuOracleSql,
    "stream_mwu" -> mwuOracleSql,
    "stats_brunner_munzel" -> brunnerMunzelOracleSql,
    "stream_brunner_munzel" -> brunnerMunzelOracleSql,
    "stats_ansari" -> ansariOracleSql,
    "stream_ansari" -> ansariOracleSql,
    // Cliff's delta replay: same count state, dominance effect size
    "stats_cliffs" -> cliffsOracleSql,
    "stream_cliffs" -> cliffsOracleSql,

    // Kruskal–Wallis replay: same (value,group) counts, same exact rank
    // sums / tie term, same fixed-order H; state additive per pair
    "stats_kruskal" -> kruskalOracleSql,
    "stream_kruskal" -> kruskalOracleSql,
    // Brown-Forsythe replay: same count state, deviation-moment F
    "stats_levene" -> leveneOracleSql,
    "stream_levene" -> leveneOracleSql,
    // exact-quantile replay: same count state, order-stat interpolation
    "stats_quantile_exact" -> quantileExactOracleSql,
    // robust location/scale replay: same additive count state as the
    // exact quantiles (trimmed = interval clamps, mad = two medians)
    "stats_trimmed" -> trimmedOracleSql,
    "stream_trimmed" -> trimmedOracleSql,
    "stats_mad" -> madOracleSql,
    "stream_mad" -> madOracleSql,
    "stats_shape" -> shapeOracleSql,
    "stream_shape" -> shapeOracleSql,
    "stream_quantile_exact" -> quantileExactOracleSql,
    // Jarque-Bera / Grubbs replay: same additive power-sum + extremes row
    "stats_jarque_bera" -> jarqueBeraOracleSql,
    "stream_jarque_bera" -> jarqueBeraOracleSql,
    "stats_grubbs" -> grubbsOracleSql,
    "stream_grubbs" -> grubbsOracleSql,
    // D'Agostino K² replay: same additive power-sum row, Johnson Su +
    // Anscombe-Glynn z's mirrored operation-for-operation
    "stats_dagostino" -> dagostinoOracleSql,
    "stream_dagostino" -> dagostinoOracleSql,

    // two-proportion replay: same exact per-arm counts, same fixed-order
    // pooled-SE z; the count state is additive
    "stats_twoprop" -> twopropOracleSql,
    "stats_riskratio" -> rrOracleSql,
    "stream_riskratio" -> rrOracleSql,
    "stats_power_twoprop" -> powerOracleSql,
    "stream_power" -> powerOracleSql,
    "stats_mh" -> mhOracleSql,
    "stats_cohenh" -> cohenhOracleSql,
    "stream_cohenh" -> cohenhOracleSql,
    "stats_simpson" -> simpsonOracleSql,
    "stream_simpson" -> simpsonOracleSql,
    "stats_cronbach" -> cronbachOracleSql(0 to 7),
    "stream_cronbach" -> cronbachOracleSql(0 to 7),
    "stream_mh" -> mhOracleSql,
    "stats_ks2" -> ks2OracleSql,
    "stream_ks" -> ks2OracleSql,
    "stats_cvm" -> cvmOracleSql,
    "stream_cvm" -> cvmOracleSql,
    "stats_ad" -> adOracleSql,
    "stream_ad" -> adOracleSql,
    "stats_wasserstein" -> w1OracleSql,
    "stream_wasserstein" -> w1OracleSql,
    "curate_krippendorff" -> krippendorffOracleSql,
    "stream_krippendorff" -> krippendorffOracleSql,
    "text_vocab_richness" -> vocabRichnessOracleSql,
    "text_zipf" -> zipfOracleSql,
    "stats_cochran_armitage" -> cochranArmitageOracleSql,
    "stats_capture" -> captureOracleSql,
    "stream_twoprop" -> twopropOracleSql,

    // Spearman replay: same joint counts, same exact doubled-rank moments,
    // same fixed-order formula; the joint count state is additive
    "stats_spearman" -> spearmanOracleSql,
    "stats_kendall" -> kendallOracleSql,
    "stream_kendall" -> kendallOracleSql,
    "stats_jonckheere" -> jonckheereOracleSql,
    "stream_jonckheere" -> jonckheereOracleSql,
    "stats_mood_median" -> moodOracleSql,
    "stream_mood_median" -> moodOracleSql,
    "stream_spearman" -> spearmanOracleSql,

    // Cramér's V replay: same joint counts, full contingency incl. absent
    // cells, same staged terms and fixed-order V; joint state additive
    "stats_cramers" -> cramersOracleSql,
    "stream_cramers" -> cramersOracleSql,

    // new-vs-returning replay: distinct activity, per-user min day,
    // daily rollup
    "events_new_returning" ->
      """WITH a AS (
           SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
         f AS (SELECT u, min(day) AS fd FROM a GROUP BY 1)
         SELECT day, count(*) AS n_active,
           CAST(sum(CASE WHEN day = fd THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(count(*) - sum(CASE WHEN day = fd THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning
         FROM a JOIN f USING (u) GROUP BY day ORDER BY day""",

    // autocorr replay: daily counts, lag-shifted self-joins, the same
    // exact moments and fixed-order Pearson
    "events_autocorr" ->
      """WITH d AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
         j AS (
           SELECT a.event_type, l.lag, a.n AS x, b.n AS y
           FROM d a CROSS JOIN lags l
           JOIN d b ON b.event_type = a.event_type
             AND b.day = a.day - CAST(l.lag AS INTEGER)),
         m AS (
           SELECT event_type, lag, count(*) AS n_days,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(x::DECIMAL(15,0) * x::DECIMAL(15,0)) AS qx,
             sum(y::DECIMAL(15,0) * y::DECIMAL(15,0)) AS qy,
             sum(x::DECIMAL(15,0) * y::DECIMAL(15,0)) AS p
           FROM j GROUP BY 1, 2),
         c AS (
           SELECT event_type, lag, n_days,
             n_days::DOUBLE * p::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
             n_days::DOUBLE * qx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS vx,
             n_days::DOUBLE * qy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS vy
           FROM m)
         SELECT event_type, CAST(lag AS INTEGER) AS lag, n_days,
           round(CAST(CASE WHEN vx <= 0.0 OR vy <= 0.0 THEN 0.0
             ELSE num / (sqrt(vx) * sqrt(vy)) END AS DECIMAL(18,8)), 4)::DOUBLE
             AS autocorr
         FROM c ORDER BY event_type, lag""",

    // lift replay: distinct (user, type), user-keyed pair join, the same
    // integer cross-products and single divide
    "events_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events),
         n AS (SELECT count(DISTINCT u) AS nu FROM ut),
         pt AS (SELECT t, count(*) AS c FROM ut GROUP BY 1),
         p AS (
           SELECT a.t AS type_a, b.t AS type_b, count(*) AS n_ab
           FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
           GROUP BY 1, 2)
         SELECT type_a, type_b, n_ab,
           round(CAST(CAST(n_ab::DECIMAL(38,0) * nu AS DOUBLE)
             / CAST(ca.c::DECIMAL(38,0) * cb.c AS DOUBLE) AS DECIMAL(18,8)), 4)::DOUBLE
             AS lift
         FROM p JOIN pt ca ON ca.t = type_a JOIN pt cb ON cb.t = type_b
         CROSS JOIN n
         ORDER BY type_a, type_b""",

    // knn replay: brute top-5, label votes, majority with ties to the
    // smallest label, verdict against the query's own label
    "sim_knn_acc" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v, label
           FROM embeddings),
         q AS (SELECT * FROM e WHERE vec_id < 50),
         p AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             c.label AS nl,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           FROM q CROSS JOIN e c WHERE q.vec_id != c.vec_id),
         topk AS (
           SELECT query_id, nl,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM p QUALIFY rn <= 5),
         v AS (SELECT query_id, nl, count(*) AS cv FROM topk GROUP BY 1, 2),
         b AS (
           SELECT query_id, nl AS pred_label, cv AS n_votes,
             row_number() OVER (PARTITION BY query_id ORDER BY cv DESC, nl ASC) AS rn
           FROM v)
         SELECT b.query_id, q.label AS true_label, b.pred_label,
           CAST(b.n_votes AS BIGINT) AS n_votes,
           q.label = b.pred_label AS correct
         FROM b JOIN q ON q.vec_id = b.query_id WHERE b.rn = 1
         ORDER BY b.query_id""",

    // hourly-profile replay: hour() under the pinned-UTC session, same
    // rollup and decimal-staged shares
    "events_hourly" ->
      """WITH c AS (
           SELECT event_type, CAST(extract(hour FROM ts) AS INTEGER) AS hour,
             count(*) AS n
           FROM events GROUP BY 1, 2),
         t AS (
           SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
         SELECT c.event_type, c.hour, c.n,
           round(CAST(c.n::DOUBLE / tot AS DECIMAL(18,8)), 6)::DOUBLE AS frac
         FROM c JOIN t USING (event_type)
         ORDER BY event_type, hour""",

    // CUSUM replay — shared with the streaming twin (additive counts)
    "events_cusum" -> cusumOracleSql,
    "stream_cusum" -> cusumOracleSql,

    // Page-Hinkley replay — shared with the streaming twin (additive
    // counts; prefix mean + decimal-staged prefix scans)
    "events_page_hinkley" -> pageHinkleyOracleSql,
    "stream_page_hinkley" -> pageHinkleyOracleSql,

    // MASE replay — shared with the streaming twin (additive counts;
    // lag-7 self-join errors scaled by the one-step-naive lag errors)
    "events_mase" -> maseOracleSql,
    "stream_mase" -> maseOracleSql,

    // runs-test replay — shared with the streaming twin (additive counts;
    // partitioned-rank median, keyed lag run starts, exact-integer z)
    "events_runs" -> runsOracleSql,
    "stream_runs" -> runsOracleSql,

    // p-chart replay — shared with the streaming twin (additive counts;
    // per-day rate limits off the broadcast center)
    "events_pchart" -> pchartOracleSql,
    "stream_pchart" -> pchartOracleSql,

    // mix-evenness replay — shared with the streaming twin (additive
    // counts; per-term staged entropy, one divide by ln k)
    "events_mix_evenness" -> evennessOracleSql,
  )
}
