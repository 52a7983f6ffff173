package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, IntegerType, TimestampType}

import graft.core.{Converters, DateSpan, Nm}
import graft.functions.{Dedup, Layout, Packing, Pii, Sampling, TextAnalysis, Vectors}
import graft.sources.Sources
import graft.tables._


/** DuckDB oracle SQL for the gate queries, chunk D (stable
  * entry order; split for compile-unit size only). */
private[graft] object OracleSqlD {
  import EntryOracleDefs._
  def m: Map[String, String] = Map(
    "stream_mix_evenness" -> evennessOracleSql,

    // SPRT replay — shared with the streaming twin (the count pair is
    // additive; in-engine log ratios, Wald bounds)
    "stats_sprt" -> sprtOracleSql,
    "stream_sprt" -> sprtOracleSql,

    // Breslow-Day replay — shared with the streaming twin (per-stratum
    // 2x2 counts are additive; admissible quadratic root per stratum)
    "stats_breslow_day" -> bdOracleSql,
    "stream_breslow_day" -> bdOracleSql,

    // Hill tail replay — shared with the streaming twin (per-key counts
    // are additive; Gini triangular ranks + top-k interval clamps)
    "stats_hill" -> hillOracleSql,
    "stream_hill" -> hillOracleSql,

    // ESS / design-effect replay (staged weight moments, Kish ratios)
    "stats_ess" -> essOracleSql,

    // EWMA replay: same daily counts and exact moments, same unrolled
    // λ(1−λ)^(t−j)x_j terms decimal-staged before the sum, same
    // fixed-order time-varying limits; daily counts are additive
    "events_ewma" -> ewmaOracleSql,
    "stream_ewma" -> ewmaOracleSql,
    "events_burstiness" -> burstinessOracleSql,
    "stream_burstiness" -> burstinessOracleSql,
    "events_mannkendall" -> mannKendallOracleSql,
    "stream_mannkendall" -> mannKendallOracleSql,
    "events_acf" -> acfOracleSql,
    "stream_acf" -> acfOracleSql,
    // Ljung-Box replay: ACF replay + pooled Q off the same day table
    "events_ljung_box" -> ljungBoxOracleSql,
    "stream_ljung_box" -> ljungBoxOracleSql,
    // Durbin-Watson replay: OLS fit + residual lag join off the day table
    "events_durbin_watson" -> durbinWatsonOracleSql,
    "stream_durbin_watson" -> durbinWatsonOracleSql,
    // Wilcoxon / sign replay: same paired day-diff table, zero-drop
    "events_wilcoxon" -> wilcoxonOracleSql,
    "stream_wilcoxon" -> wilcoxonOracleSql,
    "events_friedman" -> friedmanOracleSql,
    "stream_friedman" -> friedmanOracleSql,
    "events_rfm" -> rfmOracleSql,
    "events_basket" -> basketOracleSql,
    "stream_basket" -> basketOracleSql,
    "events_cohort_ltv" -> cohortLtvOracleSql,
    "stream_cohort_ltv" -> cohortLtvOracleSql,
    "audit_fk_orphans" -> fkAuditOracleSql,
    "stream_fk_audit" -> fkAuditOracleSql,
    "audit_reconcile" -> reconcileOracleSql,
    "events_page_trend" -> pageOracleSql,
    "stream_page_trend" -> pageOracleSql,
    "events_sign_test" -> signTestOracleSql,
    "stream_sign_test" -> signTestOracleSql,
    "events_pettitt" -> pettittOracleSql,
    "events_holt" -> holtOracleSql,
    "stream_holt" -> holtOracleSql,
    "stats_fdr_bh" -> fdrOracleSql,
    "stream_fdr" -> fdrOracleSql,
    "stats_padjust" -> padjustOracleSql,
    "stream_padjust" -> padjustOracleSql,
    "stream_pettitt" -> pettittOracleSql,

    // Kaplan–Meier replay: same spans, same censor rule, same exact
    // at-risk cumulatives and ln-factor sums; spans merge by min/max
    "events_survival" -> survivalOracleSql,
    "stream_survival" -> survivalOracleSql,
    "events_hazard" -> hazardOracleSql,
    "stream_hazard" -> hazardOracleSql,
    // survival-summary replay: the KM chain + conditional mins on the
    // rounded curve (spans merge by min/max)
    "events_survival_summary" -> survivalSummaryOracleSql,
    "stream_survival_summary" -> survivalSummaryOracleSql,

    // log-rank replay: same per-arm spans against the shared corpus end,
    // same pooled risk sets, same decimal-staged O−E / variance terms
    "events_logrank" ->
      """WITH spans AS (
           SELECT user_id, user_id % 2 = 0 AS a,
             min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
           FROM events GROUP BY 1, 2),
         e AS (SELECT max(l) AS endd FROM spans),
         lt AS (
           SELECT datediff('day', f, l) AS t,
             CAST(sum(CASE WHEN a AND datediff('day', l, endd) > 7
               THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN a AND datediff('day', l, endd) <= 7
               THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN NOT a AND datediff('day', l, endd) > 7
               THEN 1 ELSE 0 END) AS BIGINT) AS d2,
             CAST(sum(CASE WHEN NOT a AND datediff('day', l, endd) <= 7
               THEN 1 ELSE 0 END) AS BIGINT) AS c2
           FROM spans CROSS JOIN e GROUP BY 1),
         tot AS (
           SELECT CAST(sum(d1 + c1) AS BIGINT) AS nn1,
             CAST(sum(d2 + c2) AS BIGINT) AS nn2
           FROM lt),
         cum AS (
           SELECT t, d1, d2,
             nn1 - (CAST(sum(d1 + c1) OVER (ORDER BY t) AS BIGINT) - (d1 + c1))
               AS n1,
             nn2 - (CAST(sum(d2 + c2) OVER (ORDER BY t) AS BIGINT) - (d2 + c2))
               AS n2,
             nn1, nn2
           FROM lt CROSS JOIN tot),
         terms AS (
           SELECT nn1, nn2, d1,
             CASE WHEN d1 + d2 = 0 THEN CAST(0.0 AS DECIMAL(28,10))
                  ELSE CAST(n1::DOUBLE * (d1 + d2)::DOUBLE / (n1 + n2)::DOUBLE
                    AS DECIMAL(28,10)) END AS et,
             CASE WHEN d1 + d2 = 0 OR n1 + n2 <= 1 THEN CAST(0.0 AS DECIMAL(28,10))
                  ELSE CAST((d1 + d2)::DOUBLE
                    * (n1::DOUBLE / (n1 + n2)::DOUBLE)
                    * (n2::DOUBLE / (n1 + n2)::DOUBLE)
                    * (((n1 + n2)::DOUBLE - (d1 + d2)::DOUBLE)
                      / ((n1 + n2)::DOUBLE - 1.0))
                    AS DECIMAL(28,10)) END AS vt
           FROM cum),
         a2 AS (
           SELECT nn1, nn2, CAST(sum(d1) AS BIGINT) AS o_a, sum(et) AS ee,
             sum(vt) AS vv
           FROM terms GROUP BY 1, 2)
         SELECT nn1 AS n_a, nn2 AS n_b, o_a,
           round(CAST(ee AS DECIMAL(18,8)), 4)::DOUBLE AS e_a,
           CASE WHEN vv::DOUBLE <= 0.0 THEN NULL
                ELSE round(CAST((o_a::DOUBLE - ee::DOUBLE) / sqrt(vv::DOUBLE)
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS z
         FROM a2""",

    // power-law replay: count table, tail filter, decimal-staged ln sum,
    // one divide
    "stats_powerlaw" ->
      """WITH c AS (
           SELECT user_id, count(*) AS c FROM events GROUP BY 1),
         tail AS (SELECT c FROM c WHERE c >= 2),
         a AS (
           SELECT count(*) AS n_tail,
             sum(CAST(ln(c::DOUBLE / (2.0 - 0.5)) AS DECIMAL(18,8))) AS s
           FROM tail)
         SELECT CAST(2 AS BIGINT) AS xmin, n_tail,
           round(CAST(CASE WHEN s IS NULL OR s = 0 THEN 0.0
             ELSE 1.0 + n_tail::DOUBLE / CAST(s AS DOUBLE) END
             AS DECIMAL(18,8)), 4)::DOUBLE AS alpha
         FROM a""",

    // hist2d replay: same bin floors, rollup, broadcast-total shares
    "stats_hist2d" ->
      """WITH b AS (
           SELECT CAST(floor(l_quantity / 10.0) AS BIGINT) AS x_bin,
             CAST(floor(l_extendedprice / 20000.0) AS BIGINT) AS y_bin,
             count(*) AS n
           FROM lineitem GROUP BY 1, 2),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM b)
         SELECT x_bin, y_bin, n,
           round(CAST(n::DOUBLE / tot AS DECIMAL(18,8)), 6)::DOUBLE AS frac
         FROM b CROSS JOIN t ORDER BY x_bin, y_bin""",

    // Benford replay: BIGINT-string first digits, 9-row rollup, the same
    // ln(1+1/d)/ln(10) expected frequencies and rounded deviations;
    // digit counts are additive so the streaming twin shares it
    "stats_benford" -> benfordOracleSql,
    "stream_benford" -> benfordOracleSql,

    // Gini replay: count-of-counts, cumulative mass self-join, the same
    // decimal-staged trapezoid and single final divide; counts are
    // additive so the streaming twin shares it verbatim
    "stats_gini" -> giniOracleSql,
    "stream_gini" -> giniOracleSql,

    // range-bounds replay: the deterministic md5 sample filter, then the
    // stats_quantile_hist pick at the 7 interior octile points
    "layout_range_bounds" ->
      """WITH s AS (
           SELECT value FROM events
           WHERE ('0x'||substr(md5(CAST(event_id AS VARCHAR) || 'range-v1'),1,15))::BIGINT
                 % 10000 < 500),
         b AS (
           SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS cnt
           FROM s GROUP BY 1),
         cum AS (
           SELECT a.bin, CAST(sum(b2.cnt) AS BIGINT) AS cum_count
           FROM b a JOIN b b2 ON b2.bin <= a.bin GROUP BY a.bin),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM b),
         e AS (SELECT bin, cum_count, total FROM cum CROSS JOIN tot),
         qs(q) AS (VALUES (CAST(0.125 AS DOUBLE)), (CAST(0.25 AS DOUBLE)),
           (CAST(0.375 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
           (CAST(0.625 AS DOUBLE)), (CAST(0.75 AS DOUBLE)),
           (CAST(0.875 AS DOUBLE)))
         SELECT q, bin, bin * CAST(5.0 AS DOUBLE) AS lo,
           (bin + 1) * CAST(5.0 AS DOUBLE) AS hi, cum_count, total
         FROM (
           SELECT q, bin, cum_count, total,
             row_number() OVER (PARTITION BY q ORDER BY bin ASC) AS rn
           FROM qs JOIN e ON CAST(cum_count AS DOUBLE) >= q * total) WHERE rn = 1
         ORDER BY q""",

    // streaming quantile replay: additive bin state == the one-pass corpus
    // histogram, so the batch SQL is identical to stats_quantile_hist
    "stream_quantile" ->
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

    // funnel replay: chained strictly-after mins per user
    "events_funnel" ->
      """WITH s1 AS (
           SELECT user_id, min(ts) AS step_1_ts FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (
           SELECT e.user_id, min(e.ts) AS step_2_ts FROM events e
           JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.step_1_ts
           WHERE e.event_type = 'click' GROUP BY e.user_id),
         s3 AS (
           SELECT e.user_id, min(e.ts) AS step_3_ts FROM events e
           JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.step_2_ts
           WHERE e.event_type = 'signup' GROUP BY e.user_id),
         s4 AS (
           SELECT e.user_id, min(e.ts) AS step_4_ts FROM events e
           JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.step_3_ts
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
         SELECT u.user_id, step_1_ts, step_2_ts, step_3_ts, step_4_ts,
           CAST(CASE WHEN step_4_ts IS NOT NULL THEN 4
                WHEN step_3_ts IS NOT NULL THEN 3
                WHEN step_2_ts IS NOT NULL THEN 2
                WHEN step_1_ts IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
             AS steps_completed
         FROM (SELECT DISTINCT user_id FROM events) u
         LEFT JOIN s1 ON u.user_id = s1.user_id
         LEFT JOIN s2 ON u.user_id = s2.user_id
         LEFT JOIN s3 ON u.user_id = s3.user_id
         LEFT JOIN s4 ON u.user_id = s4.user_id
         ORDER BY u.user_id""",

    // funnel-latency replay: the funnel steps, per-transition integer
    // second diffs, decimal-staged means, and the grouped histogram p50
    // (1h bins) with the same first-qualifying-bin pick
    "events_funnel_latency" ->
      """WITH s1 AS (
           SELECT user_id, min(ts) AS step_1_ts FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (
           SELECT e.user_id, min(e.ts) AS step_2_ts FROM events e
           JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.step_1_ts
           WHERE e.event_type = 'click' GROUP BY e.user_id),
         s3 AS (
           SELECT e.user_id, min(e.ts) AS step_3_ts FROM events e
           JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.step_2_ts
           WHERE e.event_type = 'signup' GROUP BY e.user_id),
         s4 AS (
           SELECT e.user_id, min(e.ts) AS step_4_ts FROM events e
           JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.step_3_ts
           WHERE e.event_type = 'purchase' GROUP BY e.user_id),
         lat AS (
           SELECT 1 AS step, 'view->click' AS transition,
             (epoch_us(step_2_ts) - epoch_us(step_1_ts)) // 1000000 AS secs
           FROM s2 JOIN s1 USING (user_id)
           UNION ALL
           SELECT 2, 'click->signup',
             (epoch_us(step_3_ts) - epoch_us(step_2_ts)) // 1000000
           FROM s3 JOIN s2 USING (user_id)
           UNION ALL
           SELECT 3, 'signup->purchase',
             (epoch_us(step_4_ts) - epoch_us(step_3_ts)) // 1000000
           FROM s4 JOIN s3 USING (user_id)),
         st AS (
           SELECT step, transition, count(*) AS n_users,
             round(CAST(CAST(sum(secs) AS DOUBLE) / count(*)
               AS DECIMAL(18,8)), 2)::DOUBLE AS mean_secs
           FROM lat GROUP BY 1, 2),
         b AS (
           SELECT transition, CAST(floor(secs / 3600.0) AS BIGINT) AS bin,
             count(*) AS cnt
           FROM lat GROUP BY 1, 2),
         cum AS (
           SELECT a.transition, a.bin, CAST(sum(b2.cnt) AS BIGINT) AS cum_count
           FROM b a JOIN b b2 ON b2.transition = a.transition AND b2.bin <= a.bin
           GROUP BY 1, 2),
         tot AS (SELECT transition, CAST(sum(cnt) AS BIGINT) AS total FROM b GROUP BY 1),
         pick AS (
           SELECT transition, (bin + 1) * 3600.0 AS p50_secs,
             row_number() OVER (PARTITION BY transition ORDER BY bin ASC) AS rn
           FROM cum JOIN tot USING (transition)
           WHERE CAST(cum_count AS DOUBLE) >= 0.5 * total)
         SELECT st.step, st.transition, st.n_users, st.mean_secs, p.p50_secs
         FROM st JOIN pick p ON st.transition = p.transition AND p.rn = 1
         ORDER BY st.step""",

    // retention replay: distinct (user, day) activity, min-day cohorts,
    // offset rollup
    "events_retention" ->
      """WITH a AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)
         SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, a.day) AS INTEGER) AS offset_days,
           count(DISTINCT a.user_id) AS active_users
         FROM a JOIN c ON a.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // attribution replay: the identical user-keyed IGNORE NULLS window with
    // the same (ts, event_id) tie-break
    "events_attribution" ->
      """WITH w AS (
           SELECT event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                 IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
           FROM events)
         SELECT coalesce(touch, 'none') AS touch_type, count(*) AS conversions
         FROM w WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",

    // streaming anomaly replay: accreted additive counts equal the batch
    // count table, so the oracle is the batch anomaly SQL verbatim
    "stream_anomaly" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT event_type, count(*) AS d, CAST(sum(n) AS BIGINT) AS s,
             sum(n::DECIMAL(15,0) * n::DECIMAL(15,0)) AS s2
           FROM daily GROUP BY 1),
         j AS (
           SELECT daily.event_type, day, n,
             s::DOUBLE / d AS mean,
             sqrt(greatest(s2::DOUBLE / d
               - (s::DOUBLE / d) * (s::DOUBLE / d), 0.0)) AS std
           FROM daily JOIN st USING (event_type))
         SELECT event_type, day, n,
           round(CAST(CASE WHEN std = 0 THEN 0.0
             ELSE (n - mean) / std END AS DECIMAL(18,8)), 4)::DOUBLE AS z,
           (CASE WHEN std = 0 THEN 0.0 ELSE abs((n - mean) / std) END) > 2.0
             AS is_anomaly
         FROM j ORDER BY event_type, day""",

    // streaming retention replay: the monitor's accreted activity state is
    // the distinct (user, day) of the full stream, so the oracle is the
    // batch retention SQL verbatim
    "stream_retention" ->
      """WITH a AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)
         SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, a.day) AS INTEGER) AS offset_days,
           count(DISTINCT a.user_id) AS active_users
         FROM a JOIN c ON a.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // sessionize replay: same lag-flag + running-sum windows over the same
    // (ts, event_id) sort, same rollup
    "events_sessionize" ->
      """WITH f AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts, 1) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS nw
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts,
             CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM f)
         SELECT user_id, session_id, min(ts) AS session_start,
           max(ts) AS session_end, count(*) AS n_events
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    // anomaly replay: same count table, same exact-staged moments, same
    // fixed z operation order
    "events_anomaly" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT event_type, count(*) AS d, CAST(sum(n) AS BIGINT) AS s,
             sum(n::DECIMAL(15,0) * n::DECIMAL(15,0)) AS s2
           FROM daily GROUP BY 1),
         j AS (
           SELECT daily.event_type, day, n,
             s::DOUBLE / d AS mean,
             sqrt(greatest(s2::DOUBLE / d
               - (s::DOUBLE / d) * (s::DOUBLE / d), 0.0)) AS std
           FROM daily JOIN st USING (event_type))
         SELECT event_type, day, n,
           round(CAST(CASE WHEN std = 0 THEN 0.0
             ELSE (n - mean) / std END AS DECIMAL(18,8)), 4)::DOUBLE AS z,
           (CASE WHEN std = 0 THEN 0.0 ELSE abs((n - mean) / std) END) > 2.0
             AS is_anomaly
         FROM j ORDER BY event_type, day""",

    // PSI replay: same bin tables, add-one smoothing, fixed-order
    // (pa−pb)·ln(pa/pb) terms decimal-staged before the sum
    "stats_psi_drift" -> psiOracleSql,
    // additive stream-side bin counts: folded state reads out identically
    "stream_psi" -> psiOracleSql,

    // Poisson bootstrap replay: same md5 buckets, same inverse-CDF weight
    // thresholds, exact decimal weighted sums, one divide + staged round
    "stats_bootstrap" -> bootOracleSql,
    // linear replicate moments: folded state reads out identically
    "stream_bootstrap" -> bootOracleSql,

    // KS replay: same bins, same cumulative self-join, same exact decimal
    // cross-difference and single division
    "stats_ks_drift" ->
      """WITH a AS (
           SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS cnt
           FROM events WHERE event_type = 'click' GROUP BY 1),
         b AS (
           SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS cnt
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         edges AS (SELECT bin FROM a UNION SELECT bin FROM b),
         ca AS (
           SELECT e.bin, CAST(coalesce(sum(a.cnt), 0) AS BIGINT) AS ca
           FROM edges e LEFT JOIN a ON a.bin <= e.bin GROUP BY e.bin),
         cb AS (
           SELECT e.bin, CAST(coalesce(sum(b.cnt), 0) AS BIGINT) AS cb
           FROM edges e LEFT JOIN b ON b.bin <= e.bin GROUP BY e.bin),
         na AS (SELECT CAST(sum(cnt) AS BIGINT) AS na FROM a),
         nb AS (SELECT CAST(sum(cnt) AS BIGINT) AS nb FROM b)
         SELECT
           round(CAST(CAST(max(abs(ca.ca::DECIMAL(18,0) * nb.nb::DECIMAL(18,0)
               - cb.cb::DECIMAL(18,0) * na.na::DECIMAL(18,0))) AS DOUBLE)
             / (na.na::DOUBLE * nb.nb) AS DECIMAL(18,8)), 6)::DOUBLE AS ks,
           na.na AS n_a, nb.nb AS n_b
         FROM ca JOIN cb USING (bin) CROSS JOIN na CROSS JOIN nb
         GROUP BY na.na, nb.nb""",

    // transitions replay: the same user-keyed lead pairs, rollup, and
    // broadcast row-total probability divide
    "events_transitions" ->
      """WITH h AS (
           SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
           FROM events),
         c AS (
           SELECT from_type, to_type, count(*) AS n FROM h
           WHERE to_type IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, n,
           round(CAST(n::DOUBLE / tot AS DECIMAL(18,8)), 6)::DOUBLE AS p
         FROM c JOIN t USING (from_type) ORDER BY from_type, to_type""",

    // forecast replay: daily counts, lag-7 self-join, decimal-staged MAPE
    "events_forecast" -> forecastOracleSql,
    // daily counts are additive across batches, so the accreted forecast
    // audit equals the batch one — identical oracle
    "stream_forecast" -> forecastOracleSql,

    // cadence replay: same lag window, exact moment staging, the same
    // E[x2]-E[x]2 order and rounded-column robotic compare
    "events_cadence" ->
      """WITH g AS (
           SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM events),
         p AS (
           SELECT user_id, count(*) AS n_events, count(gap) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS s,
             CAST(sum(CAST(gap AS DECIMAL(38,0)) * CAST(gap AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS s2
           FROM g GROUP BY user_id
           HAVING count(gap) >= 1),
         m AS (
           SELECT user_id, n_events, n_gaps,
             round(CAST(CAST(s AS DOUBLE) / n_gaps / 1000000.0
               AS DECIMAL(18,8)), 2)::DOUBLE AS mean_gap_s,
             round(CAST(sqrt(greatest(
               CAST(s2 AS DOUBLE) / n_gaps
                 - (CAST(s AS DOUBLE) / n_gaps) * (CAST(s AS DOUBLE) / n_gaps),
               0.0)) / 1000000.0 AS DECIMAL(18,8)), 2)::DOUBLE AS std_gap_s
           FROM p)
         SELECT user_id, n_events, n_gaps, mean_gap_s, std_gap_s,
           n_gaps >= 10 AND std_gap_s < mean_gap_s * 0.1 AS robotic
         FROM m ORDER BY user_id""",

    // inter-arrival replay: same (user,type)-keyed lag, capped integer
    // floor-divide buckets
    "events_interarrival" -> interarrivalOracleSql,
    // with per-user time-ordered batches the carried last event closes
    // cross-batch gaps exactly once — identical oracle
    "stream_interarrival" -> interarrivalOracleSql,

    // band-join replay: the exact |a−b| ≤ tol predicate over the plain
    // join (DuckDB can afford the nested loop at oracle scale)
    "join_band" ->
      """SELECT a.event_id AS probe_id, b.event_id AS match_id,
           a.value AS probe_value, b.value AS match_value
         FROM events a JOIN events b
           ON a.event_type = b.event_type
           AND abs(a.value - b.value) <= 0.05
         WHERE a.event_id % 101 = 0 AND a.event_id <> b.event_id
         ORDER BY probe_id, match_id""",

    // entry-path replay: same ranking window, per-user ordered list join
    "events_paths" -> entryPathsOracleSql,
    // with per-user time-ordered batches the carried prefix re-cut at
    // depth equals the batch entryPaths — identical oracle
    "stream_paths" -> entryPathsOracleSql,

    // streaming transitions replay: with per-user time-ordered batches the
    // carried last event contributes exactly the boundary hop, so the
    // accreted matrix equals the batch transitions over the full stream
    "stream_transitions" ->
      """WITH h AS (
           SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
           FROM events),
         c AS (
           SELECT from_type, to_type, count(*) AS n FROM h
           WHERE to_type IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, n,
           round(CAST(n::DOUBLE / tot AS DECIMAL(18,8)), 6)::DOUBLE AS p
         FROM c JOIN t USING (from_type) ORDER BY from_type, to_type""",

    // chi-square replay: same per-side count tables, the same exact-integer
    // expected-count staging (one double divide per E), fixed (O−E)²/E
    // operation order, per-category terms decimal-staged before the sum
    "stats_chisq_drift" ->
      """WITH a AS (
           SELECT event_type AS cat, count(*) AS oa FROM events
           WHERE CAST(ts AS DATE) <= DATE '2024-01-15' GROUP BY 1),
         b AS (
           SELECT event_type AS cat, count(*) AS ob FROM events
           WHERE CAST(ts AS DATE) > DATE '2024-01-15' GROUP BY 1),
         j AS (
           SELECT coalesce(a.cat, b.cat) AS cat,
             coalesce(oa, 0) AS oa, coalesce(ob, 0) AS ob
           FROM a FULL OUTER JOIN b ON a.cat = b.cat),
         tot AS (
           SELECT CAST(sum(oa) AS BIGINT) AS na, CAST(sum(ob) AS BIGINT) AS nb
           FROM j),
         terms AS (
           SELECT na, nb,
             CAST((oa::DOUBLE - e_a) * (oa::DOUBLE - e_a) / e_a
               + (ob::DOUBLE - e_b) * (ob::DOUBLE - e_b) / e_b
               AS DECIMAL(28,10)) AS t
           FROM (
             SELECT oa, ob, na, nb,
               CAST(na::DECIMAL(38,0) * (oa + ob)::DECIMAL(38,0) AS DOUBLE)
                 / CAST((na + nb)::DECIMAL(38,0) AS DOUBLE) AS e_a,
               CAST(nb::DECIMAL(38,0) * (oa + ob)::DECIMAL(38,0) AS DOUBLE)
                 / CAST((na + nb)::DECIMAL(38,0) AS DOUBLE) AS e_b
             FROM j CROSS JOIN tot))
         SELECT count(*) AS n_categories, na AS n_a, nb AS n_b,
           CAST(count(*) - 1 AS BIGINT) AS dof,
           round(sum(t), 6)::DOUBLE AS chi2
         FROM terms GROUP BY na, nb""",

    // rolling replay: same count table, same rows-semantics trailing window
    "events_rolling" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, n,
           count(*) OVER w AS trail_days,
           round(CAST(sum(n) OVER w::DOUBLE / count(*) OVER w
             AS DECIMAL(18,8)), 4)::DOUBLE AS trail_mean
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY event_type, day""",

    // streaming stickiness replay: the accreted activity state is the
    // distinct (user, day) of the full stream, so the batch SQL replays it
    "stream_stickiness" ->
      """WITH a AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         days AS (SELECT DISTINCT day FROM a),
         c AS (
           SELECT DISTINCT a.user_id, d.day FROM a
           JOIN days d ON d.day >= a.day AND d.day <= a.day + INTERVAL 6 DAY),
         wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM c GROUP BY day),
         dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM a GROUP BY day)
         SELECT dau.day, dau.dau, wau.wau,
           round(CAST(dau.dau::DOUBLE / wau.wau AS DECIMAL(18,8)), 6)::DOUBLE
             AS stickiness
         FROM dau JOIN wau ON dau.day = wau.day ORDER BY dau.day""",

    // stickiness replay: same vote-explode via a day-range join (equivalent
    // set), distinct rollups, decimal-staged ratio
    "events_stickiness" ->
      """WITH a AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         days AS (SELECT DISTINCT day FROM a),
         c AS (
           SELECT DISTINCT a.user_id, d.day FROM a
           JOIN days d ON d.day >= a.day AND d.day <= a.day + INTERVAL 6 DAY),
         wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM c GROUP BY day),
         dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM a GROUP BY day)
         SELECT dau.day, dau.dau, wau.wau,
           round(CAST(dau.dau::DOUBLE / wau.wau AS DECIMAL(18,8)), 6)::DOUBLE
             AS stickiness
         FROM dau JOIN wau ON dau.day = wau.day ORDER BY dau.day""",

    // overlap replay: the same 3-shingle sets per (source, shingle), the
    // same ordered self-join and Jaccard denominators
    "curate_source_overlap" ->
      s"""WITH norm AS (
           SELECT source, string_split($normSql, ' ') AS toks FROM documents),
         sh0 AS (
           SELECT source AS src, unnest(list_distinct(
             CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(toks[i+1:i+3], ' ')) END)) AS sh
           FROM norm),
         sh AS (SELECT DISTINCT src, sh FROM sh0),
         sizes AS (SELECT src, count(*) AS n FROM sh GROUP BY src),
         p AS (
           SELECT a.src AS source_a, b.src AS source_b,
             count(*) AS shared_shingles
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.src < b.src
           GROUP BY 1, 2)
         SELECT source_a, source_b, shared_shingles,
           round(CAST(shared_shingles::DOUBLE
               / (sa.n + sb.n - shared_shingles) AS DECIMAL(18,8)), 6)::DOUBLE
             AS jaccard
         FROM p JOIN sizes sa ON p.source_a = sa.src
                JOIN sizes sb ON p.source_b = sb.src
         ORDER BY source_a, source_b""",

    // CMS replay: same md5 row-hashes, counter build, min-of-4 lookup
    "sketch_cms" -> cmsOracleSql,
    // the streaming monitor accretes the SAME linear sketch (cells are
    // additive), so the batch replay is the identical oracle
    "stream_cms" -> cmsOracleSql,

    // bloom replay: same md5 positions, all-k-set membership, exact flag
    "sketch_bloom" ->
      """WITH ks AS (SELECT DISTINCT o_custkey AS key FROM orders),
         js AS (SELECT unnest(range(0, 3)) AS j),
         bits AS (
           SELECT DISTINCT
             ('0x'||substr(md5(CAST(key AS VARCHAR) || 'bloom' || j::VARCHAR),1,15))::BIGINT
               % 4096 AS pos
           FROM ks CROSS JOIN js),
         probe AS (SELECT DISTINCT c_custkey FROM customer),
         pp AS (
           SELECT c_custkey,
             ('0x'||substr(md5(CAST(c_custkey AS VARCHAR) || 'bloom' || j::VARCHAR),1,15))::BIGINT
               % 4096 AS pos
           FROM probe CROSS JOIN js),
         m AS (
           SELECT c_custkey, count(*) AS n,
             sum(CASE WHEN pos IN (SELECT pos FROM bits) THEN 1 ELSE 0 END)
               AS hit
           FROM pp GROUP BY 1)
         SELECT c_custkey, (hit = n) AS might_present,
           (c_custkey IN (SELECT key FROM ks)) AS actually_present
         FROM m ORDER BY c_custkey""",

    // HLL replay: the same md5-derived 60-bit hash split into bucket and
    // sub-stream word, trailing-zero ranks via bit_count((w & -w) - 1), register-max,
    // exact-integer harmonic staging, the identical alpha·m²·2^60 literal
    // overlap replay: the hll chain three times (A-slice, B-slice, and the
    // register-wise max union), then inclusion-exclusion on the estimates
    "sketch_hll_overlap" ->
      s"""WITH tk AS (
           SELECT doc_id, tok FROM (
             SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok FROM documents)
           WHERE tok <> ''),
         ha AS (SELECT ('0x' || substr(md5(tok || 'hll'), 1, 15))::BIGINT AS h
                FROM tk WHERE doc_id % 2 = 0),
         hb AS (SELECT ('0x' || substr(md5(tok || 'hll'), 1, 15))::BIGINT AS h
                FROM tk WHERE doc_id % 3 = 0),
         ra0 AS (
           SELECT h % 256 AS bucket, max(CASE WHEN h // 256 = 0 THEN 53
             ELSE CAST(bit_count(((h // 256) & (-(h // 256))) - 1) AS INTEGER) + 1 END) AS reg
           FROM ha GROUP BY 1),
         rb0 AS (
           SELECT h % 256 AS bucket, max(CASE WHEN h // 256 = 0 THEN 53
             ELSE CAST(bit_count(((h // 256) & (-(h // 256))) - 1) AS INTEGER) + 1 END) AS reg
           FROM hb GROUP BY 1),
         buckets AS (SELECT unnest(range(0, 256)) AS bucket),
         ra AS (SELECT b.bucket, coalesce(ra0.reg, 0) AS reg
                FROM buckets b LEFT JOIN ra0 USING (bucket)),
         rb AS (SELECT b.bucket, coalesce(rb0.reg, 0) AS reg
                FROM buckets b LEFT JOIN rb0 USING (bucket)),
         ru AS (SELECT ra.bucket, greatest(ra.reg, rb.reg) AS reg
                FROM ra JOIN rb USING (bucket)),
         ea AS (
           SELECT round(CAST(CASE WHEN ($hllC / CAST(s AS DOUBLE)) <= 640.0 AND z > 0
               THEN 256.0 * ln(256.0 / CAST(z AS DOUBLE))
               ELSE ($hllC / CAST(s AS DOUBLE)) END AS DECIMAL(38,6)), 2)::DOUBLE AS est_a
           FROM (SELECT CAST(sum(1::BIGINT << (60 - reg)) AS DECIMAL(38,0)) AS s,
                   CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z FROM ra)),
         eb AS (
           SELECT round(CAST(CASE WHEN ($hllC / CAST(s AS DOUBLE)) <= 640.0 AND z > 0
               THEN 256.0 * ln(256.0 / CAST(z AS DOUBLE))
               ELSE ($hllC / CAST(s AS DOUBLE)) END AS DECIMAL(38,6)), 2)::DOUBLE AS est_b
           FROM (SELECT CAST(sum(1::BIGINT << (60 - reg)) AS DECIMAL(38,0)) AS s,
                   CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z FROM rb)),
         eu AS (
           SELECT round(CAST(CASE WHEN ($hllC / CAST(s AS DOUBLE)) <= 640.0 AND z > 0
               THEN 256.0 * ln(256.0 / CAST(z AS DOUBLE))
               ELSE ($hllC / CAST(s AS DOUBLE)) END AS DECIMAL(38,6)), 2)::DOUBLE AS est_union
           FROM (SELECT CAST(sum(1::BIGINT << (60 - reg)) AS DECIMAL(38,0)) AS s,
                   CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z FROM ru))
         SELECT est_a, est_b, est_union,
           round(CAST(est_a + est_b - est_union AS DECIMAL(38,6)), 2)::DOUBLE
             AS est_intersection
         FROM ea CROSS JOIN eb CROSS JOIN eu""",

    "sketch_hll" ->
      s"""WITH tk AS (
           SELECT tok FROM (
             SELECT unnest(string_split($normSql, ' ')) AS tok FROM documents)
           WHERE tok <> ''),
         h AS (SELECT ('0x' || substr(md5(tok || 'hll'), 1, 15))::BIGINT AS h FROM tk),
         rr AS (
           SELECT h % 256 AS bucket,
             CASE WHEN h // 256 = 0 THEN 53
                  ELSE CAST(bit_count(((h // 256) & (-(h // 256))) - 1) AS INTEGER) + 1 END AS rho
           FROM h),
         regs0 AS (SELECT bucket, max(rho) AS reg FROM rr GROUP BY bucket),
         regs AS (
           SELECT b.bucket, coalesce(regs0.reg, 0) AS reg
           FROM (SELECT unnest(range(0, 256)) AS bucket) b
           LEFT JOIN regs0 USING (bucket)),
         agg AS (
           SELECT CAST(sum(1::BIGINT << (60 - reg)) AS DECIMAL(38,0)) AS s,
             CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_registers
           FROM regs),
         est AS (
           SELECT 256 AS m, zero_registers,
             round(CAST(CASE WHEN ($hllC / CAST(s AS DOUBLE)) <= 640.0
                              AND zero_registers > 0
                         THEN 256.0 * ln(256.0 / CAST(zero_registers AS DOUBLE))
                         ELSE ($hllC / CAST(s AS DOUBLE)) END
               AS DECIMAL(38,6)), 2)::DOUBLE AS est_distinct
           FROM agg)
         SELECT est.m, est.zero_registers, est.est_distinct, x.exact_distinct
         FROM est CROSS JOIN
           (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct FROM tk) x""",

    // incremental-CC replay: order-independence means the accreted labeling
    // equals the one-shot recursive reach over the full pair set
    "stream_components" ->
      s"""WITH RECURSIVE $nearDupEdgesSql,
         reach(node, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src)
         SELECT node AS doc_id, least(node, min(r)) AS cluster
         FROM reach GROUP BY node ORDER BY doc_id""",

    // streaming HLL replay: mergeability means the accreted registers equal
    // the one-pass corpus sketch — identical chain, no exact-count column
    "stream_cardinality" ->
      s"""WITH tk AS (
           SELECT tok FROM (
             SELECT unnest(string_split($normSql, ' ')) AS tok FROM documents)
           WHERE tok <> ''),
         h AS (SELECT ('0x' || substr(md5(tok || 'hll'), 1, 15))::BIGINT AS h FROM tk),
         rr AS (
           SELECT h % 256 AS bucket,
             CASE WHEN h // 256 = 0 THEN 53
                  ELSE CAST(bit_count(((h // 256) & (-(h // 256))) - 1) AS INTEGER) + 1 END AS rho
           FROM h),
         regs0 AS (SELECT bucket, max(rho) AS reg FROM rr GROUP BY bucket),
         regs AS (
           SELECT b.bucket, coalesce(regs0.reg, 0) AS reg
           FROM (SELECT unnest(range(0, 256)) AS bucket) b
           LEFT JOIN regs0 USING (bucket)),
         agg AS (
           SELECT CAST(sum(1::BIGINT << (60 - reg)) AS DECIMAL(38,0)) AS s,
             CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_registers
           FROM regs)
         SELECT 256 AS m, zero_registers,
           round(CAST(CASE WHEN ($hllC / CAST(s AS DOUBLE)) <= 640.0
                            AND zero_registers > 0
                       THEN 256.0 * ln(256.0 / CAST(zero_registers AS DOUBLE))
                       ELSE ($hllC / CAST(s AS DOUBLE)) END
             AS DECIMAL(38,6)), 2)::DOUBLE AS est_distinct
         FROM agg""",

    // winsorize replay: per-type quantile picks → clamp
    "stats_winsorize" ->
      """WITH b AS (
           SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin, count(*) AS cnt
           FROM events GROUP BY 1, 2),
         cum AS (
           SELECT a.event_type, a.bin, CAST(sum(b2.cnt) AS BIGINT) AS cum_count
           FROM b a JOIN b b2 ON b2.event_type = a.event_type AND b2.bin <= a.bin
           GROUP BY a.event_type, a.bin),
         tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total FROM b GROUP BY 1),
         e AS (SELECT cum.event_type, bin, cum_count, total
               FROM cum JOIN tot ON cum.event_type = tot.event_type),
         qs(q) AS (VALUES (CAST(0.05 AS DOUBLE)), (CAST(0.95 AS DOUBLE))),
         pick AS (
           SELECT event_type, q, bin FROM (
             SELECT event_type, q, bin,
               row_number() OVER (PARTITION BY event_type, q ORDER BY bin ASC) AS rn
             FROM qs JOIN e ON CAST(cum_count AS DOUBLE) >= q * total) WHERE rn = 1),
         bounds AS (
           SELECT event_type,
             min(CASE WHEN q = 0.05 THEN bin * 10.0 END) AS clip_lo,
             min(CASE WHEN q = 0.95 THEN (bin + 1) * 10.0 END) AS clip_hi
           FROM pick GROUP BY event_type)
         SELECT event_id, ev.event_type, value,
           least(greatest(value, clip_lo), clip_hi) AS value_clipped,
           clip_lo, clip_hi
         FROM events ev JOIN bounds ON ev.event_type = bounds.event_type
         ORDER BY event_id""",

    "stats_quantile_by_type" ->
      """WITH b AS (
           SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin, count(*) AS cnt
           FROM events GROUP BY 1, 2),
         cum AS (
           SELECT a.event_type, a.bin, CAST(sum(b2.cnt) AS BIGINT) AS cum_count
           FROM b a JOIN b b2 ON b2.event_type = a.event_type AND b2.bin <= a.bin
           GROUP BY a.event_type, a.bin),
         tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total FROM b GROUP BY 1),
         e AS (SELECT cum.event_type, bin, cum_count, total
               FROM cum JOIN tot ON cum.event_type = tot.event_type),
         qs(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)))
         SELECT event_type, q, bin, bin * CAST(10.0 AS DOUBLE) AS lo,
           (bin + 1) * CAST(10.0 AS DOUBLE) AS hi, cum_count, total
         FROM (
           SELECT event_type, q, bin, cum_count, total,
             row_number() OVER (PARTITION BY event_type, q ORDER BY bin ASC) AS rn
           FROM qs JOIN e ON CAST(cum_count AS DOUBLE) >= q * total) WHERE rn = 1
         ORDER BY event_type, q""",

    // sliding-window chunking: stride-spaced starts, last start clamped to
    // n-window (always full-width), DuckDB list_slice mirrors Spark slice
    "chunk_overlap" ->
      s"""WITH d AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks, $normSql AS nt FROM documents),
         n AS (
           SELECT doc_id, toks,
             CASE WHEN length(nt) = 0 THEN 0 ELSE len(toks) END AS n FROM d),
         x AS (
           SELECT doc_id, toks, n,
             unnest(range(0, CAST(floor(CAST(greatest(n - 32, 0) AS DOUBLE) / 24.0) AS BIGINT)
               + CASE WHEN greatest(n - 32, 0) % 24 > 0 THEN 2 ELSE 1 END)) AS chunk
           FROM n WHERE n > 0),
         c AS (
           SELECT doc_id, chunk, least(chunk * 24, greatest(n - 32, 0)) AS start,
             list_slice(toks, least(chunk * 24, greatest(n - 32, 0)) + 1,
               least(chunk * 24, greatest(n - 32, 0)) + 32) AS ct
           FROM x)
         SELECT doc_id, chunk, start, len(ct) AS n_tok,
           md5(array_to_string(ct, ' ')) AS fp
         FROM c ORDER BY doc_id, chunk""",

    // entropy replay: per-(doc, token) counts, decimal-staged −(c/n)ln(c/n)
    "text_entropy" ->
      s"""WITH tk AS (
           SELECT doc_id, tok FROM (
             SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
             FROM documents)
           WHERE tok <> ''),
         tf AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY doc_id, tok),
         n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tf GROUP BY doc_id),
         sc AS (
           SELECT doc_id, max(n) AS n_tokens,
             round(CAST(-sum(term) AS DECIMAL(18,8)), 4)::DOUBLE AS entropy
           FROM (
             SELECT tf.doc_id, n.n,
               CAST((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
                 AS DECIMAL(18,8)) AS term
             FROM tf JOIN n ON tf.doc_id = n.doc_id)
           GROUP BY doc_id)
         SELECT documents.doc_id,
           CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
           coalesce(entropy, 0.0) AS entropy
         FROM documents LEFT JOIN sc ON documents.doc_id = sc.doc_id
         ORDER BY documents.doc_id""",

    // bigram LM replay: seen bigram = exact count ratio, unseen = 0.4×
    // add-one unigram; DECIMAL-staged transition logs
    "text_lm_bigram" ->
      s"""WITH d AS (
           SELECT doc_id, doc_id % 10 != 0 AS tr,
             list_filter(string_split($normSql, ' '), t -> len(t) > 0) AS toks
           FROM documents),
         bgl AS (
           SELECT doc_id, tr, CASE WHEN len(toks) >= 2
             THEN list_transform(range(0, len(toks)-1),
               i -> toks[i+1] || ' ' || toks[i+2])
             ELSE CAST([] AS VARCHAR[]) END AS bgs FROM d),
         px AS (
           SELECT doc_id, tr, bg, split_part(bg, ' ', 1) AS a,
             split_part(bg, ' ', 2) AS b
           FROM (SELECT doc_id, tr, unnest(bgs) AS bg FROM bgl)),
         cab AS (SELECT bg, count(*) AS cab FROM px WHERE tr GROUP BY bg),
         ca AS (SELECT a, count(*) AS ca FROM px WHERE tr GROUP BY a),
         uni AS (
           SELECT tok AS b, count(*) AS cb
           FROM (SELECT unnest(toks) AS tok FROM d WHERE tr) GROUP BY tok),
         st AS (SELECT CAST(sum(cb) AS BIGINT) AS t, count(*) AS v FROM uni),
         sc AS (
           SELECT doc_id, count(*) AS n_transitions,
             round(CAST(CAST(sum(lp) AS DOUBLE) / count(*) AS DECIMAL(18,8)), 4)::DOUBLE
               AS avg_logprob
           FROM (
             SELECT doc_id,
               CAST(CASE WHEN cab IS NOT NULL AND ca IS NOT NULL
                 THEN ln(CAST(cab AS DOUBLE) / CAST(ca AS DOUBLE))
                 ELSE ln(0.4 * (CAST(coalesce(cb, 0) AS DOUBLE) + 1.0)
                   / (CAST(t AS DOUBLE) + v)) END
                 AS DECIMAL(18,8)) AS lp
             FROM px LEFT JOIN cab USING (bg) LEFT JOIN ca USING (a)
             LEFT JOIN uni USING (b) CROSS JOIN st)
           GROUP BY doc_id)
         SELECT documents.doc_id,
           CAST(coalesce(n_transitions, 0) AS BIGINT) AS n_transitions,
           coalesce(avg_logprob, 0.0) AS avg_logprob
         FROM documents LEFT JOIN sc ON documents.doc_id = sc.doc_id
         ORDER BY documents.doc_id""",

    // DSIR importance scoring: one token pass counts both models (target =
    // conditional sum), per-token ln-ratio staged in DECIMAL(18,8), exact
    // sum, one double division — the text_lm_score discipline twice over
    "text_dsir" ->
      s"""WITH d AS (
           SELECT doc_id, lang = 'en' AS tgt, string_split($normSql, ' ') AS toks
           FROM documents),
         tk AS (
           SELECT doc_id, tgt, tok
           FROM (SELECT doc_id, tgt, unnest(toks) AS tok FROM d) WHERE tok <> ''),
         c AS (
           SELECT tok, count(*) AS cr,
             sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
           FROM tk GROUP BY tok),
         st AS (
           SELECT CAST(sum(cr) AS BIGINT) AS tr, CAST(sum(ct) AS BIGINT) AS tt,
             count(*) AS v FROM c),
         sc AS (
           SELECT doc_id, count(*) AS n_tokens,
             round(CAST(CAST(sum(lr) AS DOUBLE) / count(*) AS DECIMAL(18,8)), 4)::DOUBLE
               AS dsir_score
           FROM (
             SELECT doc_id,
               CAST(ln((CAST(ct AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + v))
                  - ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + v))
                 AS DECIMAL(18,8)) AS lr
             FROM tk JOIN c USING (tok) CROSS JOIN st)
           GROUP BY doc_id)
         SELECT documents.doc_id, coalesce(n_tokens, 0) AS n_tokens,
           coalesce(dsir_score, 0.0) AS dsir_score,
           coalesce(dsir_score, 0.0) > 0.0 AS kept
         FROM documents LEFT JOIN sc ON documents.doc_id = sc.doc_id
         ORDER BY documents.doc_id""",

    // duplicated-span extraction: rolling 8-gram md5 digests, global
    // count>1 filter, per-document gaps-and-islands (pos - row_number)
    "dedup_spans" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         g AS (
           SELECT doc_id, CASE WHEN len(toks) >= 8
             THEN list_transform(range(0, len(toks)-7),
               i -> md5(array_to_string(toks[i+1:i+8], ' ')))
             ELSE CAST([] AS VARCHAR[]) END AS grams FROM norm),
         x AS (
           SELECT doc_id, generate_subscripts(grams, 1) - 1 AS pos,
             unnest(grams) AS gg FROM g),
         f AS (SELECT gg FROM x GROUP BY gg HAVING count(*) > 1),
         i AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM x SEMI JOIN f USING (gg))
         SELECT doc_id, min(pos) AS span_start,
           max(pos) - min(pos) + 8 AS span_tokens
         FROM i GROUP BY doc_id, grp ORDER BY doc_id, span_start""",

    // the cut applied: covered positions from the span set, anti-join on
    // (doc, pos), ordered list re-aggregation
    "dedup_spans_cut" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         g AS (
           SELECT doc_id, CASE WHEN len(toks) >= 8
             THEN list_transform(range(0, len(toks)-7),
               i -> md5(array_to_string(toks[i+1:i+8], ' ')))
             ELSE CAST([] AS VARCHAR[]) END AS grams FROM norm),
         x AS (
           SELECT doc_id, generate_subscripts(grams, 1) - 1 AS pos,
             unnest(grams) AS gg FROM g),
         f AS (SELECT gg FROM x GROUP BY gg HAVING count(*) > 1),
         i AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM x SEMI JOIN f USING (gg)),
         s AS (
           SELECT doc_id, min(pos) AS s0, max(pos) + 7 AS s1
           FROM i GROUP BY doc_id, grp),
         cov AS (
           SELECT DISTINCT doc_id, pos FROM (
             SELECT doc_id, unnest(range(s0, s1 + 1)) AS pos FROM s)),
         tk AS (
           SELECT doc_id, pos - 1 AS pos, tok FROM (
             SELECT doc_id, generate_subscripts(toks, 1) AS pos,
               unnest(toks) AS tok FROM norm)
           WHERE tok <> ''),
         kept AS (
           SELECT doc_id,
             array_to_string(array_agg(tok ORDER BY pos), ' ') AS clean_text,
             count(*) AS n_kept
           FROM tk ANTI JOIN cov USING (doc_id, pos)
           GROUP BY doc_id),
         tot AS (SELECT doc_id, count(*) AS nt FROM tk GROUP BY doc_id)
         SELECT d.doc_id, coalesce(clean_text, '') AS clean_text,
           CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(nt, 0) - coalesce(n_kept, 0) AS BIGINT) AS n_cut
         FROM documents d
         LEFT JOIN tot ON d.doc_id = tot.doc_id
         LEFT JOIN kept ON d.doc_id = kept.doc_id
         ORDER BY d.doc_id""",

    // TF-IDF keywords: df = (doc, token)-count rows per token, ranking by
    // the decimal-staged score then term, per-document window top-3
    "text_tfidf" ->
      s"""WITH d AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         tf AS (
           SELECT doc_id, tok, count(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
           WHERE tok <> '' GROUP BY doc_id, tok),
         dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
         sc AS (
           SELECT doc_id, tok, tf,
             CAST(CAST(tf AS DOUBLE)
               * ln((CAST(n AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0))
               AS DECIMAL(18,8)) AS sd
           FROM tf JOIN dft USING (tok) CROSS JOIN n)
         SELECT doc_id, tok AS term, tf, round(sd, 4)::DOUBLE AS tfidf, rank
         FROM (
           SELECT doc_id, tok, tf, sd,
             row_number() OVER (PARTITION BY doc_id ORDER BY sd DESC, tok ASC) AS rank
           FROM sc)
         WHERE rank <= 3 ORDER BY doc_id, rank""",

    // ROUGE-2 over the contamination pair set: clipped bigram counts,
    // P/R/F1 each ONE double division of exact longs (F1 = 2·clip/(|A|+|B|))
    "text_rouge" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         gg AS (
           SELECT doc_id, CASE WHEN len(toks) >= 4
             THEN list_transform(range(0, len(toks)-3),
               i -> array_to_string(toks[i+1:i+4], ' '))
             ELSE CAST([] AS VARCHAR[]) END AS grams FROM norm),
         h AS (
           SELECT doc_id, list_transform(grams,
             g2 -> ('0x'||substr(md5(g2),1,15))::BIGINT) AS hs FROM gg),
         w AS (
           SELECT doc_id, CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
             ELSE list_distinct(list_transform(range(0, greatest(len(hs)-4,0)+1),
               j -> list_min(hs[j+1:j+4]))) END AS fps FROM h),
         f AS (SELECT doc_id, unnest(fps) AS fp FROM w),
         bf AS (SELECT doc_id AS bench_id, fp FROM f WHERE doc_id % 10 = 0),
         bcap AS (
           SELECT bench_id, fp FROM (
             SELECT bench_id, fp, count(*) OVER (PARTITION BY fp) AS cnt FROM bf)
           WHERE cnt <= 100),
         tf2 AS (SELECT doc_id AS train_id, fp FROM f WHERE doc_id % 10 != 0),
         p AS (
           SELECT train_id, bench_id FROM (
             SELECT train_id, bench_id, count(*) AS shared
             FROM tf2 JOIN bcap USING (fp) GROUP BY 1, 2)
           WHERE shared >= 3),
         bg AS (
           SELECT doc_id, big, count(*) AS c FROM (
             SELECT doc_id, unnest(CASE WHEN len(lf) >= 2
               THEN list_transform(range(0, len(lf)-1),
                 i -> lf[i+1] || ' ' || lf[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS big
             FROM (SELECT doc_id,
                     list_filter(string_split($normSql, ' '), t -> len(t) > 0) AS lf
                   FROM documents))
           GROUP BY doc_id, big),
         cl AS (
           SELECT train_id, bench_id, sum(least(a.c, b.c)) AS clip
           FROM p
           JOIN bg a ON a.doc_id = p.train_id
           JOIN bg b ON b.doc_id = p.bench_id AND b.big = a.big
           GROUP BY train_id, bench_id),
         tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot FROM bg GROUP BY doc_id)
         SELECT train_id, bench_id,
           round(CAST(CASE WHEN coalesce(ta.tot, 0) = 0 THEN 0.0
             ELSE CAST(coalesce(clip, 0) AS DOUBLE) / CAST(ta.tot AS DOUBLE) END
             AS DECIMAL(18,8)), 4)::DOUBLE AS rouge2_p,
           round(CAST(CASE WHEN coalesce(tb.tot, 0) = 0 THEN 0.0
             ELSE CAST(coalesce(clip, 0) AS DOUBLE) / CAST(tb.tot AS DOUBLE) END
             AS DECIMAL(18,8)), 4)::DOUBLE AS rouge2_r,
           round(CAST(CASE WHEN coalesce(ta.tot, 0) + coalesce(tb.tot, 0) = 0 THEN 0.0
             ELSE CAST(2 * coalesce(clip, 0) AS DOUBLE)
               / CAST(coalesce(ta.tot, 0) + coalesce(tb.tot, 0) AS DOUBLE) END
             AS DECIMAL(18,8)), 4)::DOUBLE AS rouge2_f
         FROM p
         LEFT JOIN cl USING (train_id, bench_id)
         LEFT JOIN tot ta ON ta.doc_id = p.train_id
         LEFT JOIN tot tb ON tb.doc_id = p.bench_id
         ORDER BY train_id, bench_id"""
  )
}
