package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, IntegerType, TimestampType}

import graft.core.{Converters, DateSpan, Nm}
import graft.functions.{Dedup, Layout, Packing, Pii, Sampling, TextAnalysis, Vectors}
import graft.sources.Sources
import graft.tables._


/** Oracle-SQL support: the DuckDB-dialect CTE bodies and generators
  * referenced by the OracleSql* chunk maps, plus scd2UserDim (shared
  * by the SCD2 gate queries and their oracles).
  */
private[graft] object EntryOracleDefs {
  import EntryShared._
  /** SCD2 user dimension over the events table (shared by dim_scd2/scd_asof) */
  def scd2UserDim(s: SparkSession, dir: String): ScdDimension = {
    val ev = events(s, dir)
    val dim = new ScdDimension("user_scd", "user_key",
      Seq("user_id", "event_type", "version", "valid_from", "valid_to"),
      Seq("user_id"), "version", "valid_from", "valid_to",
      maxTo = lit(null).cast(TimestampType))
    dim.init(ev.select(lit(0L).as("user_key"), col("user_id"), col("event_type"),
      lit(1).as("version"), col("ts").as("valid_from"), col("ts").as("valid_to")).limit(0))
    dim
  }

  // =================================================================
  // oracle SQL (DuckDB)
  // =================================================================

  /** normalized-token SQL fragment shared by the text oracles */
  val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"

  /** HLL estimator constant alpha_256·256²·2^60 — computed by the IDENTICAL
    * Scala expression Stats.hllEstimate folds, then inlined into the oracle
    * as one literal (Double.toString round-trips, so both engines divide by
    * the same bit pattern instead of replaying operation order).
    */
  val hllC = 0.7213 / (1.0 + 1.079 / 256) * 256 * 256 * math.pow(2, 60)

  /** shared oracle fragment: the exact-Jaccard 3-shingle near-dup pair graph
    * (the minhashPairs replay the cluster oracles use), as the CTE chain
    * norm/sh/pairs/edges — interpolate inside a WITH [RECURSIVE] list.
    */
  /** winnowed-fingerprint contamination replay (shared by the batch query
    * and its streaming twin — the monitor's accreted matches equal the
    * batch solve because the benchmark index is fixed and train batches
    * partition the train set)
    */
  lazy val contaminationOracleSql: String =
    s"""WITH norm AS (
         SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
       g AS (
         SELECT doc_id, CASE WHEN len(toks) >= 4
           THEN list_transform(range(0, len(toks)-3),
             i -> array_to_string(toks[i+1:i+4], ' '))
           ELSE CAST([] AS VARCHAR[]) END AS grams FROM norm),
       h AS (
         SELECT doc_id, list_transform(grams,
           g2 -> ('0x'||substr(md5(g2),1,15))::BIGINT) AS hs FROM g),
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
       tf AS (SELECT doc_id AS train_id, fp FROM f WHERE doc_id % 10 != 0),
       p AS (
         SELECT train_id, bench_id, count(*) AS shared
         FROM tf JOIN bcap USING (fp) GROUP BY 1, 2)
       SELECT train_id, bench_id, shared FROM p WHERE shared >= 3
       ORDER BY train_id, bench_id"""

  /** BPE-training oracle: the 6 merge rounds unrolled (the k-means-oracle
    * unroll discipline) — each round re-derives the weighted pair counts
    * from the previous round's `||`-delimited symbol strings, takes the
    * (count desc, pair asc) argmax, and applies the identical non-regex
    * `replace` of `|a||b|` → `|ab|`.
    */
  /** shared CTE chain for the BPE oracles: word-type table `w`, char-split
    * `s0`, then per-round (pair-count `p_k`, argmax `b_k`, replace `s_k`).
    * `s<nMerges>` is the fully-encoded word-type table.
    */
  def bpeRoundsCtes(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { k =>
      s"""p$k AS (
           SELECT pr, CAST(sum(cnt) AS BIGINT) AS pc FROM (
             SELECT cnt, unnest(CASE WHEN len(l) < 2 THEN CAST([] AS VARCHAR[])
               ELSE list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1]) END) AS pr
             FROM (SELECT cnt, list_filter(string_split(s, '||'), x -> x <> '') AS l
                   FROM s${k - 1}))
           GROUP BY pr),
         b$k AS (
           SELECT $k AS step, split_part(pr, ' ', 1) AS a,
             split_part(pr, ' ', 2) AS b, pc
           FROM p$k ORDER BY pc DESC, pr LIMIT 1),
         s$k AS (
           SELECT cnt, replace(s, '|' || a || '||' || b || '|',
             '|' || a || b || '|') AS s
           FROM s${k - 1} CROSS JOIN b$k)"""
    }.mkString(",\n       ")
    s"""w AS (
         SELECT tok, count(*) AS cnt FROM (
           SELECT unnest(string_split($normSql, ' ')) AS tok FROM documents)
         WHERE tok <> '' GROUP BY tok),
       s0 AS (
         SELECT cnt, '||' || array_to_string(
           list_transform(range(1, length(tok) + 1), i -> substr(tok, i, 1)), '||')
           || '||' AS s FROM w),
       $rounds"""
  }

  def bpeTrainOracleSql(nMerges: Int): String = {
    val union = (1 to nMerges).map(k => s"SELECT * FROM b$k").mkString(" UNION ALL ")
    s"""WITH ${bpeRoundsCtes(nMerges)}
       SELECT step, a AS merge_left, b AS merge_right, a || b AS merged,
         pc AS pair_count
       FROM ($union) ORDER BY step"""
  }

  /** encode stage: replay the same merge rounds, then unnest the final
    * symbol strings — `s` is in bijection with the word type (symbols
    * concatenate back to the word), so count(DISTINCT s) = word types.
    */
  /** per-column completeness replay over the doctored documents frame —
    * shared by `stats_null_profile` and its streaming twin
    * `stream_null_profile` (counters are additive).
    */
  val nullProfileOracleSql =
    """WITH d AS (
         SELECT doc_id,
           CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
           CASE WHEN doc_id % 13 = 0 THEN '' ELSE text END AS text,
           source
         FROM documents),
       a AS (
         SELECT count(*) AS n,
           sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS nl_lang,
           sum(CASE WHEN lang = '' THEN 1 ELSE 0 END) AS em_lang,
           sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS nl_text,
           sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS em_text,
           sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS nl_source,
           sum(CASE WHEN source = '' THEN 1 ELSE 0 END) AS em_source
         FROM d),
       stacked AS (
         SELECT 'lang' AS col_name, n AS n_rows,
           CAST(coalesce(nl_lang, 0) AS BIGINT) AS n_null,
           CAST(coalesce(em_lang, 0) AS BIGINT) AS n_empty FROM a
         UNION ALL
         SELECT 'text', n, CAST(coalesce(nl_text, 0) AS BIGINT),
           CAST(coalesce(em_text, 0) AS BIGINT) FROM a
         UNION ALL
         SELECT 'source', n, CAST(coalesce(nl_source, 0) AS BIGINT),
           CAST(coalesce(em_source, 0) AS BIGINT) FROM a)
       SELECT col_name, n_rows, n_null, n_empty,
         round(CAST(CASE WHEN n_rows = 0 THEN 0.0
           ELSE n_null::DOUBLE / n_rows END AS DECIMAL(18,8)), 4)::DOUBLE
           AS null_frac
       FROM stacked ORDER BY col_name"""

  /** correlation replay (exact decimal moments, fixed-order double
    * formula) — shared by `stats_corr` and `stream_corr` (moments are
    * additive).
    */
  val corrOracleSql =
    """WITH a AS (
           SELECT count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(19,4))) AS s0,
             sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS q0,
             sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS s1,
             sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS q1,
             sum(CAST(l_discount AS DECIMAL(19,4))) AS s2,
             sum(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS q2,
             sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS p01,
             sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS p02,
             sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(19,4))) AS p12
           FROM lineitem),
         b AS (
           SELECT n, n::DOUBLE AS nd,
             s0::DOUBLE AS s0, q0::DOUBLE AS q0, s1::DOUBLE AS s1,
             q1::DOUBLE AS q1, s2::DOUBLE AS s2, q2::DOUBLE AS q2,
             p01::DOUBLE AS p01, p02::DOUBLE AS p02, p12::DOUBLE AS p12
           FROM a),
         c AS (
           SELECT n,
             nd * p01 - s0 * s1 AS n01, nd * p02 - s0 * s2 AS n02,
             nd * p12 - s1 * s2 AS n12,
             nd * q0 - s0 * s0 AS v0, nd * q1 - s1 * s1 AS v1,
             nd * q2 - s2 * s2 AS v2
           FROM b)
         SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
           round(CAST(CASE WHEN v0 <= 0.0 OR v1 <= 0.0 THEN 0.0
             ELSE n01 / (sqrt(v0) * sqrt(v1)) END AS DECIMAL(18,8)), 6)::DOUBLE AS corr
         FROM c
         UNION ALL
         SELECT 'l_quantity', 'l_discount', n,
           round(CAST(CASE WHEN v0 <= 0.0 OR v2 <= 0.0 THEN 0.0
             ELSE n02 / (sqrt(v0) * sqrt(v2)) END AS DECIMAL(18,8)), 6)::DOUBLE
         FROM c
         UNION ALL
         SELECT 'l_extendedprice', 'l_discount', n,
           round(CAST(CASE WHEN v1 <= 0.0 OR v2 <= 0.0 THEN 0.0
             ELSE n12 / (sqrt(v1) * sqrt(v2)) END AS DECIMAL(18,8)), 6)::DOUBLE
         FROM c
         ORDER BY col_a, col_b"""

  /** Welch t-test replay (exact decimal per-arm moments, fixed-order
    * double formula for t and the Welch–Satterthwaite dof) — shared by
    * `stats_welch` and `stream_welch` (moments are additive).
    */
  val welchOracleSql =
    """WITH a AS (
           SELECT count(*) AS n, sum(CAST(value AS DECIMAL(15,4))) AS s,
             sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(15,4))) AS q
           FROM events WHERE event_type = 'click'),
         b AS (
           SELECT count(*) AS n, sum(CAST(value AS DECIMAL(15,4))) AS s,
             sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(15,4))) AS q
           FROM events WHERE event_type = 'purchase'),
         m AS (
           SELECT a.n AS n_a, b.n AS n_b,
             a.s::DOUBLE / a.n::DOUBLE AS ma, b.s::DOUBLE / b.n::DOUBLE AS mb,
             ((a.q::DOUBLE - a.s::DOUBLE * a.s::DOUBLE / a.n::DOUBLE)
               / (a.n::DOUBLE - 1.0)) / a.n::DOUBLE AS va,
             ((b.q::DOUBLE - b.s::DOUBLE * b.s::DOUBLE / b.n::DOUBLE)
               / (b.n::DOUBLE - 1.0)) / b.n::DOUBLE AS vb
           FROM a CROSS JOIN b)
         SELECT n_a, n_b,
           round(CAST(ma AS DECIMAL(18,8)), 6)::DOUBLE AS mean_a,
           round(CAST(mb AS DECIMAL(18,8)), 6)::DOUBLE AS mean_b,
           round(CAST((ma - mb) / sqrt(va + vb) AS DECIMAL(18,8)), 6)::DOUBLE AS t,
           round(CAST((va + vb) * (va + vb)
               / (va * va / (n_a::DOUBLE - 1.0) + vb * vb / (n_b::DOUBLE - 1.0))
             AS DECIMAL(18,8)), 4)::DOUBLE AS df
         FROM m"""

  /** Cohen's d / Hedges' g replay (same exact per-arm moments as welch,
    * pooled variance, fixed-order d and g) — shared by `stats_cohend`
    * and `stream_cohend` (moments are additive).
    */
  val cohendOracleSql =
    """WITH a AS (
           SELECT count(*) AS n, sum(CAST(value AS DECIMAL(15,4))) AS s,
             sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(15,4))) AS q
           FROM events WHERE event_type = 'click'),
         b AS (
           SELECT count(*) AS n, sum(CAST(value AS DECIMAL(15,4))) AS s,
             sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(15,4))) AS q
           FROM events WHERE event_type = 'purchase'),
         m AS (
           SELECT a.n AS n_a, b.n AS n_b,
             a.s::DOUBLE / a.n::DOUBLE AS ma, b.s::DOUBLE / b.n::DOUBLE AS mb,
             ((a.q::DOUBLE - a.s::DOUBLE * a.s::DOUBLE / a.n::DOUBLE)
               + (b.q::DOUBLE - b.s::DOUBLE * b.s::DOUBLE / b.n::DOUBLE))
               / (a.n::DOUBLE + b.n::DOUBLE - 2.0) AS sp2,
             1.0 - 3.0 / (4.0 * (a.n::DOUBLE + b.n::DOUBLE) - 9.0) AS j
           FROM a CROSS JOIN b)
         SELECT n_a, n_b,
           round(CAST(ma AS DECIMAL(18,8)), 6)::DOUBLE AS mean_a,
           round(CAST(mb AS DECIMAL(18,8)), 6)::DOUBLE AS mean_b,
           CASE WHEN n_a + n_b <= 2 OR sp2 <= 0.0 THEN NULL
                ELSE round(CAST((ma - mb) / sqrt(sp2) AS DECIMAL(18,8)),
                  6)::DOUBLE END AS d,
           CASE WHEN n_a + n_b <= 2 OR sp2 <= 0.0 THEN NULL
                ELSE round(CAST((ma - mb) / sqrt(sp2) * j AS DECIMAL(18,8)),
                  6)::DOUBLE END AS g
         FROM m"""

  /** OLS trend replay (exact decimal regression moments, fixed-order
    * double formulas for slope/intercept/r²/t) — shared by `stats_trend`
    * and `stream_trend` (moments are additive).
    */
  val trendOracleSql =
    """WITH a AS (
           SELECT count(*) AS n,
             sum(CAST(datepart('day', ts) AS DECIMAL(15,4))) AS sx,
             sum(CAST(value AS DECIMAL(15,4))) AS sy,
             sum(CAST(datepart('day', ts) AS DECIMAL(15,4))
               * CAST(value AS DECIMAL(15,4))) AS sxy,
             sum(CAST(datepart('day', ts) AS DECIMAL(15,4))
               * CAST(datepart('day', ts) AS DECIMAL(15,4))) AS sxx,
             sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(15,4))) AS syy
           FROM events),
         m AS (
           SELECT n,
             n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cxy,
             n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS cxx,
             n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS cyy,
             sx::DOUBLE AS sxd, sy::DOUBLE AS syd
           FROM a),
         s AS (
           SELECT n, cxy, cxx, sxd, syd, cxy / cxx AS slope,
             CASE WHEN cxx <= 0.0 OR cyy <= 0.0 THEN 0.0
                  ELSE cxy * cxy / (cxx * cyy) END AS r2
           FROM m)
         SELECT n,
           round(CAST(slope AS DECIMAL(18,8)), 6)::DOUBLE AS slope,
           round(CAST((syd - slope * sxd) / n::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE
             AS intercept,
           round(CAST(r2 AS DECIMAL(18,8)), 6)::DOUBLE AS r2,
           CASE WHEN n <= 2 OR r2 >= 1.0 THEN NULL
                ELSE round(CAST(sign(cxy) * sqrt(r2 * (n::DOUBLE - 2.0) / (1.0 - r2))
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS t
         FROM s"""

  /** one-way ANOVA replay (exact decimal per-group moments, per-group
    * terms decimal-staged before the k-row sum, fixed-order F/eta²) —
    * shared by `stats_anova` and `stream_anova` (the moment table is
    * additive per group).
    */
  val anovaOracleSql =
    """WITH g AS (
           SELECT event_type, count(*) AS n, sum(CAST(value AS DECIMAL(15,4))) AS s,
             sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(15,4))) AS q
           FROM events GROUP BY 1),
         t AS (
           SELECT n, s,
             CAST(q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE
               AS DECIMAL(28,10)) AS w,
             CAST(s::DOUBLE * s::DOUBLE / n::DOUBLE AS DECIMAL(28,10)) AS b
           FROM g),
         a AS (
           SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn, sum(s) AS ss,
             sum(w) AS ssw, sum(b) AS bp
           FROM t),
         m AS (
           SELECT k, nn, ssw::DOUBLE AS ssw,
             bp::DOUBLE - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE AS ssb
           FROM a)
         SELECT k, nn AS n, k - 1 AS df1, nn - k AS df2,
           CASE WHEN k <= 1 OR nn <= k OR ssw <= 0.0 THEN NULL
                ELSE round(CAST(ssb / (k - 1)::DOUBLE / (ssw / (nn - k)::DOUBLE)
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS f,
           CASE WHEN ssb + ssw <= 0.0 THEN NULL
                ELSE round(CAST(ssb / (ssb + ssw) AS DECIMAL(18,8)), 6)::DOUBLE
                END AS eta2
         FROM m"""

  /** Bartlett replay (same per-group exact moments as anova; each group's
    * (n−1)·ln s² and 1/(n−1) terms decimal-staged before the k-row sums,
    * χ² and the Bartlett correction in fixed double order) — shared by
    * `stats_bartlett` and `stream_bartlett` (the group-moment state is
    * the additive AnovaMonitor state).
    */
  val bartlettOracleSql =
    """WITH g AS (
           SELECT event_type, count(*) AS n, sum(CAST(value AS DECIMAL(15,4))) AS s,
             sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(15,4))) AS q
           FROM events GROUP BY 1),
         t AS (
           SELECT n,
             CASE WHEN n < 2 OR (q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                    / (n - 1)::DOUBLE <= 0.0 THEN NULL
                  ELSE CAST((n - 1)::DOUBLE
                    * ln((q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                      / (n - 1)::DOUBLE) AS DECIMAL(28,10)) END AS lv,
             CAST(1.0 / (n - 1)::DOUBLE AS DECIMAL(28,10)) AS inv,
             CAST(q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE
               AS DECIMAL(28,10)) AS w
           FROM g),
         a AS (
           SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
             sum(lv) AS slv, sum(inv) AS sinv, sum(w) AS ssw,
             sum(CASE WHEN lv IS NULL THEN 1 ELSE 0 END) AS bad
           FROM t),
         m AS (
           SELECT k, nn, bad,
             ssw::DOUBLE / (nn::DOUBLE - k::DOUBLE) AS sp2,
             CASE WHEN k < 2 OR ssw::DOUBLE <= 0.0 THEN NULL
                  ELSE ((nn::DOUBLE - k::DOUBLE)
                      * ln(ssw::DOUBLE / (nn::DOUBLE - k::DOUBLE))
                      - slv::DOUBLE)
                    / (1.0 + (sinv::DOUBLE - 1.0 / (nn::DOUBLE - k::DOUBLE))
                      / (3.0 * (k::DOUBLE - 1.0))) END AS stat
           FROM a)
         SELECT k, nn AS n,
           CASE WHEN k < 2 OR bad > 0 OR sp2 <= 0.0 THEN NULL
                ELSE round(CAST(stat AS DECIMAL(18,8)), 6)::DOUBLE
           END AS chi2
         FROM m"""

  /** Tukey HSD replay (same per-group exact moments as anova, pooled MSW,
    * triangular pair join, fixed-order Tukey–Kramer q) — shared by
    * `stats_tukey` and `stream_tukey` (the group-moment state is the
    * additive AnovaMonitor state).
    */
  val tukeyOracleSql =
    """WITH g AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(value AS DECIMAL(15,4))) AS s,
             sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(15,4)))
               AS q
           FROM events GROUP BY 1),
         t AS (
           SELECT n,
             CAST(q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE
               AS DECIMAL(28,10)) AS w
           FROM g),
         a AS (
           SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn, sum(w) AS ssw
           FROM t),
         p AS (
           SELECT ga.event_type AS group_a, gb.event_type AS group_b,
             ga.n AS na, gb.n AS nb,
             ga.s::DOUBLE / ga.n::DOUBLE AS ma,
             gb.s::DOUBLE / gb.n::DOUBLE AS mb,
             k, nn, ssw::DOUBLE AS ssw
           FROM g ga JOIN g gb ON ga.event_type < gb.event_type
             CROSS JOIN a),
         f AS (
           SELECT group_a, group_b, na, nb, ma, mb, k, nn, ssw,
             ssw / (nn - k)::DOUBLE AS msw
           FROM p)
         SELECT group_a, group_b, na AS n_a, nb AS n_b,
           round(CAST(ma AS DECIMAL(18,8)), 6)::DOUBLE AS mean_a,
           round(CAST(mb AS DECIMAL(18,8)), 6)::DOUBLE AS mean_b,
           round(CAST(ma - mb AS DECIMAL(18,8)), 6)::DOUBLE AS diff,
           CASE WHEN nn <= k OR ssw <= 0.0 THEN NULL
                ELSE round(CAST(abs(ma - mb)
                  / sqrt(msw / 2.0 * (1.0 / na::DOUBLE + 1.0 / nb::DOUBLE))
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS q
         FROM f ORDER BY group_a, group_b"""

  /** Mann–Whitney replay (per-value counts, inclusive cumulative b-side,
    * exact-integer doubled U and Σ(t³−t) tie term, fixed-order z) —
    * shared by `stats_mwu` and `stream_mwu` (counts are additive).
    */
  val mwuOracleSql =
    """WITH u AS (
           SELECT value AS v, TRUE AS l FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT value, FALSE FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT v, CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(sum(CASE WHEN l THEN 0 ELSE 1 END) AS BIGINT) AS n
           FROM u GROUP BY 1),
         s AS (SELECT p, n, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cn FROM c),
         t AS (
           SELECT p, n,
             p::DECIMAL(38,0) * (2 * (cn - n) + n)::DECIMAL(38,0) AS u2,
             (p+n)::DECIMAL(38,0) * (p+n)::DECIMAL(38,0) * (p+n)::DECIMAL(38,0)
               - (p+n)::DECIMAL(38,0) AS t3
           FROM s),
         a AS (
           SELECT CAST(sum(p) AS BIGINT) AS n_a, CAST(sum(n) AS BIGINT) AS n_b,
             sum(u2) AS u2s, sum(t3) AS ts
           FROM t),
         m AS (
           SELECT n_a, n_b, u2s::DOUBLE AS u2d, ts::DOUBLE AS tsd,
             n_a::DOUBLE AS nad, n_b::DOUBLE AS nbd, (n_a + n_b)::DOUBLE AS nd
           FROM a)
         SELECT n_a, n_b,
           round(CAST(u2d / 2.0 AS DECIMAL(28,8)), 4)::DOUBLE AS u,
           CASE WHEN n_a = 0 OR n_b = 0
                  OR (nd + 1.0) - tsd / (nd * (nd - 1.0)) <= 0.0 THEN NULL
                ELSE round(CAST((u2d - nad * nbd)
                  / (2.0 * sqrt(nad * nbd / 12.0
                    * ((nd + 1.0) - tsd / (nd * (nd - 1.0)))))
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS z
         FROM m"""

  /** Brunner–Munzel replay (same per-value counts as mwu, BOTH inclusive
    * cumulatives, doubled combined midranks and per-arm D gaps as exact
    * integers, placement variances and the Welch–Satterthwaite df in
    * fixed double order) — shared by `stats_brunner_munzel` and
    * `stream_brunner_munzel` (the count state is the additive AucMonitor
    * state).
    */
  val brunnerMunzelOracleSql =
    """WITH u AS (
           SELECT value AS v, TRUE AS l FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT value, FALSE FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT v, CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(sum(CASE WHEN l THEN 0 ELSE 1 END) AS BIGINT) AS n
           FROM u GROUP BY 1),
         s AS (
           SELECT p, n,
             CAST(sum(p) OVER (ORDER BY v) AS BIGINT) AS cp,
             CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cn
           FROM c),
         t AS (
           SELECT p, n,
             (2 * (cp - p + cn - n) + p + n + 1)::DECIMAL(38,0) AS r2,
             (2 * (cn - n) + n)::DECIMAL(38,0) AS da,
             (2 * (cp - p) + p)::DECIMAL(38,0) AS db
           FROM s),
         a AS (
           SELECT CAST(sum(p) AS BIGINT) AS n_a, CAST(sum(n) AS BIGINT) AS n_b,
             sum(p::DECIMAL(38,0) * r2) AS ar2, sum(n::DECIMAL(38,0) * r2) AS br2,
             sum(p::DECIMAL(38,0) * da) AS ad1,
             sum(p::DECIMAL(38,0) * da * da) AS ad2,
             sum(n::DECIMAL(38,0) * db) AS bd1,
             sum(n::DECIMAL(38,0) * db * db) AS bd2
           FROM t),
         m AS (
           SELECT n_a, n_b, n_a::DOUBLE AS nad, n_b::DOUBLE AS nbd,
             ar2::DOUBLE AS ar2d, br2::DOUBLE AS br2d,
             (ad2::DOUBLE - ad1::DOUBLE * ad1::DOUBLE / n_a::DOUBLE)
               / (4.0 * (n_a::DOUBLE - 1.0)) AS sx,
             (bd2::DOUBLE - bd1::DOUBLE * bd1::DOUBLE / n_b::DOUBLE)
               / (4.0 * (n_b::DOUBLE - 1.0)) AS sy
           FROM a),
         f AS (
           SELECT n_a, n_b, nad, nbd, sx, sy,
             nad * sx + nbd * sy AS dv,
             br2d / nbd - ar2d / nad AS gap2,
             (br2d / nbd - (nbd + 1.0)) / 2.0 / nad AS ph
           FROM m)
         SELECT n_a, n_b,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE round(CAST(ph AS DECIMAL(18,8)), 6)::DOUBLE END AS p_hat,
           CASE WHEN n_a < 2 OR n_b < 2 OR dv <= 0.0 THEN NULL
                ELSE round(CAST(nad * nbd * (gap2 / 2.0)
                  / ((nad + nbd) * sqrt(dv)) AS DECIMAL(18,8)), 6)::DOUBLE
                END AS w,
           CASE WHEN n_a < 2 OR n_b < 2 OR dv <= 0.0 THEN NULL
                ELSE round(CAST(dv * dv
                  / ((nad * sx) * (nad * sx) / (nad - 1.0)
                    + (nbd * sy) * (nbd * sy) / (nbd - 1.0))
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS df
         FROM f"""

  /** Ansari–Bradley replay — same per-value counts, closed-form doubled
    * block score sums against the end-in ramp (three exact integer
    * terms), DECIMAL(28,10)-staged per-block fractions, tie-correct
    * generalized z in fixed double order. Shared by `stats_ansari` and
    * `stream_ansari` (the count state is the additive AucMonitor state).
    */
  val ansariOracleSql =
    """WITH u AS (
           SELECT value AS v, TRUE AS l FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT value, FALSE FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT v, CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(sum(CASE WHEN l THEN 0 ELSE 1 END) AS BIGINT) AS n
           FROM u GROUP BY 1),
         s AS (
           SELECT p, n,
             CAST(sum(p) OVER (ORDER BY v) AS BIGINT) AS cp,
             CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cn
           FROM c),
         tot AS (
           SELECT CAST(coalesce(sum(p), 0) AS BIGINT) AS n_a,
             CAST(coalesce(sum(n), 0) AS BIGINT) AS n_b
           FROM c),
         blk AS (
           SELECT p, n, (p + n)::DECIMAL(38,0) AS t,
             ((cp - p + cn - n) + 1)::DECIMAL(38,0) AS lo,
             ((cp - p + cn - n) + p + n)::DECIMAL(38,0) AS hi,
             (n_a + n_b)::DECIMAL(38,0) AS nn,
             CAST(floor((n_a + n_b + 1)::DOUBLE / 2.0) AS BIGINT)::DECIMAL(38,0) AS fh
           FROM s CROSS JOIN tot),
         s2t AS (
           SELECT p, n, t,
             (CASE WHEN lo <= least(hi, fh)
               THEN (lo + least(hi, fh)) * (least(hi, fh) - lo + 1)
               ELSE 0::DECIMAL(38,0) END
              + CASE WHEN greatest(lo, fh + 1) <= hi
               THEN 2 * (nn + 1) * (hi - greatest(lo, fh + 1) + 1)
                 - (greatest(lo, fh + 1) + hi) * (hi - greatest(lo, fh + 1) + 1)
               ELSE 0::DECIMAL(38,0) END) AS s2
           FROM blk),
         staged AS (
           SELECT
             CAST(CAST(p::DECIMAL(38,0) * s2 AS DOUBLE) / (2.0 * t::DOUBLE)
               AS DECIMAL(28,10)) AS abx,
             s2,
             CAST(CAST(s2 * s2 AS DOUBLE) / (4.0 * t::DOUBLE)
               AS DECIMAL(28,10)) AS sq
           FROM s2t),
         agg AS (
           SELECT sum(abx) AS ab, sum(s2) AS ss2, sum(sq) AS ssq FROM staged),
         m AS (
           SELECT n_a, n_b, ab::DOUBLE AS abd,
             n_a::DOUBLE AS nad, n_b::DOUBLE AS nbd,
             (n_a::DOUBLE + n_b::DOUBLE) AS nd,
             ss2::DOUBLE / 2.0 / (n_a::DOUBLE + n_b::DOUBLE) AS sbar,
             ssq::DOUBLE AS ssqd
           FROM agg CROSS JOIN tot)
         SELECT n_a, n_b,
           CASE WHEN n_a = 0 THEN NULL
                ELSE round(CAST(abd AS DECIMAL(18,8)), 6)::DOUBLE END AS ab,
           CASE WHEN n_a = 0 OR n_b = 0 OR n_a + n_b < 3
                  OR nad * nbd * (ssqd - nd * sbar * sbar) / (nd * (nd - 1.0)) <= 0.0
                THEN NULL
                ELSE round(CAST((abd - nad * sbar)
                  / sqrt(nad * nbd * (ssqd - nd * sbar * sbar) / (nd * (nd - 1.0)))
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS z
         FROM m"""

  /** Cliff's delta replay (same per-value counts and exact doubled U as
    * mwu, one divide, Romano band off the rounded |δ|) — shared by
    * `stats_cliffs` and `stream_cliffs` (the count state is the additive
    * AucMonitor state).
    */
  val cliffsOracleSql =
    """WITH u AS (
           SELECT value AS v, TRUE AS l FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT value, FALSE FROM events WHERE event_type = 'purchase'),
         c AS (
           SELECT v, CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(sum(CASE WHEN l THEN 0 ELSE 1 END) AS BIGINT) AS n
           FROM u GROUP BY 1),
         s AS (SELECT p, n, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cn FROM c),
         t AS (
           SELECT p, n,
             p::DECIMAL(38,0) * (2 * (cn - n) + n)::DECIMAL(38,0) AS u2
           FROM s),
         a AS (
           SELECT CAST(sum(p) AS BIGINT) AS n_a, CAST(sum(n) AS BIGINT) AS n_b,
             sum(u2) AS u2s
           FROM t),
         f AS (
           SELECT n_a, n_b,
             CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                  ELSE round(CAST(u2s::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE)
                    - 1.0 AS DECIMAL(18,8)), 6)::DOUBLE END AS delta
           FROM a)
         SELECT n_a, n_b, delta,
           CASE WHEN delta IS NULL THEN NULL
                WHEN abs(delta) < 0.147 THEN 'negligible'
                WHEN abs(delta) < 0.33 THEN 'small'
                WHEN abs(delta) < 0.474 THEN 'medium'
                ELSE 'large' END AS magnitude
         FROM f"""

  /** Kruskal–Wallis replay (per-(value,group) counts, inclusive
    * cumulative totals for doubled average ranks, exact-integer rank sums
    * and Σ(t³−t), per-group terms decimal-staged, fixed-order H with tie
    * correction) — shared by `stats_kruskal` and `stream_kruskal`.
    */
  val kruskalOracleSql =
    """WITH c AS (
           SELECT value AS v, event_type AS g, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         t AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY 1),
         s AS (SELECT v, t, CAST(sum(t) OVER (ORDER BY v) AS BIGINT) AS ct FROM t),
         r AS (SELECT v, (2 * (ct - t) + t + 1)::DECIMAL(38,0) AS r2 FROM s),
         g AS (
           SELECT c.g, CAST(sum(c.c) AS BIGINT) AS n,
             sum(c.c::DECIMAL(38,0) * r.r2) AS rr2
           FROM c JOIN r USING (v) GROUP BY 1),
         term AS (
           SELECT n, CAST((rr2::DOUBLE / 2.0) * (rr2::DOUBLE / 2.0) / n::DOUBLE
             AS DECIMAL(28,10)) AS tm
           FROM g),
         tot AS (
           SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn, sum(tm) AS st
           FROM term),
         tie AS (
           SELECT sum(t::DECIMAL(38,0) * t::DECIMAL(38,0) * t::DECIMAL(38,0)
             - t::DECIMAL(38,0)) AS ts
           FROM t),
         m AS (
           SELECT k, nn,
             12.0 / (nn::DOUBLE * (nn::DOUBLE + 1.0)) * st::DOUBLE
               - 3.0 * (nn::DOUBLE + 1.0) AS h,
             1.0 - ts::DOUBLE
               / (nn::DOUBLE * nn::DOUBLE * nn::DOUBLE - nn::DOUBLE) AS corr
           FROM tot CROSS JOIN tie)
         SELECT k, nn AS n,
           CASE WHEN k <= 1 OR corr <= 0.0 THEN NULL
                ELSE round(CAST(h / corr AS DECIMAL(18,8)), 6)::DOUBLE END AS h
         FROM m"""

  /** exact-quantile replay (per-value counts, inclusive cumulative,
    * conditional-min order statistics, quantile_cont interpolation in
    * fixed double order) — shared by `stats_quantile_exact` and
    * `stream_quantile_exact` (the count state is the summed additive
    * KruskalMonitor state).
    */
  /** Mood's median test replay — exact interpolated grand median (the
    * quantile contract at q = 0.5), per-type above/not-above split, 2×k
    * χ² with exact-integer E staging and DECIMAL(28,10) term sums.
    * Shared by `stats_mood_median` and `stream_mood_median` (the count
    * table is the additive KruskalMonitor state).
    */
  val moodOracleSql =
    """WITH gv AS (
           SELECT value AS v, event_type AS g, CAST(count(*) AS BIGINT) AS c
           FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1, 2),
         vt AS (SELECT v, CAST(sum(c) AS BIGINT) AS c FROM gv GROUP BY 1),
         s AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cm
               FROM vt),
         t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vt),
         j AS (SELECT n, (n::DOUBLE - 1.0) * 0.5 AS pos FROM t),
         mm AS (
           SELECT n, CAST(floor(pos) AS BIGINT) + 1 AS lo,
             pos - floor(pos) AS frac
           FROM j),
         r AS (
           SELECT mm.frac,
             min(CASE WHEN s.cm >= mm.lo THEN s.v END)::DOUBLE AS xlo,
             min(CASE WHEN s.cm >= least(mm.lo + 1, mm.n) THEN s.v
               END)::DOUBLE AS xhi
           FROM mm CROSS JOIN s GROUP BY 1),
         med AS (
           SELECT round(CAST(xlo + (xhi - xlo) * frac AS DECIMAL(18,8)),
             6)::DOUBLE AS m
           FROM r),
         gp AS (
           SELECT g,
             CAST(sum(CASE WHEN v > m THEN c ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN v <= m THEN c ELSE 0 END) AS BIGINT) AS b,
             min(m) AS m
           FROM gv CROSS JOIN med GROUP BY 1),
         tot AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
           FROM gp),
         terms AS (
           SELECT k, ta, tb, gp.m,
             CAST((
               (a::DOUBLE - ((a + b)::DECIMAL(38,0) * ta)::DOUBLE
                 / (ta + tb)::DOUBLE)
               * (a::DOUBLE - ((a + b)::DECIMAL(38,0) * ta)::DOUBLE
                 / (ta + tb)::DOUBLE)
               / (((a + b)::DECIMAL(38,0) * ta)::DOUBLE / (ta + tb)::DOUBLE)
               + (b::DOUBLE - ((a + b)::DECIMAL(38,0) * tb)::DOUBLE
                 / (ta + tb)::DOUBLE)
               * (b::DOUBLE - ((a + b)::DECIMAL(38,0) * tb)::DOUBLE
                 / (ta + tb)::DOUBLE)
               / (((a + b)::DECIMAL(38,0) * tb)::DOUBLE / (ta + tb)::DOUBLE)
             ) AS DECIMAL(28,10)) AS term
           FROM gp CROSS JOIN tot),
         agg AS (
           SELECT min(k) AS k, min(ta + tb) AS n, min(ta) AS ta,
             min(tb) AS tb, min(m) AS gm, sum(term) AS chi
           FROM terms)
         SELECT n, k,
           round(CAST(gm AS DECIMAL(18,8)), 6)::DOUBLE AS grand_median,
           CASE WHEN k < 2 OR ta = 0 OR tb = 0 THEN NULL
                ELSE round(CAST(chi AS DECIMAL(18,8)), 6)::DOUBLE END AS chi2
         FROM agg"""

  val quantileExactOracleSql =
    """WITH c AS (
           SELECT value AS v, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
         s AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cm
               FROM c),
         t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
         qs AS (SELECT unnest([0.01, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q),
         j AS (SELECT q, n, (n::DOUBLE - 1.0) * q AS pos
               FROM qs CROSS JOIN t),
         m AS (
           SELECT q, n, CAST(floor(pos) AS BIGINT) + 1 AS lo,
             pos - floor(pos) AS frac
           FROM j),
         r AS (
           SELECT m.q, m.n, m.frac,
             min(CASE WHEN s.cm >= m.lo THEN s.v END)::DOUBLE AS xlo,
             min(CASE WHEN s.cm >= least(m.lo + 1, m.n) THEN s.v
               END)::DOUBLE AS xhi
           FROM m CROSS JOIN s GROUP BY 1, 2, 3)
         SELECT q, n,
           round(CAST(xlo + (xhi - xlo) * frac AS DECIMAL(18,8)),
             6)::DOUBLE AS value
         FROM r ORDER BY q"""

  /** trimmed-mean replay: per-value counts, prefix scan, interval-clamp
    * kept weights, decimal-staged value x weight products — shared by
    * `stats_trimmed` and `stream_trimmed` (per-value counts are
    * additive).
    */
  val trimmedOracleSql =
    """WITH c AS (
         SELECT value AS v, CAST(count(*) AS BIGINT) AS c
         FROM events GROUP BY 1),
       s AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cm
             FROM c),
       t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
       g AS (SELECT n, CAST(floor(n::DOUBLE * 0.1) AS BIGINT) AS g FROM t),
       k AS (
         SELECT n, g,
           greatest(least(cm, n - g) - greatest(cm - c, g), 0) AS kept,
           v, c
         FROM s CROSS JOIN g),
       a AS (
         SELECT n, g,
           sum(CAST(v::DOUBLE * kept::DOUBLE AS DECIMAL(28,10))) AS sv,
           CAST(sum(kept) AS BIGINT) AS ks,
           sum(CAST(v::DOUBLE * c::DOUBLE AS DECIMAL(28,10))) AS av
         FROM k GROUP BY n, g)
       SELECT n, g AS cut, ks AS kept,
         round(CAST(av::DOUBLE / n::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE
           AS mean,
         CASE WHEN ks <= 0 THEN NULL
           ELSE round(CAST(sv::DOUBLE / ks::DOUBLE AS DECIMAL(18,8)),
             6)::DOUBLE END AS trimmed_mean
       FROM a"""

  /** quartile-shape replay: the quantile-oracle machinery at (.25, .5,
    * .75), pivoted, ratios over the rounded quartiles — shared by
    * `stats_shape` and `stream_shape` (counts are additive).
    */
  val shapeOracleSql =
    """WITH c AS (
         SELECT value AS v, CAST(count(*) AS BIGINT) AS c
         FROM events GROUP BY 1),
       s AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cm
             FROM c),
       t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
       qs AS (SELECT unnest([0.25, 0.5, 0.75]) AS q),
       j AS (SELECT q, n, (n::DOUBLE - 1.0) * q AS pos
             FROM qs CROSS JOIN t),
       m AS (
         SELECT q, n, CAST(floor(pos) AS BIGINT) + 1 AS lo,
           pos - floor(pos) AS frac
         FROM j),
       r AS (
         SELECT m.q, m.n, m.frac,
           min(CASE WHEN s.cm >= m.lo THEN s.v END)::DOUBLE AS xlo,
           min(CASE WHEN s.cm >= least(m.lo + 1, m.n) THEN s.v
             END)::DOUBLE AS xhi
         FROM m CROSS JOIN s GROUP BY 1, 2, 3),
       v AS (
         SELECT q, n,
           round(CAST(xlo + (xhi - xlo) * frac AS DECIMAL(18,8)),
             6)::DOUBLE AS value
         FROM r),
       p AS (
         SELECT max(n) AS n,
           max(CASE WHEN q = 0.25 THEN value END) AS q1,
           max(CASE WHEN q = 0.5 THEN value END) AS q2,
           max(CASE WHEN q = 0.75 THEN value END) AS q3
         FROM v)
       SELECT CAST(n AS BIGINT) AS n, q1, q2 AS median, q3,
         round(CAST(q3 - q1 AS DECIMAL(18,8)), 6)::DOUBLE AS iqr,
         CASE WHEN q3 - q1 = 0.0 THEN NULL
           ELSE round(CAST((q3 + q1 - 2.0 * q2) / (q3 - q1)
             AS DECIMAL(18,8)), 6)::DOUBLE END AS bowley,
         CASE WHEN q3 + q1 = 0.0 THEN NULL
           ELSE round(CAST((q3 - q1) / (q3 + q1)
             AS DECIMAL(18,8)), 6)::DOUBLE END AS qcd
       FROM p"""

  /** MAD replay: two interpolated medians over bounded count tables (the
    * quantile-oracle machinery twice, the second over |v - med| counts)
    * — shared by `stats_mad` and `stream_mad` (counts are additive).
    */
  val madOracleSql =
    """WITH c AS (
         SELECT value AS v, CAST(count(*) AS BIGINT) AS c
         FROM events GROUP BY 1),
       s AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cm
             FROM c),
       t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
       j AS (SELECT n, (n::DOUBLE - 1.0) * 0.5 AS pos FROM t),
       m AS (SELECT n, CAST(floor(pos) AS BIGINT) + 1 AS lo,
               pos - floor(pos) AS frac FROM j),
       r1 AS (
         SELECT m.n, m.frac,
           min(CASE WHEN s.cm >= m.lo THEN s.v END)::DOUBLE AS xlo,
           min(CASE WHEN s.cm >= least(m.lo + 1, m.n) THEN s.v
             END)::DOUBLE AS xhi
         FROM m CROSS JOIN s GROUP BY 1, 2),
       med AS (SELECT n, xlo + (xhi - xlo) * frac AS med FROM r1),
       d AS (
         SELECT abs(c.v::DOUBLE - med.med) AS v, CAST(sum(c.c) AS BIGINT) AS c
         FROM c CROSS JOIN med GROUP BY 1),
       ds AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cm
              FROM d),
       r2 AS (
         SELECT m.n, m.frac,
           min(CASE WHEN ds.cm >= m.lo THEN ds.v END)::DOUBLE AS xlo,
           min(CASE WHEN ds.cm >= least(m.lo + 1, m.n) THEN ds.v
             END)::DOUBLE AS xhi
         FROM m CROSS JOIN ds GROUP BY 1, 2),
       mad AS (SELECT n, xlo + (xhi - xlo) * frac AS mad FROM r2)
       SELECT mad.n,
         round(CAST(med AS DECIMAL(18,8)), 6)::DOUBLE AS median,
         round(CAST(mad AS DECIMAL(18,8)), 6)::DOUBLE AS mad,
         round(CAST(mad * 1.4826022185056018 AS DECIMAL(18,8)), 6)::DOUBLE
           AS mad_normal
       FROM mad CROSS JOIN med"""

  /** Jarque–Bera replay (exact DECIMAL(8,2)-staged power sums, fixed
    * double-order central moments, closed-form χ²(2) p) — shared by
    * `stats_jarque_bera` and `stream_jarque_bera` (sums are additive).
    */
  val jarqueBeraOracleSql =
    """WITH mo AS (
           SELECT count("value") AS n,
             sum(CAST("value" AS DECIMAL(8,2))) AS s1,
             sum(CAST("value" AS DECIMAL(8,2))
               * CAST("value" AS DECIMAL(8,2))) AS s2,
             -- the square re-staged to DECIMAL(19,4) puts the 3rd/4th-power
             -- products in DuckDB's hugeint lane (int64 raws overflow);
             -- lossless, so the sums stay exact and equal Spark's decimals
             sum(CAST(CAST("value" AS DECIMAL(8,2))
                 * CAST("value" AS DECIMAL(8,2)) AS DECIMAL(19,4))
               * CAST("value" AS DECIMAL(8,2))) AS s3,
             sum(CAST(CAST("value" AS DECIMAL(8,2))
                 * CAST("value" AS DECIMAL(8,2)) AS DECIMAL(19,4))
               * CAST(CAST("value" AS DECIMAL(8,2))
                 * CAST("value" AS DECIMAL(8,2)) AS DECIMAL(19,4))) AS s4
           FROM events),
         e AS (
           SELECT n, s1::DOUBLE / n::DOUBLE AS m, s2::DOUBLE / n::DOUBLE AS e2,
             s3::DOUBLE / n::DOUBLE AS e3, s4::DOUBLE / n::DOUBLE AS e4
           FROM mo),
         c AS (
           SELECT n, m, e2 - m * m AS m2,
             e3 - 3.0 * m * e2 + 2.0 * m * m * m AS m3,
             e4 - 4.0 * m * e3 + 6.0 * m * m * e2 - 3.0 * m * m * m * m AS m4
           FROM e),
         st AS (
           SELECT n, m, m2, m3 / (m2 * sqrt(m2)) AS skew,
             m4 / (m2 * m2) - 3.0 AS kurt
           FROM c),
         f AS (
           SELECT n, m, m2, skew, kurt,
             n::DOUBLE / 6.0 * (skew * skew + kurt * kurt / 4.0) AS jb
           FROM st)
         SELECT n, round(CAST(m AS DECIMAL(18,8)), 6)::DOUBLE AS mean,
           CASE WHEN m2 <= 0.0 THEN NULL
             ELSE round(CAST(sqrt(m2) AS DECIMAL(18,8)), 6)::DOUBLE END AS sd,
           CASE WHEN n < 2 OR m2 <= 0.0 THEN NULL
             ELSE round(CAST(skew AS DECIMAL(18,8)), 6)::DOUBLE END AS skewness,
           CASE WHEN n < 2 OR m2 <= 0.0 THEN NULL
             ELSE round(CAST(kurt AS DECIMAL(18,8)), 6)::DOUBLE END AS kurtosis,
           CASE WHEN n < 2 OR m2 <= 0.0 THEN NULL
             ELSE round(CAST(jb AS DECIMAL(18,8)), 6)::DOUBLE END AS jb,
           CASE WHEN n < 2 OR m2 <= 0.0 THEN NULL
             ELSE round(CAST(exp(-jb / 2.0) AS DECIMAL(18,8)), 6)::DOUBLE
             END AS p
         FROM f"""

  /** D'Agostino K² replay (same exact moment row, Johnson Su z for
    * skewness, Anscombe–Glynn cube-root z for kurtosis, χ²(2) p) —
    * shared by `stats_dagostino` and `stream_dagostino` (the state is
    * additive). Every arithmetic stage mirrors the Column tree
    * operation-for-operation so the engines agree at 6dp.
    */
  val dagostinoOracleSql =
    """WITH mo AS (
           SELECT count("value") AS n,
             sum(CAST("value" AS DECIMAL(8,2))) AS s1,
             sum(CAST("value" AS DECIMAL(8,2))
               * CAST("value" AS DECIMAL(8,2))) AS s2,
             sum(CAST(CAST("value" AS DECIMAL(8,2))
                 * CAST("value" AS DECIMAL(8,2)) AS DECIMAL(19,4))
               * CAST("value" AS DECIMAL(8,2))) AS s3,
             sum(CAST(CAST("value" AS DECIMAL(8,2))
                 * CAST("value" AS DECIMAL(8,2)) AS DECIMAL(19,4))
               * CAST(CAST("value" AS DECIMAL(8,2))
                 * CAST("value" AS DECIMAL(8,2)) AS DECIMAL(19,4))) AS s4
           FROM events),
         e AS (
           SELECT n, n::DOUBLE AS nd, s1::DOUBLE / n::DOUBLE AS m,
             s2::DOUBLE / n::DOUBLE AS e2,
             s3::DOUBLE / n::DOUBLE AS e3, s4::DOUBLE / n::DOUBLE AS e4
           FROM mo),
         c AS (
           SELECT n, nd, m, e2 - m * m AS m2,
             e3 - 3.0 * m * e2 + 2.0 * m * m * m AS m3,
             e4 - 4.0 * m * e3 + 6.0 * m * m * e2 - 3.0 * m * m * m * m AS m4
           FROM e),
         st AS (
           SELECT n, nd, m2, m3 / (m2 * sqrt(m2)) AS g1,
             m4 / (m2 * m2) AS b2
           FROM c),
         sk AS (
           SELECT *,
             g1 * sqrt((nd + 1.0) * (nd + 3.0) / (6.0 * (nd - 2.0))) AS y,
             -1.0 + sqrt(2.0 * (3.0 * (nd * nd + 27.0 * nd - 70.0)
               * (nd + 1.0) * (nd + 3.0)
               / ((nd - 2.0) * (nd + 5.0) * (nd + 7.0) * (nd + 9.0))
               - 1.0)) AS w2
           FROM st),
         k1 AS (
           SELECT *, y / sqrt(2.0 / (w2 - 1.0)) AS ya,
             1.0 / sqrt(ln(sqrt(w2))) AS dl
           FROM sk),
         k2s AS (
           SELECT *, dl * ln(ya + sqrt(ya * ya + 1.0)) AS z_skew FROM k1),
         ku AS (
           SELECT *,
             (b2 - 3.0 * (nd - 1.0) / (nd + 1.0)) /
               sqrt(24.0 * nd * (nd - 2.0) * (nd - 3.0) /
                 ((nd + 1.0) * (nd + 1.0) * (nd + 3.0) * (nd + 5.0))) AS xk,
             6.0 * (nd * nd - 5.0 * nd + 2.0) / ((nd + 7.0) * (nd + 9.0)) *
               sqrt(6.0 * (nd + 3.0) * (nd + 5.0)
                 / (nd * (nd - 2.0) * (nd - 3.0))) AS sb1
           FROM k2s),
         aa AS (
           SELECT *,
             6.0 + 8.0 / sb1 * (2.0 / sb1 + sqrt(1.0 + 4.0 / (sb1 * sb1)))
               AS a
           FROM ku),
         zz AS (
           SELECT *, ((1.0 - 2.0 / (9.0 * a)) -
               cbrt((1.0 - 2.0 / a) /
                 (1.0 + xk * sqrt(2.0 / (a - 4.0))))) /
               sqrt(2.0 / (9.0 * a)) AS z_kurt
           FROM aa),
         fin AS (
           SELECT *, z_skew * z_skew + z_kurt * z_kurt AS k2 FROM zz)
         SELECT n,
           CASE WHEN n < 9 OR m2 <= 0.0 THEN NULL
             ELSE round(CAST(g1 AS DECIMAL(18,8)), 6)::DOUBLE END AS skewness,
           CASE WHEN n < 9 OR m2 <= 0.0 THEN NULL
             ELSE round(CAST(b2 - 3.0 AS DECIMAL(18,8)), 6)::DOUBLE
             END AS kurtosis,
           CASE WHEN n < 9 OR m2 <= 0.0 THEN NULL
             ELSE round(CAST(z_skew AS DECIMAL(18,8)), 6)::DOUBLE END AS z_skew,
           CASE WHEN n < 9 OR m2 <= 0.0 THEN NULL
             ELSE round(CAST(z_kurt AS DECIMAL(18,8)), 6)::DOUBLE END AS z_kurt,
           CASE WHEN n < 9 OR m2 <= 0.0 THEN NULL
             ELSE round(CAST(k2 AS DECIMAL(18,8)), 6)::DOUBLE END AS k2,
           CASE WHEN n < 9 OR m2 <= 0.0 THEN NULL
             ELSE round(CAST(exp(-k2 / 2.0) AS DECIMAL(18,8)), 6)::DOUBLE
             END AS p
         FROM fin"""

  /** Grubbs replay (same exact moment row incl. min/max, sample sd,
    * studentized max distance, 'low' wins ties) — shared by
    * `stats_grubbs` and `stream_grubbs` (the state is additive).
    */
  val grubbsOracleSql =
    """WITH mo AS (
           SELECT count("value") AS n,
             sum(CAST("value" AS DECIMAL(8,2))) AS s1,
             sum(CAST("value" AS DECIMAL(8,2))
               * CAST("value" AS DECIMAL(8,2))) AS s2,
             min(CAST("value" AS DECIMAL(8,2))) AS lo,
             max(CAST("value" AS DECIMAL(8,2))) AS hi
           FROM events),
         d AS (
           SELECT n, s1::DOUBLE / n::DOUBLE AS m,
             sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE)
               / (n::DOUBLE - 1.0)) AS s,
             lo::DOUBLE AS lo, hi::DOUBLE AS hi
           FROM mo),
         g AS (
           SELECT n, m, s, (m - lo) / s AS gl, (hi - m) / s AS gh
           FROM d)
         SELECT n, round(CAST(m AS DECIMAL(18,8)), 6)::DOUBLE AS mean,
           CASE WHEN n < 3 OR s IS NULL OR s <= 0.0 THEN NULL
             ELSE round(CAST(s AS DECIMAL(18,8)), 6)::DOUBLE END AS sd,
           CASE WHEN n < 3 OR s IS NULL OR s <= 0.0 THEN NULL
             ELSE round(CAST(greatest(gl, gh) AS DECIMAL(18,8)), 6)::DOUBLE
             END AS g,
           CASE WHEN n < 3 OR s IS NULL OR s <= 0.0 THEN NULL
             WHEN gl >= gh THEN 'low' ELSE 'high' END AS side
         FROM g"""

  /** Brown–Forsythe replay (same (value,group) counts as kruskal,
    * per-group conditional-min order-stat medians off a partitioned
    * cumulative, decimal-staged |x−med| moments, then the exact anova F
    * stage) — shared by `stats_levene` and `stream_levene` (the count
    * state is the additive KruskalMonitor state).
    */
  val leveneOracleSql =
    """WITH c AS (
           SELECT value AS v, event_type AS g, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         cum AS (
           SELECT g, v, c,
             CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cm
           FROM c),
         ng AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
         med AS (
           SELECT cum.g,
             (min(CASE WHEN cm >= (n + 1) // 2 THEN v END)::DOUBLE
              + min(CASE WHEN cm >= n // 2 + 1 THEN v END)::DOUBLE) / 2.0
               AS med
           FROM cum JOIN ng ON cum.g = ng.g GROUP BY cum.g),
         z AS (
           SELECT c.g, c.c, abs(c.v::DOUBLE - med.med) AS z
           FROM c JOIN med ON c.g = med.g),
         gm AS (
           SELECT g, CAST(sum(c) AS BIGINT) AS gn,
             sum(CAST(c::DOUBLE * z AS DECIMAL(28,10))) AS gs,
             sum(CAST(c::DOUBLE * z * z AS DECIMAL(28,10))) AS gq
           FROM z GROUP BY 1),
         t AS (
           SELECT gn, gs,
             CAST(gq::DOUBLE - gs::DOUBLE * gs::DOUBLE / gn::DOUBLE
               AS DECIMAL(28,10)) AS w,
             CAST(gs::DOUBLE * gs::DOUBLE / gn::DOUBLE AS DECIMAL(28,10)) AS b
           FROM gm),
         a AS (
           SELECT count(*) AS k, CAST(sum(gn) AS BIGINT) AS nn, sum(gs) AS ss,
             sum(w) AS ssw, sum(b) AS bp
           FROM t),
         m AS (
           SELECT k, nn, ssw::DOUBLE AS ssw,
             bp::DOUBLE - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE AS ssb
           FROM a)
         SELECT k, nn AS n, k - 1 AS df1, nn - k AS df2,
           CASE WHEN k <= 1 OR nn <= k OR ssw <= 0.0 THEN NULL
                ELSE round(CAST(ssb / (k - 1)::DOUBLE / (ssw / (nn - k)::DOUBLE)
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS f,
           CASE WHEN ssb + ssw <= 0.0 THEN NULL
                ELSE round(CAST(ssb / (ssb + ssw) AS DECIMAL(18,8)), 6)::DOUBLE
                END AS eta2
         FROM m"""

  /** two-proportion replay (exact per-arm counts, fixed-order pooled-SE
    * z) — shared by `stats_twoprop` and `stream_twoprop` (counts are
    * additive).
    */
  val twopropOracleSql =
    """WITH a AS (
           SELECT count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
           FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15'),
         b AS (
           SELECT count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
           FROM events WHERE CAST(ts AS DATE) > DATE '2024-01-15'),
         m AS (
           SELECT a.n AS n_a, b.n AS n_b,
             a.x::DOUBLE / a.n::DOUBLE AS pa, b.x::DOUBLE / b.n::DOUBLE AS pb,
             (a.x + b.x)::DOUBLE / (a.n + b.n)::DOUBLE AS pp,
             a.n::DOUBLE AS nad, b.n::DOUBLE AS nbd
           FROM a CROSS JOIN b)
         SELECT n_a, n_b,
           round(CAST(pa AS DECIMAL(18,8)), 6)::DOUBLE AS p_a,
           round(CAST(pb AS DECIMAL(18,8)), 6)::DOUBLE AS p_b,
           CASE WHEN n_a = 0 OR n_b = 0 OR pp <= 0.0 OR pp >= 1.0 THEN NULL
                ELSE round(CAST((pa - pb)
                  / sqrt(pp * (1.0 - pp) * (1.0 / nad + 1.0 / nbd))
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS z
         FROM m"""

  /** relative-risk / odds-ratio replay: the twoprop oracle's exact per-arm
    * count pairs, Katz and Woolf log intervals in fixed double order
    * (ln/exp over identical IEEE doubles), every cell-zero case NULL —
    * shared by `stats_riskratio` and `stream_riskratio`.
    */
  val rrOracleSql =
    """WITH a AS (
           SELECT count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
           FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15'),
         b AS (
           SELECT count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
           FROM events WHERE CAST(ts AS DATE) > DATE '2024-01-15'),
         m AS (
           SELECT a.n AS na, b.n AS nb, a.x AS xa, b.x AS xb,
             a.n::DOUBLE AS nad, b.n::DOUBLE AS nbd,
             a.x::DOUBLE AS xad, b.x::DOUBLE AS xbd,
             (a.n - a.x)::DOUBLE AS qad, (b.n - b.x)::DOUBLE AS qbd
           FROM a CROSS JOIN b),
         f AS (
           SELECT na, nb, xa, xb, nad, nbd, xad, xbd,
             na = 0 OR nb = 0 OR xa = 0 OR xb = 0 AS rrbad,
             na = 0 OR nb = 0 OR xa = 0 OR xb = 0
               OR xa = na OR xb = nb AS orbad,
             (xad / nad) / (xbd / nbd) AS rr,
             sqrt(1.0 / xad - 1.0 / nad + 1.0 / xbd - 1.0 / nbd) AS serr,
             (xad * qbd) / (xbd * qad) AS orr,
             sqrt(1.0 / xad + 1.0 / qad + 1.0 / xbd + 1.0 / qbd) AS seor
           FROM m)
         SELECT na AS n_a, nb AS n_b,
           round(CAST(xad / nad AS DECIMAL(18,8)), 6)::DOUBLE AS p_a,
           round(CAST(xbd / nbd AS DECIMAL(18,8)), 6)::DOUBLE AS p_b,
           CASE WHEN rrbad THEN NULL
                ELSE round(CAST(rr AS DECIMAL(18,8)), 6)::DOUBLE END AS rr,
           CASE WHEN rrbad THEN NULL
                ELSE round(CAST(exp(ln(rr) - 1.959964 * serr)
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS rr_lo,
           CASE WHEN rrbad THEN NULL
                ELSE round(CAST(exp(ln(rr) + 1.959964 * serr)
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS rr_hi,
           CASE WHEN orbad THEN NULL
                ELSE round(CAST(orr AS DECIMAL(18,8)), 6)::DOUBLE
           END AS odds_ratio,
           CASE WHEN orbad THEN NULL
                ELSE round(CAST(exp(ln(orr) - 1.959964 * seor)
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS or_lo,
           CASE WHEN orbad THEN NULL
                ELSE round(CAST(exp(ln(orr) + 1.959964 * seor)
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS or_hi
         FROM f"""

  /** Spearman replay (joint counts, marginal doubled ranks off inclusive
    * cumulatives, exact-integer rank moments, fixed-order
    * Pearson-on-ranks) — shared by `stats_spearman` and `stream_spearman`
    * (the joint count table is additive).
    */
  val spearmanOracleSql =
    """WITH j AS (
           SELECT l_quantity AS x, l_extendedprice AS y,
             CAST(count(*) AS BIGINT) AS c
           FROM lineitem GROUP BY 1, 2),
         tx AS (SELECT x, CAST(sum(c) AS BIGINT) AS t FROM j GROUP BY 1),
         rx AS (
           SELECT x, (2 * (CAST(sum(t) OVER (ORDER BY x) AS BIGINT) - t)
             + t + 1)::DECIMAL(38,0) AS rx2
           FROM tx),
         ty AS (SELECT y, CAST(sum(c) AS BIGINT) AS t FROM j GROUP BY 1),
         ry AS (
           SELECT y, (2 * (CAST(sum(t) OVER (ORDER BY y) AS BIGINT) - t)
             + t + 1)::DECIMAL(38,0) AS ry2
           FROM ty),
         m AS (
           SELECT CAST(sum(c) AS BIGINT) AS n,
             sum(c::DECIMAL(38,0) * rx2) AS sx, sum(c::DECIMAL(38,0) * ry2) AS sy,
             sum(c::DECIMAL(38,0) * rx2 * rx2) AS sxx,
             sum(c::DECIMAL(38,0) * ry2 * ry2) AS syy,
             sum(c::DECIMAL(38,0) * rx2 * ry2) AS sxy
           FROM j JOIN rx USING (x) JOIN ry USING (y)),
         f AS (
           SELECT n,
             n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
             n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS va,
             n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS vb
           FROM m)
         SELECT n,
           round(CAST(CASE WHEN va <= 0.0 OR vb <= 0.0 THEN 0.0
             ELSE num / (sqrt(va) * sqrt(vb)) END AS DECIMAL(18,8)), 6)::DOUBLE
             AS rho
         FROM f"""

  /** Kendall tau-b replay (bounded joint counts, triangular cell-pair
    * join for concordant/discordant mass, exact-integer tie terms,
    * scipy's tie-corrected variance in fixed double order) — shared by
    * `stats_kendall` and `stream_kendall` (the joint count table is the
    * SAME additive SpearmanMonitor state).
    */
  val kendallOracleSql =
    """WITH j AS (
           SELECT l_quantity AS x, floor(l_extendedprice / 5000) AS y,
             CAST(count(*) AS BIGINT) AS c
           FROM lineitem GROUP BY 1, 2),
         cd AS (
           SELECT
             coalesce(sum(CASE WHEN a.y < b.y
               THEN a.c::DECIMAL(38,0) * b.c::DECIMAL(38,0)
               ELSE 0::DECIMAL(38,0) END), 0::DECIMAL(38,0)) AS conc,
             coalesce(sum(CASE WHEN a.y > b.y
               THEN a.c::DECIMAL(38,0) * b.c::DECIMAL(38,0)
               ELSE 0::DECIMAL(38,0) END), 0::DECIMAL(38,0)) AS disc
           FROM j a JOIN j b ON a.x < b.x),
         tx AS (SELECT x, CAST(sum(c) AS BIGINT) AS t FROM j GROUP BY 1),
         ttx AS (
           SELECT sum(t::DECIMAL(38,0) * (t - 1)) AS tt_x,
             sum(t::DECIMAL(38,0) * (t - 1) * (2 * t + 5)) AS tv_x,
             sum(t::DECIMAL(38,0) * (t - 1) * (t - 2)) AS t3_x
           FROM tx),
         ty AS (SELECT y, CAST(sum(c) AS BIGINT) AS t FROM j GROUP BY 1),
         tty AS (
           SELECT sum(t::DECIMAL(38,0) * (t - 1)) AS tt_y,
             sum(t::DECIMAL(38,0) * (t - 1) * (2 * t + 5)) AS tv_y,
             sum(t::DECIMAL(38,0) * (t - 1) * (t - 2)) AS t3_y
           FROM ty),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
         m AS (
           SELECT n, conc, disc, tt_x, tv_x, t3_x, tt_y, tv_y, t3_y,
             n::DECIMAL(38,0) * (n - 1) AS two_n0,
             (conc::DOUBLE - disc::DOUBLE) AS s,
             CAST(n::DECIMAL(38,0) * (n - 1) * (2 * n + 5) AS DOUBLE) AS v0,
             n::DOUBLE AS nd
           FROM cd CROSS JOIN ttx CROSS JOIN tty CROSS JOIN tot),
         f AS (
           SELECT n, conc, disc, two_n0, tt_x, tt_y, s,
             (two_n0 - tt_x) * (two_n0 - tt_y) AS denom2,
             (v0 - tv_x::DOUBLE - tv_y::DOUBLE) / 18.0
               + (tt_x::DOUBLE * tt_y::DOUBLE) / (2.0 * nd * (nd - 1.0))
               + (t3_x::DOUBLE * t3_y::DOUBLE)
                 / (9.0 * nd * (nd - 1.0) * (nd - 2.0)) AS var_s
           FROM m)
         SELECT n, conc::BIGINT AS conc, disc::BIGINT AS disc,
           round(CAST(CASE WHEN n < 2 OR denom2 <= 0 THEN 0.0
             ELSE 2.0 * s / sqrt(denom2::DOUBLE) END AS DECIMAL(18,8)),
             6)::DOUBLE AS tau,
           CASE WHEN n < 3 OR var_s <= 0.0 THEN NULL
                ELSE round(CAST(s / sqrt(var_s) AS DECIMAL(18,8)),
                  6)::DOUBLE END AS z
         FROM f"""

  /** Jonckheere–Terpstra replay — identical machinery to
    * [[kendallOracleSql]] with x = event_type (groups in natural order),
    * y = value: J = (P + S)/2 off the exact-integer pair masses, z = the
    * tau-b tie-corrected z. Shared by `stats_jonckheere` and
    * `stream_jonckheere` (the count table is the SAME additive
    * KruskalMonitor state).
    */
  val jonckheereOracleSql =
    """WITH j AS (
           SELECT event_type AS x, value AS y, CAST(count(*) AS BIGINT) AS c
           FROM events
           WHERE event_type IS NOT NULL AND value IS NOT NULL
           GROUP BY 1, 2),
         cd AS (
           SELECT
             coalesce(sum(CASE WHEN a.y < b.y
               THEN a.c::DECIMAL(38,0) * b.c::DECIMAL(38,0)
               ELSE 0::DECIMAL(38,0) END), 0::DECIMAL(38,0)) AS conc,
             coalesce(sum(CASE WHEN a.y > b.y
               THEN a.c::DECIMAL(38,0) * b.c::DECIMAL(38,0)
               ELSE 0::DECIMAL(38,0) END), 0::DECIMAL(38,0)) AS disc
           FROM j a JOIN j b ON a.x < b.x),
         tx AS (SELECT x, CAST(sum(c) AS BIGINT) AS t FROM j GROUP BY 1),
         ttx AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             sum(t::DECIMAL(38,0) * (t - 1)) AS tt_x,
             sum(t::DECIMAL(38,0) * (t - 1) * (2 * t + 5)) AS tv_x,
             sum(t::DECIMAL(38,0) * (t - 1) * (t - 2)) AS t3_x
           FROM tx),
         ty AS (SELECT y, CAST(sum(c) AS BIGINT) AS t FROM j GROUP BY 1),
         tty AS (
           SELECT sum(t::DECIMAL(38,0) * (t - 1)) AS tt_y,
             sum(t::DECIMAL(38,0) * (t - 1) * (2 * t + 5)) AS tv_y,
             sum(t::DECIMAL(38,0) * (t - 1) * (t - 2)) AS t3_y
           FROM ty),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
         m AS (
           SELECT n, k, conc, disc, tt_x, tv_x, t3_x, tt_y, tv_y, t3_y,
             CAST(n::DECIMAL(38,0) * (n - 1) - tt_x AS DOUBLE) AS p2,
             (conc - disc)::DOUBLE AS s,
             CAST(n::DECIMAL(38,0) * (n - 1) * (2 * n + 5) AS DOUBLE) AS v0,
             n::DOUBLE AS nd
           FROM cd CROSS JOIN ttx CROSS JOIN tty CROSS JOIN tot),
         f AS (
           SELECT n, k, p2, s,
             (v0 - tv_x::DOUBLE - tv_y::DOUBLE) / 18.0
               + (tt_x::DOUBLE * tt_y::DOUBLE) / (2.0 * nd * (nd - 1.0))
               + (t3_x::DOUBLE * t3_y::DOUBLE)
                 / (9.0 * nd * (nd - 1.0) * (nd - 2.0)) AS var_s
           FROM m)
         SELECT n, k,
           round(CAST((p2 / 2.0 + s) / 2.0 AS DECIMAL(18,8)), 6)::DOUBLE AS j,
           CASE WHEN n < 3 OR var_s <= 0.0 THEN NULL
                ELSE round(CAST(s / sqrt(var_s) AS DECIMAL(18,8)),
                  6)::DOUBLE END AS z
         FROM f"""

  /** Cramér's V replay (joint counts, full r×c contingency via margins
    * cross join so absent cells contribute E, exact-integer E staging,
    * decimal-staged (O−E)²/E terms, fixed-order V) — shared by
    * `stats_cramers` and `stream_cramers` (joint counts are additive).
    * Engine weekday encodings differ (Spark 1-7, DuckDB 0-6) but V only
    * sees the PARTITION, never the labels.
    */
  val cramersOracleSql =
    """WITH j AS (
           SELECT event_type AS x, EXTRACT(dow FROM ts) AS y,
             CAST(count(*) AS BIGINT) AS cxy
           FROM events GROUP BY 1, 2),
         mx AS (SELECT x, CAST(sum(cxy) AS BIGINT) AS cx FROM j GROUP BY 1),
         my AS (SELECT y, CAST(sum(cxy) AS BIGINT) AS cy FROM j GROUP BY 1),
         tot AS (
           SELECT CAST(sum(cxy) AS BIGINT) AS n, count(DISTINCT x) AS r,
             count(DISTINCT y) AS c
           FROM j),
         cells AS (
           SELECT n, r, c, coalesce(cxy, 0) AS o,
             CAST(cx::DECIMAL(38,0) * cy::DECIMAL(38,0) AS DOUBLE)
               / n::DOUBLE AS e
           FROM mx CROSS JOIN my LEFT JOIN j USING (x, y) CROSS JOIN tot),
         t AS (
           SELECT n, r, c,
             CAST((o::DOUBLE - e) * (o::DOUBLE - e) / e AS DECIMAL(28,10)) AS trm
           FROM cells),
         a AS (SELECT n, r, c, sum(trm) AS chi2 FROM t GROUP BY 1, 2, 3)
         SELECT n, r, c,
           round(CAST(chi2 AS DECIMAL(18,8)), 6)::DOUBLE AS chi2,
           CASE WHEN least(r, c) <= 1 OR n = 0 THEN NULL
                ELSE round(CAST(sqrt(chi2::DOUBLE
                  / (n::DOUBLE * (least(r, c) - 1)::DOUBLE))
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS v
         FROM a"""

  /** Gumbel-top-k replay (quality chain, md5 uniform, -ln(-ln(u))
    * keys) — shared by `sample_gumbel` and `stream_gumbel`.
    */
  val gumbelOracleSql =
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
           FROM norm),
         q AS (
           SELECT doc_id,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                   ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE AS score
           FROM c),
         g AS (
           SELECT doc_id, score,
             round(CAST(4.0 * score + -ln(-ln(
               ((('0x'||substr(md5(doc_id::VARCHAR || 'g-v1'),1,15))::BIGINT + 1)::DOUBLE)
                 / 1152921504606846976.0))
               AS DECIMAL(18,8)), 6)::DOUBLE AS gumbel_key
           FROM q)
         SELECT doc_id, score, gumbel_key FROM g
         ORDER BY gumbel_key DESC, doc_id LIMIT 50"""

  /** Benford replay — shared by `stats_benford` and `stream_benford`
    * (digit counts are additive).
    */
  val benfordOracleSql =
    """WITH v AS (
           SELECT CAST(floor(value) AS BIGINT) AS n FROM events
           WHERE floor(value) >= 1),
         d AS (
           SELECT CAST(substr(n::VARCHAR, 1, 1) AS INT) AS digit,
             count(*) AS n
           FROM v GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM d),
         g AS (SELECT unnest(generate_series(1, 9)) AS digit),
         b AS (
           SELECT g.digit, CAST(coalesce(d.n, 0) AS BIGINT) AS n,
             round(CAST(coalesce(d.n, 0)::DOUBLE / tot AS DECIMAL(18,8)), 6)::DOUBLE
               AS obs_frac,
             round(CAST(ln(1.0 + 1.0 / g.digit) / ln(10.0) AS DECIMAL(18,8)), 6)::DOUBLE
               AS exp_frac
           FROM g LEFT JOIN d ON g.digit = d.digit CROSS JOIN t)
         SELECT digit, n, obs_frac, exp_frac,
           round(CAST(obs_frac - exp_frac AS DECIMAL(18,8)), 6)::DOUBLE AS dev
         FROM b ORDER BY digit"""

  /** linkage replay (normalization, (nation, prefix) block, levenshtein
    * similarity) — shared by `link_customers` and `stream_link`.
    */
  val linkOracleSql =
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
         FROM customer WHERE c_custkey % 4 = 0),
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
           AND l.c_nationkey = r.in_nation)
       SELECT c_custkey, in_id, name_sim FROM j WHERE name_sim >= 0.9
       ORDER BY c_custkey, in_id"""

  /** CUSUM replay: daily counts, the events_anomaly mean/std chain,
    * decimal-staged deviations, two ordered windows for the prefix
    * identity — shared by `events_cusum` and its streaming twin
    * `stream_cusum` (daily counts are additive).
    */
  val cusumOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       st AS (
         SELECT event_type, count(*) AS dd, CAST(sum(n) AS BIGINT) AS s,
           sum(n::DECIMAL(15,0) * n::DECIMAL(15,0)) AS s2
         FROM d GROUP BY 1),
       ms AS (
         SELECT event_type, s::DOUBLE / dd AS mean,
           sqrt(greatest(s2::DOUBLE / dd
             - (s::DOUBLE / dd) * (s::DOUBLE / dd), 0.0)) AS std
         FROM st),
       x AS (
         SELECT d.event_type, d.day, d.n,
           CAST((CASE WHEN std = 0.0 THEN 0.0
             ELSE (d.n - mean) / std END) - 0.5 AS DECIMAL(18,8)) AS x
         FROM d JOIN ms USING (event_type)),
       p AS (
         SELECT *, sum(x) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
         FROM x),
       sres AS (
         SELECT event_type, day, n,
           p - least(CAST(0 AS DECIMAL(18,8)),
             min(p) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
         FROM p)
       SELECT event_type, day, n,
         round(CAST(s AS DECIMAL(18,8)), 4)::DOUBLE AS cusum,
         round(CAST(s AS DECIMAL(18,8)), 4)::DOUBLE > 3.0 AS alarm
       FROM sres ORDER BY event_type, day"""

  /** Page–Hinkley replay: daily counts, exact-integer prefix mean,
    * decimal-staged deviations, prefix sum then prefix min — shared by
    * `events_page_hinkley` and its streaming twin `stream_page_hinkley`
    * (daily counts are additive).
    */
  val pageHinkleyOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       x AS (
         SELECT event_type, day, n,
           CAST(n - CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(count(*) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             - 0.5 AS DECIMAL(18,8)) AS x
         FROM d),
       p AS (
         SELECT *, sum(x) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
         FROM x),
       s AS (
         SELECT event_type, day, n,
           m - min(m) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
         FROM p)
       SELECT event_type, day, n,
         round(CAST(ph AS DECIMAL(18,8)), 4)::DOUBLE AS ph,
         round(CAST(ph AS DECIMAL(18,8)), 4)::DOUBLE > 20.0 AS alarm
       FROM s ORDER BY event_type, day"""

  /** runs-test replay: daily counts, partitioned-rank median (low/high
    * middle positions via conditional max), keyed lag for run starts,
    * exact-integer z — shared by `events_runs` and its streaming twin
    * `stream_runs` (daily counts are additive).
    */
  val runsOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       rk AS (
         SELECT event_type, day, n,
           row_number() OVER (PARTITION BY event_type ORDER BY n, day)
             AS rn,
           count(*) OVER (PARTITION BY event_type) AS dd
         FROM d),
       med AS (
         SELECT event_type,
           (max(CASE WHEN rn = CAST(floor((dd::DOUBLE + 1.0) / 2.0)
                  AS BIGINT) THEN n END)
            + max(CASE WHEN rn = CAST(floor(dd::DOUBLE / 2.0) AS BIGINT) + 1
                  THEN n END))::DOUBLE / 2.0 AS med
         FROM rk GROUP BY 1),
       sg AS (
         SELECT d.event_type, d.day, d.n > med AS sgn,
           lag(d.n > med, 1) OVER (PARTITION BY d.event_type
             ORDER BY d.day) AS prev
         FROM d JOIN med ON d.event_type = med.event_type
         WHERE d.n::DOUBLE <> med),
       a AS (
         SELECT event_type,
           CAST(sum(CASE WHEN sgn THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
           CAST(sum(CASE WHEN sgn THEN 0 ELSE 1 END) AS BIGINT) AS n_minus,
           CAST(sum(CASE WHEN prev IS NULL OR prev <> sgn THEN 1 ELSE 0 END)
             AS BIGINT) AS runs
         FROM sg GROUP BY 1),
       f AS (
         SELECT *,
           CAST(CAST(2 AS DECIMAL(38,0)) * n_plus * n_minus AS DOUBLE)
             AS tab,
           (n_plus + n_minus)::DOUBLE AS nt
         FROM a)
       SELECT event_type, n_plus, n_minus, runs,
         CASE WHEN n_plus = 0 OR n_minus = 0
                OR tab * (tab - n_plus::DOUBLE - n_minus::DOUBLE)
                  / (nt * nt * (nt - 1.0)) <= 0.0 THEN NULL
           ELSE round(CAST(
             (runs::DOUBLE - (tab / nt + 1.0))
             / sqrt(tab * (tab - n_plus::DOUBLE - n_minus::DOUBLE)
               / (nt * nt * (nt - 1.0)))
             AS DECIMAL(18,8)), 6)::DOUBLE END AS z
       FROM f ORDER BY event_type"""

  /** p-chart replay: per-day (n, purchases), broadcast center, per-day
    * clamped limits, alarm on the UNROUNDED share — shared by
    * `events_pchart` and its streaming twin `stream_pchart` (daily
    * counts are additive).
    */
  val pchartOracleSql =
    """WITH d AS (
         SELECT CAST(ts AS DATE) AS day, count(*) AS n,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS x
         FROM events GROUP BY 1),
       t AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
               CAST(sum(x) AS BIGINT) AS tx FROM d),
       f AS (
         SELECT day, n, x,
           x::DOUBLE / n::DOUBLE AS phat,
           tx::DOUBLE / tn::DOUBLE AS center,
           3.0 * sqrt(tx::DOUBLE / tn::DOUBLE
             * (1.0 - tx::DOUBLE / tn::DOUBLE) / n::DOUBLE) AS spread
         FROM d CROSS JOIN t)
       SELECT day, n, x,
         round(CAST(phat AS DECIMAL(18,8)), 6)::DOUBLE AS p_hat,
         round(CAST(center AS DECIMAL(18,8)), 6)::DOUBLE AS center,
         round(CAST(greatest(center - spread, 0.0) AS DECIMAL(18,8)),
           6)::DOUBLE AS lcl,
         round(CAST(least(center + spread, 1.0) AS DECIMAL(18,8)),
           6)::DOUBLE AS ucl,
         (phat < greatest(center - spread, 0.0)
           OR phat > least(center + spread, 1.0)) AS alarm
       FROM f ORDER BY day"""

  /** mix-evenness replay: daily type counts, per-term decimal-staged
    * −p·ln(p), one divide by ln(k) — shared by `events_mix_evenness` and
    * its streaming twin `stream_mix_evenness` (daily counts are
    * additive).
    */
  val evennessOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       t AS (SELECT day, CAST(sum(n) AS BIGINT) AS nn, count(*) AS k
             FROM d GROUP BY 1),
       terms AS (
         SELECT d.day, t.k, t.nn,
           CAST(-(d.n::DOUBLE / t.nn::DOUBLE
             * ln(d.n::DOUBLE / t.nn::DOUBLE)) AS DECIMAL(28,10)) AS term
         FROM d JOIN t ON d.day = t.day),
       a AS (SELECT day, k, nn, sum(term) AS h FROM terms GROUP BY 1, 2, 3)
       SELECT day, k, nn AS n,
         round(CAST(h::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE AS entropy,
         CASE WHEN k < 2 THEN NULL
           ELSE round(CAST(h::DOUBLE / ln(k::DOUBLE) AS DECIMAL(18,8)),
             6)::DOUBLE END AS evenness
       FROM a ORDER BY day"""

  /** SPRT replay: the live window's exact (n, x) pair, in-engine log
    * ratios, Wald boundaries, decision on the UNROUNDED llr — shared by
    * `stats_sprt` and its streaming twin `stream_sprt` (the count pair
    * is additive).
    */
  val sprtOracleSql =
    """WITH b AS (
         SELECT count(*) AS n,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS x
         FROM events WHERE CAST(ts AS DATE) > DATE '2024-01-15'),
       f AS (
         SELECT n, x,
           x::DOUBLE * ln(0.22::DOUBLE / 0.18::DOUBLE)
             + (n::DOUBLE - x::DOUBLE)
               * ln((1.0::DOUBLE - 0.22::DOUBLE)
                 / (1.0::DOUBLE - 0.18::DOUBLE)) AS llr,
           ln((1.0::DOUBLE - 0.2::DOUBLE) / 0.05::DOUBLE) AS upper,
           ln(0.2::DOUBLE / (1.0::DOUBLE - 0.05::DOUBLE)) AS lower
         FROM b)
       SELECT n, x,
         round(CAST(llr AS DECIMAL(18,8)), 6)::DOUBLE AS llr,
         round(CAST(upper AS DECIMAL(18,8)), 6)::DOUBLE AS upper,
         round(CAST(lower AS DECIMAL(18,8)), 6)::DOUBLE AS lower,
         CASE WHEN llr >= upper THEN 'accept_h1'
              WHEN llr <= lower THEN 'accept_h0'
              ELSE 'continue' END AS decision
       FROM f"""

  /** Kaplan–Meier replay (per-user day spans, churn = last activity more
    * than censorDays before corpus end, inclusive cumulative exits for
    * at-risk counts, decimal-staged ln factors summed exactly then exp'd,
    * extinction flag instead of ln(0)) — shared by `events_survival` and
    * `stream_survival` (spans merge by min/max).
    */
  val survivalOracleSql =
    """WITH spans AS (
         SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
         FROM events GROUP BY 1),
       e AS (SELECT max(l) AS endd FROM spans),
       lt AS (
         SELECT datediff('day', f, l) AS t,
           CAST(sum(CASE WHEN datediff('day', l, endd) > 7 THEN 1 ELSE 0 END)
             AS BIGINT) AS d,
           CAST(sum(CASE WHEN datediff('day', l, endd) > 7 THEN 0 ELSE 1 END)
             AS BIGINT) AS c
         FROM spans CROSS JOIN e GROUP BY 1),
       tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM lt),
       cum AS (
         SELECT t, d, c,
           n - (CAST(sum(d + c) OVER (ORDER BY t) AS BIGINT) - (d + c)) AS nrisk
         FROM lt CROSS JOIN tot),
       staged AS (
         SELECT t, d, c, nrisk,
           CASE WHEN d = 0 OR d = nrisk THEN CAST(0.0 AS DECIMAL(28,12))
                ELSE CAST(ln(1.0 - d::DOUBLE / nrisk::DOUBLE)
                  AS DECIMAL(28,12)) END AS lnf,
           CASE WHEN d = nrisk THEN 1 ELSE 0 END AS dead
         FROM cum),
       walked AS (
         SELECT t, nrisk, d, c,
           sum(lnf) OVER (ORDER BY t) AS cln,
           CAST(sum(dead) OVER (ORDER BY t) AS BIGINT) AS cdead
         FROM staged)
       SELECT t AS t_days, nrisk AS n_risk, d, c,
         CASE WHEN cdead > 0 THEN 0.0
              ELSE round(CAST(exp(cln::DOUBLE) AS DECIMAL(18,8)), 6)::DOUBLE
              END AS survival
       FROM walked ORDER BY t_days"""

  /** survival-summary replay: the KM-curve chain, then conditional mins
    * against the rounded survival column — shared by
    * `events_survival_summary` and its streaming twin (spans merge by
    * min/max).
    */
  val survivalSummaryOracleSql =
    """WITH spans AS (
         SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
         FROM events GROUP BY 1),
       e AS (SELECT max(l) AS endd FROM spans),
       lt AS (
         SELECT datediff('day', f, l) AS t,
           CAST(sum(CASE WHEN datediff('day', l, endd) > 7 THEN 1 ELSE 0 END)
             AS BIGINT) AS d,
           CAST(sum(CASE WHEN datediff('day', l, endd) > 7 THEN 0 ELSE 1 END)
             AS BIGINT) AS c
         FROM spans CROSS JOIN e GROUP BY 1),
       tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM lt),
       cum AS (
         SELECT t, d, c,
           n - (CAST(sum(d + c) OVER (ORDER BY t) AS BIGINT) - (d + c)) AS nrisk
         FROM lt CROSS JOIN tot),
       staged AS (
         SELECT t, d, c, nrisk,
           CASE WHEN d = 0 OR d = nrisk THEN CAST(0.0 AS DECIMAL(28,12))
                ELSE CAST(ln(1.0 - d::DOUBLE / nrisk::DOUBLE)
                  AS DECIMAL(28,12)) END AS lnf,
           CASE WHEN d = nrisk THEN 1 ELSE 0 END AS dead
         FROM cum),
       walked AS (
         SELECT t, d, c,
           sum(lnf) OVER (ORDER BY t) AS cln,
           CAST(sum(dead) OVER (ORDER BY t) AS BIGINT) AS cdead
         FROM staged),
       curve AS (
         SELECT t, d, c,
           CASE WHEN cdead > 0 THEN 0.0
                ELSE round(CAST(exp(cln::DOUBLE) AS DECIMAL(18,8)),
                  6)::DOUBLE END AS survival
         FROM walked)
       SELECT CAST(sum(d + c) AS BIGINT) AS n_users,
         CAST(min(CASE WHEN survival <= 0.75 THEN t END) AS BIGINT) AS t25,
         CAST(min(CASE WHEN survival <= 0.5 THEN t END) AS BIGINT)
           AS median_t,
         CAST(min(CASE WHEN survival <= 0.25 THEN t END) AS BIGINT) AS t75
       FROM curve"""


  /** Simpson concentration replay: per-user counts, exact HUGEINT pair
    * mass, fixed-order lambda/diversity/effective divides — shared by
    * `stats_simpson` and `stream_simpson` (counts are additive).
    */
  val simpsonOracleSql =
    """WITH c AS (
         SELECT user_id::VARCHAR AS key, count(*) AS cnt
         FROM events GROUP BY 1),
       a AS (
         SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n,
           sum(cnt::HUGEINT * (cnt - 1)::HUGEINT) AS p2
         FROM c)
       SELECT n_keys, n,
         CASE WHEN n < 2 THEN NULL
              ELSE round(CAST(p2::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0))
                AS DECIMAL(18,8)), 6)::DOUBLE END AS simpson,
         CASE WHEN n < 2 THEN NULL
              ELSE round(CAST(1.0 - p2::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0))
                AS DECIMAL(18,8)), 6)::DOUBLE END AS diversity,
         CASE WHEN n < 2 OR p2 = 0 THEN NULL
              ELSE round(CAST(1.0 / (p2::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0)))
                AS DECIMAL(18,8)), 6)::DOUBLE END AS effective_keys
       FROM a"""

  /** Cohen's h replay: the prop-count CTEs, arcsine formula on the
    * 6dp-rounded p's, magnitude bands on the rounded |h| — shared by
    * `stats_cohenh` and `stream_cohenh`.
    */
  val cohenhOracleSql =
    """WITH a AS (
         SELECT count(*) AS n,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS x
         FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15'),
       b AS (
         SELECT count(*) AS n,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS x
         FROM events WHERE CAST(ts AS DATE) > DATE '2024-01-15'),
       m AS (
         SELECT a.n AS n_a, b.n AS n_b,
           round(CAST(a.x::DOUBLE / a.n::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE AS p_a,
           round(CAST(b.x::DOUBLE / b.n::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE AS p_b
         FROM a CROSS JOIN b),
       hh AS (
         SELECT n_a, n_b, p_a, p_b,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE round(CAST(2.0 * asin(sqrt(p_a)) - 2.0 * asin(sqrt(p_b))
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS h
         FROM m)
       SELECT n_a, n_b, p_a, p_b, h,
         CASE WHEN h IS NULL THEN NULL
              WHEN abs(h) < 0.2 THEN 'negligible'
              WHEN abs(h) < 0.5 THEN 'small'
              WHEN abs(h) < 0.8 THEN 'medium'
              ELSE 'large' END AS magnitude
       FROM hh"""

  /** Cronbach replay: the covOracleSql exact-decimal moment row, item and
    * total variances as the IDENTICAL left-associative chains the Scala
    * expression folds, the k/(k-1) constant embedded as the same double —
    * shared by `stats_cronbach` and `stream_cronbach`.
    */
  def cronbachOracleSql(dims: Seq[Int]): String = {
    val pairs = for (a <- dims; b <- dims if a <= b) yield (a, b)
    val sumCols = dims.map(d =>
      s"sum(CAST(embedding[${d + 1}]::DOUBLE AS DECIMAL(30,10))) AS s$d").mkString(",\n           ")
    val pairCols = pairs.map { case (a, b) =>
      s"sum(CAST(embedding[${a + 1}]::DOUBLE * embedding[${b + 1}]::DOUBLE AS DECIMAL(30,10))) AS p${a}_$b"
    }.mkString(",\n           ")
    def cv(a: Int, b: Int) =
      s"(p${a}_$b::DOUBLE / n - (s$a::DOUBLE / n) * (s$b::DOUBLE / n))"
    val itemVar = dims.map(d => cv(d, d)).mkString(" + ")
    val totalVar = pairs.map { case (a, b) =>
      if (a == b) cv(a, b) else s"${cv(a, b)} * 2.0"
    }.mkString(" + ")
    val c = dims.size / (dims.size - 1.0)
    s"""WITH a AS (
         SELECT count(*) AS n,
           $sumCols,
           $pairCols
         FROM embeddings WHERE embedding IS NOT NULL),
       v AS (
         SELECT n, $itemVar AS iv, $totalVar AS tv FROM a)
       SELECT n, ${dims.size} AS k,
         round(CAST(iv AS DECIMAL(18,8)), 6)::DOUBLE AS item_var,
         round(CAST(tv AS DECIMAL(18,8)), 6)::DOUBLE AS total_var,
         CASE WHEN tv <= 0.0 THEN NULL
              ELSE round(CAST(CAST('$c' AS DOUBLE) * (1.0 - iv / tv)
                AS DECIMAL(18,8)), 6)::DOUBLE END AS alpha
       FROM v"""
  }

  /** Nelson–Aalen replay: the SAME life table as the survival oracle,
    * then d/n-at-risk staged to DECIMAL(28,12) before the cumulative sum
    * — shared by `events_hazard` and `stream_hazard` (spans merge by
    * min/max).
    */
  val hazardOracleSql =
    """WITH spans AS (
         SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
         FROM events GROUP BY 1),
       e AS (SELECT max(l) AS endd FROM spans),
       lt AS (
         SELECT datediff('day', f, l) AS t,
           CAST(sum(CASE WHEN datediff('day', l, endd) > 7 THEN 1 ELSE 0 END)
             AS BIGINT) AS d,
           CAST(sum(CASE WHEN datediff('day', l, endd) > 7 THEN 0 ELSE 1 END)
             AS BIGINT) AS c
         FROM spans CROSS JOIN e GROUP BY 1),
       tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM lt),
       cum AS (
         SELECT t, d, c,
           n - (CAST(sum(d + c) OVER (ORDER BY t) AS BIGINT) - (d + c)) AS nrisk
         FROM lt CROSS JOIN tot),
       staged AS (
         SELECT t, d, c, nrisk,
           CASE WHEN nrisk = 0 THEN CAST(0.0 AS DECIMAL(28,12))
                ELSE CAST(d::DOUBLE / nrisk::DOUBLE AS DECIMAL(28,12))
                END AS hz
         FROM cum),
       walked AS (
         SELECT t, nrisk, d, c, hz, sum(hz) OVER (ORDER BY t) AS chz
         FROM staged)
       SELECT t AS t_days, nrisk AS n_risk, d, c,
         round(CAST(hz AS DECIMAL(18,8)), 6)::DOUBLE AS hazard,
         round(CAST(chz AS DECIMAL(18,8)), 6)::DOUBLE AS cum_hazard
       FROM walked ORDER BY t_days"""

  /** CUPED replay: the corr oracle's exact-decimal moment CTE restricted
    * to the (quantity, price) pair, then the fixed-order θ/ρ²/variance
    * chain — shared by `stats_cuped` and `stream_cuped` (moments are
    * additive).
    */
  val cupedOracleSql =
    """WITH a AS (
         SELECT count(*) AS n,
           sum(CAST(l_quantity AS DECIMAL(19,4))) AS s0,
           sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS q0,
           sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS s1,
           sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS q1,
           sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS p01
         FROM lineitem),
       b AS (
         SELECT n, n::DOUBLE AS nd, s0::DOUBLE AS s0, q0::DOUBLE AS q0,
           s1::DOUBLE AS s1, q1::DOUBLE AS q1, p01::DOUBLE AS p01
         FROM a),
       c AS (
         SELECT n, nd,
           nd * p01 - s0 * s1 AS cxy,
           nd * q0 - s0 * s0 AS vx,
           nd * q1 - s1 * s1 AS vy
         FROM b)
       SELECT n,
         CASE WHEN vx <= 0.0 THEN NULL
              ELSE round(CAST(cxy / vx AS DECIMAL(18,8)), 6)::DOUBLE
              END AS theta,
         CASE WHEN vx <= 0.0 OR vy <= 0.0 THEN NULL
              ELSE round(CAST(cxy * cxy / (vx * vy) AS DECIMAL(18,8)), 6)::DOUBLE
              END AS rho2,
         round(CAST(vy / (nd * nd) AS DECIMAL(18,8)), 6)::DOUBLE AS var_y,
         CASE WHEN vx <= 0.0 OR vy <= 0.0 THEN NULL
              ELSE round(CAST(vy / (nd * nd) * (1.0 - cxy * cxy / (vx * vy))
                AS DECIMAL(18,8)), 6)::DOUBLE
              END AS var_y_cuped
       FROM c"""

  /** CMH replay: per-stratum 2x2 counts, fixed-order O−E / variance /
    * odds terms staged to DECIMAL(28,10) before the bounded sums — shared
    * by `stats_mh` and `stream_mh` (counts are additive).
    */
  val mhOracleSql =
    """WITH c0 AS (
         SELECT user_id % 4 AS st,
           CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15' THEN 1 ELSE 0 END AS arma,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
         FROM events),
       c AS (
         SELECT st,
           CAST(sum(arma) AS BIGINT) AS na,
           CAST(sum(arma * succ) AS BIGINT) AS xa,
           CAST(sum(1 - arma) AS BIGINT) AS nb,
           CAST(sum((1 - arma) * succ) AS BIGINT) AS xb
         FROM c0 GROUP BY 1),
       t AS (
         SELECT na, nb,
           CASE WHEN na + nb >= 2 THEN CAST(
             xa::DOUBLE - na::DOUBLE * (xa + xb)::DOUBLE / (na + nb)::DOUBLE
             AS DECIMAL(28,10)) ELSE CAST(0.0 AS DECIMAL(28,10)) END AS oe,
           CASE WHEN na + nb >= 2 THEN CAST(
             na::DOUBLE * nb::DOUBLE * (xa + xb)::DOUBLE
               * ((na + nb)::DOUBLE - (xa + xb)::DOUBLE)
               / ((na + nb)::DOUBLE * (na + nb)::DOUBLE
                 * ((na + nb)::DOUBLE - 1.0))
             AS DECIMAL(28,10)) ELSE CAST(0.0 AS DECIMAL(28,10)) END AS v,
           CASE WHEN na + nb >= 2 THEN CAST(
             xa::DOUBLE * (nb::DOUBLE - xb::DOUBLE) / (na + nb)::DOUBLE
             AS DECIMAL(28,10)) ELSE CAST(0.0 AS DECIMAL(28,10)) END AS odn,
           CASE WHEN na + nb >= 2 THEN CAST(
             xb::DOUBLE * (na::DOUBLE - xa::DOUBLE) / (na + nb)::DOUBLE
             AS DECIMAL(28,10)) ELSE CAST(0.0 AS DECIMAL(28,10)) END AS od2
         FROM c),
       a AS (
         SELECT CAST(count(*) AS BIGINT) AS k_strata,
           CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b,
           sum(oe) AS soe, sum(v) AS sv, sum(odn) AS son, sum(od2) AS sod
         FROM t)
       SELECT k_strata, n_a, n_b,
         CASE WHEN sv::DOUBLE <= 0.0 THEN NULL
              ELSE round(CAST(soe::DOUBLE * soe::DOUBLE / sv::DOUBLE
                AS DECIMAL(18,8)), 6)::DOUBLE END AS chi2_mh,
         CASE WHEN sod::DOUBLE <= 0.0 THEN NULL
              ELSE round(CAST(son::DOUBLE / sod::DOUBLE
                AS DECIMAL(18,8)), 6)::DOUBLE END AS or_mh
       FROM a"""

  /** Breslow–Day replay: the same per-stratum 2×2 table, the MH pooled
    * OR, each stratum's expected cell from the admissible quadratic
    * root, staged chi-square terms — shared by `stats_breslow_day` and
    * its streaming twin (per-stratum counts are additive).
    */
  val bdOracleSql =
    """WITH c0 AS (
         SELECT user_id % 4 AS st,
           CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15' THEN 1 ELSE 0 END AS arma,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
         FROM events),
       c AS (
         SELECT st,
           CAST(sum(arma) AS BIGINT) AS na,
           CAST(sum(arma * succ) AS BIGINT) AS xa,
           CAST(sum(1 - arma) AS BIGINT) AS nb,
           CAST(sum((1 - arma) * succ) AS BIGINT) AS xb
         FROM c0 GROUP BY 1),
       p AS (
         SELECT
           sum(CAST(CAST(CAST(xa AS DECIMAL(15,0))
             * CAST(nb - xb AS DECIMAL(15,0)) AS DOUBLE)
             / (na + nb)::DOUBLE AS DECIMAL(28,10))) AS son,
           sum(CAST(CAST(CAST(na - xa AS DECIMAL(15,0))
             * CAST(xb AS DECIMAL(15,0)) AS DOUBLE)
             / (na + nb)::DOUBLE AS DECIMAL(28,10))) AS sod
         FROM c),
       pp AS (SELECT son::DOUBLE / sod::DOUBLE AS psi FROM p),
       bd AS (
         SELECT c.st, c.xa::DOUBLE AS a, c.na::DOUBLE AS n1,
           c.nb::DOUBLE AS n2, (c.xa + c.xb)::DOUBLE AS m1, pp.psi
         FROM c CROSS JOIN pp),
       e AS (
         SELECT *, psi - 1.0 AS qa,
           -(psi * (n1 + m1) + (n2 - m1)) AS qb,
           psi * n1 * m1 AS qc
         FROM bd),
       r AS (SELECT *, sqrt(qb * qb - 4.0 * qa * qc) AS disc FROM e),
       x AS (
         SELECT *,
           CASE WHEN qa = 0.0 THEN -qc / qb
                WHEN (-qb - disc) / (2.0 * qa) >= greatest(0.0, m1 - n2)
                 AND (-qb - disc) / (2.0 * qa) <= least(n1, m1)
                THEN (-qb - disc) / (2.0 * qa)
                ELSE (-qb + disc) / (2.0 * qa) END AS ev
         FROM r),
       g AS (
         SELECT psi,
           CASE WHEN m1 > 0.0 AND m1 < n1 + n2 AND n1 > 0.0 AND n2 > 0.0
             THEN CAST((a - ev) * (a - ev)
               / (1.0 / (1.0 / ev + 1.0 / (n1 - ev) + 1.0 / (m1 - ev)
                 + 1.0 / (n2 - m1 + ev))) AS DECIMAL(28,10)) END AS term,
           CASE WHEN m1 > 0.0 AND m1 < n1 + n2 AND n1 > 0.0 AND n2 > 0.0
             THEN 1 ELSE 0 END AS u
         FROM x),
       agg AS (
         SELECT psi, sum(u) AS k_strata, count(*) - sum(u) AS dropped,
           sum(term) AS chi
         FROM g GROUP BY 1)
       SELECT CAST(k_strata AS BIGINT) AS k_strata,
         CAST(k_strata - 1 AS BIGINT) AS df,
         CAST(dropped AS BIGINT) AS dropped_strata,
         CASE WHEN k_strata < 2 OR psi IS NULL OR psi <= 0.0
                OR isnan(psi) THEN NULL
           ELSE round(CAST(chi::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE
           END AS chi2_bd
       FROM agg"""

  /** Hill tail-index replay: per-key counts, count-of-counts, Gini
    * triangular ranks, top-k interval clamps, staged log moments —
    * shared by `stats_hill` and its streaming twin (counts are
    * additive).
    */
  val hillOracleSql =
    """WITH kc AS (
         SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY 1),
       coc AS (SELECT cnt AS c, CAST(count(*) AS BIGINT) AS nk
               FROM kc GROUP BY 1),
       rk AS (
         SELECT a.c, a.nk,
           coalesce(CAST(sum(b.nk) AS BIGINT), 0) AS bef
         FROM coc a LEFT JOIN coc b ON b.c > a.c
         GROUP BY a.c, a.nk),
       agg AS (
         SELECT CAST(sum(nk) AS BIGINT) AS n_keys,
           sum(CAST(greatest(least(bef + nk, 100) - bef, 0)::DOUBLE
             * ln(c::DOUBLE) AS DECIMAL(28,10))) AS slog,
           CAST(max(CASE WHEN bef + nk >= 101 THEN c END) AS BIGINT) AS xk1
         FROM rk)
       SELECT n_keys, 100 AS k, xk1 AS threshold,
         CASE WHEN n_keys < 101 OR xk1 IS NULL
                OR slog::DOUBLE / 100.0 - ln(xk1::DOUBLE) <= 0.0 THEN NULL
           ELSE round(CAST(1.0 / (slog::DOUBLE / 100.0 - ln(xk1::DOUBLE))
             AS DECIMAL(18,8)), 6)::DOUBLE END AS alpha
       FROM agg"""

  /** ESS / design-effect replay: staged weight moments, Kish ratios in
    * fixed double order — the batch operator's oracle.
    */
  val essOracleSql =
    """WITH f AS (
         SELECT CAST(value AS DOUBLE) AS w FROM events
         WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
           AND CAST(value AS DOUBLE) > 0.0),
       a AS (
         SELECT count(*) AS n,
           sum(CAST(w AS DECIMAL(28,10))) AS sw,
           sum(CAST(w * w AS DECIMAL(28,10))) AS sw2
         FROM f)
       SELECT CAST(n AS BIGINT) AS n,
         CASE WHEN n = 0 THEN NULL
           ELSE round(CAST(sw::DOUBLE * sw::DOUBLE / sw2::DOUBLE
             AS DECIMAL(18,8)), 6)::DOUBLE END AS ess,
         CASE WHEN n = 0 THEN NULL
           ELSE round(CAST(n::DOUBLE * sw2::DOUBLE
             / (sw::DOUBLE * sw::DOUBLE) AS DECIMAL(18,8)), 6)::DOUBLE
           END AS deff,
         CASE WHEN n = 0 THEN NULL
           ELSE round(CAST(sqrt(greatest(n::DOUBLE * sw2::DOUBLE
             / (sw::DOUBLE * sw::DOUBLE) - 1.0, 0.0)) AS DECIMAL(18,8)),
             6)::DOUBLE END AS weight_cv
       FROM a"""

  /** two-sample KS replay: the mwu oracle's per-value count CTEs, the
    * exact integer sup-gap via HUGEINT cross-products, then the d/z/p
    * chain from the ROUNDED d — shared by `stats_ks2` and `stream_ks`.
    */
  val ks2OracleSql =
    """WITH u AS (
         SELECT value AS v, TRUE AS l FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT value, FALSE FROM events WHERE event_type = 'purchase'),
       c AS (
         SELECT v, CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS p,
           CAST(sum(CASE WHEN l THEN 0 ELSE 1 END) AS BIGINT) AS n
         FROM u GROUP BY 1),
       tot AS (SELECT CAST(sum(p) AS BIGINT) AS na, CAST(sum(n) AS BIGINT) AS nb
         FROM c),
       g AS (
         SELECT abs(sum(p) OVER (ORDER BY v) * nb
           - sum(n) OVER (ORDER BY v) * na) AS gap
         FROM c CROSS JOIN tot),
       m AS (SELECT max(gap) AS gm FROM g),
       dstage AS (
         SELECT na, nb,
           CASE WHEN na = 0 OR nb = 0 THEN NULL
                ELSE round(CAST(gm::DOUBLE / (na::DOUBLE * nb::DOUBLE)
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS d
         FROM m CROSS JOIN tot),
       z AS (
         SELECT na, nb, d,
           d * sqrt(na::DOUBLE * nb::DOUBLE / (na::DOUBLE + nb::DOUBLE)) AS zr
         FROM dstage)
       SELECT na AS n_a, nb AS n_b, d,
         round(CAST(zr AS DECIMAL(18,8)), 6)::DOUBLE AS z,
         round(CAST(least(2.0 * exp(-2.0 * zr * zr), 1.0)
           AS DECIMAL(18,8)), 6)::DOUBLE AS p_approx
       FROM z"""

  /** two-sample Cramér–von Mises replay: the ks2 oracle's per-value count
    * CTEs, each distinct value's exact HUGEINT CDF gap squared in fixed
    * double order and DECIMAL(28,10)-staged before the sum, then T and
    * Anderson's null-moment standardization from the ROUNDED t — shared
    * by `stats_cvm` and `stream_cvm`.
    */
  val cvmOracleSql =
    """WITH u AS (
         SELECT value AS v, TRUE AS l FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT value, FALSE FROM events WHERE event_type = 'purchase'),
       c AS (
         SELECT v, CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS p,
           CAST(sum(CASE WHEN l THEN 0 ELSE 1 END) AS BIGINT) AS n
         FROM u GROUP BY 1),
       tot AS (SELECT CAST(sum(p) AS BIGINT) AS na, CAST(sum(n) AS BIGINT) AS nb
         FROM c),
       cum AS (
         SELECT p, n,
           sum(p) OVER (ORDER BY v) AS cp, sum(n) OVER (ORDER BY v) AS cn
         FROM c),
       f AS (
         SELECT na, nb, p, n,
           (cp * nb - cn * na)::DOUBLE / (na::DOUBLE * nb::DOUBLE) AS fd
         FROM cum CROSS JOIN tot),
       terms AS (
         SELECT na, nb,
           CAST((p + n)::DOUBLE * fd * fd AS DECIMAL(28,10)) AS term
         FROM f),
       s AS (SELECT na, nb, sum(term) AS st FROM terms GROUP BY 1, 2),
       tstage AS (
         SELECT na, nb,
           CASE WHEN na = 0 OR nb = 0 THEN NULL
                ELSE round(CAST((na::DOUBLE * nb::DOUBLE
                    / ((na + nb)::DOUBLE * (na + nb)::DOUBLE)) * st::DOUBLE
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS t
         FROM s),
       m AS (
         SELECT na, nb, t,
           (1.0 + 1.0 / (na + nb)::DOUBLE) / 6.0 AS et,
           (((na + nb)::DOUBLE + 1.0)
             / (45.0 * (na + nb)::DOUBLE * (na + nb)::DOUBLE))
           * ((4.0 * na::DOUBLE * nb::DOUBLE * (na + nb)::DOUBLE
               - 3.0 * (na::DOUBLE * na::DOUBLE + nb::DOUBLE * nb::DOUBLE)
               - 2.0 * na::DOUBLE * nb::DOUBLE)
             / (4.0 * na::DOUBLE * nb::DOUBLE)) AS vt
         FROM tstage)
       SELECT na AS n_a, nb AS n_b, t,
         CASE WHEN t IS NULL OR vt <= 0.0 THEN NULL
              ELSE round(CAST((t - et) / sqrt(vt) AS DECIMAL(18,8)), 6)::DOUBLE
         END AS z
       FROM m"""

  /** two-sample Anderson–Darling replay: the ks2 oracle's per-value count
    * CTEs, the interior values' tail-weighted squared gaps in fixed
    * double order (each factor ≤ N) DECIMAL(28,10)-staged before the
    * sum, ONE divide by na·nb — shared by `stats_ad` and `stream_ad`.
    */
  val adOracleSql =
    """WITH u AS (
         SELECT value AS v, TRUE AS l FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT value, FALSE FROM events WHERE event_type = 'purchase'),
       c AS (
         SELECT v, CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS p,
           CAST(sum(CASE WHEN l THEN 0 ELSE 1 END) AS BIGINT) AS n
         FROM u GROUP BY 1),
       tot AS (SELECT CAST(sum(p) AS BIGINT) AS na, CAST(sum(n) AS BIGINT) AS nb
         FROM c),
       cum AS (
         SELECT p, n,
           sum(p) OVER (ORDER BY v) AS cp, sum(n) OVER (ORDER BY v) AS cn
         FROM c),
       f AS (
         SELECT na, nb, p, n,
           ((na + nb) * cp - na * (cp + cn))::DOUBLE AS gd,
           (cp + cn)::DOUBLE AS bd
         FROM cum CROSS JOIN tot
         WHERE cp + cn < na + nb),
       terms AS (
         SELECT na, nb,
           CAST((p + n)::DOUBLE * (gd / bd)
             * (gd / ((na + nb)::DOUBLE - bd)) AS DECIMAL(28,10)) AS term
         FROM f),
       s AS (SELECT na, nb, sum(term) AS st FROM terms GROUP BY 1, 2)
       SELECT na AS n_a, nb AS n_b,
         CASE WHEN na = 0 OR nb = 0 OR st IS NULL THEN NULL
              ELSE round(CAST(st::DOUBLE / (na::DOUBLE * nb::DOUBLE)
                AS DECIMAL(18,8)), 6)::DOUBLE END AS a2
       FROM s"""

  /** bucketed Wasserstein-1 replay: the ks2 oracle's per-value counts
    * re-bucketed at width 10, cumulative counts in bucket order, each
    * present bucket's span to its next present neighbor times the exact
    * HUGEINT CDF gap (DECIMAL(28,10)-staged before the sum) — shared by
    * `stats_wasserstein` and `stream_wasserstein`.
    */
  val w1OracleSql =
    """WITH u AS (
         SELECT value AS v, TRUE AS l FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT value, FALSE FROM events WHERE event_type = 'purchase'),
       c AS (
         SELECT v, CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS p,
           CAST(sum(CASE WHEN l THEN 0 ELSE 1 END) AS BIGINT) AS n
         FROM u GROUP BY 1),
       cb AS (
         SELECT CAST(floor(v / 10.0) AS BIGINT) AS b,
           CAST(sum(p) AS BIGINT) AS p, CAST(sum(n) AS BIGINT) AS n
         FROM c GROUP BY 1),
       tot AS (SELECT CAST(sum(p) AS BIGINT) AS na, CAST(sum(n) AS BIGINT) AS nb
         FROM cb),
       cum AS (
         SELECT b,
           sum(p) OVER (ORDER BY b) AS cp, sum(n) OVER (ORDER BY b) AS cn,
           lead(b) OVER (ORDER BY b) AS nx
         FROM cb),
       terms AS (
         SELECT na, nb,
           CAST(((nx - b)::DOUBLE * 10.0)
             * (abs(cp * nb - cn * na)::DOUBLE
               / (na::DOUBLE * nb::DOUBLE)) AS DECIMAL(28,10)) AS term
         FROM cum CROSS JOIN tot
         WHERE nx IS NOT NULL),
       s AS (SELECT sum(term) AS st FROM terms)
       SELECT na AS n_a, nb AS n_b,
         CASE WHEN na = 0 OR nb = 0 THEN NULL
              ELSE round(CAST(coalesce(st, 0)::DOUBLE
                AS DECIMAL(18,8)), 6)::DOUBLE END AS w1
       FROM s CROSS JOIN tot"""

  /** EWMA control-chart replay (daily counts, exact moments, unrolled
    * recursion via triangular self-join with decimal-staged terms,
    * fixed-order limits) — shared by `events_ewma` and `stream_ewma`.
    */
  val ewmaOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       st AS (
         SELECT event_type, count(*) AS dd, CAST(sum(n) AS BIGINT) AS s,
           sum(n::DECIMAL(15,0) * n::DECIMAL(15,0)) AS s2
         FROM d GROUP BY 1),
       ms AS (
         SELECT event_type, s::DOUBLE / dd AS mean,
           sqrt(greatest(s2::DOUBLE / dd
             - (s::DOUBLE / dd) * (s::DOUBLE / dd), 0.0)) AS std
         FROM st),
       idx AS (
         SELECT event_type, day, n,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
             AS BIGINT) AS t
         FROM d),
       z AS (
         SELECT a.event_type, a.day, a.n, a.t,
           sum(CAST(0.2 * pow(0.8, a.t - b.t) * b.n AS DECIMAL(28,10))) AS zs
         FROM idx a JOIN idx b
           ON a.event_type = b.event_type AND b.t <= a.t
         GROUP BY 1, 2, 3, 4),
       f AS (
         SELECT z.event_type, day, n,
           mean * pow(0.8, t) + zs::DOUBLE AS ewma,
           3.0 * std * sqrt(0.2 / (2.0 - 0.2) * (1.0 - pow(0.8, 2 * t))) AS spread,
           mean
         FROM z JOIN ms ON z.event_type = ms.event_type)
       SELECT event_type, day, n,
         round(CAST(ewma AS DECIMAL(18,8)), 4)::DOUBLE AS ewma,
         round(CAST(mean - spread AS DECIMAL(18,8)), 4)::DOUBLE AS lcl,
         round(CAST(mean + spread AS DECIMAL(18,8)), 4)::DOUBLE AS ucl,
         (ewma < mean - spread OR ewma > mean + spread) AS alarm
       FROM f ORDER BY event_type, day"""

  /** burstiness replay (daily counts, per-type exact (d, Σn, Σn²)
    * moments, Fano = var/mean and CV² in fixed double order) — shared by
    * `events_burstiness` and `stream_burstiness` (daily counts are
    * additive, so the accreted VolumeMonitor state equals the one-pass
    * count table).
    */
  val burstinessOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       st AS (
         SELECT event_type, count(*) AS d_days,
           CAST(sum(n) AS BIGINT) AS n_total,
           sum(n::DECIMAL(15,0) * n::DECIMAL(15,0)) AS s2
         FROM d GROUP BY 1),
       f AS (
         SELECT event_type, d_days, n_total,
           n_total::DOUBLE / d_days AS mean,
           greatest(s2::DOUBLE / d_days
             - (n_total::DOUBLE / d_days) * (n_total::DOUBLE / d_days),
             0.0) AS vr
         FROM st)
       SELECT event_type, d_days, n_total,
         round(CAST(mean AS DECIMAL(18,8)), 6)::DOUBLE AS mean_daily,
         CASE WHEN mean <= 0.0 THEN NULL
              ELSE round(CAST(vr / mean AS DECIMAL(18,8)), 6)::DOUBLE
         END AS fano,
         CASE WHEN mean <= 0.0 THEN NULL
              ELSE round(CAST(vr / (mean * mean) AS DECIMAL(18,8)), 6)::DOUBLE
         END AS cv2
       FROM f ORDER BY event_type"""

  /** Mann–Kendall + Theil–Sen replay (daily counts, triangular day-pair
    * join for S and the slope pool, exact-integer tie terms,
    * continuity-corrected z in fixed double order, exact median slope) —
    * shared by `events_mannkendall` and `stream_mannkendall` (daily
    * counts are additive, so the accreted VolumeMonitor state equals the
    * one-pass count table).
    */
  val mannKendallOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       p AS (
         SELECT a.event_type,
           CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sgn,
           (b.n - a.n)::DOUBLE / date_diff('day', a.day, b.day)::DOUBLE
             AS slope
         FROM d a JOIN d b
           ON a.event_type = b.event_type AND a.day < b.day),
       s AS (
         SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s,
           quantile_cont(slope, 0.5) AS slope
         FROM p GROUP BY 1),
       dd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS d_days
              FROM d GROUP BY 1),
       ties AS (
         SELECT event_type,
           CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tv
         FROM (SELECT event_type, n, CAST(count(*) AS BIGINT) AS t
               FROM d GROUP BY 1, 2) q
         GROUP BY 1),
       f AS (
         SELECT dd.event_type, d_days, coalesce(s, 0) AS s, slope,
           (d_days * (d_days - 1) * (2 * d_days + 5) - tv)::DOUBLE / 18.0
             AS var_s
         FROM dd LEFT JOIN s ON dd.event_type = s.event_type
                 JOIN ties ON dd.event_type = ties.event_type)
       SELECT event_type, d_days, s,
         CASE WHEN var_s <= 0.0 THEN NULL
              WHEN s = 0 THEN 0.0
              ELSE round(CAST(
                (s - CASE WHEN s > 0 THEN 1 ELSE -1 END)::DOUBLE
                  / sqrt(var_s) AS DECIMAL(18,8)), 6)::DOUBLE END AS z,
         round(CAST(slope AS DECIMAL(18,8)), 6)::DOUBLE AS slope
       FROM f ORDER BY event_type"""

  /** daily-volume ACF replay (daily counts, positional index, broadcast
    * lag range join, decimal-staged cross products, exact-moment
    * denominator) — shared by `events_acf` and `stream_acf` (daily
    * counts are additive).
    */
  val acfOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       st AS (
         SELECT event_type, count(*) AS dd, CAST(sum(n) AS BIGINT) AS s,
           sum(n::DECIMAL(15,0) * n::DECIMAL(15,0)) AS s2
         FROM d GROUP BY 1),
       idx AS (
         SELECT event_type, n,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
             AS BIGINT) AS t
         FROM d),
       lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, 8)),
       p AS (
         SELECT a.event_type, l.lag AS lag,
           CAST((a.n::DOUBLE - st.s::DOUBLE / st.dd)
             * (b.n::DOUBLE - st.s::DOUBLE / st.dd) AS DECIMAL(28,10)) AS num,
           st.s2::DOUBLE - st.s::DOUBLE * st.s::DOUBLE / st.dd AS den
         FROM idx a CROSS JOIN lags l
           JOIN idx b ON a.event_type = b.event_type AND b.t = a.t - l.lag
           JOIN st ON a.event_type = st.event_type),
       agg AS (
         SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
           sum(num) AS nm, min(den) AS dn
         FROM p GROUP BY 1, 2)
       SELECT event_type, lag, n_pairs,
         CASE WHEN dn <= 0.0 THEN NULL
              ELSE round(CAST(nm::DOUBLE / dn AS DECIMAL(18,8)), 6)::DOUBLE
              END AS r
       FROM agg ORDER BY event_type, lag"""

  /** Ljung–Box replay (the ACF replay verbatim, then each lag's
    * r²/(n−k) decimal-staged before the k-row sum, Q in fixed double
    * order; n_days from the dense pair index) — shared by
    * `events_ljung_box` and `stream_ljung_box` (daily counts are
    * additive).
    */
  val ljungBoxOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       st AS (
         SELECT event_type, count(*) AS dd, CAST(sum(n) AS BIGINT) AS s,
           sum(n::DECIMAL(15,0) * n::DECIMAL(15,0)) AS s2
         FROM d GROUP BY 1),
       idx AS (
         SELECT event_type, n,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
             AS BIGINT) AS t
         FROM d),
       lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, 8)),
       p AS (
         SELECT a.event_type, l.lag AS lag,
           CAST((a.n::DOUBLE - st.s::DOUBLE / st.dd)
             * (b.n::DOUBLE - st.s::DOUBLE / st.dd) AS DECIMAL(28,10)) AS num,
           st.s2::DOUBLE - st.s::DOUBLE * st.s::DOUBLE / st.dd AS den
         FROM idx a CROSS JOIN lags l
           JOIN idx b ON a.event_type = b.event_type AND b.t = a.t - l.lag
           JOIN st ON a.event_type = st.event_type),
       agg AS (
         SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
           sum(num) AS nm, min(den) AS dn
         FROM p GROUP BY 1, 2),
       acf AS (
         SELECT event_type, lag, n_pairs,
           CASE WHEN dn <= 0.0 THEN NULL
                ELSE round(CAST(nm::DOUBLE / dn AS DECIMAL(18,8)), 6)::DOUBLE
                END AS r
         FROM agg),
       tm AS (
         SELECT event_type, n_pairs + lag AS dd,
           CASE WHEN r IS NULL THEN NULL
                ELSE CAST(r * r / n_pairs::DOUBLE AS DECIMAL(28,10)) END AS tm
         FROM acf),
       g AS (
         SELECT event_type, max(dd) AS n_days,
           CAST(count(tm) AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS lags,
           sum(tm) AS st
         FROM tm GROUP BY 1)
       SELECT event_type, n_days, m,
         CASE WHEN lags != 7 OR m != lags THEN NULL
              ELSE round(CAST(n_days::DOUBLE * (n_days::DOUBLE + 2.0)
                * st::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE END AS q
       FROM g ORDER BY event_type"""

  /** Durbin–Watson replay (daily counts, per-type five-moment OLS fit,
    * fixed-order residuals, lag-1 self-join on the dense index,
    * decimal-staged quadratic sums) — shared by `events_durbin_watson`
    * and `stream_durbin_watson` (daily counts are additive).
    */
  val durbinWatsonOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       idx AS (
         SELECT event_type, n,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
             AS BIGINT) AS t
         FROM d),
       mo AS (
         SELECT event_type, count(*) AS dd,
           sum(t::DECIMAL(15,0)) AS st, sum(n::DECIMAL(15,0)) AS sy,
           sum(t::DECIMAL(15,0) * n::DECIMAL(15,0)) AS sty,
           sum(t::DECIMAL(15,0) * t::DECIMAL(15,0)) AS stt
         FROM idx GROUP BY 1),
       fit AS (
         SELECT event_type, dd,
           dd::DOUBLE * stt::DOUBLE - st::DOUBLE * st::DOUBLE AS det,
           (dd::DOUBLE * sty::DOUBLE - st::DOUBLE * sy::DOUBLE)
             / (dd::DOUBLE * stt::DOUBLE - st::DOUBLE * st::DOUBLE) AS b,
           (sy::DOUBLE - (dd::DOUBLE * sty::DOUBLE - st::DOUBLE * sy::DOUBLE)
             / (dd::DOUBLE * stt::DOUBLE - st::DOUBLE * st::DOUBLE)
             * st::DOUBLE) / dd::DOUBLE AS a
         FROM mo),
       res AS (
         SELECT i.event_type, i.t, f.dd, f.det, f.b,
           i.n::DOUBLE - (f.a + f.b * i.t::DOUBLE) AS e
         FROM idx i JOIN fit f ON i.event_type = f.event_type),
       nm AS (
         SELECT a.event_type,
           sum(CAST((a.e - p.e) * (a.e - p.e) AS DECIMAL(28,10))) AS num
         FROM res a JOIN res p
           ON a.event_type = p.event_type AND p.t = a.t - 1
         GROUP BY 1),
       dn AS (
         SELECT event_type, min(dd) AS dd, min(det) AS det, min(b) AS b,
           sum(CAST(e * e AS DECIMAL(28,10))) AS den
         FROM res GROUP BY 1)
       SELECT dn.event_type, dd AS n_days,
         CASE WHEN dd < 3 OR det <= 0.0 THEN NULL
              ELSE round(CAST(b AS DECIMAL(18,8)), 6)::DOUBLE END AS slope,
         CASE WHEN dd < 3 OR det <= 0.0 OR den::DOUBLE <= 0.0
                OR nm.num IS NULL THEN NULL
              ELSE round(CAST(nm.num::DOUBLE / dn.den::DOUBLE
                AS DECIMAL(18,8)), 6)::DOUBLE END AS dw
       FROM dn LEFT JOIN nm ON dn.event_type = nm.event_type
       ORDER BY dn.event_type"""

  /** Wilcoxon signed-rank replay (paired day diffs with absent days as
    * 0, zero-drop, doubled average ranks off the inclusive cumulative,
    * exact tie term, fixed-order z) — shared by `events_wilcoxon` and
    * `stream_wilcoxon` (daily counts are additive).
    */
  /** Market-basket replay — distinct (order, part) frame, ≤1000-item
    * basket cap, pair self-join, supports, unrounded-lift top-20 with id
    * tie-break. Shared by `events_basket`.
    */
  val basketOracleSql =
    """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
       sz AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 1000),
       cap AS (SELECT bi.b, bi.i FROM bi JOIN sz USING (b)),
       nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM cap),
       supp AS (SELECT i, CAST(count(*) AS BIGINT) AS s FROM cap GROUP BY 1),
       pr AS (
         SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS support
         FROM cap a JOIN cap b ON a.b = b.b AND a.i < b.i
         GROUP BY 1, 2 HAVING count(*) >= 2),
       sc AS (
         SELECT item_a, item_b, support, sa.s AS support_a, sb.s AS support_b,
           (support::DOUBLE * n::DOUBLE) / (sa.s::DOUBLE * sb.s::DOUBLE) AS lf
         FROM pr JOIN supp sa ON sa.i = item_a JOIN supp sb ON sb.i = item_b
         CROSS JOIN nb)
       SELECT item_a, item_b, support, support_a, support_b,
         round(CAST(support::DOUBLE / support_a::DOUBLE AS DECIMAL(18,8)),
           6)::DOUBLE AS confidence,
         round(CAST(lf AS DECIMAL(18,8)), 6)::DOUBLE AS lift
       FROM (SELECT * FROM sc ORDER BY lf DESC, item_a, item_b LIMIT 20)
       ORDER BY lift DESC, item_a, item_b"""

  /** Cohort LTV replay — first-order-month cohorts, month-offset ages,
    * exact decimal revenue, cohort-partitioned running sum. Shared by
    * `events_cohort_ltv`.
    */
  val cohortLtvOracleSql =
    """WITH o AS (
         SELECT o_custkey AS c, CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
           CAST(o_totalprice AS DECIMAL(18,2)) AS a
         FROM orders),
       f AS (SELECT c, min(m) AS cohort_month FROM o GROUP BY 1),
       aged AS (
         SELECT o.c, o.a, f.cohort_month,
           CAST(date_diff('month', f.cohort_month, o.m) AS BIGINT) AS age_months
         FROM o JOIN f USING (c)),
       g AS (
         SELECT cohort_month, age_months,
           CAST(count(DISTINCT c) AS BIGINT) AS n_customers,
           CAST(sum(a) AS DECIMAL(28,2)) AS rev
         FROM aged GROUP BY 1, 2)
       SELECT cohort_month, age_months, n_customers, rev::DOUBLE AS revenue,
         CAST(sum(rev) OVER (PARTITION BY cohort_month ORDER BY age_months)
           AS DECIMAL(28,2))::DOUBLE AS cum_revenue
       FROM g ORDER BY cohort_month, age_months"""

  /** FK audit replay — distinct-key tables full-outer joined, both-way
    * verdicts in one row. Shared by `audit_fk_orphans`.
    */
  val fkAuditOracleSql =
    """WITH ck AS (
         SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS rws
         FROM lineitem GROUP BY 1),
       pk AS (SELECT DISTINCT o_orderkey AS k, 1 AS p FROM orders),
       j AS (SELECT ck.rws, pk.p FROM ck FULL OUTER JOIN pk ON ck.k = pk.k)
       SELECT CAST(coalesce(sum(rws), 0) AS BIGINT) AS n_child_rows,
         CAST(sum(CASE WHEN rws IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_child_keys,
         CAST(coalesce(sum(CASE WHEN p IS NULL THEN rws END), 0) AS BIGINT) AS n_orphan_rows,
         CAST(sum(CASE WHEN p IS NULL AND rws IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_keys,
         CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parent_keys,
         CAST(sum(CASE WHEN p IS NOT NULL AND rws IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_childless_parents,
         CASE WHEN coalesce(sum(rws), 0) = 0 THEN NULL
              ELSE round(CAST(coalesce(sum(CASE WHEN p IS NULL THEN rws END), 0)::DOUBLE
                / coalesce(sum(rws), 0)::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE
              END AS orphan_rate
       FROM j"""

  /** Reconciliation replay — exact-decimal child rollups, both sides
    * staged to DECIMAL(28,4) before the diff, 1-cent tolerance verdicts.
    * Shared by `audit_reconcile`.
    */
  val reconcileOracleSql =
    """WITH cs AS (
         SELECT l_orderkey AS k,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(8,4)))
             * (1 + CAST(l_tax AS DECIMAL(8,4)))) AS DECIMAL(28,4)) AS s
         FROM lineitem GROUP BY 1),
       p AS (SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(28,4)) AS v
             FROM orders),
       j AS (SELECT v, s, abs(v - s) AS diff FROM p LEFT JOIN cs USING (k))
       SELECT CAST(count(*) AS BIGINT) AS n_parent,
         CAST(sum(CASE WHEN s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_children,
         CAST(sum(CASE WHEN diff <= CAST(0.01 AS DECIMAL(28,4)) THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
         CAST(sum(CASE WHEN diff > CAST(0.01 AS DECIMAL(28,4)) THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
         CAST(sum(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_children,
         round(CAST(max(diff) AS DECIMAL(18,2)), 2)::DOUBLE AS max_abs_diff
       FROM j"""

  /** RFM replay — per-customer (last, count, exact-decimal sum) row,
    * the exact interpolated quintile-cut block per metric, correlated
    * strictly-greater counts for the 1–5 scores. Anchors on the corpus
    * max order date. Shared by `events_rfm`.
    */
  val rfmOracleSql =
    """WITH per AS (
         SELECT o_custkey, max(o_orderdate) AS last_o,
           CAST(count(*) AS BIGINT) AS frequency,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS msum
         FROM orders GROUP BY 1),
       anch AS (SELECT max(last_o) AS anchor FROM per),
       base AS (
         SELECT o_custkey,
           CAST(date_diff('day', CAST(last_o AS DATE), CAST(anchor AS DATE))
             AS BIGINT) AS recency_days,
           frequency, msum::DOUBLE AS monetary
         FROM per CROSS JOIN anch),
       rcnt AS (SELECT recency_days AS v, CAST(count(*) AS BIGINT) AS c
                FROM base GROUP BY 1),
       rs AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cm FROM rcnt),
       rt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM rcnt),
       qq AS (SELECT unnest([0.2, 0.4, 0.6, 0.8]) AS q),
       rj AS (SELECT q, n, (n::DOUBLE - 1.0) * q AS pos FROM qq CROSS JOIN rt),
       rm AS (SELECT q, n, CAST(floor(pos) AS BIGINT) + 1 AS lo,
                pos - floor(pos) AS frac FROM rj),
       rr AS (SELECT rm.q, rm.frac,
                min(CASE WHEN rs.cm >= rm.lo THEN rs.v END)::DOUBLE AS xlo,
                min(CASE WHEN rs.cm >= least(rm.lo + 1, rm.n) THEN rs.v
                  END)::DOUBLE AS xhi
              FROM rm CROSS JOIN rs GROUP BY 1, 2),
       rc AS (SELECT round(CAST(xlo + (xhi - xlo) * frac AS DECIMAL(18,8)),
                6)::DOUBLE AS v FROM rr),
       fcnt AS (SELECT frequency AS v, CAST(count(*) AS BIGINT) AS c
                FROM base GROUP BY 1),
       fs AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cm FROM fcnt),
       ft AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM fcnt),
       fj AS (SELECT q, n, (n::DOUBLE - 1.0) * q AS pos FROM qq CROSS JOIN ft),
       fm AS (SELECT q, n, CAST(floor(pos) AS BIGINT) + 1 AS lo,
                pos - floor(pos) AS frac FROM fj),
       fr AS (SELECT fm.q, fm.frac,
                min(CASE WHEN fs.cm >= fm.lo THEN fs.v END)::DOUBLE AS xlo,
                min(CASE WHEN fs.cm >= least(fm.lo + 1, fm.n) THEN fs.v
                  END)::DOUBLE AS xhi
              FROM fm CROSS JOIN fs GROUP BY 1, 2),
       fc AS (SELECT round(CAST(xlo + (xhi - xlo) * frac AS DECIMAL(18,8)),
                6)::DOUBLE AS v FROM fr),
       mcnt AS (SELECT monetary AS v, CAST(count(*) AS BIGINT) AS c
                FROM base GROUP BY 1),
       ms AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cm FROM mcnt),
       mt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM mcnt),
       mj AS (SELECT q, n, (n::DOUBLE - 1.0) * q AS pos FROM qq CROSS JOIN mt),
       mq AS (SELECT q, n, CAST(floor(pos) AS BIGINT) + 1 AS lo,
                pos - floor(pos) AS frac FROM mj),
       mr AS (SELECT mq.q, mq.frac,
                min(CASE WHEN ms.cm >= mq.lo THEN ms.v END)::DOUBLE AS xlo,
                min(CASE WHEN ms.cm >= least(mq.lo + 1, mq.n) THEN ms.v
                  END)::DOUBLE AS xhi
              FROM mq CROSS JOIN ms GROUP BY 1, 2),
       mc AS (SELECT round(CAST(xlo + (xhi - xlo) * frac AS DECIMAL(18,8)),
                6)::DOUBLE AS v FROM mr),
       sc AS (
         SELECT b.o_custkey, b.recency_days, b.frequency,
           round(CAST(b.monetary AS DECIMAL(18,8)), 2)::DOUBLE AS monetary,
           5 - (SELECT count(*) FROM rc WHERE b.recency_days > rc.v) AS r_score,
           1 + (SELECT count(*) FROM fc WHERE b.frequency > fc.v) AS f_score,
           1 + (SELECT count(*) FROM mc WHERE b.monetary > mc.v) AS m_score
         FROM base b)
       SELECT o_custkey, recency_days, frequency, monetary,
         CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
         CAST(m_score AS BIGINT) AS m_score,
         CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
       FROM sc ORDER BY o_custkey"""

  /** Friedman + Kendall's W replay — daily volumes, completed grid
    * (absent type-days count 0), within-day midranks via the per-day
    * (value, count) self-join, exact doubled-rank sums and Σ(t³−t) tie
    * term, χ²/W in fixed double order. Shared by `events_friedman` and
    * `stream_friedman` (daily counts are the additive VolumeMonitor
    * state).
    */
  val friedmanOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       types AS (SELECT DISTINCT event_type FROM d),
       days AS (SELECT DISTINCT day FROM d),
       grid AS (
         SELECT days.day AS b, types.event_type AS t,
           coalesce(d.n, 0) AS x
         FROM days CROSS JOIN types
         LEFT JOIN d ON d.day = days.day AND d.event_type = types.event_type),
       bx AS (
         SELECT b, x, CAST(count(*) AS BIGINT) AS cnt
         FROM grid GROUP BY 1, 2),
       rk AS (
         SELECT a.b, a.x,
           2 * coalesce(sum(l.cnt), 0) + a.cnt + 1 AS r2
         FROM bx a LEFT JOIN bx l ON l.b = a.b AND l.x < a.x
         GROUP BY a.b, a.x, a.cnt),
       pt AS (
         SELECT g.t, sum(rk.r2::DECIMAL(38,0)) AS rs
         FROM grid g JOIN rk ON rk.b = g.b AND rk.x = g.x
         GROUP BY g.t),
       ss AS (
         SELECT CAST(count(*) AS BIGINT) AS k,
           sum(rs * rs) AS ss4 FROM pt),
       nb AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM days),
       tie AS (
         SELECT sum(cnt::DECIMAL(38,0) * cnt * cnt - cnt) AS tt FROM bx),
       m AS (
         SELECT n_days, k,
           3.0 * ss4::DOUBLE / (n_days::DOUBLE * k::DOUBLE * (k::DOUBLE + 1.0))
             - 3.0 * n_days::DOUBLE * (k::DOUBLE + 1.0) AS chi_u,
           1.0 - tt::DOUBLE
             / (n_days::DOUBLE * k::DOUBLE * (k::DOUBLE * k::DOUBLE - 1.0)) AS c
         FROM ss CROSS JOIN nb CROSS JOIN tie)
       SELECT n_days, k,
         CASE WHEN k < 2 OR n_days < 1 OR c <= 0.0 THEN NULL
              ELSE round(CAST(chi_u / c AS DECIMAL(18,8)), 6)::DOUBLE END AS chi2,
         CASE WHEN k < 2 OR n_days < 1 OR c <= 0.0 THEN NULL
              ELSE round(CAST(chi_u / c / (n_days::DOUBLE * (k::DOUBLE - 1.0))
                AS DECIMAL(18,8)), 6)::DOUBLE END AS w
       FROM m"""

  /** Page's L replay — same completed grid and within-day midranks as
    * [[friedmanOracleSql]], ordering index via the k² type self-join,
    * L = Σ j·Rⱼ exact, closed-form E/Var z in fixed double order. Shared
    * by `events_page_trend` and `stream_page_trend`.
    */
  val pageOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       types AS (SELECT DISTINCT event_type FROM d),
       days AS (SELECT DISTINCT day FROM d),
       grid AS (
         SELECT days.day AS b, types.event_type AS t,
           coalesce(d.n, 0) AS x
         FROM days CROSS JOIN types
         LEFT JOIN d ON d.day = days.day AND d.event_type = types.event_type),
       bx AS (
         SELECT b, x, CAST(count(*) AS BIGINT) AS cnt
         FROM grid GROUP BY 1, 2),
       rk AS (
         SELECT a.b, a.x,
           2 * coalesce(sum(l.cnt), 0) + a.cnt + 1 AS r2
         FROM bx a LEFT JOIN bx l ON l.b = a.b AND l.x < a.x
         GROUP BY a.b, a.x, a.cnt),
       pt AS (
         SELECT g.t, sum(rk.r2::DECIMAL(38,0)) AS rs
         FROM grid g JOIN rk ON rk.b = g.b AND rk.x = g.x
         GROUP BY g.t),
       jx AS (
         SELECT a.t, a.rs, CAST(count(*) AS BIGINT) AS j
         FROM pt a JOIN pt b ON b.t <= a.t
         GROUP BY a.t, a.rs),
       agg AS (
         SELECT CAST(count(*) AS BIGINT) AS k,
           sum(j::DECIMAL(38,0) * rs) AS l2 FROM jx),
       nb AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM days),
       m AS (
         SELECT n_days, k, l2::DOUBLE / 2.0 AS l,
           n_days::DOUBLE * k::DOUBLE * (k::DOUBLE + 1.0) * (k::DOUBLE + 1.0)
             / 4.0 AS e,
           n_days::DOUBLE * k::DOUBLE * k::DOUBLE * (k::DOUBLE + 1.0)
             * (k::DOUBLE * k::DOUBLE - 1.0) / 144.0 AS v
         FROM agg CROSS JOIN nb)
       SELECT n_days, k,
         round(CAST(l AS DECIMAL(18,8)), 6)::DOUBLE AS l,
         CASE WHEN k < 2 OR n_days < 1 OR v <= 0.0 THEN NULL
              ELSE round(CAST((l - e) / sqrt(v) AS DECIMAL(18,8)),
                6)::DOUBLE END AS z
       FROM m"""

  val wilcoxonOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       a AS (SELECT day, n FROM d WHERE event_type = 'click'),
       b AS (SELECT day, n FROM d WHERE event_type = 'view'),
       df AS (
         SELECT coalesce(a.n, 0) - coalesce(b.n, 0) AS dd
         FROM a FULL OUTER JOIN b ON a.day = b.day),
       t AS (
         SELECT abs(dd) AS v, CAST(count(*) AS BIGINT) AS c,
           CAST(sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS p
         FROM df GROUP BY 1),
       nz AS (
         SELECT v, c, p, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cm
         FROM t WHERE v > 0),
       r AS (
         SELECT c, p, (2 * (cm - c) + c + 1)::DECIMAL(38,0) AS r2 FROM nz),
       ag AS (
         SELECT coalesce(CAST(sum(c) AS BIGINT), 0) AS n,
           sum(p::DECIMAL(38,0) * r2) AS w2,
           sum(c::DECIMAL(38,0) * c::DECIMAL(38,0) * c::DECIMAL(38,0)
             - c::DECIMAL(38,0)) AS ts
         FROM r),
       tot AS (SELECT coalesce(CAST(sum(c) AS BIGINT), 0) AS n_days FROM t)
       SELECT n_days, n,
         CASE WHEN n = 0 THEN NULL
           ELSE round(CAST(w2::DOUBLE / 2.0 AS DECIMAL(18,8)), 6)::DOUBLE
           END AS w_plus,
         CASE WHEN n < 2
                OR (n::DOUBLE * (n::DOUBLE + 1.0) * (2.0 * n::DOUBLE + 1.0)
                  / 24.0 - ts::DOUBLE / 48.0) <= 0.0 THEN NULL
           ELSE round(CAST(
             (w2::DOUBLE / 2.0 - n::DOUBLE * (n::DOUBLE + 1.0) / 4.0)
             / sqrt(n::DOUBLE * (n::DOUBLE + 1.0) * (2.0 * n::DOUBLE + 1.0)
               / 24.0 - ts::DOUBLE / 48.0) AS DECIMAL(18,8)), 6)::DOUBLE
           END AS z
       FROM ag CROSS JOIN tot"""

  /** Sign-test replay (same paired day diffs and zero-drop, exact
    * (n, n_pos) counts, fixed-order z without continuity correction) —
    * shared by `events_sign_test` and `stream_sign_test`.
    */
  val signTestOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       a AS (SELECT day, n FROM d WHERE event_type = 'click'),
       b AS (SELECT day, n FROM d WHERE event_type = 'view'),
       df AS (
         SELECT coalesce(a.n, 0) - coalesce(b.n, 0) AS dd
         FROM a FULL OUTER JOIN b ON a.day = b.day),
       t AS (
         SELECT abs(dd) AS v, CAST(count(*) AS BIGINT) AS c,
           CAST(sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS p
         FROM df GROUP BY 1),
       nz AS (
         SELECT coalesce(CAST(sum(c) AS BIGINT), 0) AS n,
           coalesce(CAST(sum(p) AS BIGINT), 0) AS np
         FROM t WHERE v > 0),
       tot AS (SELECT coalesce(CAST(sum(c) AS BIGINT), 0) AS n_days FROM t)
       SELECT n_days, n, np AS n_pos, n - np AS n_neg,
         CASE WHEN n = 0 THEN NULL
           ELSE round(CAST((2.0 * np::DOUBLE - n::DOUBLE) / sqrt(n::DOUBLE)
             AS DECIMAL(18,8)), 6)::DOUBLE END AS z
       FROM nz CROSS JOIN tot"""

  /** Pettitt changepoint replay (daily counts, day-pair vote sums,
    * partitioned prefix U, exact-integer K with first-day tie-break,
    * fixed-order approximate p) — shared by `events_pettitt` and
    * `stream_pettitt` (daily counts are additive).
    */
  val pettittOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       idx AS (
         SELECT event_type, day, n,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
             AS BIGINT) AS t
         FROM d),
       votes AS (
         SELECT a.event_type, a.day, a.t,
           CAST(sum(CASE WHEN a.n > b.n THEN 1 WHEN a.n < b.n THEN -1
             ELSE 0 END) AS BIGINT) AS v
         FROM idx a JOIN idx b
           ON a.event_type = b.event_type AND a.t <> b.t
         GROUP BY 1, 2, 3),
       dd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS d_days
              FROM d GROUP BY 1),
       u AS (
         SELECT event_type, day, t,
           CAST(sum(v) OVER (PARTITION BY event_type ORDER BY t
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u
         FROM votes),
       uf AS (
         SELECT u.event_type, u.day, u.t, u.u, dd.d_days
         FROM u JOIN dd ON u.event_type = dd.event_type
         WHERE u.t < dd.d_days),
       k AS (
         SELECT event_type, d_days, CAST(max(abs(u)) AS BIGINT) AS k_stat
         FROM uf GROUP BY 1, 2),
       att AS (
         SELECT uf.event_type, k.k_stat, arg_min(uf.day, uf.t) AS change_day
         FROM uf JOIN k ON uf.event_type = k.event_type
           AND abs(uf.u) = k.k_stat
         GROUP BY 1, 2),
       f AS (
         SELECT dd.event_type, dd.d_days, coalesce(att.k_stat, 0) AS k_stat,
           att.change_day
         FROM dd LEFT JOIN att ON dd.event_type = att.event_type)
       SELECT event_type, d_days, k_stat, change_day,
         round(CAST(least(1.0, 2.0 * exp(-6.0 * k_stat::DOUBLE
           * k_stat::DOUBLE / (d_days::DOUBLE * d_days::DOUBLE
             * d_days::DOUBLE + d_days::DOUBLE * d_days::DOUBLE)))
           AS DECIMAL(18,8)), 6)::DOUBLE AS p_approx
       FROM f ORDER BY event_type"""

  /** BH step-up FDR control over the per-type Pettitt p panel: the
    * pettitt readout as a CTE, ordinal rank with key tie-break, min
    * envelope of p·m/rank over ranks at-or-above — shared by
    * `stats_fdr_bh` and its streaming twin (both stages batch-exact).
    */
  lazy val fdrOracleSql =
    s"""WITH panel AS ($pettittOracleSql),
       base AS (
         SELECT CAST(event_type AS VARCHAR) AS key, p_approx::DOUBLE AS p
         FROM panel WHERE p_approx IS NOT NULL),
       m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM base),
       ranked AS (
         SELECT a.key, a.p, CAST(count(*) AS BIGINT) AS rank
         FROM base a JOIN base b
           ON (b.p < a.p OR (b.p = a.p AND b.key <= a.key))
         GROUP BY 1, 2),
       rawv AS (
         SELECT rank AS rj, p * m.m::DOUBLE / rank::DOUBLE AS raw
         FROM ranked, m),
       env AS (
         SELECT r.key, r.p, r.rank, min(rawv.raw) AS env
         FROM ranked r JOIN rawv ON rawv.rj >= r.rank
         GROUP BY 1, 2, 3)
       SELECT key, p, rank,
         round(CAST(least(env, 1.0) AS DECIMAL(18,8)), 6)::DOUBLE AS p_bh,
         least(env, 1.0) <= 0.05 AS reject
       FROM env ORDER BY key"""

  /** Bonferroni/Holm/BY replay over the same Pettitt panel: the fdr
    * oracle's ordinal rank, a step-DOWN max envelope for Holm, BH's
    * step-UP min envelope inflated by the decimal-staged harmonic
    * constant for BY — shared by `stats_padjust` and `stream_padjust`.
    */
  lazy val padjustOracleSql =
    s"""WITH panel AS ($pettittOracleSql),
       base AS (
         SELECT CAST(event_type AS VARCHAR) AS key, p_approx::DOUBLE AS p
         FROM panel WHERE p_approx IS NOT NULL),
       m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM base),
       ranked AS (
         SELECT a.key, a.p, CAST(count(*) AS BIGINT) AS rank
         FROM base a JOIN base b
           ON (b.p < a.p OR (b.p = a.p AND b.key <= a.key))
         GROUP BY 1, 2),
       cm AS (
         SELECT sum(CAST(1.0 / rank::DOUBLE AS DECIMAL(28,10))) AS cm
         FROM ranked),
       hraw AS (
         SELECT rank AS rj, (m.m - rank + 1)::DOUBLE * p AS rawh
         FROM ranked, m),
       byraw AS (
         SELECT rank AS rj,
           p * (m.m::DOUBLE * cm.cm::DOUBLE) / rank::DOUBLE AS rawby
         FROM ranked, m, cm),
       henv AS (
         SELECT r.key, max(hraw.rawh) AS envh
         FROM ranked r JOIN hraw ON hraw.rj <= r.rank GROUP BY 1),
       byenv AS (
         SELECT r.key, min(byraw.rawby) AS envby
         FROM ranked r JOIN byraw ON byraw.rj >= r.rank GROUP BY 1)
       SELECT r.key, r.p, r.rank,
         round(CAST(least(r.p * m.m::DOUBLE, 1.0) AS DECIMAL(18,8)), 6)::DOUBLE
           AS p_bonf,
         round(CAST(least(henv.envh, 1.0) AS DECIMAL(18,8)), 6)::DOUBLE
           AS p_holm,
         round(CAST(least(byenv.envby, 1.0) AS DECIMAL(18,8)), 6)::DOUBLE
           AS p_by
       FROM ranked r JOIN henv ON henv.key = r.key
         JOIN byenv ON byenv.key = r.key, m
       ORDER BY r.key"""

  /** Holt linear-smoothing replay: the A^e / A^e·c weight constants are
    * EMBEDDED from the same [[graft.functions.Events.holtWeights]] run
    * the Spark plan broadcasts, each weight·count term staged to
    * DECIMAL(28,10) before the exact sum — shared by `events_holt` and
    * its streaming twin (the recursion is linear in the additive daily
    * counts).
    */
  lazy val holtOracleSql: String = {
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val rows = graft.functions.Events.holtWeights(0.5, 0.5, 64)
      .map { case (e, v1, v2, w11, w12, w21, w22) =>
        s"($e, ${d(v1)}, ${d(v2)}, ${d(w11)}, ${d(w12)}, ${d(w21)}, ${d(w22)})"
      }.mkString(", ")
    s"""WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       pw AS (SELECT * FROM (VALUES $rows)
              AS t(e, v1, v2, w11, w12, w21, w22)),
       idx AS (
         SELECT event_type, n,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
             AS BIGINT) AS t
         FROM d),
       mt AS (
         SELECT event_type, max(t) AS tt, CAST(count(*) AS BIGINT) AS d_days,
           max(CASE WHEN t = 1 THEN n END) AS y1,
           max(CASE WHEN t = 2 THEN n END) AS y2
         FROM idx GROUP BY 1),
       terms AS (
         SELECT idx.event_type,
           sum(CAST(pw.v1 * idx.n AS DECIMAL(28,10))) AS sl,
           sum(CAST(pw.v2 * idx.n AS DECIMAL(28,10))) AS sb
         FROM idx JOIN mt ON idx.event_type = mt.event_type
           JOIN pw ON pw.e = mt.tt - idx.t
         WHERE idx.t >= 2 GROUP BY 1),
       ini AS (
         SELECT mt.event_type,
           CAST(pw.w11 * mt.y1 AS DECIMAL(28,10))
             + CAST(pw.w12 * (mt.y2 - mt.y1) AS DECIMAL(28,10)) AS il,
           CAST(pw.w21 * mt.y1 AS DECIMAL(28,10))
             + CAST(pw.w22 * (mt.y2 - mt.y1) AS DECIMAL(28,10)) AS ib
         FROM mt JOIN pw ON pw.e = mt.tt - 1 WHERE mt.tt >= 2)
       SELECT mt.event_type, mt.d_days,
         CASE WHEN mt.tt = 1
              THEN round(CAST(mt.y1 AS DECIMAL(28,10)), 6)::DOUBLE
              ELSE round(CAST(terms.sl + ini.il AS DECIMAL(28,10)), 6)::DOUBLE
         END AS level,
         CASE WHEN mt.tt = 1 THEN NULL
              ELSE round(CAST(terms.sb + ini.ib AS DECIMAL(28,10)), 6)::DOUBLE
         END AS trend,
         CASE WHEN mt.tt = 1 THEN NULL
              ELSE round(CAST(terms.sl + ini.il + terms.sb + ini.ib
                AS DECIMAL(28,10)), 6)::DOUBLE
         END AS forecast
       FROM mt LEFT JOIN terms ON mt.event_type = terms.event_type
         LEFT JOIN ini ON mt.event_type = ini.event_type
       ORDER BY mt.event_type"""
  }

  /** seasonal-naive forecast replay: daily counts, lag-7 self-join,
    * decimal-staged MAE/MAPE — shared by `events_forecast` and its
    * streaming twin `stream_forecast` (daily counts are additive, so the
    * accreted state equals the one-pass count table).
    */
  val forecastOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       j AS (
         SELECT a.event_type, a.n, b.n AS f, abs(a.n - b.n) AS ae
         FROM d a JOIN d b
           ON a.event_type = b.event_type
          AND b.day = a.day - 7)
       SELECT event_type, count(*) AS n_days,
         round(CAST(CAST(sum(ae) AS DOUBLE) / count(*) AS DECIMAL(18,8)), 4)::DOUBLE
           AS mae,
         round(CAST(CAST(sum(CAST(ae::DOUBLE / n AS DECIMAL(18,8))) AS DOUBLE)
           / count(*) AS DECIMAL(18,8)), 4)::DOUBLE AS mape
       FROM j GROUP BY event_type ORDER BY event_type"""

  /** MASE replay: daily counts, lag-7 calendar self-join for the
    * seasonal errors, ONE keyed lag window for the naive scale, exact
    * integers to the three final divisions — shared by `events_mase`
    * and its streaming twin `stream_mase` (daily counts are additive).
    */
  val maseOracleSql =
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       fc AS (
         SELECT a.event_type, count(*) AS n_fc,
           CAST(sum(abs(a.n - b.n)) AS BIGINT) AS sae_fc
         FROM d a JOIN d b
           ON a.event_type = b.event_type AND b.day = a.day - 7
         GROUP BY 1),
       nv AS (
         SELECT event_type, count(*) AS n_naive,
           CAST(sum(abs(n - prev)) AS BIGINT) AS sae_nv
         FROM (
           SELECT event_type, n,
             lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev
           FROM d)
         WHERE prev IS NOT NULL GROUP BY 1)
       SELECT fc.event_type, n_fc, n_naive,
         round(CAST(CAST(sae_fc AS DOUBLE) / CAST(n_fc AS DOUBLE)
           AS DECIMAL(18,8)), 4)::DOUBLE AS mae_fc,
         round(CAST(CAST(sae_nv AS DOUBLE) / CAST(n_naive AS DOUBLE)
           AS DECIMAL(18,8)), 4)::DOUBLE AS mae_naive,
         CASE WHEN sae_nv = 0 THEN NULL
           ELSE round(CAST(CAST(sae_fc AS DOUBLE) / CAST(n_fc AS DOUBLE)
             / (CAST(sae_nv AS DOUBLE) / CAST(n_naive AS DOUBLE))
             AS DECIMAL(18,8)), 6)::DOUBLE END AS mase
       FROM fc JOIN nv ON fc.event_type = nv.event_type
       ORDER BY fc.event_type"""

  /** exact-Gini replay (count-of-counts, cumulative self-join, decimal
    * trapezoid) — shared by `stats_gini` and `stream_gini` (per-key counts
    * are additive, so the accreted state equals the one-pass table).
    */
  val giniOracleSql =
    """WITH counts AS (
         SELECT user_id, count(*) AS c FROM events GROUP BY 1),
       coc AS (SELECT c, count(*) AS nk FROM counts GROUP BY 1),
       cum AS (
         SELECT a.c, a.nk,
           CAST(sum(CAST(b.c AS DECIMAL(38,0)) * b.nk) AS DECIMAL(38,0)) AS cm
         FROM coc a JOIN coc b ON b.c <= a.c GROUP BY a.c, a.nk),
       s AS (
         SELECT CAST(sum(CAST(nk AS DECIMAL(38,0)) *
           (cm * 2 - CAST(c AS DECIMAL(38,0)) * nk)) AS DECIMAL(38,0)) AS t
         FROM cum),
       tot AS (
         SELECT CAST(sum(nk) AS BIGINT) AS keys,
           CAST(sum(CAST(c AS DECIMAL(38,0)) * nk) AS DECIMAL(38,0)) AS m
         FROM coc)
       SELECT keys AS n_keys, CAST(m AS BIGINT) AS total,
         round(CAST(1.0 - CAST(t AS DOUBLE) /
           (CAST(keys AS DOUBLE) * CAST(m AS DOUBLE)) AS DECIMAL(18,8)), 6)::DOUBLE
           AS gini
       FROM tot CROSS JOIN s"""

  /** key-skew replay (count table, totals, top-k) — shared by
    * `stats_key_skew` and `stream_key_skew` (same additivity argument).
    */
  val keySkewOracleSql =
    """WITH c AS (
         SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY 1),
       t AS (
         SELECT CAST(sum(cnt) AS BIGINT) AS tot, count(*) AS keys,
           CAST(max(cnt) AS BIGINT) AS mx
         FROM c)
       SELECT key, cnt,
         round(CAST(cnt::DOUBLE / tot AS DECIMAL(18,8)), 6)::DOUBLE AS share,
         CAST(keys AS BIGINT) AS n_keys,
         round(CAST(mx::DOUBLE * keys / tot AS DECIMAL(18,8)), 4)::DOUBLE
           AS skew
       FROM c CROSS JOIN t ORDER BY cnt DESC, key LIMIT 20"""

  def bpeApplyOracleSql(nMerges: Int): String =
    s"""WITH ${bpeRoundsCtes(nMerges)}
       SELECT sym AS symbol, CAST(sum(cnt) AS BIGINT) AS total_count,
         CAST(count(DISTINCT s) AS BIGINT) AS n_word_types
       FROM (
         SELECT cnt, s,
           unnest(list_filter(string_split(s, '||'), x -> x <> '')) AS sym
         FROM s$nMerges)
       GROUP BY sym ORDER BY symbol"""

  /** CMS replay: md5-derived 4×512 counters over the token stream, top-20
    * point queries — shared by `sketch_cms` and its streaming twin
    * `stream_cms` (the sketch is linear, so the accreted cells equal the
    * one-pass build bit-for-bit).
    */
  val cmsOracleSql =
    s"""WITH tk AS (
         SELECT tok FROM (
           SELECT unnest(string_split($normSql, ' ')) AS tok FROM documents)
         WHERE tok <> ''),
       js AS (SELECT unnest(range(0, 4)) AS j),
       h AS (
         SELECT tok, j,
           ('0x'||substr(md5(tok || 'cms' || j::VARCHAR),1,15))::BIGINT % 512 AS pos
         FROM tk CROSS JOIN js),
       cnt AS (SELECT j, pos, count(*) AS c FROM h GROUP BY j, pos),
       truec AS (SELECT tok, count(*) AS true_cnt FROM tk GROUP BY tok),
       top AS (SELECT tok, true_cnt FROM truec ORDER BY true_cnt DESC, tok LIMIT 20),
       look AS (
         SELECT t.tok, js.j,
           ('0x'||substr(md5(t.tok || 'cms' || js.j::VARCHAR),1,15))::BIGINT % 512 AS pos
         FROM top t CROSS JOIN js),
       est AS (
         SELECT tok, min(coalesce(c, 0)) AS cms_est
         FROM look LEFT JOIN cnt USING (j, pos) GROUP BY tok)
       SELECT top.tok AS token, CAST(true_cnt AS BIGINT) AS true_cnt,
         CAST(cms_est AS BIGINT) AS cms_est
       FROM top JOIN est USING (tok) ORDER BY token"""

  /** entry-path replay: ranking window + per-user ordered list rollup —
    * shared by `events_paths` and its streaming twin `stream_paths`.
    */
  val entryPathsOracleSql =
    """WITH r AS (
         SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS rn
         FROM events),
       p AS (
         SELECT user_id,
           array_to_string(list(event_type ORDER BY rn), '>') AS path,
           CAST(max(rn) AS INT) AS depth
         FROM r WHERE rn <= 3 GROUP BY user_id)
       SELECT path, depth, count(*) AS n_users
       FROM p GROUP BY path, depth ORDER BY path"""

  /** kappa oracle: quality-score and token-count flag replays into the 2×2
    * confusion row, po/pe rounded before κ — shared by the batch operator
    * and its streaming twin (additive confusion counts)
    */
  /** shared confusion-row CTE chain (quality-score and token-count filter
    * replays down to the 2×2 row `k`) — the state both `kappa` and
    * `mcnemar` oracles read.
    */
  lazy val confusionCteSql =
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
         FROM norm),
       f AS (
         SELECT
           round(CAST(least(length(text) / 500.0, 1.0) * 0.4
             + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
             + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                           ELSE npunct::DOUBLE / length(text) END) * 0.3
             AS DECIMAL(18,8)), 4)::DOUBLE >= 0.5 AS a,
           ntok >= 25 AS b
         FROM c),
       k AS (
         SELECT count(*) AS n,
           sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n11,
           sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n10,
           sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS n01,
           sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n00
         FROM f)"""

  lazy val kappaOracleSql = confusionCteSql +
    """,
       p AS (
         SELECT n, n11, n10, n01, n00,
           round(CAST((n11 + n00)::DOUBLE / n::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE AS po,
           round(CAST(((n11 + n10)::DOUBLE * (n11 + n01)::DOUBLE
             + (n01 + n00)::DOUBLE * (n10 + n00)::DOUBLE) / (n::DOUBLE * n::DOUBLE)
             AS DECIMAL(18,8)), 6)::DOUBLE AS pe
         FROM k)
       SELECT n, n11, n10, n01, n00, po, pe,
         round(CAST(CASE WHEN pe >= 1.0 THEN 0.0
           ELSE (po - pe) / (1.0 - pe) END AS DECIMAL(18,8)), 6)::DOUBLE AS kappa
       FROM p"""

  /** Scott's π / Gwet's AC1 replay (same confusion-row CTE as kappa; the
    * pooled trait prevalence feeds both chance terms, po and the chance
    * terms 6dp-rounded BEFORE the index forms) — shared by `curate_gwet`
    * and `stream_gwet` (the confusion row is the additive KappaMonitor
    * state).
    */
  lazy val gwetOracleSql = confusionCteSql +
    """,
       r AS (
         SELECT n,
           round(CAST((n11 + n00)::DOUBLE / n::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE AS po,
           ((n11 + n10)::DOUBLE / n::DOUBLE
             + (n11 + n01)::DOUBLE / n::DOUBLE) / 2.0 AS pib
         FROM k),
       r2 AS (
         SELECT n, po,
           round(CAST(pib * pib + (1.0 - pib) * (1.0 - pib)
             AS DECIMAL(18,8)), 6)::DOUBLE AS pe_scott,
           round(CAST(2.0 * pib * (1.0 - pib)
             AS DECIMAL(18,8)), 6)::DOUBLE AS pe_gwet
         FROM r)
       SELECT n, po, pe_scott,
         round(CAST(CASE WHEN pe_scott >= 1.0 THEN 0.0
           ELSE (po - pe_scott) / (1.0 - pe_scott) END
           AS DECIMAL(18,8)), 6)::DOUBLE AS scott_pi,
         pe_gwet,
         round(CAST(CASE WHEN pe_gwet >= 1.0 THEN 0.0
           ELSE (po - pe_gwet) / (1.0 - pe_gwet) END
           AS DECIMAL(18,8)), 6)::DOUBLE AS gwet_ac1
       FROM r2"""

  /** McNemar replay (same confusion-row CTE as kappa; signed z over the
    * discordant pair, Edwards-corrected χ² clamped at 0) — shared by
    * `curate_mcnemar` and `stream_mcnemar` (the confusion row is the
    * additive KappaMonitor state).
    */
  lazy val mcnemarOracleSql = confusionCteSql +
    """
       SELECT n, n10, n01,
         CASE WHEN n10 + n01 = 0 THEN NULL
              ELSE round(CAST((n10 - n01)::DOUBLE
                / sqrt((n10 + n01)::DOUBLE) AS DECIMAL(18,8)), 6)::DOUBLE
              END AS z,
         CASE WHEN n10 + n01 = 0 THEN NULL
              ELSE round(CAST(
                greatest(abs(n10 - n01)::DOUBLE - 1.0, 0.0)
                  * greatest(abs(n10 - n01)::DOUBLE - 1.0, 0.0)
                  / (n10 + n01)::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE
              END AS chi2
       FROM k"""

  /** Cochran's Q replay (same quality/token filter replays plus the
    * length cap, per-row R_i, exact-integer numerator and denominator,
    * one divide) — shared by `curate_cochranq` and `stream_cochranq`
    * (the 1-row panel state is additive).
    */
  /** Krippendorff alpha replay: the SAME panel-count staging as the
    * Cochran/Fleiss oracles, then D_o from exact integers and D_e from
    * HUGEINT-staged total-vote products; alpha from the 6dp-rounded
    * pieces — shared by `curate_krippendorff` and its streaming twin.
    */
  lazy val krippendorffOracleSql =
    s"""WITH norm AS (
         SELECT doc_id, text, n_chars, string_split($normSql, ' ') AS toks,
           $normSql AS nt
         FROM documents),
       c AS (
         SELECT doc_id, text, n_chars,
           CASE WHEN length(nt) = 0 THEN 0
                ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
           len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS nstop,
           length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS npunct
         FROM norm),
       f AS (
         SELECT
           round(CAST(least(length(text) / 500.0, 1.0) * 0.4
             + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
             + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                           ELSE npunct::DOUBLE / length(text) END) * 0.3
             AS DECIMAL(18,8)), 4)::DOUBLE >= 0.5 AS f1,
           ntok >= 25 AS f2,
           n_chars <= 500 AS f3
         FROM c),
       r AS (
         SELECT (CASE WHEN f1 THEN 1 ELSE 0 END
           + CASE WHEN f2 THEN 1 ELSE 0 END
           + CASE WHEN f3 THEN 1 ELSE 0 END) AS ri
         FROM f),
       a AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(ri) AS BIGINT) AS sr, CAST(sum(ri * ri) AS BIGINT) AS sr2
         FROM r),
       s AS (
         SELECT n,
           round(CAST((2 * (3 * sr - sr2))::DOUBLE
             / (n::HUGEINT * 6)::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE AS d_o,
           round(CAST((2::HUGEINT * sr::HUGEINT
               * (n::HUGEINT * 3 - sr::HUGEINT))::DOUBLE
             / ((n::HUGEINT * 3) * (n::HUGEINT * 3 - 1))::DOUBLE
             AS DECIMAL(18,8)), 6)::DOUBLE AS d_e
         FROM a)
       SELECT 3::BIGINT AS k, n, d_o, d_e,
         CASE WHEN d_e <= 0.0 THEN NULL
              ELSE round(CAST(1.0 - d_o / d_e AS DECIMAL(18,8)), 6)::DOUBLE
         END AS alpha
       FROM s"""

  /** two-proportion sample-size plan: the same per-arm exact count pairs
    * as the twoprop oracle, 6dp-rounded p's, and the z-sum-squared
    * constant embedded from the IDENTICAL Scala value — shared by
    * `stats_power_twoprop` and its streaming twin.
    */
  lazy val powerOracleSql =
    s"""WITH a AS (
           SELECT count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
           FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15'),
         b AS (
           SELECT count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
           FROM events WHERE CAST(ts AS DATE) > DATE '2024-01-15'),
         m AS (
           SELECT a.n AS n_a, b.n AS n_b,
             round(CAST(a.x::DOUBLE / a.n::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE AS p_a,
             round(CAST(b.x::DOUBLE / b.n::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE AS p_b
           FROM a CROSS JOIN b)
         SELECT n_a, n_b, p_a, p_b,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE round(CAST(p_a - p_b AS DECIMAL(18,8)), 6)::DOUBLE
           END AS effect,
           CASE WHEN n_a = 0 OR n_b = 0 OR p_a = p_b THEN NULL
                ELSE CAST(ceil(CAST(
                  CAST('${graft.functions.Stats.zSumSq80At05}' AS DOUBLE)
                    * (p_a * (1.0 - p_a) + p_b * (1.0 - p_b))
                    / ((p_a - p_b) * (p_a - p_b))
                  AS DECIMAL(28,8))) AS BIGINT)
           END AS n_per_arm
         FROM m"""

  /** vocabulary richness: token counts -> frequency-of-frequency row ->
    * Chao1 (bias-corrected) and Good-Turing unseen mass from exact
    * integers in fixed double order.
    */
  lazy val vocabRichnessOracleSql =
    s"""WITH norm AS (SELECT string_split($normSql, ' ') AS toks FROM documents),
       tk AS (SELECT unnest(list_filter(toks, t -> len(t) > 0)) AS tok FROM norm),
       tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
       a AS (
         SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS distinct_tokens,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
         FROM tf)
       SELECT n_tokens, distinct_tokens, f1, f2,
         round(CAST(distinct_tokens::DOUBLE
           + (f1 * (f1 - 1))::DOUBLE / (2.0 * (f2 + 1)::DOUBLE)
           AS DECIMAL(18,8)), 6)::DOUBLE AS chao1,
         CASE WHEN coalesce(n_tokens, 0) = 0 THEN NULL
              ELSE round(CAST(f1::DOUBLE / n_tokens::DOUBLE
                AS DECIMAL(18,8)), 6)::DOUBLE
         END AS gt_unseen
       FROM a"""

  /** Zipf fit: token counts -> count-of-counts -> midpoint ranks via the
    * triangular join -> weighted OLS of ln(freq) on ln(rank), every
    * moment decimal-staged and every double op mirroring the Column tree.
    */
  lazy val zipfOracleSql =
    s"""WITH norm AS (SELECT string_split($normSql, ' ') AS toks FROM documents),
       tk AS (SELECT unnest(list_filter(toks, t -> len(t) > 0)) AS tok FROM norm),
       tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
       coc AS (SELECT c, CAST(count(*) AS BIGINT) AS nk FROM tf GROUP BY 1),
       rk AS (
         SELECT a.c, a.nk,
           coalesce(sum(b.nk), 0)::DOUBLE + (a.nk::DOUBLE + 1.0) / 2.0 AS r
         FROM coc a LEFT JOIN coc b ON b.c > a.c
         GROUP BY a.c, a.nk),
       mo AS (
         SELECT CAST(sum(CAST(c AS DECIMAL(38,0)) * nk) AS BIGINT) AS n_tokens,
           CAST(sum(nk) AS BIGINT) AS vocab,
           count(*) AS groups,
           sum(CAST(nk * ln(r) AS DECIMAL(28,10))) AS swx,
           sum(CAST(nk * ln(c::DOUBLE) AS DECIMAL(28,10))) AS swy,
           sum(CAST(nk * ln(r) * ln(r) AS DECIMAL(28,10))) AS swxx,
           sum(CAST(nk * ln(c::DOUBLE) * ln(c::DOUBLE) AS DECIMAL(28,10)))
             AS swyy,
           sum(CAST(nk * ln(r) * ln(c::DOUBLE) AS DECIMAL(28,10))) AS swxy
         FROM rk),
       f AS (
         SELECT *, vocab::DOUBLE AS w,
           swxx::DOUBLE - swx::DOUBLE * swx::DOUBLE / vocab::DOUBLE AS sxx,
           swyy::DOUBLE - swy::DOUBLE * swy::DOUBLE / vocab::DOUBLE AS syy
         FROM mo),
       g AS (
         SELECT *, (swxy::DOUBLE - swx::DOUBLE * swy::DOUBLE / w) / sxx
           AS slope
         FROM f)
       SELECT n_tokens, vocab, groups,
         CASE WHEN groups < 2 THEN NULL
           ELSE round(CAST(slope AS DECIMAL(18,8)), 6)::DOUBLE END AS slope,
         CASE WHEN groups < 2 THEN NULL
           ELSE round(CAST(swy::DOUBLE / w - slope * swx::DOUBLE / w
             AS DECIMAL(18,8)), 6)::DOUBLE END AS intercept,
         CASE WHEN groups < 2 THEN NULL
           ELSE round(CAST(slope * slope * sxx / syy
             AS DECIMAL(18,8)), 6)::DOUBLE END AS r2
       FROM g"""

  /** Cochran–Armitage replay: week-of-month scored proportions, exact
    * DECIMAL(38,0)-staged moments, fixed-order z.
    */
  val cochranArmitageOracleSql =
    """WITH c AS (
         SELECT CAST(floor((day(ts) - 1) / 7.0) AS BIGINT) AS w,
           count(*) AS n,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS x
         FROM events
         WHERE floor((day(ts) - 1) / 7.0) IS NOT NULL
           AND (event_type = 'purchase') IS NOT NULL
         GROUP BY 1),
       a AS (
         SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS x,
           sum(CAST(w AS DECIMAL(38,0)) * x) AS swx,
           sum(CAST(w AS DECIMAL(38,0)) * n) AS swn,
           sum(CAST(w AS DECIMAL(38,0)) * w * n) AS snww
         FROM c)
       SELECT k, n, x,
         CASE WHEN k < 2 OR x = 0 OR x = n THEN NULL
           ELSE round(CAST(
             (swx::DOUBLE - x::DOUBLE / n::DOUBLE * swn::DOUBLE)
             / sqrt(x::DOUBLE / n::DOUBLE * (1.0 - x::DOUBLE / n::DOUBLE)
               * (snww::DOUBLE - swn::DOUBLE * swn::DOUBLE / n::DOUBLE))
             AS DECIMAL(18,8)), 6)::DOUBLE END AS z
       FROM a"""

  /** capture-recapture replay: distinct users per month half, overlap
    * join, Chapman's estimate + SE from exact DECIMAL(38,0)-staged
    * products in fixed double order.
    */
  val captureOracleSql =
    """WITH a AS (
         SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events
         WHERE CAST(ts AS DATE) <= DATE '2024-01-15'),
       b AS (
         SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events
         WHERE CAST(ts AS DATE) > DATE '2024-01-15'),
       t AS (SELECT
         (SELECT count(*) FROM a) AS n_a,
         (SELECT count(*) FROM b) AS n_b,
         (SELECT count(*) FROM a JOIN b USING (k)) AS m)
       SELECT n_a, n_b, m,
         round(CAST(
           CAST(CAST(n_a + 1 AS DECIMAL(38,0)) * CAST(n_b + 1 AS DECIMAL(38,0))
             AS DOUBLE) / CAST(m + 1 AS DOUBLE) - 1.0
           AS DECIMAL(28,8)), 4)::DOUBLE AS n_hat,
         round(CAST(sqrt(
             CAST(CAST(n_a + 1 AS DECIMAL(38,0))
               * CAST(n_b + 1 AS DECIMAL(38,0)) AS DOUBLE)
             * CAST(CAST(n_a - m AS DECIMAL(38,0))
               * CAST(n_b - m AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST(m + 1 AS DECIMAL(38,0)) * CAST(m + 1 AS DECIMAL(38,0))
               * CAST(m + 2 AS DECIMAL(38,0)) AS DOUBLE))
           AS DECIMAL(28,8)), 4)::DOUBLE AS se
       FROM t"""

  lazy val cochranOracleSql =
    s"""WITH norm AS (
         SELECT doc_id, text, n_chars, string_split($normSql, ' ') AS toks,
           $normSql AS nt
         FROM documents),
       c AS (
         SELECT doc_id, text, n_chars,
           CASE WHEN length(nt) = 0 THEN 0
                ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
           len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS nstop,
           length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS npunct
         FROM norm),
       f AS (
         SELECT
           round(CAST(least(length(text) / 500.0, 1.0) * 0.4
             + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
             + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                           ELSE npunct::DOUBLE / length(text) END) * 0.3
             AS DECIMAL(18,8)), 4)::DOUBLE >= 0.5 AS f1,
           ntok >= 25 AS f2,
           n_chars <= 500 AS f3
         FROM c),
       r AS (
         SELECT (CASE WHEN f1 THEN 1 ELSE 0 END
           + CASE WHEN f2 THEN 1 ELSE 0 END
           + CASE WHEN f3 THEN 1 ELSE 0 END) AS ri, f1, f2, f3
         FROM f),
       a AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(ri) AS BIGINT) AS sr, CAST(sum(ri * ri) AS BIGINT) AS sr2,
           CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
           CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
         FROM r),
       m AS (
         SELECT n, 3 * (c1 * c1 + c2 * c2 + c3 * c3) - sr * sr AS num,
           3 * sr - sr2 AS den
         FROM a)
       SELECT 3::BIGINT AS k, n, 2::BIGINT AS df,
         CASE WHEN den <= 0 THEN NULL
              ELSE round(CAST(2.0 * num::DOUBLE / den::DOUBLE
                AS DECIMAL(18,8)), 6)::DOUBLE END AS q
       FROM m"""

  /** Fleiss' kappa replay (same three-filter panel state as cochran,
    * exact-integer P-bar, fixed-order P-e, kappa from rounded pieces) —
    * shared by `curate_fleiss` and `stream_fleiss`.
    */
  lazy val fleissOracleSql =
    s"""WITH norm AS (
         SELECT doc_id, text, n_chars, string_split($normSql, ' ') AS toks,
           $normSql AS nt
         FROM documents),
       c AS (
         SELECT doc_id, text, n_chars,
           CASE WHEN length(nt) = 0 THEN 0
                ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
           len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS nstop,
           length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS npunct
         FROM norm),
       f AS (
         SELECT
           round(CAST(least(length(text) / 500.0, 1.0) * 0.4
             + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
             + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                           ELSE npunct::DOUBLE / length(text) END) * 0.3
             AS DECIMAL(18,8)), 4)::DOUBLE >= 0.5 AS f1,
           ntok >= 25 AS f2,
           n_chars <= 500 AS f3
         FROM c),
       r AS (
         SELECT (CASE WHEN f1 THEN 1 ELSE 0 END
           + CASE WHEN f2 THEN 1 ELSE 0 END
           + CASE WHEN f3 THEN 1 ELSE 0 END) AS ri
         FROM f),
       a AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(ri) AS BIGINT) AS sr, CAST(sum(ri * ri) AS BIGINT) AS sr2
         FROM r),
       m AS (
         SELECT n,
           round(CAST((2 * sr2 - 6 * sr + n * 6)::DOUBLE / (n * 6)::DOUBLE
             AS DECIMAL(18,8)), 6)::DOUBLE AS p_bar,
           round(CAST((sr::DOUBLE / (n::DOUBLE * 3.0))
               * (sr::DOUBLE / (n::DOUBLE * 3.0))
             + (1.0 - sr::DOUBLE / (n::DOUBLE * 3.0))
               * (1.0 - sr::DOUBLE / (n::DOUBLE * 3.0))
             AS DECIMAL(18,8)), 6)::DOUBLE AS p_e
         FROM a)
       SELECT 3::BIGINT AS k, n, p_bar, p_e,
         round(CAST(CASE WHEN p_e >= 1.0 THEN 0.0
           ELSE (p_bar - p_e) / (1.0 - p_e) END AS DECIMAL(18,8)),
           6)::DOUBLE AS kappa
       FROM m"""

  /** P/R/F1 oracle: score/label replays, per-threshold conditional
    * sums unpivoted, integer-exact F1 — shared by the batch operator
    * and the streaming operating-points readout
    */
  lazy val prCurveOracleSql =
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
           FROM norm),
         lab AS (
           SELECT doc_id,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE >= 0.5 AS y
           FROM c),
         tk AS (
           SELECT doc_id, unnest(list_filter(toks, t -> len(t) > 0)) AS tok
           FROM norm),
         w AS (
           SELECT doc_id,
             CAST(sum(('0x'||substr(md5(tok || 'clf-v1'),1,15))::BIGINT % 2000001 - 1000000)
               AS BIGINT) AS s
           FROM tk GROUP BY doc_id),
         sc AS (
           SELECT norm.doc_id, coalesce(w.s, 0) AS s
           FROM norm LEFT JOIN w ON norm.doc_id = w.doc_id),
         j AS (SELECT sc.s, lab.y FROM sc JOIN lab ON sc.doc_id = lab.doc_id),
         k AS (
           SELECT
             sum(CASE WHEN y AND s >= -2000000.0 THEN 1 ELSE 0 END)::BIGINT AS tp0,
             sum(CASE WHEN NOT y AND s >= -2000000.0 THEN 1 ELSE 0 END)::BIGINT AS fp0,
             sum(CASE WHEN y AND s < -2000000.0 THEN 1 ELSE 0 END)::BIGINT AS fn0,
             sum(CASE WHEN y AND s >= 0.0 THEN 1 ELSE 0 END)::BIGINT AS tp1,
             sum(CASE WHEN NOT y AND s >= 0.0 THEN 1 ELSE 0 END)::BIGINT AS fp1,
             sum(CASE WHEN y AND s < 0.0 THEN 1 ELSE 0 END)::BIGINT AS fn1,
             sum(CASE WHEN y AND s >= 2000000.0 THEN 1 ELSE 0 END)::BIGINT AS tp2,
             sum(CASE WHEN NOT y AND s >= 2000000.0 THEN 1 ELSE 0 END)::BIGINT AS fp2,
             sum(CASE WHEN y AND s < 2000000.0 THEN 1 ELSE 0 END)::BIGINT AS fn2
           FROM j),
         u AS (
           SELECT -2000000.0::DOUBLE AS threshold, tp0 AS tp, fp0 AS fp, fn0 AS fn FROM k
           UNION ALL SELECT 0.0::DOUBLE, tp1, fp1, fn1 FROM k
           UNION ALL SELECT 2000000.0::DOUBLE, tp2, fp2, fn2 FROM k)
         SELECT threshold, tp, fp, fn,
           CASE WHEN tp + fp = 0 THEN NULL
             ELSE round(CAST(tp::DOUBLE / (tp + fp)::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE
             END AS prec,
           CASE WHEN tp + fn = 0 THEN NULL
             ELSE round(CAST(tp::DOUBLE / (tp + fn)::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE
             END AS recall,
           CASE WHEN 2*tp + fp + fn = 0 THEN NULL
             ELSE round(CAST((2*tp)::DOUBLE / (2*tp + fp + fn)::DOUBLE
               AS DECIMAL(18,8)), 6)::DOUBLE END AS f1
         FROM u ORDER BY threshold"""

  /** bootstrap oracle: same md5 buckets, same inverse-CDF weight
    * thresholds, exact decimal weighted sums — shared by the batch
    * operator and its streaming twin (linear replicate moments)
    */
  /** PSI oracle: same bin tables, add-one smoothing, fixed-order
    * (pa−pb)·ln(pa/pb) terms decimal-staged before the sum — shared by the
    * batch operator and its streaming twin (additive bin counts)
    */
  lazy val psiOracleSql =
      """WITH a AS (
           SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS ca
           FROM events WHERE event_type = 'click' GROUP BY 1),
         b AS (
           SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS cb
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         j AS (
           SELECT coalesce(a.bin, b.bin) AS bin,
             coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
           FROM a FULL OUTER JOIN b ON a.bin = b.bin),
         t AS (
           SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
             count(*) AS k FROM j),
         terms AS (
           SELECT na, nb,
             CAST((pa - pb) * ln(pa / pb) AS DECIMAL(28,10)) AS term
           FROM (
             SELECT na, nb,
               (ca + 1)::DOUBLE / (na + k)::DOUBLE AS pa,
               (cb + 1)::DOUBLE / (nb + k)::DOUBLE AS pb
             FROM j CROSS JOIN t))
         SELECT count(*) AS n_bins, na AS n_a, nb AS n_b,
           round(sum(term), 6)::DOUBLE AS psi
         FROM terms GROUP BY na, nb"""

  lazy val bootOracleSql =
      """WITH reps AS (SELECT unnest(generate_series(0, 15)) AS rep),
         w AS (
           SELECT rep, o_totalprice,
             ('0x'||substr(md5(o_orderkey::VARCHAR || 'boot' || rep::VARCHAR),1,15))::BIGINT
               % 1000000000 AS bkt
           FROM orders CROSS JOIN reps),
         wt AS (
           SELECT rep, o_totalprice,
             CASE WHEN bkt < 367879441 THEN 0 WHEN bkt < 735758882 THEN 1
                  WHEN bkt < 919698603 THEN 2 WHEN bkt < 981011843 THEN 3
                  WHEN bkt < 996340153 THEN 4 WHEN bkt < 999405815 THEN 5
                  WHEN bkt < 999916759 THEN 6 ELSE 7 END AS w
           FROM w)
         SELECT CAST(rep AS INT) AS rep, CAST(sum(w) AS BIGINT) AS n_eff,
           round(CAST(CAST(sum(w * CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             / sum(w) AS DECIMAL(18,8)), 4)::DOUBLE AS boot_mean
         FROM wt GROUP BY rep ORDER BY rep"""

  /** reliability oracle: score/label replays binned at the fixed width,
    * one rate divide per bin — shared by the batch operator and the
    * streaming calibration readout
    */
  lazy val reliabilityOracleSql =
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
           FROM norm),
         lab AS (
           SELECT doc_id,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE >= 0.5 AS y
           FROM c),
         tk AS (
           SELECT doc_id, unnest(list_filter(toks, t -> len(t) > 0)) AS tok
           FROM norm),
         w AS (
           SELECT doc_id,
             CAST(sum(('0x'||substr(md5(tok || 'clf-v1'),1,15))::BIGINT % 2000001 - 1000000)
               AS BIGINT) AS s
           FROM tk GROUP BY doc_id),
         sc AS (
           SELECT norm.doc_id, coalesce(w.s, 0) AS s
           FROM norm LEFT JOIN w ON norm.doc_id = w.doc_id),
         j AS (SELECT floor(sc.s::DOUBLE / 2000000.0::DOUBLE)::BIGINT AS bin, lab.y
           FROM sc JOIN lab ON sc.doc_id = lab.doc_id)
         SELECT bin, bin * 2000000.0::DOUBLE AS lo, count(*) AS n,
           sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_pos,
           round(CAST(sum(CASE WHEN y THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE
             AS DECIMAL(18,8)), 6)::DOUBLE AS rate
         FROM j GROUP BY bin ORDER BY bin"""

  /** AUC oracle: micro-sum and quality-label replays into the per-score
    * count table, rank-sum with HUGEINT-exact doubled U — shared by the
    * batch operator and its streaming twin (additive per-score counts)
    */
  lazy val aucOracleSql =
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
           FROM norm),
         lab AS (
           SELECT doc_id,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE >= 0.5 AS y
           FROM c),
         tk AS (
           SELECT doc_id, unnest(list_filter(toks, t -> len(t) > 0)) AS tok
           FROM norm),
         w AS (
           SELECT doc_id,
             CAST(sum(('0x'||substr(md5(tok || 'clf-v1'),1,15))::BIGINT % 2000001 - 1000000)
               AS BIGINT) AS s
           FROM tk GROUP BY doc_id),
         sc AS (
           SELECT norm.doc_id, coalesce(w.s, 0) AS s
           FROM norm LEFT JOIN w ON norm.doc_id = w.doc_id),
         j AS (SELECT sc.s, lab.y FROM sc JOIN lab ON sc.doc_id = lab.doc_id),
         counts AS (
           SELECT s, sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS p,
             sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS nn
           FROM j GROUP BY s),
         cum AS (
           SELECT p, nn, sum(nn) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
           FROM counts),
         u AS (
           SELECT sum(p::HUGEINT * (2*(cn - nn) + nn)::HUGEINT) AS u2,
             sum(p) AS np, sum(nn) AS nneg
           FROM cum)
         SELECT CAST(np AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
           CASE WHEN np = 0 OR nneg = 0 THEN NULL
             ELSE round(CAST(u2::DOUBLE / (2.0::DOUBLE * np::DOUBLE * nneg::DOUBLE)
               AS DECIMAL(18,8)), 6)::DOUBLE END AS auc
         FROM u"""

  /** gains/lift replay: the same classifier score + quality label count
    * table as the AUC oracle, cumulated top-first, decile boundary rows
    * via conditional mins — shared by `curate_gains` and `stream_gains`
    * (the per-score counts are additive).
    */
  lazy val gainsOracleSql =
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
           FROM norm),
         lab AS (
           SELECT doc_id,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE >= 0.5 AS y
           FROM c),
         tk AS (
           SELECT doc_id, unnest(list_filter(toks, t -> len(t) > 0)) AS tok
           FROM norm),
         w AS (
           SELECT doc_id,
             CAST(sum(('0x'||substr(md5(tok || 'clf-v1'),1,15))::BIGINT % 2000001 - 1000000)
               AS BIGINT) AS s
           FROM tk GROUP BY doc_id),
         sc AS (
           SELECT norm.doc_id, coalesce(w.s, 0) AS s
           FROM norm LEFT JOIN w ON norm.doc_id = w.doc_id),
         j AS (SELECT sc.s, lab.y FROM sc JOIN lab ON sc.doc_id = lab.doc_id),
         counts AS (
           SELECT s, sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS p,
             sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS nn
           FROM j GROUP BY s),
         cum AS (
           SELECT s, p, nn,
             CAST(sum(p) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cp,
             CAST(sum(p + nn) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS ct
           FROM counts),
         tot AS (
           SELECT CAST(sum(p) AS BIGINT) AS tp, CAST(sum(nn) AS BIGINT) AS tn
           FROM counts),
         dec AS (SELECT unnest(generate_series(1, 10)) AS d),
         sel AS (
           SELECT dec.d AS decile, tp, tn,
             min(CASE WHEN ct >= CAST(floor((((tp + tn) * dec.d)::DOUBLE + 9.0)
                   / 10.0) AS BIGINT) THEN ct END) AS n_cum,
             min(CASE WHEN ct >= CAST(floor((((tp + tn) * dec.d)::DOUBLE + 9.0)
                   / 10.0) AS BIGINT) THEN cp END) AS pos_cum
           FROM cum CROSS JOIN dec CROSS JOIN tot
           GROUP BY dec.d, tp, tn)
         SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_cum AS BIGINT) AS n_cum, CAST(pos_cum AS BIGINT) AS pos_cum,
           CASE WHEN tp = 0 THEN NULL
             ELSE round(CAST(pos_cum::DOUBLE / tp::DOUBLE AS DECIMAL(18,8)),
               6)::DOUBLE END AS gain,
           CASE WHEN tp = 0 THEN NULL
             ELSE round(CAST(pos_cum::DOUBLE / tp::DOUBLE
               / (n_cum::DOUBLE / (tp::DOUBLE + tn::DOUBLE))
               AS DECIMAL(18,8)), 6)::DOUBLE END AS lift
         FROM sel ORDER BY decile"""

  /** confusion-metrics replay: the same score+label count table as the
    * AUC oracle, four conditional sums at the zero cut, MCC numerator
    * exact in DECIMAL(38,0) — shared by `curate_confusion` and
    * `stream_confusion` (the per-score counts are additive).
    */
  lazy val confusionOracleSql =
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
           FROM norm),
         lab AS (
           SELECT doc_id,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE >= 0.5 AS y
           FROM c),
         tk AS (
           SELECT doc_id, unnest(list_filter(toks, t -> len(t) > 0)) AS tok
           FROM norm),
         w AS (
           SELECT doc_id,
             CAST(sum(('0x'||substr(md5(tok || 'clf-v1'),1,15))::BIGINT % 2000001 - 1000000)
               AS BIGINT) AS s
           FROM tk GROUP BY doc_id),
         sc AS (
           SELECT norm.doc_id, coalesce(w.s, 0) AS s
           FROM norm LEFT JOIN w ON norm.doc_id = w.doc_id),
         j AS (SELECT sc.s, lab.y FROM sc JOIN lab ON sc.doc_id = lab.doc_id),
         counts AS (
           SELECT s, sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS p,
             sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS nn
           FROM j GROUP BY s),
         a AS (
           SELECT
             CAST(sum(CASE WHEN s >= 0.0 THEN p ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN s >= 0.0 THEN nn ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN s < 0.0 THEN p ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN s < 0.0 THEN nn ELSE 0 END) AS BIGINT) AS tn
           FROM counts),
         f AS (
           SELECT *,
             tp::DOUBLE / (tp::DOUBLE + fn::DOUBLE) AS tpr,
             tn::DOUBLE / (tn::DOUBLE + fp::DOUBLE) AS tnr
           FROM a)
         SELECT CAST(0.0 AS DOUBLE) AS threshold, tp, fp, fn, tn,
           CASE WHEN tp + fn = 0 AND tn + fp = 0 THEN NULL
             ELSE round(CAST((tp::DOUBLE + tn::DOUBLE)
               / (tp::DOUBLE + fp::DOUBLE + fn::DOUBLE + tn::DOUBLE)
               AS DECIMAL(18,8)), 6)::DOUBLE END AS acc,
           CASE WHEN tp + fn = 0 THEN NULL
             ELSE round(CAST(tpr AS DECIMAL(18,8)), 6)::DOUBLE END AS tpr,
           CASE WHEN tn + fp = 0 THEN NULL
             ELSE round(CAST(tnr AS DECIMAL(18,8)), 6)::DOUBLE END AS tnr,
           CASE WHEN tp + fn = 0 OR tn + fp = 0 THEN NULL
             ELSE round(CAST((tpr + tnr) / 2.0 AS DECIMAL(18,8)),
               6)::DOUBLE END AS balanced_acc,
           CASE WHEN tp + fn = 0 OR tn + fp = 0 THEN NULL
             ELSE round(CAST(tpr + tnr - 1.0 AS DECIMAL(18,8)),
               6)::DOUBLE END AS youden_j,
           CASE WHEN tp + fn = 0 OR tn + fp = 0 OR tp + fp = 0
                  OR tn + fn = 0 THEN NULL
             ELSE round(CAST(
               CAST(CAST(tp AS DECIMAL(38,0)) * tn
                 - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)
               / sqrt((tp::DOUBLE + fp::DOUBLE) * (tp::DOUBLE + fn::DOUBLE)
                 * (tn::DOUBLE + fp::DOUBLE) * (tn::DOUBLE + fn::DOUBLE))
               AS DECIMAL(18,8)), 6)::DOUBLE END AS mcc
         FROM f"""

  /** ECE replay: 4dp quality score as probability, classifier verdict as
    * label, decile bins with decimal-staged probability sums and ECE
    * terms — the batch operator's oracle (bounded-bin state).
    */
  lazy val eceOracleSql =
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
           FROM norm),
         pr AS (
           SELECT doc_id,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE AS p
           FROM c),
         tk AS (
           SELECT doc_id, unnest(list_filter(toks, t -> len(t) > 0)) AS tok
           FROM norm),
         w AS (
           SELECT doc_id,
             CAST(sum(('0x'||substr(md5(tok || 'clf-v1'),1,15))::BIGINT % 2000001 - 1000000)
               AS BIGINT) AS s
           FROM tk GROUP BY doc_id),
         lab AS (
           SELECT norm.doc_id, coalesce(w.s, 0) >= 0 AS y
           FROM norm LEFT JOIN w ON norm.doc_id = w.doc_id),
         j AS (
           SELECT pr.p, lab.y FROM pr JOIN lab ON pr.doc_id = lab.doc_id),
         binned AS (
           SELECT greatest(least(CAST(floor(p * 10.0) AS BIGINT), 9), 0)
               AS b,
             count(*) AS n,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS x,
             sum(CAST(p AS DECIMAL(28,10))) AS sp
           FROM j GROUP BY 1),
         g AS (
           SELECT n,
             CAST(n::DOUBLE * abs(x::DOUBLE / n::DOUBLE
               - sp::DOUBLE / n::DOUBLE) AS DECIMAL(28,10)) AS term,
             abs(x::DOUBLE / n::DOUBLE - sp::DOUBLE / n::DOUBLE) AS gap
           FROM binned),
         a AS (SELECT CAST(sum(n) AS BIGINT) AS nn, sum(term) AS es,
             max(gap) AS mce FROM g)
         SELECT 10 AS bins, nn AS n,
           round(CAST(es::DOUBLE / nn::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE
             AS ece,
           round(CAST(mce AS DECIMAL(18,8)), 6)::DOUBLE AS mce
         FROM a"""

  /** MI oracle: joint/marginal count tables, exact-integer ln ratios,
    * per-term decimal staging — shared by the batch operator and its
    * streaming twin (additive joint counts fold to the same table)
    */
  val miOracleSql =
    """WITH j AS (
         SELECT event_type AS x, hour(ts) AS y, count(*) AS cxy
         FROM events GROUP BY 1, 2),
       mx AS (SELECT x, sum(cxy) AS cx FROM j GROUP BY 1),
       my AS (SELECT y, sum(cxy) AS cy FROM j GROUP BY 1),
       t AS (SELECT CAST(sum(cxy) AS BIGINT) AS n FROM j),
       ex AS (
         SELECT n, count(*) AS kx,
           -sum(CAST((cx::DOUBLE / n) * ln(cx::DOUBLE / n)
             AS DECIMAL(18,8))) AS hx
         FROM mx CROSS JOIN t GROUP BY n),
       ey AS (
         SELECT n, count(*) AS ky,
           -sum(CAST((cy::DOUBLE / n) * ln(cy::DOUBLE / n)
             AS DECIMAL(18,8))) AS hy
         FROM my CROSS JOIN t GROUP BY n),
       m0 AS (
         SELECT n, sum(CAST((cxy::DOUBLE / n)
             * ln((cxy * n)::DOUBLE / (cx * cy)::DOUBLE)
             AS DECIMAL(18,8))) AS mm
         FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t GROUP BY n),
       o AS (
         SELECT n, CAST(kx AS BIGINT) AS n_x, CAST(ky AS BIGINT) AS n_y,
           round(CAST(hx AS DECIMAL(18,8)), 6)::DOUBLE AS h_x,
           round(CAST(hy AS DECIMAL(18,8)), 6)::DOUBLE AS h_y,
           round(CAST(mm AS DECIMAL(18,8)), 6)::DOUBLE AS mi
         FROM m0 JOIN ex USING (n) JOIN ey USING (n))
       SELECT n, n_x, n_y, h_x, h_y, mi,
         round(CAST(CASE WHEN h_x * h_y <= 0.0 THEN 0.0
           ELSE mi / sqrt(h_x * h_y) END AS DECIMAL(18,8)), 6)::DOUBLE AS nmi
       FROM o"""

  /** Theil's U replay (same joint-count chain as mi, both directional
    * coefficients from the rounded pieces) — shared by `stats_theilu`
    * and `stream_theilu` (joint counts are additive).
    */
  val theilUOracleSql =
    """WITH j AS (
         SELECT event_type AS x, hour(ts) AS y, count(*) AS cxy
         FROM events GROUP BY 1, 2),
       mx AS (SELECT x, sum(cxy) AS cx FROM j GROUP BY 1),
       my AS (SELECT y, sum(cxy) AS cy FROM j GROUP BY 1),
       t AS (SELECT CAST(sum(cxy) AS BIGINT) AS n FROM j),
       ex AS (
         SELECT n, count(*) AS kx,
           -sum(CAST((cx::DOUBLE / n) * ln(cx::DOUBLE / n)
             AS DECIMAL(18,8))) AS hx
         FROM mx CROSS JOIN t GROUP BY n),
       ey AS (
         SELECT n, count(*) AS ky,
           -sum(CAST((cy::DOUBLE / n) * ln(cy::DOUBLE / n)
             AS DECIMAL(18,8))) AS hy
         FROM my CROSS JOIN t GROUP BY n),
       m0 AS (
         SELECT n, sum(CAST((cxy::DOUBLE / n)
             * ln((cxy * n)::DOUBLE / (cx * cy)::DOUBLE)
             AS DECIMAL(18,8))) AS mm
         FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t GROUP BY n),
       o AS (
         SELECT n, CAST(kx AS BIGINT) AS n_x, CAST(ky AS BIGINT) AS n_y,
           round(CAST(hx AS DECIMAL(18,8)), 6)::DOUBLE AS h_x,
           round(CAST(hy AS DECIMAL(18,8)), 6)::DOUBLE AS h_y,
           round(CAST(mm AS DECIMAL(18,8)), 6)::DOUBLE AS mi
         FROM m0 JOIN ex USING (n) JOIN ey USING (n))
       SELECT n, n_x, n_y, h_x, h_y, mi,
         round(CAST(CASE WHEN h_x <= 0.0 THEN 0.0
           ELSE mi / h_x END AS DECIMAL(18,8)), 6)::DOUBLE AS u_xy,
         round(CAST(CASE WHEN h_y <= 0.0 THEN 0.0
           ELSE mi / h_y END AS DECIMAL(18,8)), 6)::DOUBLE AS u_yx
       FROM o"""

  /** inter-arrival oracle: (user,type)-keyed lag gaps, capped integer
    * floor-divide buckets — shared by the batch operator and its
    * streaming twin (carried-last-event parity)
    */
  val interarrivalOracleSql =
    """WITH g AS (
         SELECT event_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
         FROM events),
       b AS (
         SELECT event_type,
           CAST(least(gap // 600000000, 144) AS BIGINT) AS gap_bucket
         FROM g WHERE gap IS NOT NULL)
       SELECT event_type, gap_bucket,
         CAST(gap_bucket * 600 AS BIGINT) AS lo_s, count(*) AS n_gaps
       FROM b GROUP BY 1, 2 ORDER BY event_type, gap_bucket"""

  val nearDupEdgesSql =
    s"""norm AS (
         SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
       sh AS (
         SELECT doc_id,
           list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(0, len(toks) - 2),
               i -> array_to_string(toks[i+1:i+3], ' ')) END) AS s
         FROM norm),
       pairs AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.s, b.s))::DOUBLE
             / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
       edges AS (
         SELECT id_a AS src, id_b AS dst FROM pairs
         UNION SELECT id_b, id_a FROM pairs)"""

  /** symmetrized edge set of the shared-boilerplate graph: the
    * containmentPairs screen (df ≤ 64 shingles, ≥ 2 shared, staged-decimal
    * containment ≥ 0.08) — low-containment edges chain through common
    * phrases, giving the graph genuine distance-2 structure the near-dup
    * cliques lack
    */
  val boilerplateEdgesSql =
    s"""norm AS (
         SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
       sh0 AS (
         SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(0, len(toks) - 2),
               i -> array_to_string(toks[i+1:i+3], ' ')) END)) AS sh
         FROM norm),
       sizes AS (SELECT doc_id, count(*) AS sz FROM sh0 GROUP BY 1),
       dfreq AS (SELECT sh, count(*) AS df FROM sh0 GROUP BY 1),
       bcand AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
         FROM sh0 a JOIN sh0 b ON a.sh = b.sh AND a.doc_id < b.doc_id
         JOIN dfreq d ON d.sh = a.sh
         WHERE d.df <= 64
         GROUP BY 1, 2 HAVING count(*) >= 2),
       bpairs AS (
         SELECT id_a, id_b FROM bcand
         JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
         WHERE round(CAST(shared::DOUBLE / least(sa.sz, sb.sz)
           AS DECIMAL(18,8)), 6) >= 0.08),
       edges AS (
         SELECT id_a AS src, id_b AS dst FROM bpairs
         UNION SELECT id_b, id_a FROM bpairs)"""

  /** Covariance-submatrix oracle: one aggregate row with a DECIMAL(30,10)
    * sum per dim and per pair (the identical staging the Spark side uses),
    * unioned out to the (dim_i, dim_j) table with the same divide order.
    */
  def covOracleSql(dims: Seq[Int]): String = {
    val pairs = for (a <- dims; b <- dims if a <= b) yield (a, b)
    val sumCols = dims.map(d =>
      s"sum(CAST(embedding[${d + 1}]::DOUBLE AS DECIMAL(30,10))) AS s$d").mkString(",\n           ")
    val pairCols = pairs.map { case (a, b) =>
      s"sum(CAST(embedding[${a + 1}]::DOUBLE * embedding[${b + 1}]::DOUBLE AS DECIMAL(30,10))) AS p${a}_$b"
    }.mkString(",\n           ")
    val branches = pairs.map { case (a, b) =>
      s"SELECT $a AS dim_i, $b AS dim_j, n, s$a AS sx, s$b AS sy, p${a}_$b AS sxy FROM a"
    }.mkString("\n           UNION ALL ")
    s"""WITH a AS (
         SELECT count(*) AS n,
           $sumCols,
           $pairCols
         FROM embeddings WHERE embedding IS NOT NULL),
       l AS (
           $branches)
       SELECT CAST(dim_i AS INTEGER) AS dim_i, CAST(dim_j AS INTEGER) AS dim_j, n,
         round(CAST(CAST(sx AS DOUBLE) / n AS DECIMAL(18,8)), 6)::DOUBLE AS mean_i,
         round(CAST(CAST(sy AS DOUBLE) / n AS DECIMAL(18,8)), 6)::DOUBLE AS mean_j,
         round(CAST(CAST(sxy AS DOUBLE) / n
           - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)
           AS DECIMAL(18,8)), 6)::DOUBLE AS cov
       FROM l ORDER BY dim_i, dim_j"""
  }

  /** Power-iteration PCA oracle: the covOracleSql exact-decimal covariance
    * (6dp-rounded — the values the Spark driver iterates on), then `iters`
    * unrolled matvec+normalize steps as EXPLICIT left-associative IEEE
    * chains (the same fixed order Vectors.topComponent folds in), Rayleigh
    * eigenvalue, first-dim sign fix, engine-rounded output.
    */
  def pcaOracleSql(dims: Seq[Int], iters: Int): String = {
    val k = dims.size
    val pairs = for (a <- dims; b <- dims if a <= b) yield (a, b)
    val sumCols = dims.map(d =>
      s"sum(CAST(embedding[${d + 1}]::DOUBLE AS DECIMAL(30,10))) AS s$d").mkString(",\n           ")
    val pairCols = pairs.map { case (a, b) =>
      s"sum(CAST(embedding[${a + 1}]::DOUBLE * embedding[${b + 1}]::DOUBLE AS DECIMAL(30,10))) AS p${a}_$b"
    }.mkString(",\n           ")
    def cn(a: Int, b: Int) = if (a <= b) s"c${a}_$b" else s"c${b}_$a"
    val covCols = pairs.map { case (a, b) =>
      s"round(CAST(CAST(p${a}_$b AS DOUBLE) / n - (CAST(s$a AS DOUBLE) / n) * (CAST(s$b AS DOUBLE) / n) AS DECIMAL(18,8)), 6)::DOUBLE AS ${cn(a, b)}"
    }.mkString(",\n           ")
    def wExprs = dims.indices.map { i =>
      val terms = dims.indices.map(j => s"${cn(dims(i), dims(j))}*v$j").mkString(" + ")
      s"$terms AS w$i"
    }.mkString(",\n             ")
    val ssq = dims.indices.map(i => s"w$i*w$i").mkString(" + ")
    val vN = dims.indices.map(i => s"w$i/sqrt($ssq) AS v$i").mkString(",\n             ")
    val i0 = dims.indices.map(i => s"1.0::DOUBLE/sqrt($k.0::DOUBLE) AS v$i").mkString(", ")
    val iterCtes = (1 to iters).map { t =>
      val src = if (t == 1) "i0" else s"n${t - 1}"
      s"""w$t AS (SELECT $wExprs FROM $src CROSS JOIN c),
         n$t AS (SELECT $vN FROM w$t)"""
    }.mkString(",\n         ")
    val vCarry = dims.indices.map(i => s"v$i").mkString(", ")
    val lam = dims.indices.map(i => s"v$i*w$i").mkString(" + ")
    val branches = dims.zipWithIndex.map { case (d, i) =>
      s"SELECT $d AS dim, CASE WHEN v0 < 0.0::DOUBLE THEN -v$i ELSE v$i END AS ld, lam FROM l"
    }.mkString("\n           UNION ALL ")
    s"""WITH a AS (
         SELECT count(*) AS n,
           $sumCols,
           $pairCols
         FROM embeddings WHERE embedding IS NOT NULL),
       c AS (
         SELECT n,
           $covCols
         FROM a),
       i0 AS (SELECT $i0),
       $iterCtes,
       f AS (SELECT $vCarry, $wExprs FROM n$iters CROSS JOIN c),
       l AS (SELECT $vCarry, $lam AS lam FROM f),
       u AS (
           $branches)
       SELECT CAST(dim AS INTEGER) AS dim,
         round(CAST(ld AS DECIMAL(18,8)), 6)::DOUBLE AS loading,
         round(CAST(lam AS DECIMAL(18,8)), 6)::DOUBLE AS eigenvalue
       FROM u ORDER BY dim"""
  }

  /** PQ-ADC oracle: retrains all four per-subspace codebooks (id-seeded
    * init, one Lloyd round, decimal-exact means — the sim_kmeans replay,
    * once per subspace), re-encodes the corpus, rebuilds the query distance
    * tables and replays the decimal-sum ADC ranking. Generated by the same
    * loop the Spark side uses, so sub-count/slice bounds can't drift.
    */
  def pqOracleSql: String = {
    val (m, subDim, kSub) = (16, 4, 32)
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       ${pqSubCtes(m, subDim, kSub)},
       allp AS (${pqPairUnion(m)}),
       agg AS (
         SELECT qid, cid, sum(d2) AS ad2 FROM allp WHERE qid <> cid GROUP BY qid, cid)
       SELECT qid AS query_id, cid AS neighbor_id,
         round(ad2, 4)::DOUBLE AS d2, rank
       FROM (
         SELECT qid, cid, ad2,
           row_number() OVER (PARTITION BY qid ORDER BY ad2 ASC, cid ASC) AS rank
         FROM agg)
       WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  def pqPairUnion(m: Int): String =
    (0 until m).map(s => s"SELECT * FROM pair_$s").mkString(" UNION ALL ")

  /** the per-subspace PQ replay blocks (codebook training, encoding, query
    * distance tables, candidate pairs), shared by the sim_ann_pq and
    * sim_ann_ivfpq oracles; expects a CTE `e(vec_id, v)` in scope
    */
  def pqSubCtes(m: Int, subDim: Int, kSub: Int): String =
    (0 until m).map { s =>
      val (lo, hi) = (s * subDim + 1, (s + 1) * subDim)
      val d2 = (v: String) =>
        s"list_dot_product($v, $v) - 2*list_dot_product($v, cv) + list_dot_product(cv, cv)"
      s"""sub$s AS (SELECT vec_id, v[$lo:$hi] AS sv FROM e),
         c0_$s AS (SELECT vec_id AS cluster, sv AS cv FROM sub$s ORDER BY vec_id LIMIT $kSub),
         a1_$s AS (
           SELECT vec_id, sv, cluster FROM (
             SELECT sub$s.vec_id, sub$s.sv, c0_$s.cluster,
               row_number() OVER (PARTITION BY sub$s.vec_id
                 ORDER BY ${d2("sv")} ASC, cluster ASC) AS rn
             FROM sub$s CROSS JOIN c0_$s) WHERE rn = 1),
         c1_$s AS (
           SELECT cluster, list(cx ORDER BY dim) AS cv FROM (
             SELECT cluster, dim, sum(x::DECIMAL(30,10))::DOUBLE / count(*) AS cx
             FROM (SELECT cluster, unnest(sv) AS x, generate_subscripts(sv, 1) AS dim
                   FROM a1_$s)
             GROUP BY cluster, dim) GROUP BY cluster),
         code_$s AS (
           SELECT vec_id, cluster AS code FROM (
             SELECT sub$s.vec_id, c1_$s.cluster,
               row_number() OVER (PARTITION BY sub$s.vec_id
                 ORDER BY ${d2("sv")} ASC, cluster ASC) AS rn
             FROM sub$s CROSS JOIN c1_$s) WHERE rn = 1),
         dt_$s AS (
           SELECT q.vec_id AS qid, c1_$s.cluster AS code,
             CAST(${d2("q.sv")} AS DECIMAL(18,8)) AS d2
           FROM (SELECT * FROM sub$s WHERE vec_id < 10) q CROSS JOIN c1_$s),
         pair_$s AS (
           SELECT dt.qid, code_$s.vec_id AS cid, dt.d2
           FROM code_$s JOIN dt_$s dt ON code_$s.code = dt.code)"""
    }.mkString(",\n")

  /** rerank oracle: the shared PQ replay produces the 25-wide shortlist,
    * then exact cosine over shortlisted (qid, cid) pairs picks the final 5
    */
  def pqRerankOracleSql: String = {
    val (m, subDim, kSub, shortlist) = (16, 4, 32, 25)
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       ${pqSubCtes(m, subDim, kSub)},
       allp AS (${pqPairUnion(m)}),
       agg AS (
         SELECT qid, cid, sum(d2) AS ad2 FROM allp WHERE qid <> cid GROUP BY qid, cid),
       short AS (
         SELECT qid, cid FROM (
           SELECT qid, cid,
             row_number() OVER (PARTITION BY qid ORDER BY ad2 ASC, cid ASC) AS rank
           FROM agg)
         WHERE rank <= $shortlist),
       rer AS (
         SELECT s.qid, s.cid,
           CAST(list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
             AS DECIMAL(18,8)) AS cos
         FROM short s
         JOIN e q ON q.vec_id = s.qid
         JOIN e c ON c.vec_id = s.cid)
       SELECT qid AS query_id, cid AS neighbor_id,
         round(cos, 4)::DOUBLE AS cosine, rank
       FROM (
         SELECT qid, cid, cos,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
         FROM rer)
       WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** IVFADC oracle: deterministic sampled coarse quantizer (euclidean
    * routing) prunes candidates to the query's nProbe clusters, then the
    * shared PQ replay ranks them by decimal ADC sums.
    */
  def ivfPqOracleSql: String = {
    val (m, subDim, kSub, nCoarse, nProbe) = (16, 4, 32, 16, 4)
    val d2c = (v: String) =>
      s"list_dot_product($v, $v) - 2*list_dot_product($v, cv) + list_dot_product(cv, cv)"
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       co AS (SELECT vec_id AS cluster, v AS cv FROM e ORDER BY vec_id LIMIT $nCoarse),
       ca AS (
         SELECT vec_id, cluster FROM (
           SELECT e.vec_id, co.cluster,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY ${d2c("e.v")} ASC, cluster ASC) AS rn
           FROM e CROSS JOIN co) WHERE rn = 1),
       qp AS (
         SELECT vec_id AS qid, cluster FROM (
           SELECT e.vec_id, co.cluster,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY ${d2c("e.v")} ASC, cluster ASC) AS rn
           FROM e CROSS JOIN co WHERE e.vec_id < 10) WHERE rn <= $nProbe),
       cand AS (
         SELECT qp.qid, ca.vec_id AS cid FROM qp JOIN ca ON qp.cluster = ca.cluster),
       ${pqSubCtes(m, subDim, kSub)},
       allp AS (${pqPairUnion(m)}),
       agg AS (
         SELECT a.qid, a.cid, sum(a.d2) AS ad2
         FROM allp a JOIN cand c ON a.qid = c.qid AND a.cid = c.cid
         WHERE a.qid <> a.cid GROUP BY a.qid, a.cid)
       SELECT qid AS query_id, cid AS neighbor_id,
         round(ad2, 4)::DOUBLE AS d2, rank
       FROM (
         SELECT qid, cid, ad2,
           row_number() OVER (PARTITION BY qid ORDER BY ad2 ASC, cid ASC) AS rank
         FROM agg)
       WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** SCD2-from-events SQL fragment shared by dim_scd2/scd_asof oracles */
  val scd2Sql =
    """dedup AS (
         SELECT user_id, event_type, ts,
           CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg,
           row_number() OVER w AS rn
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       kept AS (SELECT user_id, event_type, ts FROM dedup WHERE rn = 1 OR chg = 1),
       ver AS (
         SELECT user_id, event_type,
           CAST(row_number() OVER w2 AS INTEGER) AS version,
           ts AS valid_from,
           lead(ts) OVER w2 AS valid_to
         FROM kept WINDOW w2 AS (PARTITION BY user_id ORDER BY ts)),
       keyed AS (
         SELECT row_number() OVER (ORDER BY user_id, version) AS user_key, *
         FROM ver)"""
}
