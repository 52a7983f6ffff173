package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, IntegerType, TimestampType}

import graft.core.{Converters, DateSpan, Nm}
import graft.functions.{Dedup, Layout, Packing, Pii, Sampling, TextAnalysis, Vectors}
import graft.sources.Sources
import graft.tables._


/** DuckDB oracle SQL for the gate queries, chunk A (stable
  * entry order; split for compile-unit size only). */
private[graft] object OracleSqlA {
  import EntryOracleDefs._
  def m: Map[String, String] = Map(

    // cube replay: all four grouping sets, same grouping ids
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
         CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
         round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)::DOUBLE AS sum_qty,
         count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""",

    // rollup replay: same grouping sets, same grouping ids
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
         CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
         round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)::DOUBLE AS sum_qty,
         count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)::DOUBLE AS sum_qty,
         round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)::DOUBLE AS sum_base_price,
         round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS sum_disc_price,
         round(sum(CAST(l_discount AS DECIMAL(18,4)))::DOUBLE / count(*), 6) AS avg_disc,
         count(*) AS count_order,
         count(DISTINCT l_orderkey) AS distinct_orders,
         round(max(l_extendedprice), 2) AS max_price,
         round(min(l_extendedprice), 2) AS min_price
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "fact_load" ->
      """SELECT n.n_name AS nation, year(o.o_orderdate) AS year,
         round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue,
         count(*) AS n_items
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "proj_project" ->
      """SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
         FROM customer ORDER BY id""",

    "proj_setdefaults" ->
      """SELECT c_custkey,
         coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS acctbal,
         coalesce(CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END, 'UNKNOWN') AS segment
         FROM customer ORDER BY c_custkey""",

    "proj_copy_rename" ->
      """SELECT c_custkey, upper(c_name) AS name_upper, c_mktsegment AS segment
         FROM customer ORDER BY c_custkey""",

    "fn_str_helpers" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN '1' ELSE '0' END AS open_flag,
         coalesce(nullif(o_orderpriority, '1-URGENT'), 'none') AS prio_or_none,
         TRY_CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS od
         FROM orders ORDER BY o_orderkey""",

    "src_transforming" ->
      """SELECT c_custkey, round(CAST(c_acctbal / 2 AS DECIMAL(18,8)), 2)::DOUBLE AS bal_half
         FROM customer WHERE c_acctbal > 0 ORDER BY c_custkey""",

    "agg_step" ->
      """SELECT l_returnflag,
         round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)::DOUBLE AS qty,
         count(DISTINCT l_suppkey) AS n_supp,
         round(max(l_extendedprice), 2) AS max_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "steps_conditional" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice > 150000 THEN 'high' ELSE 'low' END AS branch
         FROM orders ORDER BY o_orderkey""",

    "dim_ensure_expander" ->
      """WITH seed AS (
           SELECT p_brand, row_number() OVER (ORDER BY p_brand) AS brand_key, -1 AS brand_len
           FROM (SELECT DISTINCT p_brand FROM part WHERE p_size < 25)),
         newm AS (
           SELECT p_brand FROM (SELECT DISTINCT p_brand FROM part)
           WHERE p_brand NOT IN (SELECT p_brand FROM seed)),
         newk AS (
           SELECT p_brand,
             (SELECT coalesce(max(brand_key), 0) FROM seed)
               + row_number() OVER (ORDER BY p_brand) AS brand_key,
             CAST(length(p_brand) AS INTEGER) AS brand_len
           FROM newm)
         SELECT brand_key, p_brand, brand_len FROM seed
         UNION ALL SELECT brand_key, p_brand, brand_len FROM newk
         ORDER BY brand_key""",

    "dim_getbyvals" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""",

    "dim_getbykey" ->
      """SELECT p.c_custkey, d.c_name, d.c_mktsegment
         FROM (SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0) p
         LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 2 = 0) d USING (c_custkey)
         ORDER BY p.c_custkey""",

    "dim_getbykey_nm" ->
      """SELECT p.c_custkey, d.c_name, d.c_mktsegment
         FROM (SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0) p
         LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 2 = 0) d USING (c_custkey)
         ORDER BY p.c_custkey""",

    "fact_lookup" ->
      """WITH rev AS (
           SELECT l_orderkey,
             round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)::DOUBLE AS price_sum,
             count(*) AS n_lines
           FROM lineitem GROUP BY l_orderkey),
         probe AS (
           SELECT o_orderkey * 2 AS l_orderkey FROM orders WHERE o_orderkey % 4 = 0)
         SELECT p.l_orderkey, r.price_sum, r.n_lines
         FROM probe p LEFT JOIN rev r USING (l_orderkey)
         ORDER BY p.l_orderkey""",

    "snowflake_lookup" ->
      """WITH input AS (
           SELECT c.c_name, c.c_acctbal, n.n_name, r.r_name
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey),
         rk AS (SELECT r_name, row_number() OVER (ORDER BY r_name) AS r_key
                FROM (SELECT DISTINCT r_name FROM input)),
         nk AS (SELECT n_name, row_number() OVER (ORDER BY n_name) AS n_key
                FROM (SELECT DISTINCT n_name FROM input)),
         ck AS (SELECT c_name, row_number() OVER (ORDER BY c_name) AS cu_key
                FROM (SELECT DISTINCT c_name FROM input))
         SELECT ck.cu_key, i.c_name, nk.n_key, i.n_name, rk.r_key, i.r_name
         FROM input i JOIN ck USING (c_name) JOIN nk USING (n_name) JOIN rk USING (r_name)
         ORDER BY ck.cu_key""",

    "fn_converters" ->
      """SELECT o_orderkey,
         coalesce(TRY_CAST(o_orderpriority AS INTEGER), -1) AS prio_int,
         coalesce(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER), -1) AS prio_digit,
         TRY_CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS order_date,
         coalesce(CASE WHEN o_orderstatus = 'O' THEN true ELSE NULL END, false) AS is_open,
         trim('  ' || o_orderstatus || ' ') AS status
         FROM orders ORDER BY o_orderkey""",

    "fn_datereader" ->
      """SELECT o_orderkey,
         try_strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y')::DATE AS d_roundtrip,
         coalesce(try_strptime(o_orderpriority, '%d/%m/%Y')::DATE, DATE '1970-01-01') AS d_bad,
         try_strptime(strftime(o_orderdate, '%d/%m/%Y') || ' 12:30', '%d/%m/%Y %H:%M') AS ts_custom
         FROM orders ORDER BY o_orderkey""",

    "fn_datespan" ->
      """SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS dateid,
         strftime(d, '%Y-%m-%d') AS date,
         year(d) AS year, month(d) AS month, day(d) AS day,
         dayofweek(d) + 1 AS weekday, quarter(d) AS quarter
         FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY))::DATE AS d)
         ORDER BY dateid""",

    "fn_datespan_custom" ->
      """SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS dateid,
         strftime(d, '%Y-%m-%d') AS date, strftime(d, '%B') AS monthname,
         year(d) AS year, month(d) AS month,
         dayofweek(d) IN (0, 6) AS is_weekend
         FROM (SELECT unnest(generate_series(DATE '1997-06-01', DATE '1997-08-31', INTERVAL 1 DAY))::DATE AS d)
         ORDER BY dateid""",

    "join_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         ORDER BY l_orderkey, l_linenumber""",

    "src_filtering" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
         WHERE l_quantity > 30 AND l_discount <= 0.05
         ORDER BY l_orderkey, l_linenumber""",

    "src_mapping" ->
      """SELECT c_custkey, upper(c_name) AS c_name, round(c_acctbal * 2, 2) AS c_acctbal
         FROM customer ORDER BY c_custkey""",

    "src_valuemapping" ->
      """SELECT o_orderkey, o_orderstatus,
         coalesce(CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
                  WHEN 'P' THEN 'pending' END, 'other') AS status_name
         FROM orders ORDER BY o_orderkey""",

    "src_union" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal >= 5000
         UNION ALL
         SELECT c_custkey, c_name, NULL FROM customer WHERE c_acctbal < 5000
         ORDER BY c_custkey""",

    "src_roundrobin" ->
      """SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey""",

    "src_sqltransforming" ->
      """SELECT l_returnflag, round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)::DOUBLE AS qty, count(*) AS n
         FROM lineitem WHERE l_discount > 0.02
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "src_sqltransforming_batch" ->
      """SELECT l_returnflag,
           round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)::DOUBLE AS qty,
           count(*) AS n, l_linenumber AS batch
         FROM lineitem WHERE l_discount > 0.02
         GROUP BY l_returnflag, l_linenumber
         ORDER BY batch, l_returnflag""",

    "src_crosstab" ->
      """SELECT o_orderpriority,
         round(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2)::DOUBLE AS "F",
         round(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2)::DOUBLE AS "O",
         round(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2)::DOUBLE AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "join_hash" ->
      """SELECT c.c_custkey, c.c_name, n.n_name, n.n_regionkey
         FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
         ORDER BY c.c_custkey""",

    "join_merge" ->
      """SELECT o.o_orderstatus, round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2)::DOUBLE AS price_sum, count(*) AS n
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1 ORDER BY 1""",

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
         ORDER BY c_custkey""",

    "join_skew_salted" ->
      """SELECT e.user_id, 'u' || e.user_id AS user_tag, count(*) AS n,
         round(sum(CAST(e.value AS DECIMAL(18,4))), 2)::DOUBLE AS value_sum
         FROM events e
         GROUP BY e.user_id ORDER BY e.user_id""",

    "agg_topk" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
         FROM orders QUALIFY rank <= 3 ORDER BY o_orderpriority, rank""",

    "agg_geomean" ->
      """SELECT o_orderstatus, round(exp(avg(ln(o_totalprice))), 2) AS geo_mean
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "agg_freq_tokens" ->
      s"""WITH norm AS (
           SELECT source, string_split($normSql, ' ') AS toks FROM documents),
         t AS (
           SELECT source, unnest(list_filter(toks, w -> w IN
             ('the','and','of','to','a','der','und','das','ist','nicht',
              'le','et','les','des','une','el','los','y','las','una'))) AS token
           FROM norm)
         SELECT source, token, count(*) AS cnt
         FROM t GROUP BY source, token ORDER BY source, cnt DESC, token""",

    "fn_json" ->
      """SELECT event_id, json_extract(props, '$.k')::INTEGER AS k
         FROM events ORDER BY event_id""",

    "stream_window_agg" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, event_type,
         count(*) AS n, round(sum(CAST(value AS DECIMAL(18,4))), 2)::DOUBLE AS value_sum
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, event_type
         FROM (SELECT event_id, user_id, event_type FROM events
               UNION ALL
               SELECT event_id, user_id, event_type FROM events WHERE event_id % 3 = 0)
         ORDER BY event_id""",

    "stream_curate" ->
      s"""WITH norm AS (
           SELECT doc_id, text, string_split($normSql, ' ') AS toks, $normSql AS nt
           FROM documents),
         c AS (
           SELECT doc_id, text, nt,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS s_en,
             len(list_filter(toks, w -> w IN ('der','und','das','ist','nicht'))) AS s_de,
             len(list_filter(toks, w -> w IN ('le','et','les','des','une'))) AS s_fr,
             len(list_filter(toks, w -> w IN ('el','los','y','las','una'))) AS s_es,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS npunct
           FROM norm),
         scored AS (
           SELECT md5(nt) AS fp,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(s_en * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE AS quality,
             CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                  ELSE 'fr' END AS lang
           FROM c)
         SELECT DISTINCT fp, lang AS lang_pred FROM scored
         WHERE quality >= 0.3 AND lang IN ('en', 'de')
         ORDER BY fp""",

    // lateness replay: batch index = event_id % 5, per-batch prior
    // high-watermark from the smaller-index batches, count under cutoff
    "stream_late" ->
      """WITH b AS (
           SELECT event_type, ts, event_id % 5 AS bi FROM events),
         m AS (SELECT bi, max(ts) AS mx FROM b GROUP BY 1),
         pm AS (
           SELECT a.bi, max(bm.mx) AS prior
           FROM (SELECT DISTINCT bi FROM b) a JOIN m bm ON bm.bi < a.bi
           GROUP BY a.bi)
         SELECT event_type, count(*) AS n_late
         FROM b JOIN pm ON b.bi = pm.bi
         WHERE b.ts < pm.prior - INTERVAL 1 HOUR
         GROUP BY 1 ORDER BY 1""",

    // stream-static enrichment replay: additive segment totals equal the
    // one-shot batch join+rollup (enrichment is stateless, sums exact)
    "stream_enrich" ->
      """SELECT c_mktsegment AS segment, count(*) AS n,
           round(sum(CAST(value AS DECIMAL(18,4))), 2)::DOUBLE AS value_sum
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1 ORDER BY 1""",

    "stream_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  >= INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
           FROM events),
         sessions AS (
           SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS sid
           FROM flagged)
         SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           round(sum(CAST(value AS DECIMAL(18,4))), 2)::DOUBLE AS value_sum
         FROM sessions GROUP BY user_id, sid ORDER BY user_id, session_start""",

    "dim_ensure" ->
      """WITH seed AS (
           SELECT p_brand, dense_rank() OVER (ORDER BY p_brand) AS brand_key
           FROM (SELECT DISTINCT p_brand FROM part WHERE p_size < 25)),
         new_members AS (
           SELECT DISTINCT p_brand FROM part
           WHERE p_brand NOT IN (SELECT p_brand FROM seed)),
         keyed_new AS (
           SELECT p_brand,
             (SELECT coalesce(max(brand_key), 0) FROM seed) + row_number() OVER (ORDER BY p_brand) AS brand_key
           FROM new_members),
         dim AS (SELECT * FROM seed UNION ALL SELECT * FROM keyed_new)
         SELECT p.p_partkey, d.brand_key, p.p_brand
         FROM part p JOIN dim d ON p.p_brand = d.p_brand
         ORDER BY p.p_partkey""",

    "dim_lookup" ->
      """SELECT c.c_name, coalesce(d.c_custkey, -1) AS c_custkey
         FROM customer c
         LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0) d
           ON c.c_name = d.c_name
         ORDER BY c.c_name""",

    // role-playing replay: the same nation table joined twice under its
    // two roles
    "dim_roleplay" ->
      """SELECT l.l_orderkey, l.l_linenumber,
           nc.n_name AS cust_nation, ns.n_name AS supp_nation
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation nc ON c.c_nationkey = nc.n_nationkey
         JOIN nation ns ON s.s_nationkey = ns.n_nationkey
         WHERE l.l_orderkey % 50 = 0
         ORDER BY l.l_orderkey, l.l_linenumber""",

    "dim_scd1" ->
      """WITH p1 AS (
           SELECT user_id, event_type FROM events WHERE event_id < 5000
           QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1),
         seed AS (
           SELECT row_number() OVER (ORDER BY user_id) AS user_key, user_id, event_type FROM p1),
         p2 AS (
           SELECT user_id, event_type FROM events WHERE event_id >= 5000
           QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1),
         newm AS (
           SELECT user_id, event_type FROM p2
           WHERE user_id NOT IN (SELECT user_id FROM seed)),
         newk AS (
           SELECT (SELECT coalesce(max(user_key), 0) FROM seed)
             + row_number() OVER (ORDER BY user_id) AS user_key, user_id, event_type
           FROM newm),
         dim AS (SELECT * FROM seed UNION ALL SELECT * FROM newk)
         SELECT d.user_key, d.user_id, coalesce(p2.event_type, d.event_type) AS event_type
         FROM dim d LEFT JOIN p2 ON d.user_id = p2.user_id
         ORDER BY d.user_key""",

    "dim_scd2" ->
      s"""WITH $scd2Sql
         SELECT user_key, user_id, event_type, version, valid_from, valid_to
         FROM keyed ORDER BY user_key""",

    "dim_scd2_closed" ->
      s"""WITH $scd2Sql
         SELECT user_key, user_id, event_type, version, valid_from,
           coalesce(valid_to, TIMESTAMP '2026-01-01 00:00:00') AS valid_to
         FROM keyed ORDER BY user_key""",

    "scd_asof" ->
      s"""WITH $scd2Sql,
         probe AS (
           SELECT event_id, user_id, ts + INTERVAL 30 MINUTE AS pts
           FROM events WHERE event_id % 7 = 0)
         SELECT p.event_id, coalesce(k.user_key, -1) AS user_key
         FROM probe p LEFT JOIN keyed k ON p.user_id = k.user_id
           AND k.valid_from <= p.pts AND (k.valid_to IS NULL OR p.pts < k.valid_to)
         QUALIFY row_number() OVER (PARTITION BY p.event_id ORDER BY k.version DESC NULLS LAST) = 1
         ORDER BY p.event_id""",

    "snowflake_scdensure" ->
      """WITH ek AS (
           SELECT event_type, row_number() OVER (ORDER BY event_type) AS etype_key
           FROM (SELECT DISTINCT event_type FROM events)),
         ev2 AS (SELECT e.user_id, ek.etype_key, e.ts FROM events e JOIN ek USING (event_type)),
         dedup AS (
           SELECT user_id, etype_key, ts,
             CASE WHEN lag(etype_key) OVER w IS DISTINCT FROM etype_key THEN 1 ELSE 0 END AS chg,
             row_number() OVER w AS rn
           FROM ev2 WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         kept AS (SELECT user_id, etype_key, ts FROM dedup WHERE rn = 1 OR chg = 1),
         ver AS (
           SELECT user_id, etype_key,
             CAST(row_number() OVER w2 AS INTEGER) AS version,
             ts AS valid_from, lead(ts) OVER w2 AS valid_to
           FROM kept WINDOW w2 AS (PARTITION BY user_id ORDER BY ts)),
         keyed AS (SELECT row_number() OVER (ORDER BY user_id, version) AS user_key, * FROM ver)
         SELECT user_key, user_id, etype_key, version, valid_from, valid_to
         FROM keyed ORDER BY user_key""",

    "dim_scd2_srcdate" ->
      """WITH ver AS (
           SELECT user_id, event_type,
             CAST(row_number() OVER w AS INTEGER) AS version,
             CASE WHEN row_number() OVER w = 1 THEN NULL ELSE ts END AS valid_from,
             lead(ts) OVER w AS valid_to
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         keyed AS (SELECT row_number() OVER (ORDER BY user_id, version) AS user_key, * FROM ver)
         SELECT user_key, user_id, event_type, version, valid_from, valid_to
         FROM keyed ORDER BY user_key""",

    "snowflake_ensure" ->
      """WITH input AS (
           SELECT c.c_name, c.c_acctbal, n.n_name, r.r_name
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey),
         rk AS (SELECT r_name, row_number() OVER (ORDER BY r_name) AS r_key
                FROM (SELECT DISTINCT r_name FROM input)),
         nk AS (SELECT n_name, row_number() OVER (ORDER BY n_name) AS n_key
                FROM (SELECT DISTINCT n_name FROM input)),
         ck AS (SELECT c_name, row_number() OVER (ORDER BY c_name) AS cu_key
                FROM (SELECT DISTINCT c_name FROM input))
         SELECT i.c_name, ck.cu_key, nk.n_key, rk.r_key
         FROM input i JOIN ck USING (c_name) JOIN nk USING (n_name) JOIN rk USING (r_name)
         ORDER BY ck.cu_key""",

    "fact_ensure" ->
      """SELECT l_orderkey,
         round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue,
         count(*) AS n_lines
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",

    "fact_accumulating" ->
      """WITH init AS (
           SELECT o_orderkey, CAST(NULL AS INTEGER) AS ship_year,
             o_totalprice AS total, CAST(NULL AS DOUBLE) AS line_rev
           FROM orders),
         upd AS (
           SELECT l_orderkey AS o_orderkey, year(max(l_shipdate)) AS ship_year,
             CAST(NULL AS DOUBLE) AS total,
             round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS line_rev
           FROM lineitem GROUP BY 1)
         SELECT coalesce(i.o_orderkey, u.o_orderkey) AS o_orderkey,
           coalesce(u.ship_year, i.ship_year) AS ship_year,
           coalesce(u.total, i.total) AS total,
           coalesce(u.line_rev, i.line_rev) AS line_rev
         FROM init i FULL OUTER JOIN upd u ON i.o_orderkey = u.o_orderkey
         ORDER BY 1""",

    "pipeline_curate" ->
      s"""WITH norm AS (
           SELECT doc_id, text, source, string_split($normSql, ' ') AS toks,
             $normSql AS nt
           FROM documents),
         c AS (
           SELECT doc_id, text, source, nt,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS nstop,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS npunct,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS s_en,
             len(list_filter(toks, w -> w IN ('der','und','das','ist','nicht'))) AS s_de,
             len(list_filter(toks, w -> w IN ('le','et','les','des','une'))) AS s_fr,
             len(list_filter(toks, w -> w IN ('el','los','y','las','una'))) AS s_es
           FROM norm),
         scored AS (
           SELECT doc_id, source, nt,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0 ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3 AS DECIMAL(18,8)), 4)::DOUBLE AS quality,
             CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                  ELSE 'fr' END AS lang
           FROM c),
         kept AS (SELECT * FROM scored WHERE lang = 'en' AND quality >= 0.3),
         fpd AS (
           SELECT doc_id, source, quality,
             row_number() OVER (PARTITION BY md5(nt) ORDER BY doc_id) AS rn
           FROM kept)
         SELECT doc_id, source, quality FROM fpd WHERE rn = 1 ORDER BY doc_id""",

    "pipeline_train_prep" ->
      s"""WITH c AS (
           SELECT doc_id, text, lang, nt,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS n_tokens,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a'))) AS nstop,
             length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS npunct
           FROM (SELECT doc_id, text, lang, $normSql AS nt,
                   string_split($normSql, ' ') AS toks FROM documents)),
         q AS (
           SELECT doc_id, lang, nt, n_tokens,
             round(CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN n_tokens = 0 THEN 0.0
                       ELSE least(nstop * 5.0 / n_tokens, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)), 4)::DOUBLE AS quality
           FROM c),
         f AS (SELECT * FROM q WHERE quality >= 0.3),
         dd AS (
           SELECT doc_id, lang, n_tokens FROM (
             SELECT doc_id, lang, n_tokens,
               row_number() OVER (PARTITION BY md5(nt) ORDER BY doc_id) AS rn
             FROM f) WHERE rn = 1),
         g AS (SELECT lang, sum(n_tokens) AS gt FROM dd GROUP BY lang),
         tt AS (SELECT sum(gt) AS tt FROM g),
         r AS (
           SELECT lang, CAST(floor(least(1.0::DOUBLE,
             0.6::DOUBLE * (CASE lang WHEN 'en' THEN 0.5::DOUBLE WHEN 'de' THEN 0.15::DOUBLE
               WHEN 'es' THEN 0.15::DOUBLE WHEN 'fr' THEN 0.1::DOUBLE
               WHEN 'zh' THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END)
             * tt::DOUBLE / gt::DOUBLE) * 10000 + 0.5::DOUBLE) AS BIGINT) AS rate_bp
           FROM g CROSS JOIN tt),
         kept AS (
           SELECT dd.doc_id, dd.n_tokens FROM dd JOIN r ON dd.lang = r.lang
           WHERE ('0x'||substr(md5(dd.doc_id::VARCHAR || 'prep-v1'),1,15))::BIGINT % 10000
             < r.rate_bp),
         train AS (
           SELECT doc_id, n_tokens FROM kept
           WHERE ('0x'||substr(md5(doc_id::VARCHAR || 'prep-v1'),1,15))::BIGINT % 10000 < 9000),
         sh AS (
           SELECT doc_id,
             ('0x'||substr(md5(doc_id::VARCHAR || 'pack'),1,15))::BIGINT % 16 AS shard,
             n_tokens AS n_tok
           FROM train),
         w AS (
           SELECT doc_id, shard, n_tok,
             (sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)::BIGINT AS strt
           FROM sh)
         SELECT doc_id, shard, n_tok::BIGINT AS n_tok,
           strt // 512 AS pack, strt % 512 AS off
         FROM w ORDER BY doc_id""",

    "dedup_exact" ->
      s"""WITH fp AS (
           SELECT doc_id, md5($normSql) AS fp,
             row_number() OVER (PARTITION BY md5($normSql) ORDER BY doc_id) AS rn
           FROM documents)
         SELECT doc_id, fp FROM fp WHERE rn = 1 ORDER BY doc_id""",

    "dedup_minhash" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(toks[i+1:i+3], ' ')) END) AS s
           FROM norm),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE
               / len(list_distinct(list_concat(a.s, b.s))) AS jac
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, round(jac, 4) AS jaccard
         FROM pairs WHERE jac >= 0.8 ORDER BY id_a, id_b""",

    // triangle replay: oriented edges, apex wedge join, closing-edge semi
    "dedup_triangles" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(toks[i+1:i+3], ' ')) END) AS s
           FROM norm),
         e AS (
           SELECT a.doc_id AS u, b.doc_id AS v
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.s, b.s))::DOUBLE
               / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
         tri AS (
           SELECT w1.u AS a, w1.v AS b, w2.v AS c
           FROM e w1 JOIN e w2 ON w1.u = w2.u AND w1.v < w2.v
           WHERE EXISTS (SELECT 1 FROM e ce WHERE ce.u = w1.v AND ce.v = w2.v)),
         pn AS (
           SELECT node, count(*) AS n_triangles FROM (
             SELECT a AS node FROM tri
             UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri)
           GROUP BY node),
         nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e)
         SELECT node, CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles
         FROM nodes LEFT JOIN pn USING (node) ORDER BY node""",

    // edit verification over the same pair set: DuckDB's levenshtein on the
    // normalized text, similarity as one double division
    "dedup_edit_verify" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks, $normSql AS nt
           FROM documents),
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
               / len(list_distinct(list_concat(a.s, b.s))) >= 0.8)
         SELECT id_a, id_b,
           CAST(levenshtein(na.nt, nb.nt) AS BIGINT) AS edit_dist,
           round(CAST(CASE WHEN greatest(length(na.nt), length(nb.nt)) = 0 THEN 1.0
             ELSE 1.0 - levenshtein(na.nt, nb.nt)::DOUBLE
               / greatest(length(na.nt), length(nb.nt)) END
             AS DECIMAL(18,8)), 4)::DOUBLE AS edit_sim
         FROM pairs
         JOIN norm na ON na.doc_id = id_a
         JOIN norm nb ON nb.doc_id = id_b
         ORDER BY id_a, id_b""",

    "dedup_cosine" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         p AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
           FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, round(CAST(cos AS DECIMAL(18,8)), 4)::DOUBLE AS cosine
         FROM p WHERE cos >= 0.4 ORDER BY id_a, id_b""",

    "dedup_winnow" ->
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
         capped AS (
           SELECT doc_id, fp FROM (
             SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS cnt FROM f)
           WHERE cnt <= 100),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, shared FROM p WHERE shared >= 5
         ORDER BY id_a, id_b""",

    "dedup_contamination" -> contaminationOracleSql,

    // streaming contamination replay: the benchmark index is fixed and the
    // 5 train batches partition the train set, so the accreted matches are
    // exactly the batch contamination — the oracle is shared verbatim
    "stream_contamination" -> contaminationOracleSql,

    // containment replay: the same distinct (id, shingle) sets, the df ≤ 64
    // rare-shingle candidate cap, shared counts, and min-size containment —
    // on the gate's documented deterministic half-sample (doc_id % 2 = 0)
    "dedup_containment" ->
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
           GROUP BY 1, 2 HAVING count(*) >= 2),
         scored AS (
           SELECT id_a, id_b, shared, sa.sz AS size_a, sb.sz AS size_b,
             round(CAST(shared::DOUBLE / least(sa.sz, sb.sz)
               AS DECIMAL(18,8)), 6)::DOUBLE AS containment,
             round(CAST(shared::DOUBLE / (sa.sz + sb.sz - shared)
               AS DECIMAL(18,8)), 6)::DOUBLE AS jaccard
           FROM cand JOIN sizes sa ON id_a = sa.doc_id
                     JOIN sizes sb ON id_b = sb.doc_id)
         SELECT * FROM scored WHERE containment >= 0.5
         ORDER BY id_a, id_b""",

    "dedup_clusters" ->
      s"""WITH RECURSIVE norm AS (
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
           UNION SELECT id_b, id_a FROM pairs),
         reach(node, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src)
         SELECT node AS doc_id, least(node, min(r)) AS cluster,
           CASE WHEN least(node, min(r)) = node THEN 1 ELSE 0 END AS keep
         FROM reach GROUP BY node ORDER BY doc_id""",

    // novelty replay: the spans gram machinery, duplicated-digest set,
    // per-doc rollups, rounded fractions (novelty from the ROUNDED frac)
    "text_novelty" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         g AS (
           SELECT doc_id, CASE WHEN len(toks) >= 8
             THEN list_transform(range(0, len(toks)-7),
               i -> md5(array_to_string(toks[i+1:i+8], ' ')))
             ELSE CAST([] AS VARCHAR[]) END AS grams FROM norm),
         x AS (SELECT doc_id, unnest(grams) AS gg FROM g),
         f AS (SELECT gg FROM x GROUP BY gg HAVING count(*) > 1),
         cnts AS (SELECT doc_id, count(*) AS n_grams FROM x GROUP BY 1),
         dups AS (
           SELECT doc_id, count(*) AS n_dup
           FROM x SEMI JOIN f USING (gg) GROUP BY 1),
         j AS (
           SELECT d.doc_id,
             CAST(coalesce(cnts.n_grams, 0) AS BIGINT) AS n_grams,
             CAST(coalesce(dups.n_dup, 0) AS BIGINT) AS n_dup_grams
           FROM documents d
           LEFT JOIN cnts ON d.doc_id = cnts.doc_id
           LEFT JOIN dups ON d.doc_id = dups.doc_id),
         sel AS (
           SELECT doc_id, n_grams, n_dup_grams,
             round(CAST(CASE WHEN n_grams = 0 THEN 0.0
               ELSE n_dup_grams::DOUBLE / n_grams END AS DECIMAL(18,8)), 4)::DOUBLE
               AS dup_frac
           FROM j)
         SELECT doc_id, n_grams, n_dup_grams, dup_frac,
           round(CAST(1.0 - dup_frac AS DECIMAL(18,8)), 4)::DOUBLE AS novelty
         FROM sel ORDER BY doc_id""",

    // entropy replay: value counts, per-term decimal staging, same
    // normalization by ln(#values) of the rounded entropy
    "stats_entropy" ->
      """WITH c AS (
           SELECT event_type AS v, count(*) AS c FROM events GROUP BY 1),
         t AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS k FROM c),
         terms AS (
           SELECT n, k,
             CAST((c::DOUBLE / n) * ln(c::DOUBLE / n) AS DECIMAL(18,8)) AS tt
           FROM c CROSS JOIN t),
         h AS (SELECT n, k, sum(tt) AS s FROM terms GROUP BY n, k),
         e AS (
           SELECT n, CAST(k AS BIGINT) AS n_values,
             round(CAST(-s AS DECIMAL(18,8)), 6)::DOUBLE AS entropy
           FROM h)
         SELECT n, n_values, entropy,
           round(CAST(CASE WHEN n_values <= 1 THEN 0.0
             ELSE entropy / ln(n_values::DOUBLE) END AS DECIMAL(18,8)), 6)::DOUBLE
             AS norm_entropy
         FROM e""",

    // MI replay: same joint/marginal tables, exact-integer ln ratios,
    // per-term decimal staging, same divide order on the rounded pieces
    "stats_mi" -> miOracleSql,
    "stats_theilu" -> theilUOracleSql,
    "stream_theilu" -> theilUOracleSql,
    // additive joint counts: the monitor's folded state equals the
    // one-pass table — identical replay
    "stream_mi" -> miOracleSql,
    // linear moment sketch: folded state reads out bit-identical
    "stream_cov" -> covOracleSql(0 to 7),

    // cluster-stats replay: the dedup_clusters transitive closure, then
    // per-cluster sizes and the count-of-counts rollup
    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE norm AS (
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
           UNION SELECT id_b, id_a FROM pairs),
         reach(node, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         lab AS (
           SELECT node AS doc_id, least(node, min(r)) AS cluster
           FROM reach GROUP BY node),
         sz AS (SELECT cluster, count(*) AS s FROM lab GROUP BY 1)
         SELECT CAST(s AS BIGINT) AS size, count(*) AS n_clusters,
           CAST(s * count(*) AS BIGINT) AS n_docs
         FROM sz GROUP BY s ORDER BY size""",

    // soft-dedup replay: components from the recursive reach, 1/size
    // weights, same ⌊buckets/n + ½⌋ keep threshold over the corpus
    "sample_dedup_weight" ->
      s"""WITH RECURSIVE $nearDupEdgesSql,
         reach(node, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         lab AS (
           SELECT node AS doc_id, least(node, min(r)) AS cluster
           FROM reach GROUP BY node),
         sz AS (SELECT cluster, count(*) AS n FROM lab GROUP BY 1),
         mem AS (SELECT lab.doc_id, lab.cluster, sz.n
                 FROM lab JOIN sz USING (cluster)),
         al AS (
           SELECT d.doc_id, coalesce(mem.cluster, d.doc_id) AS cluster,
             coalesce(mem.n, 1) AS n_members
           FROM documents d LEFT JOIN mem ON d.doc_id = mem.doc_id)
         SELECT doc_id, cluster, CAST(n_members AS BIGINT) AS n_members,
           round(CAST(1.0::DOUBLE / n_members::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE
             AS weight,
           CAST(floor(10000.0::DOUBLE / n_members::DOUBLE + 0.5::DOUBLE)
             AS BIGINT) AS rate_bp,
           ('0x'||substr(md5(doc_id::VARCHAR || 'dupw-v1'),1,15))::BIGINT % 10000
             < floor(10000.0::DOUBLE / n_members::DOUBLE + 0.5::DOUBLE) AS kept
         FROM al ORDER BY doc_id""",

    // cluster collapse replay: components from the recursive reach, winner
    // per cluster = most tokens then smallest id, emit the non-winners
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $nearDupEdgesSql,
         reach(node, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         lab AS (
           SELECT node AS doc_id, least(node, min(r)) AS cluster
           FROM reach GROUP BY node),
         tok AS (
           SELECT doc_id,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok
           FROM (SELECT doc_id, $normSql AS nt FROM documents)),
         m AS (SELECT lab.doc_id, lab.cluster, tok.ntok
               FROM lab JOIN tok USING (doc_id)),
         w AS (SELECT cluster, doc_id AS kept_doc FROM (
             SELECT cluster, doc_id,
               row_number() OVER (PARTITION BY cluster
                 ORDER BY ntok DESC, doc_id ASC) AS rn
             FROM m) WHERE rn = 1),
         cnt AS (SELECT cluster, count(*) AS n_members FROM m GROUP BY cluster)
         SELECT m.doc_id, m.cluster, w.kept_doc, cnt.n_members
         FROM m JOIN w USING (cluster) JOIN cnt USING (cluster)
         WHERE m.doc_id <> w.kept_doc ORDER BY m.doc_id""",

    // PageRank replay: 3 unrolled damped rounds of exact scaled-integer
    // floor-divide arithmetic over the symmetrized pair graph
    "graph_pagerank" ->
      s"""WITH $nearDupEdgesSql,
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
         r0 AS (SELECT src AS node, CAST(1000000000 AS BIGINT) AS "rank" FROM deg),
         i1 AS (SELECT ed.dst AS node,
             CAST(150000000 AS BIGINT)
               + (85 * CAST(sum(r0."rank" // ed.deg) AS BIGINT)) // 100 AS "rank"
           FROM ed JOIN r0 ON ed.src = r0.node GROUP BY ed.dst),
         i2 AS (SELECT ed.dst AS node,
             CAST(150000000 AS BIGINT)
               + (85 * CAST(sum(i1."rank" // ed.deg) AS BIGINT)) // 100 AS "rank"
           FROM ed JOIN i1 ON ed.src = i1.node GROUP BY ed.dst),
         i3 AS (SELECT ed.dst AS node,
             CAST(150000000 AS BIGINT)
               + (85 * CAST(sum(i2."rank" // ed.deg) AS BIGINT)) // 100 AS "rank"
           FROM ed JOIN i2 ON ed.src = i2.node GROUP BY ed.dst)
         SELECT node, "rank" FROM i3 ORDER BY node""",

    // degree-histogram replay: same containment pair screen, symmetrized,
    // two aggregations
    "graph_degree_hist" ->
      s"""WITH $boilerplateEdgesSql,
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)
         SELECT CAST(deg AS BIGINT) AS degree, count(*) AS n_nodes
         FROM deg GROUP BY deg ORDER BY degree""",

    // neighbor-Jaccard replay: hub-capped length-2 paths, anti-join against
    // existing edges, exact permille floor division
    "graph_jaccard" ->
      s"""WITH $boilerplateEdgesSql,
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         centers AS (SELECT src FROM deg WHERE deg <= 64),
         thru AS (SELECT e.src, e.dst FROM edges e JOIN centers c USING (src)),
         cand AS (
           SELECT x.dst AS id_a, y.dst AS id_b, count(*) AS common
           FROM thru x JOIN thru y ON x.src = y.src AND x.dst < y.dst
           GROUP BY x.dst, y.dst),
         newp AS (
           SELECT c.* FROM cand c
           LEFT JOIN edges e ON e.src = c.id_a AND e.dst = c.id_b
           WHERE e.src IS NULL)
         SELECT n.id_a, n.id_b, CAST(n.common AS BIGINT) AS common,
           CAST(da.deg AS BIGINT) AS deg_a, CAST(db.deg AS BIGINT) AS deg_b,
           CAST((1000 * n.common) // (da.deg + db.deg - n.common) AS BIGINT)
             AS jaccard_pm
         FROM newp n JOIN deg da ON da.src = n.id_a JOIN deg db ON db.src = n.id_b
         ORDER BY n.id_a, n.id_b""",

    // temporal-split replay: same day calendar, same ceil(0.8·n) cut rank
    // (identical IEEE double product, so the boundary day agrees), same
    // embargo band arithmetic
    "sample_temporal_split" ->
      """WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
         cut AS (
           SELECT day AS cut_day FROM (
             SELECT day, row_number() OVER (ORDER BY day) AS rn,
               count(*) OVER () AS n FROM d)
           WHERE rn = CAST(ceil(0.8 * n) AS BIGINT))
         SELECT event_id,
           CASE WHEN CAST(ts AS DATE) <= cut_day THEN 'train'
                WHEN CAST(ts AS DATE) <= cut_day + INTERVAL 1 DAY THEN 'embargo'
                ELSE 'test' END AS split
         FROM events CROSS JOIN cut ORDER BY event_id""",

    // leakage-safe split replay: cluster labels from the recursive reach,
    // split buckets hashed on the LABEL so components move atomically
    "sample_split_leakage_safe" ->
      s"""WITH RECURSIVE norm AS (
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
           UNION SELECT id_b, id_a FROM pairs),
         reach(node, r) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         lab AS (
           SELECT node AS doc_id, least(node, min(r)) AS cluster
           FROM reach GROUP BY node),
         keyed AS (
           SELECT d.doc_id, coalesce(lab.cluster, d.doc_id) AS cluster
           FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
         b AS (
           SELECT doc_id, cluster,
             ('0x'||substr(md5(cluster::VARCHAR || 'v1'),1,15))::BIGINT % 10000 AS bucket
           FROM keyed)
         SELECT doc_id, cluster,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
         FROM b ORDER BY doc_id""",

    "dedup_chunk" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         c AS (
           SELECT doc_id, CASE WHEN len(toks) >= 10
             THEN list_transform(range(0, len(toks)//10),
               i -> array_to_string(toks[i*10+1:i*10+10], ' '))
             ELSE CAST([] AS VARCHAR[]) END AS chunks FROM norm),
         x AS (SELECT doc_id, unnest(chunks) AS chunk FROM c),
         g AS (
           SELECT md5(chunk) AS chunk_fp, count(*) AS n_occ,
             count(DISTINCT doc_id) AS n_docs, min(doc_id) AS min_doc
           FROM x GROUP BY 1)
         SELECT chunk_fp, n_occ, n_docs, min_doc FROM g
         WHERE n_occ > 1 ORDER BY chunk_fp""",

    "text_pii" ->
      """WITH p AS (
           SELECT doc_id, text
             || CASE WHEN doc_id % 3 = 0
                THEN ' contact u' || doc_id::VARCHAR || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                THEN ' from 10.0.' || (doc_id % 200)::VARCHAR || '.25' ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                THEN ' call 555-123-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
             AS ptext
           FROM documents)
         SELECT doc_id,
           len(regexp_extract_all(ptext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
           len(regexp_extract_all(ptext, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
           len(regexp_extract_all(ptext, '\b\d{3}-\d{3}-\d{4}\b'))::BIGINT AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(ptext,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS red_fp
         FROM p ORDER BY doc_id""",

    // pii-by-source replay: the combined fixture, RE2 counts, the Luhn
    // fold for cards, one rollup per source
    "curate_pii_by_source" ->
      """WITH p AS (
           SELECT doc_id, source, text
             || CASE WHEN doc_id % 3 = 0
                THEN ' contact u' || doc_id::VARCHAR || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                THEN ' from 10.0.' || (doc_id % 200)::VARCHAR || '.25' ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                THEN ' call 555-123-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
             || CASE WHEN doc_id % 4 = 0 THEN ' card ' ||
                  (1000000000000000 + ((doc_id % 100000) * 9999991 + doc_id))::VARCHAR
                ELSE '' END
             AS ptext
           FROM documents),
         cand AS (
           SELECT doc_id,
             unnest(regexp_extract_all(ptext,
               '\b(\d{16}|\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4})\b')) AS c
           FROM p),
         lu AS (
           SELECT doc_id, c,
             sum(CASE WHEN (17 - i) % 2 = 0
                 THEN CASE WHEN dg * 2 > 9 THEN dg * 2 - 9 ELSE dg * 2 END
                 ELSE dg END) AS s
           FROM (
             SELECT doc_id, c, i,
               CAST(substr(regexp_replace(c, '[- ]', '', 'g'), i, 1) AS INT) AS dg
             FROM cand CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS i))
           GROUP BY doc_id, c),
         cards AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc
           FROM lu GROUP BY doc_id),
         per AS (
           SELECT p.source,
             len(regexp_extract_all(ptext,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
             len(regexp_extract_all(ptext,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni,
             len(regexp_extract_all(ptext, '\b\d{3}-\d{3}-\d{4}\b')) AS np,
             coalesce(cards.nc, 0) AS nc
           FROM p LEFT JOIN cards ON p.doc_id = cards.doc_id),
         agg AS (
           SELECT source, count(*) AS n_docs,
             CAST(sum(ne) AS BIGINT) AS n_email, CAST(sum(ni) AS BIGINT) AS n_ip,
             CAST(sum(np) AS BIGINT) AS n_phone, CAST(sum(nc) AS BIGINT) AS n_card
           FROM per GROUP BY source)
         SELECT source, n_docs, n_email, n_ip, n_phone, n_card,
           round(CAST((n_email + n_ip + n_phone + n_card)::DOUBLE * 1000.0
             / n_docs AS DECIMAL(18,8)), 4)::DOUBLE AS pii_per_1k
         FROM agg ORDER BY source""",

    // cosine-histogram replay: same md5 sample, rounded cosine, bin
    // floors and shares
    "sim_dist_hist" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         s AS (
           SELECT vec_id, v FROM e
           WHERE ('0x'||substr(md5(vec_id::VARCHAR || 'dh'),1,15))::BIGINT % 4 = 0),
         pr AS (
           SELECT CAST(floor(
             round(CAST(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
               AS DECIMAL(18,8)), 6)::DOUBLE / 0.1) AS BIGINT) AS bin
           FROM s a JOIN s b ON a.vec_id < b.vec_id),
         b AS (SELECT bin, count(*) AS n FROM pr GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM b)
         SELECT bin, bin * CAST(0.1 AS DOUBLE) AS lo, n,
           round(CAST(n::DOUBLE / tot AS DECIMAL(18,8)), 6)::DOUBLE AS frac
         FROM b CROSS JOIN t ORDER BY bin""",

    // card replay: the same synthesized candidates, RE2 extraction, and
    // the identical 16-term Luhn fold via a generate_series cross join
    "text_pii_cards" ->
      """WITH p AS (
           SELECT doc_id, text
             || CASE WHEN doc_id % 4 = 0 THEN ' card ' ||
                  (1000000000000000 + ((doc_id % 100000) * 9999991 + doc_id))::VARCHAR
                ELSE '' END
             || CASE WHEN doc_id % 6 = 0 THEN ' acct ' ||
                  substr((1000000000000000 + ((doc_id % 100000) * 1234567 + doc_id * 3))::VARCHAR, 1, 4)
                  || '-' || substr((1000000000000000 + ((doc_id % 100000) * 1234567 + doc_id * 3))::VARCHAR, 5, 4)
                  || '-' || substr((1000000000000000 + ((doc_id % 100000) * 1234567 + doc_id * 3))::VARCHAR, 9, 4)
                  || '-' || substr((1000000000000000 + ((doc_id % 100000) * 1234567 + doc_id * 3))::VARCHAR, 13, 4)
                ELSE '' END
             AS ptext
           FROM documents),
         cand AS (
           SELECT doc_id,
             unnest(regexp_extract_all(ptext, '\b(\d{16}|\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4})\b'))
               AS c
           FROM p),
         norm AS (
           SELECT doc_id, c, regexp_replace(c, '[- ]', '', 'g') AS d FROM cand),
         lu AS (
           SELECT doc_id, c,
             sum(CASE WHEN (17 - i) % 2 = 0
                 THEN CASE WHEN dg * 2 > 9 THEN dg * 2 - 9 ELSE dg * 2 END
                 ELSE dg END) AS s
           FROM (
             SELECT doc_id, c, i, CAST(substr(d, i, 1) AS INT) AS dg
             FROM norm CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS i))
           GROUP BY doc_id, c),
         agg AS (
           SELECT doc_id, count(*) AS n_candidates,
             CAST(sum(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
           FROM lu GROUP BY doc_id)
         SELECT p.doc_id,
           coalesce(n_candidates, 0)::BIGINT AS n_candidates,
           coalesce(n_valid, 0)::BIGINT AS n_valid,
           md5(regexp_replace(ptext,
             '\b(\d{16}|\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4})\b', '<CARD>', 'g')) AS red_fp
         FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id
         ORDER BY p.doc_id""",

    "pack_sequences" ->
      s"""WITH d AS (
           SELECT doc_id,
             ('0x'||substr(md5(doc_id::VARCHAR || 'pack'),1,15))::BIGINT % 32 AS shard,
             CASE WHEN length($normSql) = 0 THEN 0
                  ELSE length($normSql) - length(replace($normSql, ' ', '')) + 1
             END AS n_tok
           FROM documents),
         w AS (
           SELECT doc_id, shard, n_tok,
             (sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)::BIGINT AS strt
           FROM d)
         SELECT doc_id, shard, n_tok::BIGINT AS n_tok,
           strt // 512 AS pack, strt % 512 AS off
         FROM w ORDER BY doc_id""",

    "sample_split" ->
      """WITH b AS (
           SELECT doc_id,
             ('0x'||substr(md5(doc_id::VARCHAR || 'v1'),1,15))::BIGINT % 10000 AS bucket
           FROM documents)
         SELECT doc_id, bucket,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
         FROM b ORDER BY doc_id""",

    "sample_stratified" ->
      """WITH h AS (
           SELECT doc_id, source,
             ('0x'||substr(md5(doc_id::VARCHAR || 'v1'),1,15))::BIGINT AS hv
           FROM documents)
         SELECT doc_id, source FROM (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
           FROM h)
         WHERE rn <= 5 ORDER BY doc_id""",

    // A-ES weighted sampling: u = (hash60+1)/2^60, rank key ln(u)/w staged
    // in DECIMAL(18,8) with id tiebreak (the tfidf ranking discipline)
    "sample_weighted" ->
      s"""WITH d AS (
           SELECT doc_id, lang, $normSql AS nt FROM documents),
         tc AS (
           SELECT doc_id, lang,
             CASE WHEN length(nt) = 0 THEN 0
                  ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok
           FROM d),
         w AS (
           SELECT doc_id, lang, ntok,
             CAST(ln(((('0x'||substr(md5(doc_id::VARCHAR || 'wsample'),1,15))::BIGINT
                 + 1)::DOUBLE) / 1152921504606846976.0) / ntok::DOUBLE
               AS DECIMAL(18,8)) AS wk
           FROM tc WHERE ntok > 0)
         SELECT doc_id, lang, CAST(ntok AS BIGINT) AS n_tokens,
           CAST(rn AS BIGINT) AS sample_rank
         FROM (
           SELECT doc_id, lang, ntok,
             row_number() OVER (PARTITION BY lang ORDER BY wk DESC, doc_id ASC) AS rn
           FROM w)
         WHERE rn <= 20 ORDER BY lang, rn""",

    // gumbel replay: the text_quality chain, the same md5 uniform and
    // -ln(-ln(u)) perturbation, identical 4*q + g operation order;
    // deterministic keys make the streaming twin share it verbatim
    "sample_gumbel" -> gumbelOracleSql,
    "stream_gumbel" -> gumbelOracleSql,

    // snapshot diff: same deterministic v_old/v_new construction, md5 of
    // the normalized text as the content fingerprint
    "curate_snapshot_diff" ->
      s"""WITH o AS (
           SELECT doc_id, md5($normSql) AS old_fp FROM documents
           WHERE doc_id % 10 != 9),
         base AS (
           SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' revised' ELSE text END AS text
           FROM documents WHERE doc_id % 10 != 0),
         n AS (SELECT doc_id, md5($normSql) AS new_fp FROM base)
         SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN old_fp != new_fp THEN 'changed'
                ELSE 'unchanged' END AS status,
           old_fp, new_fp
         FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
         ORDER BY doc_id""",

    // drift replay: one union-tagged token aggregation, add-one smoothing
    // over the joint vocabulary, decimal-staged contributions, top-15
    "curate_token_drift" ->
      s"""WITH o AS (
           SELECT text FROM documents WHERE doc_id % 10 != 9),
         nb AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN text || ' revised' ELSE text END AS text
           FROM documents WHERE doc_id % 10 != 0),
         tk AS (
           SELECT tok, FALSE AS isnew FROM (
             SELECT unnest(string_split($normSql, ' ')) AS tok FROM o) WHERE tok <> ''
           UNION ALL
           SELECT tok, TRUE AS isnew FROM (
             SELECT unnest(string_split($normSql, ' ')) AS tok FROM nb) WHERE tok <> ''),
         c AS (
           SELECT tok, sum(CASE WHEN NOT isnew THEN 1 ELSE 0 END) AS c_old,
             sum(CASE WHEN isnew THEN 1 ELSE 0 END) AS c_new
           FROM tk GROUP BY tok),
         st AS (
           SELECT CAST(sum(c_old) AS BIGINT) AS t_old,
             CAST(sum(c_new) AS BIGINT) AS t_new, count(*) AS v FROM c),
         x AS (
           SELECT tok, c_old, c_new,
             CAST(((CAST(c_new AS DOUBLE) + 1.0) / (CAST(t_new AS DOUBLE) + v))
               * ln(((CAST(c_new AS DOUBLE) + 1.0) / (CAST(t_new AS DOUBLE) + v))
                   / ((CAST(c_old AS DOUBLE) + 1.0) / (CAST(t_old AS DOUBLE) + v)))
               AS DECIMAL(18,8)) AS contrib
           FROM c CROSS JOIN st)
         SELECT token, c_old, c_new, contrib FROM (
           SELECT tok AS token, CAST(c_old AS BIGINT) AS c_old,
             CAST(c_new AS BIGINT) AS c_new,
             round(contrib, 6)::DOUBLE AS contrib
           FROM x ORDER BY x.contrib DESC, tok ASC LIMIT 15)
         ORDER BY token""",

    // JSD replay: same shared count table, same smoothed p/q/m and
    // fixed-order ½p·ln(p/m)+½q·ln(q/m) terms decimal-staged before the sum
    "curate_jsd" ->
      s"""WITH o AS (
           SELECT text FROM documents WHERE doc_id % 10 != 9),
         nb AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN text || ' revised' ELSE text END AS text
           FROM documents WHERE doc_id % 10 != 0),
         tk AS (
           SELECT tok, FALSE AS isb FROM (
             SELECT unnest(string_split($normSql, ' ')) AS tok FROM o) WHERE tok <> ''
           UNION ALL
           SELECT tok, TRUE AS isb FROM (
             SELECT unnest(string_split($normSql, ' ')) AS tok FROM nb) WHERE tok <> ''),
         c AS (
           SELECT tok, sum(CASE WHEN NOT isb THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN isb THEN 1 ELSE 0 END) AS cb
           FROM tk GROUP BY tok),
         st AS (
           SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb,
             count(*) AS v
           FROM c),
         x AS (
           SELECT ta, tb, v,
             (CAST(ca AS DOUBLE) + 1.0) / (CAST(ta AS DOUBLE) + v) AS p,
             (CAST(cb AS DOUBLE) + 1.0) / (CAST(tb AS DOUBLE) + v) AS q
           FROM c CROSS JOIN st),
         t AS (
           SELECT ta, tb, v,
             CAST(0.5 * p * ln(p / ((p + q) / 2.0))
               + 0.5 * q * ln(q / ((p + q) / 2.0)) AS DECIMAL(28,12)) AS trm
           FROM x)
         SELECT ta AS n_tok_a, tb AS n_tok_b, v AS vocab,
           round(CAST(sum(trm) AS DECIMAL(18,8)), 6)::DOUBLE AS jsd
         FROM t GROUP BY 1, 2, 3""",

    // TVD/Hellinger/Bhattacharyya replay: the jsd oracle's smoothed
    // per-token p/q, |p-q| and sqrt(pq) decimal-staged before the
    // vocabulary sums, identical clamps on the readouts
    "curate_hellinger" ->
      s"""WITH o AS (
           SELECT text FROM documents WHERE doc_id % 10 != 9),
         nb AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN text || ' revised' ELSE text END AS text
           FROM documents WHERE doc_id % 10 != 0),
         tk AS (
           SELECT tok, FALSE AS isb FROM (
             SELECT unnest(string_split($normSql, ' ')) AS tok FROM o) WHERE tok <> ''
           UNION ALL
           SELECT tok, TRUE AS isb FROM (
             SELECT unnest(string_split($normSql, ' ')) AS tok FROM nb) WHERE tok <> ''),
         c AS (
           SELECT tok, sum(CASE WHEN NOT isb THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN isb THEN 1 ELSE 0 END) AS cb
           FROM tk GROUP BY tok),
         st AS (
           SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb,
             count(*) AS v
           FROM c),
         x AS (
           SELECT ta, tb, v,
             (CAST(ca AS DOUBLE) + 1.0) / (CAST(ta AS DOUBLE) + v) AS p,
             (CAST(cb AS DOUBLE) + 1.0) / (CAST(tb AS DOUBLE) + v) AS q
           FROM c CROSS JOIN st),
         t AS (
           SELECT ta, tb, v,
             CAST(abs(p - q) AS DECIMAL(28,12)) AS tv,
             CAST(sqrt(p * q) AS DECIMAL(28,12)) AS bc
           FROM x),
         s AS (
           SELECT ta, tb, v, sum(tv) AS tvs, sum(bc) AS bcs
           FROM t GROUP BY 1, 2, 3)
         SELECT ta AS n_tok_a, tb AS n_tok_b, v AS vocab,
           round(CAST(0.5 * tvs::DOUBLE AS DECIMAL(18,8)), 6)::DOUBLE AS tvd,
           round(CAST(sqrt(greatest(1.0 - bcs::DOUBLE, 0.0))
             AS DECIMAL(18,8)), 6)::DOUBLE AS hellinger,
           CASE WHEN bcs::DOUBLE <= 0.0 THEN NULL
                ELSE round(CAST(greatest(-ln(bcs::DOUBLE), 0.0)
                  AS DECIMAL(18,8)), 6)::DOUBLE END AS bhattacharyya
         FROM s""",

    // calibration replay: decimal-exact Σq/Σq², one-division moments, z
    "curate_score_calibrate" ->
      s"""WITH q AS (
           SELECT doc_id, lang,
             CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0
                       ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)) AS ql
           FROM (
             SELECT doc_id, lang, text,
               CASE WHEN length(nt) = 0 THEN 0
                    ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
               len(list_filter(string_split(nt, ' '),
                 w -> w IN ('the','and','of','to','a'))) AS nstop,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
                 AS npunct
             FROM (SELECT doc_id, lang, text, $normSql AS nt FROM documents))),
         m AS (
           SELECT lang, count(*) AS n, sum(ql) AS s, sum(ql * ql) AS s2
           FROM q GROUP BY lang),
         mm AS (
           SELECT lang,
             round(CAST(CAST(s AS DOUBLE) / n AS DECIMAL(18,8)), 4)::DOUBLE
               AS group_mean,
             round(CAST(sqrt(greatest(CAST(s2 AS DOUBLE) / n
               - pow(CAST(s AS DOUBLE) / n, 2), 0.0)) AS DECIMAL(18,8)), 4)::DOUBLE
               AS group_std
           FROM m)
         SELECT doc_id, q.lang, group_mean, group_std,
           round(CAST(CASE WHEN group_std = 0.0 THEN 0.0
             ELSE (CAST(ql AS DOUBLE) - group_mean) / group_std END
             AS DECIMAL(18,8)), 4)::DOUBLE AS z_score
         FROM q JOIN mm ON q.lang = mm.lang ORDER BY doc_id""",

    // mixture-plan replay: same parts weights, decimal-exact weight total,
    // one IEEE divide per share, availability cap + shortfall
    "curate_mixture_plan" ->
      s"""WITH avail AS (
           SELECT source,
             CAST(sum(CASE WHEN length(nt) = 0 THEN 0
                      ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END)
               AS BIGINT) AS avail_tokens
           FROM (SELECT source, $normSql AS nt FROM documents) GROUP BY source),
         w AS (
           SELECT 'src0' AS src, 60.0 AS wt UNION ALL SELECT 'src1', 1.0
           ${(2 until 20).map(i => s"UNION ALL SELECT 'src$i', 8.0").mkString(" ")}),
         j AS (
           SELECT a.source, a.avail_tokens, w.wt AS w
           FROM avail a JOIN w ON a.source = w.src),
         t AS (
           SELECT CAST(sum(CAST(w AS DECIMAL(28,10))) AS DOUBLE) AS wtot FROM j),
         p AS (
           SELECT j.source, j.avail_tokens,
             CAST(floor(j.w / t.wtot * 100000) AS BIGINT) AS target_tokens
           FROM j, t)
         SELECT source, avail_tokens, target_tokens,
           least(target_tokens, avail_tokens) AS planned_tokens,
           round(CAST(least(target_tokens, avail_tokens)::DOUBLE
               / greatest(avail_tokens, 1) AS DECIMAL(18,8)), 6)::DOUBLE
             AS keep_rate,
           target_tokens - least(target_tokens, avail_tokens) AS shortfall
         FROM p ORDER BY source""",

    // per-domain trust table: decimal-staged quality mean, exact-int dup
    // fraction, mean token count
    "curate_domains" ->
      s"""WITH q AS (
           SELECT source,
             CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0
                       ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)) AS ql,
             ntok, md5(nt) AS fp
           FROM (
             SELECT source, text, nt,
               CASE WHEN length(nt) = 0 THEN 0
                    ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
               len(list_filter(string_split(nt, ' '),
                 w -> w IN ('the','and','of','to','a'))) AS nstop,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
                 AS npunct
             FROM (SELECT source, text, $normSql AS nt FROM documents)))
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(CAST(sum(ql) AS DOUBLE) / count(*) AS DECIMAL(18,8)), 4)::DOUBLE
             AS mean_quality,
           round(CAST((count(*) - count(DISTINCT fp))::DOUBLE / count(*)
             AS DECIMAL(18,8)), 4)::DOUBLE AS dup_frac,
           round(CAST(sum(ntok)::DOUBLE / count(*) AS DECIMAL(18,8)), 4)::DOUBLE
             AS mean_tokens
         FROM q GROUP BY source ORDER BY source""",

    // domain verdict annotation: every document joined to its domain's
    // stats row, kept iff the domain clears the floors/ceilings/blocklist
    "curate_by_domain" ->
      s"""WITH q AS (
           SELECT doc_id, source,
             CAST(least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN ntok = 0 THEN 0.0
                       ELSE least(nstop * 5.0 / ntok, 1.0) END) * 0.3
               + (1.0 - CASE WHEN length(text) = 0 THEN 1.0
                             ELSE npunct::DOUBLE / length(text) END) * 0.3
               AS DECIMAL(18,8)) AS ql,
             md5(nt) AS fp
           FROM (
             SELECT doc_id, source, text, nt,
               CASE WHEN length(nt) = 0 THEN 0
                    ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS ntok,
               len(list_filter(string_split(nt, ' '),
                 w -> w IN ('the','and','of','to','a'))) AS nstop,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
                 AS npunct
             FROM (SELECT doc_id, source, text, $normSql AS nt FROM documents))),
         st AS (
           SELECT source, count(*) AS n_docs,
             round(CAST(CAST(sum(ql) AS DOUBLE) / count(*) AS DECIMAL(18,8)), 4)::DOUBLE
               AS mean_quality,
             round(CAST((count(*) - count(DISTINCT fp))::DOUBLE / count(*)
               AS DECIMAL(18,8)), 4)::DOUBLE AS dup_frac
           FROM q GROUP BY source)
         SELECT doc_id, source, mean_quality, dup_frac,
           (n_docs >= 10 AND mean_quality >= 0.63 AND dup_frac <= 0.2
             AND source != 'spamnet') AS kept
         FROM q JOIN st USING (source) ORDER BY doc_id""",

    // extensions replay: shingle counts from the norm chain, self dot from
    // list_dot_product — the SQL-surface smoke over two native expressions
    "fn_sql_extensions" ->
      s"""WITH norm AS (
           SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(0, len(toks) - 2),
                 i -> array_to_string(toks[i+1:i+3], ' ')) END) AS s
           FROM norm),
         d AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
         SELECT sh.doc_id, CAST(len(sh.s) AS INTEGER) AS n_shingles,
           round(CAST(list_dot_product(d.v, d.v) AS DECIMAL(18,8)), 4)::DOUBLE AS self_dot
         FROM sh JOIN d ON sh.doc_id = d.vec_id ORDER BY sh.doc_id""",

    // interval-join replay: integer-exact hot-bin threshold, island starts
    // nearest replay: naive per-user range join + (distance, id) rank —
    // the reference semantics the bucketed plan must reproduce exactly
  )
}
