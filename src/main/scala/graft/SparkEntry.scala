package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{Converters, DateSpan, Nm}
import graft.functions.{Dedup, TextAnalysis, Vectors}
import graft.sources.Sources
import graft.tables._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-runnable oracle in `oracleSql` where the
  * semantics are SQL-expressible (non-SQL-expressible ops get a rows-only
  * check and a ScalaTest spec instead).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("fact_load")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.8 aggregations: the reference's Sum/Count/CountDistinct/Avg/Max/Min
    // (pygrametl/aggregators.py) as one grouped plan (TPC-H Q1 shape).
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"),
          count_distinct(col("l_orderkey")).as("distinct_orders"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          round(min(col("l_extendedprice")), 2).as("min_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §7.5 flagship star-schema load: ensure dims, resolve keys, aggregate.
    "fact_load" -> ((s, dir) => {
      val customer = t(s, dir, "customer"); val nation = t(s, dir, "nation")
      val orders = t(s, dir, "orders"); val lineitem = t(s, dir, "lineitem")

      // customer dimension snowflaked onto nation (broadcast both: small dims)
      val custDim = customer.join(broadcast(nation),
        customer("c_nationkey") === nation("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))

      val facts = lineitem
        .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
        .join(broadcast(custDim), orders("o_custkey") === custDim("c_custkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).as("year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))

      facts.groupBy(col("nation"), col("year"))
        .agg(round(sum(col("revenue")), 2).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("nation"), col("year"))
    }),

    // §2.3 project/copy/rename (pygrametl/__init__.py:106-187)
    "proj_project" -> ((s, dir) => {
      Nm.project(t(s, dir, "customer"), Seq("id", "name", "segment"),
        Map("id" -> "c_custkey", "name" -> "c_name", "segment" -> "c_mktsegment"))
        .orderBy(col("id"))
    }),

    // §2.3 setdefaults (pygrametl/__init__.py:356-382)
    "proj_setdefaults" -> ((s, dir) => {
      val withNulls = t(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("acctbal"),
          when(col("c_mktsegment") === "BUILDING", lit(null)).otherwise(col("c_mktsegment")).as("segment"))
      Nm.setDefaults(withNulls, Map("acctbal" -> 0.0, "segment" -> "UNKNOWN"))
        .orderBy(col("c_custkey"))
    }),

    // §2.4 converters: cast-or-default (pygrametl/__init__.py:190-337)
    "fn_converters" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        Converters.getInt(col("o_orderpriority"), lit(-1)).as("prio_int"),
        Converters.getInt(substring(col("o_orderpriority"), 1, 1), lit(-1)).as("prio_digit"),
        Converters.getDate(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("order_date"),
        Converters.getBool(when(col("o_orderstatus") === "O", "1").otherwise("xyz"), lit(false)).as("is_open"),
        Converters.getStrippedStr(concat(lit("  "), col("o_orderstatus"), lit(" "))).as("status"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.4 datespan date-dimension generator (pygrametl/__init__.py:561-630)
    "fn_datespan" -> ((s, dir) => DateSpan(s, "1995-01-01", "1995-12-31").orderBy(col("dateid"))),

    // §2.3 FilteringSource (datasources.py:668-686)
    "src_filtering" -> ((s, dir) => {
      Sources.filtering(t(s, dir, "lineitem"),
        col("l_quantity") > 30 && col("l_discount") <= 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // §2.8 UnionSource with differing schemas (datasources.py:689-705)
    "src_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val hi = c.filter(col("c_acctbal") >= 5000)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val lo = c.filter(col("c_acctbal") < 5000)
        .select(col("c_custkey"), col("c_name")) // missing column → NULL
      Sources.union(hi, lo).orderBy(col("c_custkey"))
    }),

    // §2.5 HashJoiningSource: broadcast inner equi join, src2 wins collisions
    // (datasources.py:296-332)
    "join_hash" -> ((s, dir) => {
      val cust = t(s, dir, "customer").withColumnRenamed("c_nationkey", "nkey")
      val nat = t(s, dir, "nation").withColumnRenamed("n_nationkey", "nkey")
      Sources.hashJoining(cust, "nkey", nat, "nkey")
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("n_regionkey"))
        .orderBy(col("c_custkey"))
    }),

    // §2.5 MergeJoiningSource: large-large sort-merge join (datasources.py:335-401)
    "join_merge" -> ((s, dir) => {
      Sources.mergeJoining(t(s, dir, "lineitem"), t(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("price_sum"), count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // §2.5 semi/anti joins (ensure's building blocks)
    "join_semi" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name")).orderBy(col("c_custkey"))
    }),
    "join_anti" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")).orderBy(col("c_custkey"))
    }),

    // §2.6 Dimension.ensure: seeded dim + bulk lookup-or-insert with
    // MAX(key)+1-style key assignment (tables.py:374-425, 234-243)
    "dim_ensure" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val dim = new Dimension("brand_dim", "brand_key", Seq("p_brand"), Seq("p_brand"))
      val seed = part.filter(col("p_size") < 25).select(col("p_brand")).distinct()
        .withColumn("brand_key", dense_rank().over(Window.orderBy(col("p_brand"))).cast("long"))
      dim.init(seed.select(col("brand_key"), col("p_brand")))
      dim.ensure(part.select(col("p_partkey"), col("p_brand")))
        .select(col("p_partkey"), col("brand_key"), col("p_brand"))
        .orderBy(col("p_partkey"))
    }),

    // §2.5 Dimension.lookup with default id on miss (tables.py:245-264)
    "dim_lookup" -> ((s, dir) => {
      val dim = new Dimension("cust_dim", "c_custkey", Seq("c_name", "c_mktsegment"), Seq("c_name"))
      dim.init(t(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")))
      dim.lookup(t(s, dir, "customer").select(col("c_name").as("name"))
          .withColumnRenamed("name", "c_name"))
        .select(col("c_name"), col("c_custkey"))
        .orderBy(col("c_name"))
    }),

    // training-data op: exact dedup (hash-groupBy on content fingerprint)
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // training-data op: token counting
    "text_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.tokenEstimate(col("text")).as("n_tokens_est"))
        .orderBy(col("doc_id"))
    })
  )

  // ------------------------------------------------------------- oracle SQL

  def oracleSql: Map[String, String] = Map(

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order,
         count(DISTINCT l_orderkey) AS distinct_orders,
         round(max(l_extendedprice), 2) AS max_price,
         round(min(l_extendedprice), 2) AS min_price
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "fact_load" ->
      """SELECT n.n_name AS nation, year(o.o_orderdate) AS year,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
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

    "fn_converters" ->
      """SELECT o_orderkey,
         coalesce(TRY_CAST(o_orderpriority AS INTEGER), -1) AS prio_int,
         coalesce(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER), -1) AS prio_digit,
         TRY_CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS order_date,
         coalesce(CASE WHEN o_orderstatus = 'O' THEN true ELSE NULL END, false) AS is_open,
         trim('  ' || o_orderstatus || ' ') AS status
         FROM orders ORDER BY o_orderkey""",

    "fn_datespan" ->
      """SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS dateid,
         strftime(d, '%Y-%m-%d') AS date,
         year(d) AS year, month(d) AS month, day(d) AS day,
         dayofweek(d) + 1 AS weekday, quarter(d) AS quarter
         FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY))::DATE AS d)
         ORDER BY dateid""",

    "src_filtering" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
         WHERE l_quantity > 30 AND l_discount <= 0.05
         ORDER BY l_orderkey, l_linenumber""",

    "src_union" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal >= 5000
         UNION ALL
         SELECT c_custkey, c_name, NULL FROM customer WHERE c_acctbal < 5000
         ORDER BY c_custkey""",

    "join_hash" ->
      """SELECT c.c_custkey, c.c_name, n.n_name, n.n_regionkey
         FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
         ORDER BY c.c_custkey""",

    "join_merge" ->
      """SELECT o.o_orderstatus, round(sum(l.l_extendedprice), 2) AS price_sum, count(*) AS n
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

    "dedup_exact" ->
      """WITH fp AS (
           SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fp,
             row_number() OVER (PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) ORDER BY doc_id) AS rn
           FROM documents)
         SELECT doc_id, fp FROM fp WHERE rn = 1 ORDER BY doc_id""",

    "text_tokens" ->
      """WITH norm AS (
           SELECT doc_id, text,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')) AS nt
           FROM documents)
         SELECT doc_id,
           CASE WHEN length(nt) = 0 THEN 0 ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS n_tokens,
           (length(text) - length(replace(text, ' ', ''))) +
             CAST(ceil(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) / 4.0) AS BIGINT) AS n_tokens_est
         FROM norm ORDER BY doc_id"""
  )
}
