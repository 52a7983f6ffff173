package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, IntegerType, TimestampType}

import graft.core.{Converters, DateSpan, Nm}
import graft.functions.{Dedup, Layout, Packing, Pii, Sampling, TextAnalysis, Vectors}
import graft.sources.Sources
import graft.tables._


/** SURVEY §2 core-surface gate queries (aggregation, projection,
  * sources, joins, converters, steps). */
private[graft] object QueriesCore {
  import EntryShared._
  import EntryOracleDefs._
  def m: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ROLLUP hierarchy with grouping ids: (flag,status) → flag → grand
    // total in ONE pass — Spark expands the grouping sets BEFORE the
    // aggregation, so the whole hierarchy is still a single
    // map-side-combined shuffle, not three scans
    "agg_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("g_rf"), col("g_ls"), col("sum_qty"), col("n"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
    }),

    // CUBE: all four grouping sets (both, each alone, grand total) in the
    // same single-shuffle Expand plan — the slice-and-dice twin of
    // agg_rollup
    "agg_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("g_rf"), col("g_ls"), col("sum_qty"), col("n"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.8 aggregations: the reference's Sum/Count/CountDistinct/Avg/Max/Min
    // (pygrametl/aggregators.py) as one grouped plan (TPC-H Q1 shape).
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          round(sum(col("l_discount").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast(DoubleType) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"),
          count_distinct(col("l_orderkey")).as("distinct_orders"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          round(min(col("l_extendedprice")), 2).as("min_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §7.5 flagship star-schema load: resolve keys through dims, aggregate.
    "fact_load" -> ((s, dir) => {
      val customer = t(s, dir, "customer"); val nation = t(s, dir, "nation")
      val orders = t(s, dir, "orders"); val lineitem = t(s, dir, "lineitem")
      // nation is bounded (25 rows at every scale) -> always broadcast;
      // the customer-derived dim is unbounded -> size-gated hint only
      val custDim = customer.join(broadcast(nation),
        customer("c_nationkey") === nation("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      val facts = lineitem
        .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
        .join(graft.core.Joins.maybeBroadcast(custDim), orders("o_custkey") === custDim("c_custkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).as("year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      facts.groupBy(col("nation"), col("year"))
        .agg(dsum(col("revenue")).as("revenue"), count(lit(1)).as("n_items"))
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

    // §2.3 copy (old column fans out to new) + renamefromto + toupper
    // (pygrametl/__init__.py:130-187, 633-642)
    "proj_copy_rename" -> ((s, dir) => {
      val c = Nm.copy(t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        "name_copy" -> "c_name")
      val r = Nm.renameFromTo(c, Map("c_mktsegment" -> "segment"))
      r.select(col("c_custkey"),
        Converters.toUpper(col("name_copy")).as("name_upper"), col("segment"))
        .orderBy(col("c_custkey"))
    }),

    // §2.4 getdbfriendlystr / getstrornullvalue / ymdparser
    // (pygrametl/__init__.py:226-269, 475-495)
    "fn_str_helpers" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderkey"),
        Converters.getDbFriendlyStr(col("o_orderstatus") === "O").as("open_flag"),
        Converters.getStrOrNullValue(nullif(col("o_orderpriority"), lit("1-URGENT")), "none").as("prio_or_none"),
        Converters.ymd(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("od"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.3 TransformingSource: ordered whole-frame transforms (datasources.py:430-448)
    "src_transforming" -> ((s, dir) => {
      Sources.transforming(t(s, dir, "customer"),
        _.filter(col("c_acctbal") > 0),
        _.withColumn("bal_half", dround(col("c_acctbal") / 2, 2)))
        .select(col("c_custkey"), col("bal_half"))
        .orderBy(col("c_custkey"))
    }),

    // §2.8 AggregatingStep collapsed to a grouped plan (steps.py:467-561)
    "agg_step" -> ((s, dir) => {
      graft.functions.Aggregators.aggregate(t(s, dir, "lineitem"), Seq("l_returnflag"),
        Seq(dsum(col("l_quantity")).as("qty"),
          count_distinct(col("l_suppkey")).as("n_supp"),
          round(max(col("l_extendedprice")), 2).as("max_price")))
        .orderBy(col("l_returnflag"))
    }),

    // §2.3 ConditionalStep routing: both branches kept, tagged (steps.py:390-422)
    "steps_conditional" -> ((s, dir) => {
      val (hot, cold) = graft.steps.Steps.conditional(
        t(s, dir, "orders"), col("o_totalprice") > 150000)
      hot.withColumn("branch", lit("high"))
        .unionByName(cold.withColumn("branch", lit("low")))
        .select(col("o_orderkey"), col("branch"))
        .orderBy(col("o_orderkey"))
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

    // §2.4 datereader/datetimereader: custom-format parser factories with a
    // lenient default (pygrametl/__init__.py:519-558)
    "fn_datereader" -> ((s, dir) => {
      val rd = Converters.dateReader("dd/MM/yyyy")
      val rdDef = Converters.dateReader("dd/MM/yyyy",
        lit("1970-01-01").cast(org.apache.spark.sql.types.DateType))
      val rt = Converters.datetimeReader("dd/MM/yyyy HH:mm")
      t(s, dir, "orders").select(
        col("o_orderkey"),
        rd(date_format(col("o_orderdate"), "dd/MM/yyyy")).as("d_roundtrip"),
        rdDef(col("o_orderpriority")).as("d_bad"),
        rt(concat(date_format(col("o_orderdate"), "dd/MM/yyyy"), lit(" 12:30")))
          .as("ts_custom"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.4 datespan date-dimension generator (pygrametl/__init__.py:561-630)
    "fn_datespan" -> ((s, dir) => DateSpan(s, "1995-01-01", "1995-12-31").orderBy(col("dateid"))),

    // §2.4 datespan configurability: strings/ints dicts + expander callback
    // (pygrametl/__init__.py:561-630 — `strings`, `ints`, `expander`)
    "fn_datespan_custom" -> ((s, dir) => {
      DateSpan(s, "1997-06-01", "1997-08-31",
        strings = Seq("date" -> "yyyy-MM-dd", "monthname" -> "MMMM"),
        ints = Seq("year" -> (year(_)), "month" -> (month(_))),
        expander = Some((d, df) => df.withColumn("is_weekend", dayofweek(d).isin(1, 7))))
        .orderBy(col("dateid"))
    }),

    // bloom-filter pre-pruned semi join (scale extension): the small side's
    // keys fold into a bounded bloom that kills non-matching fact rows in
    // the scan stage, before the join shuffle; exact semi join verifies
    // survivors, so the result equals the plain semi join bit-for-bit
    "join_bloom_semi" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
      graft.core.Joins.bloomSemiJoin(t(s, dir, "lineitem"), urgent,
        "l_orderkey", "o_orderkey", expectedItems = 1L << 17, fpp = 0.01)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // §2.3 FilteringSource (datasources.py:668-686)
    "src_filtering" -> ((s, dir) => {
      Sources.filtering(t(s, dir, "lineitem"),
        col("l_quantity") > 30 && col("l_discount") <= 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // §2.3 MappingSource: per-column functions (datasources.py:404-427)
    "src_mapping" -> ((s, dir) => {
      Sources.mapping(t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_acctbal")),
        Map("c_name" -> (c => upper(c)),
            "c_acctbal" -> (c => round(c * 2, 2))))
        .orderBy(col("c_custkey"))
    }),

    // §2.3 ValueMappingStep: dictionary translation (steps.py:207-256)
    "src_valuemapping" -> ((s, dir) => {
      Sources.valueMapping(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus")),
        "status_name", "o_orderstatus",
        Map("O" -> "open", "F" -> "finished", "P" -> "pending"), "other")
        .orderBy(col("o_orderkey"))
    }),

    // §2.8 UnionSource with differing schemas (datasources.py:689-705)
    "src_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val hi = c.filter(col("c_acctbal") >= 5000)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val lo = c.filter(col("c_acctbal") < 5000)
        .select(col("c_custkey"), col("c_name"))
      Sources.union(hi, lo).orderBy(col("c_custkey"))
    }),

    // §2.8 RoundRobinSource: interleave == union + round-robin repartition
    // (datasources.py:708-738; row order is not semantic in a set engine)
    "src_roundrobin" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      Sources.roundRobin(8,
        o.filter(col("o_orderstatus") === "O"),
        o.filter(col("o_orderstatus") === "F"),
        o.filter(col("o_orderstatus") === "P"))
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.8 SQLTransformingSource: stage + declarative SQL (datasources.py:451-606)
    "src_sqltransforming" -> ((s, dir) => {
      Sources.sqlTransforming(t(s, dir, "lineitem"), "staged_lineitem",
        """SELECT l_returnflag,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty,
             count(*) AS n
           FROM staged_lineitem WHERE l_discount > 0.02
           GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // §2.8 SQLTransformingSource per-batch mode (datasources.py:536-606,
    // perbatch=True): the staged query runs once per batch — aggregations
    // aggregate per batch, intentionally different from the whole-input mode
    "src_sqltransforming_batch" -> ((s, dir) => {
      Sources.sqlTransformingPerBatch(t(s, dir, "lineitem"), "staged_li_batch",
        """SELECT l_returnflag,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty,
             count(*) AS n
           FROM staged_li_batch WHERE l_discount > 0.02
           GROUP BY l_returnflag""",
        col("l_linenumber"))
        .orderBy(col("batch"), col("l_returnflag"))
    }),

    // §2.8 CrossTabbingSource: pivot (datasources.py:609-665). Explicit pivot
    // values keep the plan single-pass (no distinct pre-scan) — required at scale.
    "src_crosstab" -> ((s, dir) => {
      Sources.crossTab(t(s, dir, "orders")
            .withColumn("o_totalprice", col("o_totalprice")
              .cast(org.apache.spark.sql.types.DecimalType(18, 4))),
          "o_orderpriority", "o_orderstatus", "o_totalprice", colValues = Seq("F", "O", "P"))
        .select(col("o_orderpriority"),
          round(col("F"), 2).cast(DoubleType).as("F"),
          round(col("O"), 2).cast(DoubleType).as("O"),
          round(col("P"), 2).cast(DoubleType).as("P"))
        .orderBy(col("o_orderpriority"))
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
      Sources.mergeJoining(t(s, dir, "lineitem"),
          t(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(dsum(col("l_extendedprice")).as("price_sum"), count(lit(1)).as("n"))
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

    // §2.10 skew-safe salted join: hot keys spread over salt buckets, small
    // side replicated — row-identical to the plain join the oracle runs
    "join_skew_salted" -> ((s, dir) => {
      val ev = events(s, dir)
      val userDim = ev.select(col("user_id")).distinct()
        .withColumn("user_tag", concat(lit("u"), col("user_id")))
      Partitioners.saltedJoin(ev.select(col("user_id"), col("value")), userDim, "user_id", 8)
        .groupBy(col("user_id"), col("user_tag"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
        .orderBy(col("user_id"))
    }),

    // §2.8 top-k per group (window row_number <= k)
    "agg_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("rank"))
        .orderBy(col("o_orderpriority"), col("rank"))
    }),

    // §2.11 custom Aggregator[IN,BUF,OUT] extension point (geometric mean)
    "agg_geomean" -> ((s, dir) => {
      val gm = udaf(graft.functions.GeometricMean)
      t(s, dir, "orders").groupBy(col("o_orderstatus"))
        .agg(round(gm(col("o_totalprice")), 2).as("geo_mean"))
        .orderBy(col("o_orderstatus"))
    }),

    // multimodal resize: real decode -> nearest-neighbor resample -> real
    // BMP re-encode; the oracle recomputes the resampled means from the
    // generation rule (a wrong index mapping or row order fails the hash)
    "mm_resize" -> ((s, dir) => {
      graft.multimodal.Multimodal.resizeImages(
        graft.multimodal.Multimodal.mediaTable(t(s, dir, "documents")), 4, 4)
        .select(col("doc_id"), col("width"), col("height"),
          col("mean_gray")) // binary content checked by spec round-trip
        .orderBy(col("doc_id"))
    }),

    // §2.11 deepest aggregate extension: TypedImperativeAggregate sketch
    // (Misra-Gries heavy hitters; exact here because the token domain — 20
    // stopwords — fits the capacity, which is what the oracle verifies; at
    // scale it degrades to the eps=1/capacity guarantee with fixed-size
    // partial sketches shuffling instead of raw rows)
    "agg_freq_tokens" -> ((s, dir) => {
      val stop = Seq("the", "and", "of", "to", "a", "der", "und", "das", "ist", "nicht",
        "le", "et", "les", "des", "une", "el", "los", "y", "las", "una")
      val toks = docsNorm(s, dir).select(col("source"),
        explode(filter(TextAnalysis.tokens(col("text")),
          t => t.isin(stop.map(lit(_)): _*))).as("tok"))
      toks.groupBy(col("source"))
        .agg(graft.plans.SketchFunctions.freqItems(col("tok"), 64).as("sketch"))
        .select(col("source"), explode(col("sketch")).as("e"))
        .select(col("source"), col("e.token").as("token"), col("e.cnt").as("cnt"))
        .orderBy(col("source"), col("cnt").desc, col("token"))
    }),

    // scalar JSON access over the events props column
    "fn_json" -> ((s, dir) => {
      events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .orderBy(col("event_id"))
    }),

    // §2.9→extension: event-time tumbling window aggregation (the batch form
    // of the Structured Streaming windowed agg; same plan shape)
    "stream_window_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
        .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("value_sum"))
        .orderBy(col("wstart"), col("event_type"))
    }),

    // streaming ingestion dedup (batch twin): re-delivered events collapse to
    // one row per event_id; the streaming form bounds state by watermark
    // (graft.streaming.Streaming.dedup — dropDuplicatesWithinWatermark)
    "stream_dedup" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val redelivered = ev.unionByName(ev.filter(col("event_id") % 3 === 0))
      graft.streaming.Streaming.dedup(redelivered, "ts", "1 hour", Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    // streaming curation: quality/langid filters (stateless) + content-
    // fingerprint dedup with watermark-bounded state — the continuous
    // ingestion form of pipeline_curate; batch twin here, streaming-mode
    // parity in StreamingSpec
    "stream_curate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("ts", timestamp_micros((col("doc_id") + 1) * lit(60000000L)))
      graft.streaming.Streaming.curate(docs, "text", "ts", "1 hour",
        minQuality = 0.3, langs = Seq("en", "de"))
        .select(col("fp"), col("lang_pred"))
        .orderBy(col("fp"))
    }),

    // streaming incremental dedup: 5 ordered micro-batches (doc_id % 5)
    // each matched against the MinHash index accreted from prior batches,
    // then absorbed — the ingestion steady state; streaming-mode parity in
    // StreamingSpec (high-recall 32x2 bands, so the oracle is the exact
    // cross-batch Jaccard over strictly-earlier batches)
    "stream_dedup_index" -> ((s, dir) => {
      val docs = docsNorm(s, dir)
      val dd = new graft.streaming.Streaming.MinHashIndexDedup(
        "doc_id", "text", n = 3, k = 64, bands = 32, threshold = 0.8)
      (0 until 5).foreach(b => dd.update(docs.filter(col("doc_id") % 5 === b)))
      dd.matches.orderBy(col("new_id"), col("match_id"))
    }),

    // streaming incremental connected components (batch replay of 4 pair
    // slices): each batch contracts through the current labels and solves
    // a batch-sized graph — the final labeling equals the from-scratch
    // solve over all pairs, which is exactly what the oracle computes
    "stream_components" -> ((s, dir) => {
      val pairs = Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, k = 64, bands = 32, threshold = 0.8)
      val frozen = org.apache.spark.sql.graftbridge.Bridge.freeze(pairs)
      val cm = new graft.streaming.Streaming.ComponentMonitor()
      (0 until 4).foreach(b =>
        cm.update(frozen.filter((col("id_a") + col("id_b")) % 4 === b)))
      cm.components
        .select(col("node").as("doc_id"), col("label").as("cluster"))
        .orderBy(col("doc_id"))
    }),

    // streaming cardinality (batch replay of 5 ordered micro-batches):
    // per-batch HLL sketches max-merged into constant-size state — by
    // mergeability the final estimate equals the full-corpus sketch, which
    // is exactly what the oracle computes
    "stream_cardinality" -> ((s, dir) => {
      val toks = docsNorm(s, dir)
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      val cm = new graft.streaming.Streaming.CardinalityMonitor("token", b = 8)
      (0 until 5).foreach(b => cm.update(toks.filter(col("doc_id") % 5 === b)))
      cm.estimate
    }),

    // streaming volume-anomaly monitor (batch replay of 5 micro-batches):
    // additive count state makes the accreted table exactly the batch count
    // table, so verdicts are bit-identical — streaming-mode parity in
    // StreamingSpec
    "stream_anomaly" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.anomalies().orderBy(col("event_type"), col("day"))
    }),

    // second readout off the SAME volume-monitor count state: daily counts
    // are additive, so the accreted seasonal-naive forecast audit equals
    // the batch events_forecast — identical oracle
    "stream_forecast" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.forecast(period = 7).orderBy(col("event_type"))
    }),

    // third readout off the SAME state: the CUSUM creep alarm — additive
    // counts make it batch-exact, identical oracle
    "stream_cusum" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.cusum(slack = 0.5, threshold = 3.0)
        .orderBy(col("event_type"), col("day"))
    }),

    // Kaplan–Meier survival over user lifetimes: retention with CENSORING
    // done right — per-user min/max spans, bounded per-lifetime table,
    // at-risk counts and the survival product both via the deterministic
    // prefix scan (exact ln-factor sums, one exp), no unpartitioned window
    "events_survival" -> ((s, dir) => {
      graft.functions.Events.kaplanMeier(events(s, dir), "user_id", "ts",
          censorDays = 7)
        .orderBy(col("t_days"))
    }),

    // streaming Kaplan–Meier (batch replay of 5 batches): per-user spans
    // merge by min/max, so the accreted state reads out the identical
    // curve — including churn-vs-censor against the advancing corpus end;
    // same oracle
    "stream_survival" -> ((s, dir) => {
      survivalState(s, dir).curve(censorDays = 7).orderBy(col("t_days"))
    }),

    // streaming Nelson–Aalen cumulative hazard: the SECOND readout of the
    // same per-user span state — the rate view next to stream_survival's
    // probability view; equals the batch events_hazard
    "stream_hazard" -> ((s, dir) => {
      survivalState(s, dir).hazard(censorDays = 7).orderBy(col("t_days"))
    }),

    // survival-time quartiles: the lifetimes at which 25/50/75% of users
    // have churned — conditional mins against the rounded KM curve; a
    // NULL median reads "censoring dominates"
    "events_survival_summary" -> ((s, dir) => {
      graft.functions.Events.survivalSummary(events(s, dir), "user_id", "ts",
        censorDays = 7)
    }),

    // streaming survival summary: THIRD readout of the same per-user span
    // state; equals the batch events_survival_summary — same oracle
    "stream_survival_summary" -> ((s, dir) => {
      survivalState(s, dir).summary(censorDays = 7)
    }),

    // Nelson–Aalen cumulative hazard over raw events: H(t) = Σ d/n-at-risk
    // off the same bounded life table as events_survival — hazard spikes
    // read directly where the KM curve only bends
    "events_hazard" -> ((s, dir) => {
      graft.functions.Events.nelsonAalen(events(s, dir), "user_id", "ts",
          censorDays = 7)
        .orderBy(col("t_days"))
    }),

    // log-rank test: do even/odd user cohorts churn differently — the
    // survival family's hypothesis test; per-arm at-risk counts off ONE
    // shared prefix scan, hypergeometric O−E / variance terms from exact
    // integers decimal-staged before the bounded sum
    "events_logrank" -> ((s, dir) => {
      val ev = events(s, dir)
      graft.functions.Events.logRank(
        ev.filter(col("user_id") % 2 === 0), ev.filter(col("user_id") % 2 === 1),
        "user_id", "ts", censorDays = 7)
    }),

    // EWMA control chart: the small-sustained-shift detector between the
    // per-day z (events_anomaly) and the creep alarm (events_cusum) — the
    // recursion unrolls exactly as a triangular self-join on the bounded
    // day table, terms decimal-staged, time-varying limits in fixed order
    "events_ewma" -> ((s, dir) => {
      graft.functions.Events.ewmaDaily(events(s, dir), "event_type", "ts",
          lambda = 0.2, limitSigmas = 3.0)
        .orderBy(col("event_type"), col("day"))
    }),

    // streaming EWMA (batch replay of 5 batches): fourth readout off the
    // same additive daily-count state as stream_anomaly / stream_forecast
    // / stream_cusum — equals the batch chart; same oracle
    "stream_ewma" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.ewma(lambda = 0.2, limitSigmas = 3.0)
        .orderBy(col("event_type"), col("day"))
    }),

    // burstiness profile: each type's daily-volume Fano factor + CV² —
    // the dispersion context the CUSUM/EWMA limits on this same state
    // should be tuned against; one aggregation of the bounded day table
    "events_burstiness" -> ((s, dir) => {
      graft.functions.Events.burstiness(events(s, dir), "event_type", "ts")
    }),

    // streaming burstiness (seventeenth readout of the same additive
    // daily-count state): equals the batch events_burstiness; same oracle
    "stream_burstiness" -> ((s, dir) => {
      volState(s, dir).burstiness
    }),

    // Mann-Kendall trend + Theil-Sen slope: the distribution-free trend
    // verdict next to the parametric stats_trend — pair directions and
    // the median pairwise slope off the triangular day-pair join on the
    // bounded daily count table, exact-integer S and tie terms,
    // continuity-corrected z in fixed double order
    "events_mannkendall" -> ((s, dir) => {
      graft.functions.Events.mannKendall(events(s, dir), "event_type", "ts")
    }),

    // streaming Mann-Kendall (batch replay of 5 batches): fifth readout
    // off the same additive daily-count state as stream_anomaly /
    // stream_cusum / stream_ewma — equals the batch verdicts; same oracle
    "stream_mannkendall" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.trend
    }),

    // daily-volume autocorrelation at lags 1..7: the seasonality /
    // momentum fingerprint — lag pairs via broadcast range x bounded day
    // table, decimal-staged cross products, exact-moment denominator
    "events_acf" -> ((s, dir) => {
      graft.functions.Events.acfDaily(events(s, dir), "event_type", "ts",
        maxLag = 7)
    }),

    // streaming ACF (batch replay of 5 batches): sixth readout off the
    // same additive daily-count state — equals the batch ACF; same oracle
    "stream_acf" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.autocorrelation(maxLag = 7)
    }),

    // Ljung-Box white-noise test: is the daily-volume ACF's structure
    // real — Q pools the 7 lag correlations off the same bounded day
    // table; n falls out of the dense pair index, terms decimal-staged
    "events_ljung_box" -> ((s, dir) => {
      graft.functions.Events.ljungBox(events(s, dir), "event_type", "ts",
        maxLag = 7)
    }),

    // streaming Ljung-Box (batch replay of 5 batches): eighth readout off
    // the same additive daily-count state — equals the batch Q; same
    // oracle
    "stream_ljung_box" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.whiteNoise(maxLag = 7)
    }),

    // Durbin-Watson on the detrended daily volumes: do residuals around
    // the per-type OLS line lean on each other — five-moment exact row,
    // fixed-order residuals, lag-1 self-join, decimal-staged quadratics
    "events_durbin_watson" -> ((s, dir) => {
      graft.functions.Events.durbinWatson(events(s, dir), "event_type", "ts")
    }),

    // streaming Durbin-Watson (batch replay of 5 batches): ninth readout
    // off the same additive daily-count state — equals the batch DW;
    // same oracle
    "stream_durbin_watson" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.residualAutocorr
    }),

    // Wilcoxon signed-rank on paired daily volumes (click vs view): day
    // by day, does one type out-fire the other — zero diffs drop, |d|
    // ranks are doubled-integer order stats off the prefix scan, exact
    // tie correction, fixed-order z
    "events_wilcoxon" -> ((s, dir) => {
      graft.functions.Events.wilcoxonSignedRank(events(s, dir),
        "click", "view", "event_type", "ts")
    }),

    // streaming Wilcoxon (batch replay of 5 batches): tenth readout off
    // the same additive daily-count state — equals the batch test; same
    // oracle
    "stream_wilcoxon" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.pairedShift("click", "view")
    }),

    // sign test over the same paired daily diffs: the assumption-free
    // floor under events_wilcoxon — exact (n, n_pos) counts, z in fixed
    // double order, no continuity correction
    "events_sign_test" -> ((s, dir) => {
      graft.functions.Events.signTest(events(s, dir),
        "click", "view", "event_type", "ts")
    }),

    // streaming sign test (batch replay of 5 batches): eleventh readout
    // off the same additive daily-count state; same oracle
    "stream_sign_test" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.pairedSign("click", "view")
    }),

    // RFM segmentation of order customers: recency/frequency/monetary
    // quintile scores against the population's own exact interpolated
    // cuts (broadcast), 4x-expansion scoring passes, deterministic
    // corpus-max anchor date
    "events_rfm" -> ((s, dir) => {
      graft.functions.Events.rfmSegments(t(s, dir, "orders"),
          "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy(col("o_custkey"))
    }),

    // market-basket pair mining over order lines: distinct (order, part)
    // frame frozen once, capped basket self-join for pairs, broadcast
    // supports, top-20 by unrounded lift with id tie-break
    "events_basket" -> ((s, dir) => {
      graft.functions.Events.basketPairs(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", minSupport = 2, topN = 20)
        .orderBy(col("lift").desc, col("item_a"), col("item_b"))
    }),

    // cohort LTV: cumulative revenue per first-order-month cohort by
    // month age — exact decimal money, cohort-partitioned running sum
    "events_cohort_ltv" -> ((s, dir) => {
      graft.functions.Events.cohortLtv(t(s, dir, "orders"),
          "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy(col("cohort_month"), col("age_months"))
    }),

    // FK audit: lineitem -> orders referential integrity both ways in one
    // verdict row (orphan lines AND childless orders), off the two
    // distinct-key tables — zero row-level joins
    "audit_fk_orphans" -> ((s, dir) => {
      graft.functions.Audits.fkAudit(
        t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders"), "o_orderkey")
    }),

    // aggregate reconciliation: o_totalprice vs the exact-decimal rollup
    // of its lines (extprice·(1−disc)·(1+tax)) at a 1-cent tolerance —
    // the trust gate before loading the batch
    "audit_reconcile" -> ((s, dir) => {
      val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
      val dec4 = org.apache.spark.sql.types.DecimalType(8, 4)
      graft.functions.Audits.reconcileSum(
        t(s, dir, "orders"), "o_orderkey", col("o_totalprice"),
        t(s, dir, "lineitem"), "l_orderkey",
        col("l_extendedprice").cast(dec2)
          * (lit(1) - col("l_discount").cast(dec4))
          * (lit(1) + col("l_tax").cast(dec4)),
        tol = 0.01)
    }),

    // streaming basket monitor (batch replay of 5 PART-keyed batches —
    // an order's lines scatter across batches, so re-pairing off the
    // accreted distinct frame is what's being proven); same oracle
    "stream_basket" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val bm = new graft.streaming.Streaming.BasketMonitor(
        "l_orderkey", "l_partkey", minSupport = 2, topN = 20)
      (0 until 5).foreach(b => bm.update(li.filter(col("l_partkey") % 5 === b)))
      bm.pairs.orderBy(col("lift").desc, col("item_a"), col("item_b"))
    }),

    // streaming FK audit (batch replay of 5 batches): parent key set
    // frozen once, additive child key counts; same oracle
    "stream_fk_audit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val fm = new graft.streaming.Streaming.FkAuditMonitor(
        t(s, dir, "orders"), "o_orderkey", "l_orderkey")
      (0 until 5).foreach(b => fm.update(li.filter(col("l_linenumber") % 5 === b)))
      fm.readout
    }),

    // streaming cohort LTV (batch replay of 5 batches): additive
    // per-(customer, month) decimal revenue, first months re-derived per
    // readout so late-arriving earlier orders reassign cohorts; same
    // oracle
    "stream_cohort_ltv" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val lm = new graft.streaming.Streaming.LtvMonitor(
        "o_custkey", "o_orderdate", "o_totalprice")
      (0 until 5).foreach(b => lm.update(o.filter(col("o_orderkey") % 5 === b)))
      lm.curve.orderBy(col("cohort_month"), col("age_months"))
    }),

    // Friedman rank test + Kendall's W: do the event types order the
    // same way day after day — days as blocks, within-day midranks from
    // the k²-per-day cell join, exact doubled-rank sums and tie term,
    // fixed-order chi²/W
    "events_friedman" -> ((s, dir) => {
      graft.functions.Events.friedmanTest(events(s, dir), "event_type", "ts")
    }),

    // streaming Friedman/W (batch replay of 5 batches): twelfth readout
    // off the same additive daily-count state; same oracle
    "stream_friedman" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.concordance
    }),

    // Page's L ordered trend: do daily volumes INCREASE along the types'
    // ordering, day after day — the directed companion of events_friedman
    // over the same within-day midranks; L exact, closed-form E/Var z
    "events_page_trend" -> ((s, dir) => {
      graft.functions.Events.pageTrendTest(events(s, dir), "event_type", "ts")
    }),

    // streaming Page trend (batch replay of 5 batches): thirteenth
    // readout off the same additive daily-count state; same oracle
    "stream_page_trend" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.pageTrend
    }),

    // Pettitt changepoint: WHICH day the volume regime shifted — per-day
    // vote sums off the bounded day-pair join, partitioned prefix U_t,
    // exact-integer K with first-day tie-break, fixed-order approximate p
    "events_pettitt" -> ((s, dir) => {
      graft.functions.Events.pettitt(events(s, dir), "event_type", "ts")
    }),

    // streaming Pettitt (batch replay of 5 batches): seventh readout off
    // the same additive daily-count state — equals the batch verdicts;
    // same oracle
    "stream_pettitt" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.changepoint
    }),

    // Holt's linear level+trend smoothing + one-step volume forecast:
    // the LINEAR recursion unrolls exactly as a broadcast join of the
    // bounded day table against precomputed A^e weight constants
    // (matrix-power form of the l/b recurrence), each weight·count term
    // decimal-staged so the sum is exact and order-free
    "events_holt" -> ((s, dir) => {
      graft.functions.Events.holtDaily(events(s, dir), "event_type", "ts")
    }),

    // streaming Holt (batch replay of 5 batches): fourteenth readout off
    // the same additive daily-count state — the recursion is linear in
    // the counts, so the accreted state reads out identically; same
    // oracle
    "stream_holt" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.holt()
    }),

    // Benjamini-Hochberg FDR control across the per-type Pettitt
    // changepoint p-values: ordinal rank and the step-up min envelope
    // p_bh = min(1, min_{j>=i} p_j·m/j) via triangular self-joins on the
    // bounded panel (deterministic key tie-break) — which of the panel's
    // alarms survive multiple-testing control at q = 0.05
    "stats_fdr_bh" -> ((s, dir) => {
      graft.functions.Stats.bhAdjust(
        graft.functions.Events.pettitt(events(s, dir), "event_type", "ts"),
        "event_type", "p_approx", q = 0.05)
    }),

    // streaming BH-FDR (batch replay of 5 batches): fifteenth readout
    // off the same additive daily-count state (Pettitt panel -> BH);
    // batch-exact because both stages are; same oracle
    "stream_fdr" -> ((s, dir) => {
      val vm = volState(s, dir)
      vm.fdrControl(0.05)
    }),

    // Bonferroni / Holm / Benjamini–Yekutieli over the same per-type
    // Pettitt changepoint panel as stats_fdr_bh: the FWER and
    // dependence-robust corrections next to BH — bounded-panel
    // triangular envelopes, decimal-staged harmonic constant
    "stats_padjust" -> ((s, dir) => {
      graft.functions.Stats.padjust(
        graft.functions.Events.pettitt(events(s, dir), "event_type", "ts"),
        "event_type", "p_approx")
    }),

    // streaming adjustment family (sixteenth readout of the same additive
    // daily-count state): equals the batch stats_padjust; same oracle
    "stream_padjust" -> ((s, dir) => {
      volState(s, dir).familywiseControl
    }),

    // streaming key concentration (batch replay of 5 micro-batches):
    // per-key counts are additive, so BOTH readouts off the one accreted
    // count state equal their batch twins — whale-factor top-k and exact
    // Gini; parity + restore in StreamingSpec
    "stream_key_skew" -> ((s, dir) => {
      val km = keyCountState(s, dir)
      km.skew(topK = 20).orderBy(col("cnt").desc, col("key").asc)
    }),

    // second readout off the SAME key-count state: the exact Gini
    "stream_gini" -> ((s, dir) => {
      val km = keyCountState(s, dir)
      km.gini()
    }),

    // Hill tail index over per-user event volumes: WHAT power law the
    // whale tail follows (alpha <= 1 reads "the mean doesn't converge")
    // — descending ranks off the Gini triangular join, top-k interval
    // clamps, decimal-staged log moments
    "stats_hill" -> ((s, dir) => {
      graft.functions.Stats.hillTail(events(s, dir), "user_id", k = 100)
    }),

    // streaming Hill tail (the FOURTH readout of the same per-user count
    // state): equals the batch stats_hill; same oracle
    "stream_hill" -> ((s, dir) => {
      keyCountState(s, dir).tail(k = 100)
    }),

    // effective sample size / design effect of a value-weighted sample:
    // how much statistical information the weighted rows actually carry
    // — one aggregation of staged weight moments, Kish ESS + deff + CV
    "stats_ess" -> ((s, dir) => {
      graft.functions.Stats.designEffect(events(s, dir), col("value"))
    }),

    // streaming Simpson concentration (the THIRD readout of the same
    // per-user count state): live collision probability / effective-key
    // count — equals the batch stats_simpson
    "stream_simpson" -> ((s, dir) => {
      keyCountState(s, dir).concentration()
    }),

    // streaming cohort retention (batch replay of 5 micro-batches): the
    // activity-state design re-derives the exact batch rollup after every
    // batch, late back-dating included — streaming-mode parity in
    // StreamingSpec
    "stream_retention" -> ((s, dir) => {
      val rm = retentionState(s, dir)
      rm.retention.orderBy(col("cohort_day"), col("offset_days"))
    }),

    // second readout off the SAME retention-monitor activity state: the
    // DAU/WAU stickiness table — one accreted state, both dashboards
    "stream_stickiness" -> ((s, dir) => {
      val rm = retentionState(s, dir)
      rm.stickiness().orderBy(col("day"))
    }),

    // streaming ANN index ingestion (batch replay of 4 ordered micro-
    // batches): the coarse quantizer freezes on the first batch, every
    // batch routes at scan speed onto it and accretes into the IVF index,
    // queries probe 4 clusters — streaming-mode parity in StreamingSpec
    "stream_ann_ingest" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      val ing = new graft.streaming.Streaming.IvfIndexIngest(
        "vec_id", "v", nCentroids = 16, nProbe = 4)
      (0 until 4).foreach(b => ing.update(e.filter(col("vec_id") % 4 === b)))
      ing.topK(e.filter(col("vec_id") < 10), "vec_id", "v", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // streaming ANN ingestion WITH index compaction (batch replay of 4
    // micro-batches, maxMeanList=4): mid-stream compactions trip
    // GEOMETRICALLY (mean-list bar exceeded AND index doubled — amortized
    // O(sqrt n)/vector ingest), and seal() closes the stream with the
    // deterministic re-route onto the ceil(sqrt(n)) lowest-id vectors of
    // the whole corpus — the batch-boundary-independent closed form the
    // oracle replays; the sqrt split keeps probe cost O(sqrt n) and the
    // re-route subquadratic (the old n/4 quantizer measured 36x at 10x)
    "stream_ann_compact" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      val ing = new graft.streaming.Streaming.IvfIndexIngest(
        "vec_id", "v", nCentroids = 16, nProbe = 4, maxMeanList = 4)
      (0 until 4).foreach(b => ing.update(e.filter(col("vec_id") % 4 === b)))
      ing.seal()
      ing.topK(e.filter(col("vec_id") < 10), "vec_id", "v", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // streaming contamination monitor (batch replay of 5 train batches):
    // the benchmark fingerprint index freezes once, each batch matches
    // batch-proportionally — accreted hits equal the batch contamination
    "stream_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cm = new graft.streaming.Streaming.ContaminationMonitor(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        "doc_id", "text", minShared = 3)
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      (0 until 5).foreach(b => cm.update(train.filter(col("doc_id") % 5 === b)))
      cm.matches.orderBy(col("train_id"), col("bench_id"))
    }),

    // streaming quantile monitor (batch replay of 5 micro-batches):
    // fixed-width histogram state is additive and value-range-bounded, so
    // the accreted bin table IS the corpus histogram and the threshold
    // picks are bit-identical to the batch scan
    "stream_quantile" -> ((s, dir) => {
      val ev = events(s, dir)
      val qm = new graft.streaming.Streaming.QuantileMonitor("value", width = 10.0)
      (0 until 5).foreach(b => qm.update(ev.filter(col("event_id") % 5 === b)))
      qm.quantiles(Seq(0.5, 0.9, 0.99)).orderBy(col("q"))
    }),

    // streaming transition monitor (batch replay of 5 DAY-RANGE batches —
    // per-user time-ordered, the monitor's arrival contract): hop counts
    // accrete additively with the per-user last event carried across the
    // batch boundary, so the matrix equals the batch transitions over all
    // events — streaming-mode parity in StreamingSpec
    "stream_transitions" -> ((s, dir) => {
      val ev = events(s, dir)
      val tm = new graft.streaming.Streaming.TransitionMonitor(
        "user_id", "event_type", "ts", "event_id")
      // 6 buckets: day 31 lands in bucket 5 — never silently dropped
      (0 until 6).foreach(b =>
        tm.update(ev.filter(floor((dayofmonth(col("ts")) - 1) / 6) === b)))
      tm.matrix.orderBy(col("from_type"), col("to_type"))
    }),

    // streaming inter-arrival monitor (batch replay of 5 time-ordered
    // batches): carried last event per (user,type) closes cross-batch
    // gaps exactly once — same oracle as the batch operator
    "stream_interarrival" -> ((s, dir) => {
      val ev = events(s, dir)
      val im = new graft.streaming.Streaming.InterarrivalMonitor(
        "user_id", "event_type", "ts", "event_id",
        widthSeconds = 600L, capBuckets = 144)
      // 6 buckets: day 31 lands in bucket 5 — never silently dropped
      (0 until 6).foreach(b =>
        im.update(ev.filter(floor((dayofmonth(col("ts")) - 1) / 6) === b)))
      im.histogram.orderBy(col("event_type"), col("gap_bucket"))
    }),

    // streaming covariance monitor (batch replay of 5 batches): the moment
    // row is a LINEAR sketch (count + exact decimal sums), so the folded
    // state reads out bit-identical to the one-pass corpus build — same
    // oracle as stats_embedding_cov
    "stream_cov" -> ((s, dir) => {
      covState(s, dir).matrix.orderBy(col("dim_i"), col("dim_j"))
    }),

    // streaming Cronbach alpha (the SECOND readout of the same 1-row
    // moment state): live internal-consistency over the arriving
    // embedding dims — equals the batch stats_cronbach
    "stream_cronbach" -> ((s, dir) => {
      covState(s, dir).consistency
    }),

    // Cronbach's alpha over embedding dims 0-7: how much the dims measure
    // ONE latent direction (the MRL-truncation / judge-agreement number)
    // — one moment pass, fixed-order variance chain
    "stats_cronbach" -> ((s, dir) => {
      graft.functions.Vectors.cronbachAlpha(t(s, dir, "embeddings"),
        "embedding", 0 to 7)
    }),

    // streaming AUC monitor (batch replay of 5 batches): per-score counts
    // fold additively, the rank-sum readout equals the batch AUC — same
    // oracle as curate_auc
    "stream_auc" -> ((s, dir) => {
      val am = aucDocsState(s, dir)
      am.readout
    }),

    // cumulative gains/lift table: top-k/10 curation budgets scored
    // against the classifier — decile boundary rows via two
    // conditional-min order stats on the top-first prefix scan of the
    // same per-score count table curate_auc reduces
    "curate_gains" -> ((s, dir) => {
      graft.functions.Stats.gainsCurve(docsNorm(s, dir),
        TextAnalysis.classifierMicroSum(col("text"), "clf-v1"),
        dround(TextAnalysis.qualityScoreRaw(col("text")), 4) >= 0.5,
        deciles = 10)
    }),

    // streaming gains (batch replay of 5 batches): fourth readout off the
    // same additive per-score state as stream_auc — equals the batch
    // curate_gains; same oracle
    "stream_gains" -> ((s, dir) => {
      aucDocsState(s, dir).gains(deciles = 10)
    }),

    // confusion-matrix metrics at the zero cut: MCC / balanced accuracy /
    // Youden's J — the class-imbalance-honest admission numbers P/R/F1
    // can't see (they ignore the true negatives); four conditional sums
    // on the same per-score count table
    "curate_confusion" -> ((s, dir) => {
      graft.functions.Stats.confusionMetrics(docsNorm(s, dir),
        TextAnalysis.classifierMicroSum(col("text"), "clf-v1"),
        dround(TextAnalysis.qualityScoreRaw(col("text")), 4) >= 0.5,
        threshold = 0.0)
    }),

    // streaming confusion metrics (batch replay of 5 batches): fifth
    // readout off the same additive per-score state as stream_auc —
    // equals the batch curate_confusion; same oracle
    "stream_confusion" -> ((s, dir) => {
      aucDocsState(s, dir).confusion(threshold = 0.0)
    }),

    // expected calibration error: is the 4dp quality score honest as a
    // probability of the classifier's verdict — bin-weighted
    // |confidence − accuracy| gap (ECE) + worst bin (MCE) off one
    // bounded-bin aggregation
    "curate_ece" -> ((s, dir) => {
      graft.functions.Stats.calibrationError(docsNorm(s, dir),
        dround(TextAnalysis.qualityScoreRaw(col("text")), 4),
        TextAnalysis.classifierMicroSum(col("text"), "clf-v1") >= 0L,
        bins = 10)
    }),

    // streaming P/R operating points (batch replay of 5 batches): the SAME
    // additive per-score state as stream_auc, read out at the three cuts —
    // same oracle as curate_pr_curve
    "stream_pr_curve" -> ((s, dir) => {
      val am = aucDocsState(s, dir)
      am.operatingPoints(Seq(-2000000.0, 0.0, 2000000.0))
        .orderBy(col("threshold"))
    }),

    // streaming reliability (batch replay of 5 batches): the third readout
    // of the stream_auc state — binning commutes with counting, so the
    // calibration table equals the batch one; same oracle
    "stream_reliability" -> ((s, dir) => {
      val am = aucDocsState(s, dir)
      am.calibration(width = 2000000.0).orderBy(col("bin"))
    }),

    // streaming kappa monitor (batch replay of 5 batches): the 2×2
    // confusion row folds by plain addition, the readout equals the batch
    // kappa — same oracle as curate_kappa
    "stream_kappa" -> ((s, dir) => {
      val km = kappaState(s, dir)
      km.readout
    }),

    // streaming McNemar (batch replay of 5 batches): second readout off
    // the same additive confusion state as stream_kappa — equals the
    // batch test; same oracle as curate_mcnemar
    "stream_mcnemar" -> ((s, dir) => {
      val km = kappaState(s, dir)
      km.disagreement
    }),

    // Cochran's Q across the three-filter panel (quality rule, token
    // floor, length cap): do the filters keep at the same rate given the
    // documents' own keep-ability — exact-integer numerator/denominator
    // off ONE scan+reduce, the k-way generalization of curate_mcnemar
    "curate_cochranq" -> ((s, dir) => {
      graft.functions.Curation.cochranQ(t(s, dir, "documents"), Seq(
        dround(TextAnalysis.qualityScoreRaw(col("text")), 4) >= 0.5,
        TextAnalysis.tokenCount(col("text")) >= 25,
        col("n_chars") <= 500))
    }),

    // streaming Cochran's Q (batch replay of 5 batches): the 1-row panel
    // state folds by plain addition — equals the batch Q; same oracle
    "stream_cochranq" -> ((s, dir) => {
      val cm = cochranState(s, dir)
      cm.readout
    }),

    // Fleiss' kappa over the same three-filter panel: beyond-chance
    // AGREEMENT next to curate_cochranq's rate test — exact-integer P-bar
    // off the same 1-row state, kappa from 6dp-rounded pieces
    "curate_fleiss" -> ((s, dir) => {
      graft.functions.Curation.fleissKappa(t(s, dir, "documents"), Seq(
        dround(TextAnalysis.qualityScoreRaw(col("text")), 4) >= 0.5,
        TextAnalysis.tokenCount(col("text")) >= 25,
        col("n_chars") <= 500))
    }),

    // Krippendorff's alpha over the same three-filter panel: the
    // finite-sample-corrected reliability verdict next to curate_fleiss
    // — observed vs expected pairwise disagreement off the SAME 1-row
    // additive panel state, D_e products HUGEINT/decimal-staged
    "curate_krippendorff" -> ((s, dir) => {
      graft.functions.Curation.krippendorffAlpha(t(s, dir, "documents"), Seq(
        dround(TextAnalysis.qualityScoreRaw(col("text")), 4) >= 0.5,
        TextAnalysis.tokenCount(col("text")) >= 25,
        col("n_chars") <= 500))
    }),

    // streaming Krippendorff (batch replay of 5 batches): third readout
    // off the same additive panel state as stream_cochranq /
    // stream_fleiss; same oracle
    "stream_krippendorff" -> ((s, dir) => {
      val cm = cochranState(s, dir)
      cm.alphaReliability
    }),

    // streaming Fleiss (batch replay of 5 batches): second readout off
    // the same additive panel state as stream_cochranq — equals the
    // batch kappa; same oracle
    "stream_fleiss" -> ((s, dir) => {
      val cm = cochranState(s, dir)
      cm.agreement
    }),

    // streaming mixture monitor (batch replay of 5 batches): per-group
    // token masses fold additively, the readout derives the same τ-sampling
    // rate table the batch sampler computes over all rows seen
    "stream_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val mm = new graft.streaming.Streaming.MixtureMonitor("lang",
        TextAnalysis.tokenCount(col("text")))
      (0 until 5).foreach(b => mm.update(docs.filter(col("doc_id") % 5 === b)))
      mm.rates(alpha = 0.7, budgetFrac = 0.5).orderBy(col("lang"))
    }),

    // streaming MI monitor (batch replay of 5 time-ordered batches): joint
    // counts are additive per key, so the folded state reads out equal to
    // the batch MI — same oracle as stats_mi
    "stream_mi" -> ((s, dir) => {
      // joint counts are order-free, so batch by id — covers every row
      // for ANY time span
      val mm = miHrState(s, dir)
      mm.readout
    }),

    // streaming Count-Min monitor (batch replay of 5 batches): the CMS is
    // a LINEAR sketch, so the accreted cells are bit-identical to the
    // one-pass corpus build — same oracle as sketch_cms
    "stream_cms" -> ((s, dir) => {
      val docs = docsNorm(s, dir)
      def toks(d: DataFrame) = d
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      val cm = new graft.streaming.Streaming.CmsMonitor("token", depth = 4, width = 512)
      (0 until 5).foreach(b => cm.update(toks(docs.filter(col("doc_id") % 5 === b))))
      val truec = toks(docs).groupBy(col("token")).agg(count(lit(1)).as("true_cnt"))
      val top = truec.orderBy(col("true_cnt").desc, col("token").asc).limit(20)
      cm.estimate(top, "token").join(top, Seq("token"))
        .select(col("token"), col("true_cnt"), col("cms_est"))
        .orderBy(col("token"))
    }),

    // stream-static enrichment monitor (batch replay of 5 batches): the
    // customer dimension freezes once and every micro-batch broadcast-joins
    // it; additive per-segment totals equal the one-shot batch join+rollup
    "stream_enrich" -> ((s, dir) => {
      val ev = events(s, dir)
      val em = new graft.streaming.Streaming.EnrichMonitor(
        t(s, dir, "customer"), "c_custkey", "c_mktsegment", "user_id", "value")
      (0 until 5).foreach(b => em.update(ev.filter(col("event_id") % 5 === b)))
      em.result.orderBy(col("segment"))
    }),

    // streaming lateness monitor (batch replay of 5 id-keyed batches, so
    // arrival order scrambles event time): per-type counts of rows older
    // than the carried high-watermark minus 1 hour — the rows a
    // watermarked operator would drop; sizes the watermark before losses
    "stream_late" -> ((s, dir) => {
      val ev = events(s, dir)
      val lm = new graft.streaming.Streaming.LatenessMonitor("event_type", "ts", "1 HOUR")
      (0 until 5).foreach(b => lm.update(ev.filter(col("event_id") % 5 === b)))
      lm.lateCounts.orderBy(col("event_type"))
    }),

    // streaming entry-path monitor (batch replay of 5 DAY-RANGE batches —
    // the per-user time-ordered arrival contract): carried prefixes
    // re-cut at depth equal the batch entryPaths over the full stream
    "stream_paths" -> ((s, dir) => {
      val ev = events(s, dir)
      val pm = new graft.streaming.Streaming.PathMonitor(
        "user_id", "event_type", "ts", "event_id", depth = 3)
      // 6 buckets: day 31 lands in bucket 5 — never silently dropped
      (0 until 6).foreach(b =>
        pm.update(ev.filter(floor((dayofmonth(col("ts")) - 1) / 6) === b)))
      pm.paths.orderBy(col("path"))
    }),

    // session windows (gap-based) — streaming-capable sessionization
    "stream_sessionize" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("value_sum"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("value_sum"))
        .orderBy(col("user_id"), col("session_start"))
    })
  )
}
