package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.functions.{Curation, Dedup, Events, Layout, Packing, Pii, Sampling, Stats, TextAnalysis, Vectors}
import graft.tables.ScdDimension

/** 10× scale proof: run representative operator pipelines at 1× (sf0.1) and
  * at a synthesized 10× of the same data, and check per-row cost does not
  * grow super-linearly — the evidence that the partition/shuffle strategy
  * holds as data grows, not just that small-SF results are correct.
  *
  * The 10× documents set salts every token per copy (`c<k>` prefix), so
  * within-copy near-duplicate structure is preserved while cross-copy
  * n-gram Jaccard collapses to ~0 — near-dup PAIRS scale linearly with
  * copies, keeping the workload shape honest (plain duplication would grow
  * pairs quadratically and measure the wrong thing). Events shift user_id /
  * event_id ranges per copy so key cardinality scales with the data.
  *
  * Usage: `runMain graft.tools.ScaleBench [reportPath]` (writes a markdown
  * report; default SCALECHECK_r05.md). SPARK_GRAFT_SF_DIR picks the base
  * scale (default sf0.1).
  */
object ScaleBench {

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val report = args.headOption.getOrElse("SCALECHECK_r06.md")
    val copies = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-scalebench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- inputs: 1x from parquet; 10x synthesized and re-read from parquet
    // (both sides scan parquet, so the comparison excludes synthesis cost)
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val ev1 = graft.sources.EventsReader.read(spark, sfDir)

    val nDocs = docs1.count()
    // offset by max+1, not the row count: sparse ids would collide across copies
    val maxDoc = docs1.agg(max("doc_id")).head().getLong(0) + 1
    val maxUser = ev1.agg(max("user_id")).head().getLong(0) + 1
    val maxEvent = ev1.agg(max("event_id")).head().getLong(0) + 1

    val scaleDir = "target/scale10"
    val docs10Path = s"$scaleDir/documents10.parquet"
    val ev10Path = s"$scaleDir/events10.parquet"
    (0 until copies).map { k =>
      docs1.select(
        (col("doc_id") + lit(k.toLong * maxDoc)).as("doc_id"),
        // per-copy token salt: preserves within-copy near-dup structure,
        // kills cross-copy similarity -> pair count scales linearly
        regexp_replace(col("text"), "(\\S+)", s"c$k" + "$1").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionByName(_)).write.mode("overwrite").parquet(docs10Path)
    (0 until copies).map { k =>
      ev1.select(
        (col("event_id") + lit(k.toLong * maxEvent)).as("event_id"), col("ts"),
        (col("user_id") + lit(k.toLong * maxUser)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_.unionByName(_)).write.mode("overwrite").parquet(ev10Path)
    val docs10 = spark.read.parquet(docs10Path)
    val ev10 = spark.read.parquet(ev10Path)

    // embeddings: copies shift vec_id and flip component signs on odd copies
    // (cheap per-copy decorrelation; codebook/ADC work is linear in rows
    // either way, the flip just keeps 10x cluster populations honest)
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val maxVec = emb1.agg(max("vec_id")).head().getLong(0) + 1
    val emb10Path = s"$scaleDir/embeddings10.parquet"
    (0 until copies).map { k =>
      emb1.select((col("vec_id") + lit(k.toLong * maxVec)).as("vec_id"),
        (if (k % 2 == 0) col("v")
         else transform(col("v"), x => -x)).as("v"))
    }.reduce(_.unionByName(_)).write.mode("overwrite").parquet(emb10Path)
    val emb10 = spark.read.parquet(emb10Path)

    // ---- workloads (each a function of its input tables)
    def minhash(d: DataFrame): Unit =
      force(Dedup.minhashPairs(d, "doc_id", "text", n = 3, k = 64, bands = 32, threshold = 0.8))
    def exactDedup(d: DataFrame): Unit = force(Dedup.exact(d, "text", "doc_id"))
    def textStack(d: DataFrame): Unit =
      force(d.select(col("doc_id"),
        TextAnalysis.qualityScoreRaw(col("text")).as("q"),
        TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.tokenCount(col("text")).as("toks")))
    def scd2(e: DataFrame): Unit = {
      val dim = new ScdDimension("sb_scd", "user_key",
        Seq("user_id", "event_type", "version", "valid_from", "valid_to"),
        Seq("user_id"), "version", "valid_from", "valid_to",
        maxTo = lit(null).cast(TimestampType))
      dim.init(e.select(lit(0L).as("user_key"), col("user_id"), col("event_type"),
        lit(1).as("version"), col("ts").as("valid_from"), col("ts").as("valid_to")).limit(0))
      dim.scdensure(e.select(col("user_id"), col("event_type"), col("ts")), col("ts"))
      force(dim.current)
    }
    def agg(e: DataFrame): Unit =
      force(e.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v")))
    def winnow(d: DataFrame): Unit =
      force(Dedup.winnowPairs(d, "doc_id", "text", minShared = 5, maxDocsPerFp = 100))
    def chunks(d: DataFrame): Unit = force(Dedup.chunkDups(d, "doc_id", "text"))
    def pii(d: DataFrame): Unit =
      force(d.select(col("doc_id"), Pii.piiCount(col("text")).as("n"),
        md5(Pii.redact(col("text"))).as("fp")))
    def pack(d: DataFrame): Unit =
      force(Packing.packPlan(d, "doc_id", TextAnalysis.tokenCount(col("text"))))
    // gate forced to 0 so the ratio measures the DISTRIBUTED propagation
    // loop — the 100 TB path — not the driver-side union-find shortcut
    def cc(pairs: DataFrame): Unit =
      force(Dedup.connectedComponents(pairs, localEdgeGate = 0L))
    def classifier(d: DataFrame): Unit =
      force(d.select(col("doc_id"),
        TextAnalysis.classifierMargin(col("text"), "clf-v1").as("m")))
    def mixture(d: DataFrame): Unit =
      force(Sampling.mixtureSample(d, "lang", "doc_id",
        TextAnalysis.tokenCount(col("text")),
        Map("en" -> 0.5, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.1, "zh" -> 0.1),
        budgetFrac = 0.5, salt = "m1").select(col("doc_id"), col("kept")))
    def bpePairs(d: DataFrame): Unit =
      force(d.select(explode(TextAnalysis.tokenPairs(col("text"))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc).limit(50))
    def pqEncode(e: DataFrame): Unit =
      force(Vectors.pqEncode(e, "vec_id", "v", dim = 64, m = 16,
        Vectors.pqTrain(e, "vec_id", "v", dim = 64, m = 16, k = 32, iters = 1)))
    def shardBal(d: DataFrame): Unit =
      force(Layout.shardStats(Layout.shardBalanced(
        d.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("nt")),
        "doc_id", "nt", 8), "nt"))
    def docFreq(d: DataFrame): Unit = {
      val toks = d.select(col("doc_id"),
          explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
        .filter(col("tok") =!= "")
      val dfTab = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      force(toks.join(dfTab, "tok").groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("df")).as("s")))
    }
    def zorder(e: DataFrame): Unit =
      force(Layout.zorderStats(e,
        (col("user_id") % 256).cast("long"), (col("event_id") % 256).cast("long"),
        bits = 8, files = 16))
    def project(e: DataFrame): Unit =
      force(e.select(col("vec_id"),
        graft.plans.NativeFunctions.randomProjection(col("v"), 16).as("p")))
    def dsir(d: DataFrame): Unit =
      force(graft.functions.Retrieval.dsirScore(d, "doc_id", "text",
        col("lang") === "en"))
    def spans(d: DataFrame): Unit =
      force(Dedup.duplicateSpans(d, "doc_id", "text", k = 8))
    def tfidf(d: DataFrame): Unit =
      force(graft.functions.Retrieval.tfidfKeywords(d, "doc_id", "text", perDoc = 3))
    def wsample(d: DataFrame): Unit =
      force(graft.functions.Sampling.weightedSample(
        d.withColumn("w", graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")),
        Seq("lang"), "doc_id", col("w"), k = 20, salt = "sb"))
    def curate(d: DataFrame): Unit =
      force(graft.functions.Curation.curateByDomain(d, "source", "text",
        minMeanQuality = 0.63, maxDupFrac = 0.2, minDocs = 10))
    def entropy(d: DataFrame): Unit =
      force(graft.functions.Retrieval.tokenEntropyScores(d, "doc_id", "text"))
    def bigram(d: DataFrame): Unit =
      force(graft.functions.Retrieval.bigramLogProb(d, "doc_id", "text",
        isTrain = col("doc_id") % 10 =!= 0))
    def cms(d: DataFrame): Unit = {
      val toks = d.select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
      val sk = graft.functions.Stats.countMinSketch(toks, "token", depth = 4, width = 512)
      force(graft.functions.Stats.countMinEstimate(sk,
        toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("token").asc).limit(20),
        "token", depth = 4, width = 512))
    }
    // negativeSample's documented 100 TB tuning: `buckets` grows with the
    // corpus so the per-query candidate pool stays CONSTANT — the 10x side
    // probes 4 of 160 buckets where the 1x side probes 4 of 16, drawing the
    // same ~|C|/4-sized pool from a 10x corpus. Queries are the same fixed
    // probe set on both sides.
    def negSample(e: DataFrame, buckets: Int): Unit =
      force(Vectors.negativeSample(emb1.filter(col("vec_id") < 10), e,
        "vec_id", "v", "vec_id", "v", k = 5, excludeK = 5, salt = "sb",
        buckets = buckets, probes = 4))
    def editVerify(d: DataFrame): Unit = {
      val pairs = Dedup.minhashPairs(d, "doc_id", "text", n = 3, k = 64,
        bands = 32, threshold = 0.8)
      force(Dedup.editVerify(pairs, "id_a", "id_b", d, "doc_id", "text"))
    }
    def pagerank(pairs: DataFrame): Unit =
      force(graft.functions.Graphs.pageRankScaled(pairs, iterations = 3))
    def keepBest(d: DataFrame, pairs: DataFrame): Unit =
      force(Dedup.keepBest(Dedup.clusters(pairs), d, "doc_id", "text"))
    def hll(d: DataFrame): Unit =
      force(graft.functions.Stats.hllEstimate(graft.functions.Stats.hllRegisters(
        d.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
          .filter(col("token") =!= ""), "token")))
    def pplBuckets(d: DataFrame): Unit =
      force(graft.functions.Curation.perplexityBuckets(d, "doc_id", "text", "lang"))
    def coreset(e: DataFrame): Unit =
      force(Vectors.kCenterCoreset(e, "vec_id", "v", k = 4))
    def rouge(d: DataFrame): Unit = {
      val pairs = Dedup.contamination(
        d.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text", minShared = 3)
      force(graft.functions.Retrieval.rouge2(pairs, "train_id", "bench_id",
        d, "doc_id", "text"))
    }
    def spansCut(d: DataFrame): Unit =
      force(Dedup.cutSpans(d, "doc_id", "text", k = 8))
    def pmi(d: DataFrame): Unit =
      force(graft.functions.Retrieval.collocations(d, "text", minCount = 5, topK = 50))
    def cmsWeighted(d: DataFrame): Unit = {
      val counts = d.select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("c"))
      force(graft.functions.Stats.countMinSketchOfCounts(counts, "token", "c",
        depth = 4, width = 512))
    }

    // the CC loop is measured over PRE-MATERIALIZED pair sets so the ratio
    // isolates label propagation (minhash candidate generation is its own
    // row above); salted copies keep the 10x pair count linear in copies
    val ccPairs1 = org.apache.spark.sql.graftbridge.Bridge.freeze(
      Dedup.minhashPairs(docs1, "doc_id", "text", n = 3, k = 64, bands = 32, threshold = 0.8))
    val ccPairs10 = org.apache.spark.sql.graftbridge.Bridge.freeze(
      Dedup.minhashPairs(docs10, "doc_id", "text", n = 3, k = 64, bands = 32, threshold = 0.8))
    val nPairs1 = ccPairs1.count(); val nPairs10 = ccPairs10.count()

    // fixed merge table for the bpe_apply workload (trained once, untimed)
    val applyMerges = TextAnalysis.bpeTrain(docs1, "text", nMerges = 6)
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

    // customers: copies shift keys and prefix names per copy, so linkage
    // blocks (nation × name-prefix) stay copy-local — block COUNT grows
    // 10x at constant block size, the correct ER scale shape
    val cust1 = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val nCust = cust1.count()
    val maxCust = cust1.agg(max("c_custkey")).head().getLong(0) + 1
    val cust10Path = s"$scaleDir/customer10.parquet"
    (0 until copies).map { k =>
      cust1.select((col("c_custkey") + lit(k.toLong * maxCust)).as("c_custkey"),
        concat(lit(s"c$k"), col("c_name")).as("c_name"), col("c_nationkey"))
    }.reduce(_.unionByName(_)).write.mode("overwrite").parquet(cust10Path)
    val cust10 = spark.read.parquet(cust10Path)

    def linkW(cust: DataFrame): DataFrame = {
      val incoming = cust.filter(col("c_custkey") % 4 === 0)
        .select((col("c_custkey") + 100000000L).as("in_id"),
          concat(col("c_name").substr(lit(1), length(col("c_name")) - 1), lit("x"))
            .as("in_name"),
          col("c_nationkey").as("in_nation"))
      graft.functions.Linkage.blockedLink(cust, incoming,
        "c_custkey", "in_id", "c_name", "in_name",
        Seq("c_nationkey" -> "in_nation"), minSim = 0.9)
    }

    def overlapW(e: DataFrame): DataFrame = {
      def spans(tpe: String, p: String) =
        e.filter(col("event_type") === tpe)
          .groupBy(col("user_id"), to_date(col("ts")).as(s"${p}_day"))
          .agg(min(unix_micros(col("ts"))).as(s"${p}_lo"),
            (max(unix_micros(col("ts"))) + 1).as(s"${p}_hi"))
      graft.core.Joins.overlapJoin(spans("click", "c"), "c_lo", "c_hi",
        spans("view", "v"), "v_lo", "v_hi",
        width = 3600000000.0, keys = Seq("user_id"))
    }
    def urlCanonW(d: DataFrame): DataFrame = {
      val grp = expr("doc_id div 5")
      val host = concat(lit("s"), (grp % 20).cast("string"), lit(".example.com"))
      val k = grp.cast("string")
      val url = when(col("doc_id") % 5 === 0,
          concat(lit("http://"), host, lit("/docs/"), k, lit("?id="), k))
        .when(col("doc_id") % 5 === 1,
          concat(lit("HTTP://"), upper(host), lit(":80/docs/"), k, lit("?id="), k))
        .when(col("doc_id") % 5 === 2,
          concat(lit("http://"), host, lit("/docs/"), k, lit("/?id="), k, lit("#frag")))
        .when(col("doc_id") % 5 === 3,
          concat(lit("http://"), host, lit("/docs/"), k, lit("?utm_source=feed&id="), k))
        .otherwise(concat(lit("https://"), host, lit(":443/docs/"), k, lit("?id="), k))
      Curation.urlDupGroups(d.select(col("doc_id"), url.as("url")), "doc_id", "url")
    }

    // ---- round-10 workload helpers
    def boilerplatePairs(d: DataFrame): DataFrame =
      Dedup.containmentPairs(d, "doc_id", "text", n = 3, maxDf = 64,
        minShared = 2, minContain = 0.08)
    def bandW(e: DataFrame, tol: Double): DataFrame = {
      val probes = e.filter(col("event_id") % 101 === 0)
        .select(col("event_id").as("probe_id"), col("event_type").as("probe_type"),
          col("value").as("probe_value"))
      val base = e.select(col("event_id").as("match_id"),
        col("event_type").as("match_type"), col("value").as("match_value"))
      graft.core.Joins.bandJoin(probes, "probe_value", base, "match_value", tol,
        Seq("probe_type" -> "match_type"))
    }
    def miW(e: DataFrame): DataFrame =
      Stats.mutualInformation(
        e.select(col("event_type"), hour(col("ts")).as("hr")), "event_type", "hr")
    def scenecutW(d: DataFrame): DataFrame =
      graft.multimodal.Multimodal.sceneCuts(
        graft.multimodal.Multimodal.sampleFrames(
          graft.multimodal.Multimodal.mediaTable(d)), threshold = 16)

    val workloads: Seq[(String, Long, Long, () => Unit, () => Unit)] = Seq(
      ("dedup_minhash", nDocs, nDocs * copies, () => minhash(docs1), () => minhash(docs10)),
      ("dedup_exact", nDocs, nDocs * copies, () => exactDedup(docs1), () => exactDedup(docs10)),
      ("dedup_winnow", nDocs, nDocs * copies, () => winnow(docs1), () => winnow(docs10)),
      ("text_stack", nDocs, nDocs * copies, () => textStack(docs1), () => textStack(docs10)),
      ("dedup_chunk", nDocs, nDocs * copies, () => chunks(docs1), () => chunks(docs10)),
      ("text_pii", nDocs, nDocs * copies, () => pii(docs1), () => pii(docs10)),
      ("pack_sequences", nDocs, nDocs * copies, () => pack(docs1), () => pack(docs10)),
      ("cc_clusters", nPairs1, nPairs10, () => cc(ccPairs1), () => cc(ccPairs10)),
      ("text_classifier", nDocs, nDocs * copies, () => classifier(docs1), () => classifier(docs10)),
      ("sample_mixture", nDocs, nDocs * copies, () => mixture(docs1), () => mixture(docs10)),
      ("text_bpe_pairs", nDocs, nDocs * copies, () => bpePairs(docs1), () => bpePairs(docs10)),
      ("pq_train_encode", maxVec, maxVec * copies, () => pqEncode(emb1), () => pqEncode(emb10)),
      ("scd2_ensure", maxEvent, maxEvent * copies, () => scd2(ev1), () => scd2(ev10)),
      ("group_agg", maxEvent, maxEvent * copies, () => agg(ev1), () => agg(ev10)),
      ("shard_balanced", nDocs, nDocs * copies, () => shardBal(docs1), () => shardBal(docs10)),
      ("text_docfreq", nDocs, nDocs * copies, () => docFreq(docs1), () => docFreq(docs10)),
      ("layout_zorder", maxEvent, maxEvent * copies, () => zorder(ev1), () => zorder(ev10)),
      ("sim_projection", maxVec, maxVec * copies, () => project(emb1), () => project(emb10)),
      ("text_dsir", nDocs, nDocs * copies, () => dsir(docs1), () => dsir(docs10)),
      ("dedup_spans", nDocs, nDocs * copies, () => spans(docs1), () => spans(docs10)),
      ("text_tfidf", nDocs, nDocs * copies, () => tfidf(docs1), () => tfidf(docs10)),
      ("sample_weighted", nDocs, nDocs * copies, () => wsample(docs1), () => wsample(docs10)),
      ("curate_by_domain", nDocs, nDocs * copies, () => curate(docs1), () => curate(docs10)),
      ("text_rouge", nDocs, nDocs * copies, () => rouge(docs1), () => rouge(docs10)),
      ("text_entropy", nDocs, nDocs * copies, () => entropy(docs1), () => entropy(docs10)),
      ("text_lm_bigram", nDocs, nDocs * copies, () => bigram(docs1), () => bigram(docs10)),
      ("sketch_cms", nDocs, nDocs * copies, () => cms(docs1), () => cms(docs10)),
      ("sim_negatives", maxVec, maxVec * copies,
        () => negSample(emb1, 16), () => negSample(emb10, 160)),
      ("dedup_edit_verify", nDocs, nDocs * copies, () => editVerify(docs1), () => editVerify(docs10)),
      ("graph_pagerank", nPairs1, nPairs10, () => pagerank(ccPairs1), () => pagerank(ccPairs10)),
      ("dedup_keep_best", nPairs1, nPairs10,
        () => keepBest(docs1, ccPairs1), () => keepBest(docs10, ccPairs10)),
      ("sketch_hll", nDocs, nDocs * copies, () => hll(docs1), () => hll(docs10)),
      ("curate_ppl_buckets", nDocs, nDocs * copies,
        () => pplBuckets(docs1), () => pplBuckets(docs10)),
      ("sim_coreset", maxVec, maxVec * copies, () => coreset(emb1), () => coreset(emb10)),
      ("events_retention", maxEvent, maxEvent * copies,
        () => force(Events.retention(ev1, "user_id", "ts")),
        () => force(Events.retention(ev10, "user_id", "ts"))),
      ("events_stickiness", maxEvent, maxEvent * copies,
        () => force(Events.stickiness(ev1, "user_id", "ts")),
        () => force(Events.stickiness(ev10, "user_id", "ts"))),
      // per-copy token salt keeps shingle sets disjoint across copies, so
      // the (source, shingle) frame and the pair join both scale linearly
      ("curate_source_overlap", nDocs, nDocs * copies,
        () => force(Curation.sourceOverlap(docs1, "source", "text")),
        () => force(Curation.sourceOverlap(docs10, "source", "text"))),
      ("events_sessionize", maxEvent, maxEvent * copies,
        () => force(Events.sessionize(ev1, "user_id", "ts", "event_id")),
        () => force(Events.sessionize(ev10, "user_id", "ts", "event_id"))),
      ("dedup_spans_cut", nDocs, nDocs * copies, () => spansCut(docs1), () => spansCut(docs10)),
      ("text_pmi", nDocs, nDocs * copies, () => pmi(docs1), () => pmi(docs10)),
      ("sketch_cms_weighted", nDocs, nDocs * copies,
        () => cmsWeighted(docs1), () => cmsWeighted(docs10)),
      // two corpus passes (moments, then broadcast z-annotation) — proves
      // the no-freeze rewrite stays linear
      ("curate_score_calibrate", nDocs, nDocs * copies,
        () => force(Curation.calibrateScores(docs1, "lang",
          TextAnalysis.qualityScoreRaw(col("text")))),
        () => force(Curation.calibrateScores(docs10, "lang",
          TextAnalysis.qualityScoreRaw(col("text"))))),
      ("sketch_hll_overlap", nDocs, nDocs * copies,
        () => force(Stats.hllOverlap(
          docs1.filter(col("doc_id") % 2 === 0),
          docs1.filter(col("doc_id") % 3 === 0), "text")),
        () => force(Stats.hllOverlap(
          docs10.filter(col("doc_id") % 2 === 0),
          docs10.filter(col("doc_id") % 3 === 0), "text"))),
      // one user-keyed window + |types|²-row rollup — per-copy user-id
      // shifts keep per-user stream lengths constant at 10x
      ("events_transitions", maxEvent, maxEvent * copies,
        () => force(Events.transitions(ev1, "user_id", "event_type", "ts", "event_id")),
        () => force(Events.transitions(ev10, "user_id", "event_type", "ts", "event_id"))),
      // two |types|-row count tables + tiny χ² arithmetic — near-constant
      // beyond the scans
      ("stats_chisq_drift", maxEvent, maxEvent * copies,
        () => force(Stats.chisqDrift(
          ev1.filter(dayofmonth(col("ts")) <= 15).select(col("event_type")),
          ev1.filter(dayofmonth(col("ts")) > 15).select(col("event_type")),
          "event_type")),
        () => force(Stats.chisqDrift(
          ev10.filter(dayofmonth(col("ts")) <= 15).select(col("event_type")),
          ev10.filter(dayofmonth(col("ts")) > 15).select(col("event_type")),
          "event_type"))),
      // salted copies keep shingles disjoint across copies: the rare-shingle
      // candidate sets and pair counts scale linearly
      ("dedup_containment", nDocs, nDocs * copies,
        () => force(Dedup.containmentPairs(docs1, "doc_id", "text",
          n = 3, maxDf = 64, minShared = 2, minContain = 0.5)),
        () => force(Dedup.containmentPairs(docs10, "doc_id", "text",
          n = 3, maxDf = 64, minShared = 2, minContain = 0.5))),
      ("text_vocab_growth", nDocs, nDocs * copies,
        () => force(graft.functions.Retrieval.vocabGrowth(docs1, "doc_id", "text", 50)),
        () => force(graft.functions.Retrieval.vocabGrowth(docs10, "doc_id", "text", 50))),
      // union-tag + one user-keyed carry window; per-copy user shifts keep
      // per-key stream lengths constant at 10x
      ("join_asof", maxEvent, maxEvent * copies,
        () => force(graft.core.Joins.asofJoin(
          ev1.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts")),
          "event_id",
          ev1.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id").as("cid"), col("value").as("cv")),
          "cid", "user_id", "ts", Seq("cid", "cv"))),
        () => force(graft.core.Joins.asofJoin(
          ev10.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts")),
          "event_id",
          ev10.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id").as("cid"), col("value").as("cv")),
          "cid", "user_id", "ts", Seq("cid", "cv")))),
      // one corpus pass to the word table; 6 merge rounds on the
      // vocabulary-sized frame (salted copies grow the vocab 10x)
      ("text_bpe_train", nDocs, nDocs * copies,
        () => force(TextAnalysis.bpeTrain(docs1, "text", nMerges = 6)),
        () => force(TextAnalysis.bpeTrain(docs10, "text", nMerges = 6))),
      // k user-keyed step aggregations + bounded-bin p50 pick
      ("events_funnel_latency", maxEvent, maxEvent * copies,
        () => force(Events.funnelLatency(ev1, "user_id", "event_type", "ts",
          Seq("view", "click", "signup", "purchase"))),
        () => force(Events.funnelLatency(ev10, "user_id", "event_type", "ts",
          Seq("view", "click", "signup", "purchase")))),
      // two bounded bin tables + tiny smoothed-divergence arithmetic
      ("stats_psi_drift", maxEvent, maxEvent * copies,
        () => force(Stats.psiDrift(
          ev1.filter(col("event_type") === "click").select(col("value")),
          ev1.filter(col("event_type") === "purchase").select(col("value")),
          "value", width = 5.0)),
        () => force(Stats.psiDrift(
          ev10.filter(col("event_type") === "click").select(col("value")),
          ev10.filter(col("event_type") === "purchase").select(col("value")),
          "value", width = 5.0))),
      // word-TYPE table through ONE chained-replace projection — the apply
      // cost is per distinct word (salted copies grow the type table 10x);
      // the merge table is fixed (trained once on the 1x corpus) so both
      // sides replay the identical replace chain
      ("text_bpe_apply", nDocs, nDocs * copies,
        () => force(TextAnalysis.bpeApply(docs1, "text", applyMerges)),
        () => force(TextAnalysis.bpeApply(docs10, "text", applyMerges))),
      // one user-keyed ranking window + bounded per-user rollup; per-copy
      // user shifts keep per-user stream lengths constant at 10x
      ("events_paths", maxEvent, maxEvent * copies,
        () => force(Events.entryPaths(ev1, "user_id", "event_type", "ts", "event_id")),
        () => force(Events.entryPaths(ev10, "user_id", "event_type", "ts", "event_id"))),
      // one explode + two-level hash agg; salted copies keep per-copy
      // trigram df structure so the audit table scales linearly
      ("curate_boilerplate", nDocs, nDocs * copies,
        () => force(Curation.boilerplateNgrams(docs1, "doc_id", "text")),
        () => force(Curation.boilerplateNgrams(docs10, "doc_id", "text"))),
      // df-bounded candidates + frozen pair frame; per-threshold scans hit
      // the bounded pair frame, not the corpus
      ("dedup_threshold_curve", nDocs, nDocs * copies,
        () => force(Dedup.thresholdCurve(docs1, "doc_id", "text",
          Seq(0.3, 0.5, 0.7, 0.8, 0.9))),
        () => force(Dedup.thresholdCurve(docs10, "doc_id", "text",
          Seq(0.3, 0.5, 0.7, 0.8, 0.9)))),
      // one explode to the frozen (lang, token, cnt) table + broadcast vocab
      ("text_oov", nDocs, nDocs * copies,
        () => force(graft.functions.Retrieval.oovRate(docs1, "text", "lang", 20)),
        () => force(graft.functions.Retrieval.oovRate(docs10, "text", "lang", 20))),
      // one domain-keyed ranking window; source cardinality is fixed, so
      // per-domain partitions grow 10x — the whale-domain case the cap is
      // for, still one shuffle
      ("curate_host_cap", nDocs, nDocs * copies,
        () => force(Curation.capPerDomain(docs1, "source", "doc_id",
          TextAnalysis.tokenCount(col("text")), 20)),
        () => force(Curation.capPerDomain(docs10, "source", "doc_id",
          TextAnalysis.tokenCount(col("text")), 20))),
      // bucket equi-join + responsibility rule; per-copy user shifts keep
      // spans-per-user constant so overlap pairs scale linearly
      ("join_overlap", maxEvent, maxEvent * copies,
        () => force(overlapW(ev1)), () => force(overlapW(ev10))),
      // df-bounded truth pass + pair-proportional md5 signatures; salted
      // copies keep candidate pairs linear in rows
      ("dedup_minhash_eval", nDocs, nDocs * copies,
        () => force(Dedup.minhashEval(docs1, "doc_id", "text",
          Seq(0.5, 0.8), k = 16, bands = 4)),
        () => force(Dedup.minhashEval(docs10, "doc_id", "text",
          Seq(0.5, 0.8), k = 16, bands = 4))),
      // scan-speed per-doc signals + one fp aggregation + slice rollup
      ("curate_datacard", nDocs, nDocs * copies,
        () => force(Curation.dataCard(docs1, "doc_id", "text", Seq("source", "lang"))),
        () => force(Curation.dataCard(docs10, "doc_id", "text", Seq("source", "lang")))),
      // count table -> count-of-counts -> bounded cumulative self-join;
      // per-copy user shifts grow keys 10x, per-key counts stay put
      ("stats_gini", maxEvent, maxEvent * copies,
        () => force(Stats.giniConcentration(ev1, "user_id")),
        () => force(Stats.giniConcentration(ev10, "user_id"))),
      // pure regex projection + one aggregation
      ("curate_url_canon", nDocs, nDocs * copies,
        () => force(urlCanonW(docs1)), () => force(urlCanonW(docs10))),
      // blocking equi-join + pair-proportional levenshtein; per-copy name
      // prefixes grow block COUNT 10x at constant block size
      ("link_blocked", nCust, nCust * copies,
        () => force(linkW(cust1)), () => force(linkW(cust10))),
      // serpentine deal over distributed ordinals; 1-row total gate
      ("layout_compaction", nDocs, nDocs * copies,
        () => force(Layout.compactionPlan(
          docs1.select(col("doc_id").as("file_id"), col("n_chars")),
          "file_id", "n_chars", 2000L, 300L)),
        () => force(Layout.compactionPlan(
          docs10.select(col("doc_id").as("file_id"), col("n_chars")),
          "file_id", "n_chars", 2000L, 300L))),
      // two keyed aggregations over the containment screen; salted copies
      // keep edges linear
      ("graph_degree_hist", nDocs, nDocs * copies,
        () => force(graft.functions.Graphs.degreeHistogram(boilerplatePairs(docs1))),
        () => force(graft.functions.Graphs.degreeHistogram(boilerplatePairs(docs10)))),
      // hub-capped length-2 path join over the same screen
      ("graph_jaccard", nDocs, nDocs * copies,
        () => force(graft.functions.Graphs.neighborJaccard(
          boilerplatePairs(docs1), maxDegree = 64L)),
        () => force(graft.functions.Graphs.neighborJaccard(
          boilerplatePairs(docs10), maxDegree = 64L))),
      // tol-sized buckets + shuffled hash join; copies DUPLICATE the value
      // column, so tol scales 1/copies to keep output pairs linear — a
      // fixed tol would grow matches 100x and measure output size, not
      // the join
      ("join_band", maxEvent, maxEvent * copies,
        () => force(bandW(ev1, 0.05)), () => force(bandW(ev10, 0.005))),
      // ONE (user,type)-keyed lag window + bounded rollup
      ("events_interarrival", maxEvent, maxEvent * copies,
        () => force(Events.interarrivalHistogram(ev1,
          "user_id", "event_type", "ts", "event_id")),
        () => force(Events.interarrivalHistogram(ev10,
          "user_id", "event_type", "ts", "event_id"))),
      // ONE scan+reduce; every replicate is two more agg columns
      ("stats_bootstrap", maxEvent, maxEvent * copies,
        () => force(Stats.poissonBootstrap(ev1, "event_id", "value", 16)),
        () => force(Stats.poissonBootstrap(ev10, "event_id", "value", 16))),
      // ONE aggregation to the bounded joint table + readout
      ("stats_mi", maxEvent, maxEvent * copies,
        () => force(miW(ev1)), () => force(miW(ev10))),
      // two 1-row exact-decimal moment reduces + fixed-order formula
      ("stats_welch", maxEvent, maxEvent * copies,
        () => force(Stats.welchTTest(
          ev1.filter(col("event_type") === "click").select(col("value")),
          ev1.filter(col("event_type") === "purchase").select(col("value")),
          "value")),
        () => force(Stats.welchTTest(
          ev10.filter(col("event_type") === "click").select(col("value")),
          ev10.filter(col("event_type") === "purchase").select(col("value")),
          "value"))),
      // ONE scan+reduce to the 1-row regression moments
      ("stats_trend", maxEvent, maxEvent * copies,
        () => force(Stats.trendTest(ev1, dayofmonth(col("ts")), col("value"))),
        () => force(Stats.trendTest(ev10, dayofmonth(col("ts")), col("value")))),
      // ONE groupBy to the k-row moment table + staged readout
      ("stats_anova", maxEvent, maxEvent * copies,
        () => force(Stats.anovaF(ev1, col("event_type"), col("value"))),
        () => force(Stats.anovaF(ev10, col("event_type"), col("value")))),
      // group moment reduce + bounded triangular k x k pair join
      ("stats_tukey", maxEvent, maxEvent * copies,
        () => force(Stats.tukeyHsd(ev1, col("event_type"), col("value"))),
        () => force(Stats.tukeyHsd(ev10, col("event_type"), col("value")))),
      // (value,group) count reduce + bounded partitioned cumulative +
      // deviation-moment F
      ("stats_levene", maxEvent, maxEvent * copies,
        () => force(Stats.leveneTest(ev1, col("event_type"), col("value"))),
        () => force(Stats.leveneTest(ev10, col("event_type"), col("value")))),
      // per-value count reduce + prefix scan + conditional-min order stats
      ("stats_quantile_exact", maxEvent, maxEvent * copies,
        () => force(Stats.exactQuantiles(ev1, col("value"),
          Seq(0.25, 0.5, 0.9, 0.99))),
        () => force(Stats.exactQuantiles(ev10, col("value"),
          Seq(0.25, 0.5, 0.9, 0.99)))),
      // one map-side-combined power-sum reduce; readout is a 1-row formula
      ("stats_jarque_bera", maxEvent, maxEvent * copies,
        () => force(Stats.jarqueBera(ev1, col("value"))),
        () => force(Stats.jarqueBera(ev10, col("value")))),
      // per-value count reduce + deterministic-bucket prefix scan; salted
      // copies grow the distinct-value table 10x alongside the rows
      ("stats_mwu", maxEvent, maxEvent * copies,
        () => force(Stats.mannWhitney(
          ev1.filter(col("event_type") === "click").select(col("value")),
          ev1.filter(col("event_type") === "purchase").select(col("value")),
          "value")),
        () => force(Stats.mannWhitney(
          ev10.filter(col("event_type") === "click").select(col("value")),
          ev10.filter(col("event_type") === "purchase").select(col("value")),
          "value"))),
      // (value,group) count reduce + prefix-scan ranks on bounded tables
      ("stats_kruskal", maxEvent, maxEvent * copies,
        () => force(Stats.kruskalWallis(ev1, col("event_type"), col("value"))),
        () => force(Stats.kruskalWallis(ev10, col("event_type"), col("value")))),
      // joint count reduce + two prefix scans; no row-level join
      ("stats_spearman", maxEvent, maxEvent * copies,
        () => force(Stats.spearman(ev1, col("user_id") % 1000, col("value"))),
        () => force(Stats.spearman(ev10, col("user_id") % 1000, col("value")))),
      // joint count reduce + bounded triangular cell-pair join
      ("stats_kendall", maxEvent, maxEvent * copies,
        () => force(Stats.kendallTau(ev1, col("user_id") % 97, dayofweek(col("ts")))),
        () => force(Stats.kendallTau(ev10, col("user_id") % 97, dayofweek(col("ts"))))),
      // two 1-row exact count reduces + fixed-order z
      ("stats_twoprop", maxEvent, maxEvent * copies,
        () => force(Stats.twoProportionZ(
          ev1.filter(col("event_id") % 2 === 0), ev1.filter(col("event_id") % 2 === 1),
          col("event_type") === "purchase")),
        () => force(Stats.twoProportionZ(
          ev10.filter(col("event_id") % 2 === 0), ev10.filter(col("event_id") % 2 === 1),
          col("event_type") === "purchase"))),
      // bounded day table + triangular day-pair self-join (days², not rows)
      ("events_ewma", maxEvent, maxEvent * copies,
        () => force(graft.functions.Events.ewmaDaily(ev1, "event_type", "ts")),
        () => force(graft.functions.Events.ewmaDaily(ev10, "event_type", "ts"))),
      // daily count reduce + bounded triangular day-pair join
      ("events_mannkendall", maxEvent, maxEvent * copies,
        () => force(graft.functions.Events.mannKendall(ev1, "event_type", "ts")),
        () => force(graft.functions.Events.mannKendall(ev10, "event_type", "ts"))),
      // daily count reduce + broadcast lag range x bounded day table
      ("events_acf", maxEvent, maxEvent * copies,
        () => force(graft.functions.Events.acfDaily(ev1, "event_type", "ts")),
        () => force(graft.functions.Events.acfDaily(ev10, "event_type", "ts"))),
      // the ACF pipeline + a k-row pooled-Q stage on top
      ("events_ljung_box", maxEvent, maxEvent * copies,
        () => force(graft.functions.Events.ljungBox(ev1, "event_type", "ts")),
        () => force(graft.functions.Events.ljungBox(ev10, "event_type", "ts"))),
      // per-type OLS moment row + residual lag join on the bounded day table
      ("events_durbin_watson", maxEvent, maxEvent * copies,
        () => force(graft.functions.Events.durbinWatson(ev1, "event_type", "ts")),
        () => force(graft.functions.Events.durbinWatson(ev10, "event_type", "ts"))),
      // paired day-diff table + rank prefix scan, all bounded by days
      ("events_wilcoxon", maxEvent, maxEvent * copies,
        () => force(graft.functions.Events.wilcoxonSignedRank(
          ev1, "click", "view")),
        () => force(graft.functions.Events.wilcoxonSignedRank(
          ev10, "click", "view"))),
      // daily count reduce + bounded day-pair votes + partitioned prefix U
      ("events_pettitt", maxEvent, maxEvent * copies,
        () => force(graft.functions.Events.pettitt(ev1, "event_type", "ts")),
        () => force(graft.functions.Events.pettitt(ev10, "event_type", "ts"))),
      // per-user span reduce + bounded lifetime table + two prefix scans
      ("events_survival", maxEvent, maxEvent * copies,
        () => force(graft.functions.Events.kaplanMeier(ev1, "user_id", "ts")),
        () => force(graft.functions.Events.kaplanMeier(ev10, "user_id", "ts"))),
      // two span reduces + ONE shared prefix scan over the pooled exits
      ("events_logrank", maxEvent, maxEvent * copies,
        () => force(graft.functions.Events.logRank(
          ev1.filter(col("user_id") % 2 === 0), ev1.filter(col("user_id") % 2 === 1),
          "user_id", "ts")),
        () => force(graft.functions.Events.logRank(
          ev10.filter(col("user_id") % 2 === 0), ev10.filter(col("user_id") % 2 === 1),
          "user_id", "ts"))),
      // joint count reduce + bounded r x c contingency cross join
      ("stats_cramers", maxEvent, maxEvent * copies,
        () => force(Stats.cramersV(
          ev1.select(col("event_type"), dayofweek(col("ts")).as("dow")),
          "event_type", "dow")),
        () => force(Stats.cramersV(
          ev10.select(col("event_type"), dayofweek(col("ts")).as("dow")),
          "event_type", "dow"))),
      // ONE shared vocab-bounded token count table + staged term sum
      ("curate_jsd", nDocs, nDocs * copies,
        () => force(graft.functions.Curation.jsDivergence(
          docs1.filter(col("doc_id") % 2 === 0), docs1.filter(col("doc_id") % 2 === 1),
          "text")),
        () => force(graft.functions.Curation.jsDivergence(
          docs10.filter(col("doc_id") % 2 === 0), docs10.filter(col("doc_id") % 2 === 1),
          "text"))),
      // ONE scan+reduce to the moment row; the k x k driver iteration is
      // O(1) in data
      ("sim_pca", maxVec, maxVec * copies,
        () => force(Vectors.topComponent(emb1, "v", 0 to 7, iters = 10)),
        () => force(Vectors.topComponent(emb10, "v", 0 to 7, iters = 10))),
      // same two-job shape as sample_mixture, shares computed from corpus
      ("sample_temperature", nDocs, nDocs * copies,
        () => force(Sampling.temperatureSample(docs1, "lang", "doc_id",
          TextAnalysis.tokenCount(col("text")), alpha = 0.7, budgetFrac = 0.5,
          salt = "t1").select(col("doc_id"), col("kept"))),
        () => force(Sampling.temperatureSample(docs10, "lang", "doc_id",
          TextAnalysis.tokenCount(col("text")), alpha = 0.7, budgetFrac = 0.5,
          salt = "t1").select(col("doc_id"), col("kept")))),
      // partition-local decode, then a per-video lag window over 2 longs
      // per frame — pixels never shuffle
      ("mm_scenecut", nDocs, nDocs * copies,
        () => force(scenecutW(docs1)), () => force(scenecutW(docs10))))

    // warm-up (JIT, codegen, parquet footers) so neither side absorbs it —
    // the release below needs `keep` in scope, so warm-up runs after it
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    // workloads that freeze state (scd2, curate, rouge, CC, …) leave
    // localCheckpoint RDD blocks behind; across ~30 workloads in one 8g JVM
    // the accumulation GC-thrashes late workloads into fake super-linear
    // timings. Release everything each workload created — but never the
    // pre-materialized pair sets (unpersisting a localCheckpointed RDD
    // makes it unrecomputable).
    val keep = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def releaseTransients(): Unit = {
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(blocking = false))
      // broadcast/shuffle cleanup rides on ContextCleaner's weak refs — it
      // only fires after a driver GC, so nudge one between workloads or the
      // run degrades cumulatively and late workloads time super-linear
      System.gc()
    }

    // optional 2nd arg: comma-separated workload filter (local iteration)
    val wanted = args.drop(1).headOption.map(_.split(",").toSet)
    val selected = wanted match {
      case Some(ws) => workloads.filter(w => ws(w._1))
      case None => workloads
    }
    selected.foreach { w => w._4(); releaseTransients() }

    val firstPass = selected.map { case (name, n1, n10, w1, w10) =>
      val t1 = timed(w1())
      releaseTransients()
      val t10 = timed(w10())
      releaseTransients()
      (name, n1, t1, n10, t10, w1, w10)
    }
    // Honest-timing audit (the Bench solo-audit discipline): ~45 workloads
    // ×2 in one JVM still accumulate enough cleaner/GC residue to spike an
    // occasional row 3-5× (text_tfidf measured 14.1s in-suite vs 3.1s
    // isolated). Rows whose per-row ratio looks super-ish are RE-TIMED
    // after a settle; each side takes the min of its runs (best-of-n, the
    // standard wall-clock noise floor) and the report marks them.
    val retimeAbove = 0.45
    val rows = firstPass.map { case (name, n1, t1, n10, t10, w1, w10) =>
      val (f1, f10, retimed) =
        if (t10 / t1 / copies > retimeAbove) {
          Thread.sleep(1000); System.gc(); Thread.sleep(500)
          val r1 = timed(w1()); releaseTransients()
          val r10 = timed(w10()); releaseTransients()
          (math.min(t1, r1), math.min(t10, r10), true)
        } else (t1, t10, false)
      val ratio = f10 / f1
      val perRowRatio = ratio / copies // 1.0 = perfectly linear in rows
      (name, n1, f1, n10, f10, ratio, perRowRatio, retimed)
    }

    val md = new StringBuilder
    md.append("# SCALECHECK — 10x scale proof\n\n")
    md.append(s"Base: `$sfDir` (documents=$nDocs, events=$maxEvent); 10x = $copies salted copies\n")
    md.append("(per-copy token salt keeps near-dup pair growth LINEAR; user/event id ranges\n")
    md.append("shift per copy so key cardinality scales with rows). Wall-clock local[32],\n")
    md.append("both sides parquet-scanned, JIT warmed. `rows ratio/10` = 1.0 means perfectly\n")
    md.append("linear per-row cost; < 1 means 10x amortizes fixed overhead (expected for\n")
    md.append("shuffle-light scans); super-linear (>1.5) would flag a scale defect.\n\n")
    md.append("| workload | rows 1x | sec 1x | rows 10x | sec 10x | time ratio | ratio/10 |\n")
    md.append("|---|---|---|---|---|---|---|\n")
    rows.foreach { case (name, n1, t1, n10, t10, r, pr, rt) =>
      val mark = if (rt) " †" else ""
      md.append(f"| $name$mark | $n1 | $t1%.2f | $n10 | $t10%.2f | $r%.2f | $pr%.2f |%n")
    }
    val worst = rows.map(_._7).max
    md.append(f"%nWorst per-row ratio: $worst%.2f — ${if (worst <= 1.5) "PASS (no super-linear growth)" else "FAIL"}%n")
    if (rows.exists(_._8))
      md.append("\n† re-timed in isolation after a GC settle (best of 2 runs per side) —\nfirst-pass in-suite timing exceeded 0.45 per-row, the in-JVM residue zone.\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(report), md.toString)
    println(md.toString)
    val json = rows.map { case (name, _, t1, _, t10, r, pr, rt) =>
      f""""$name":{"sec1":$t1%.3f,"sec10":$t10%.3f,"ratio":$r%.3f,"perRow":$pr%.3f,"retimed":$rt}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale10","worstPerRow":$worst,"workloads":$json}""")
    spark.stop()
  }
}
