package graft

import org.apache.spark.sql.functions._

/** Plan-quality audits: the properties that decide 100 TB behavior have to
  * hold in the EXECUTED plan, not just in intent — column pruning reaches
  * the parquet scan, filters push down to the source, aggregations combine
  * map-side before the exchange, and scans stay inside whole-stage codegen.
  * Plans are AQE-wrapped, so the audits parse the printed tree (FileScan
  * lines carry ReadSchema/PushedFilters; codegen spans print as `*(n)`).
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** every column any parquet scan of the plan reads (cache cleared first:
    * another suite's cached table would otherwise substitute an
    * InMemoryTableScan for the parquet scan under audit)
    */
  private def readColumns(df: org.apache.spark.sql.DataFrame): Set[String] = {
    spark.catalog.clearCache()
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(planOf(df))
      .flatMap(_.group(1).split(",")).map(_.split(":")(0).trim)
      .filter(_.nonEmpty).toSet
  }

  test("column pruning: a 3-column projection reads 3 columns, not the table") {
    val read = readColumns(SparkEntry.queries("proj_project")(spark, sfDir))
    assert(read == Set("c_custkey", "c_name", "c_mktsegment"),
      s"scan must read exactly the projected columns, got $read")
  }

  test("filter pushdown: a selective predicate reaches the parquet source") {
    val df = table("lineitem").filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"predicate must appear in PushedFilters:\n${plan.take(1500)}")
    assert(readColumns(df) == Set("l_orderkey", "l_quantity"))
  }

  test("token pipelines scan only the columns they use") {
    // dedup_exact needs text (fingerprint) + doc_id (representative pick)
    val read = readColumns(SparkEntry.queries("dedup_exact")(spark, sfDir))
    assert(read == Set("doc_id", "text"),
      s"exact dedup must not read lang/source/n_chars, got $read")
  }

  test("aggregation is partial (map-side combine) before the exchange") {
    val plan = planOf(SparkEntry.queries("q1_agg")(spark, sfDir))
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"q1 must combine map-side before shuffling:\n${plan.take(2000)}")
  }

  test("scan-speed text scoring stays in whole-stage codegen with no exchange") {
    val df = table("documents").select(col("doc_id"),
      graft.functions.TextAnalysis.qualityScore(col("text")).as("q"))
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), "per-row scoring must not shuffle")
    assert(plan.contains("*("), "per-row scoring must sit in a codegen span")
  }

  test("pagerank round: keyed join + keyed aggregation, never a cartesian") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = graft.functions.Graphs.pageRankScaled(pairs, iterations = 2)
    val plan = planOf(out)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"pagerank must stay equi-joined:\n${plan.take(2000)}")
    // the iteration state is re-materialized (frozen), so the printed plan
    // of round N reads a materialized leaf, not the whole lineage
    assert(plan.contains("Scan ExistingRDD") || plan.contains("InMemoryTableScan")
      || plan.contains("LocalTableScan"),
      s"ranks must come off a materialized leaf:\n${plan.take(2000)}")
  }

  test("event rollups and source overlap stay equi-joined with tiny broadcasts") {
    // retention: activity↔cohort join is user-keyed, rollup combines map-side
    val ret = planOf(SparkEntry.queries("events_retention")(spark, sfDir))
    assert(!ret.contains("CartesianProduct") && !ret.contains("BroadcastNestedLoop"),
      s"retention must stay equi-joined:\n${ret.take(2000)}")
    // stickiness: the |days|-row calendar arrives by broadcast
    val st = planOf(SparkEntry.queries("events_stickiness")(spark, sfDir))
    assert(!st.contains("CartesianProduct") && !st.contains("BroadcastNestedLoop"),
      s"stickiness must stay equi-joined:\n${st.take(2000)}")
    assert(st.contains("BroadcastExchange"), "calendar join must broadcast")
    // source overlap: the pair join is keyed on the shingle (equi), sizes
    // arrive by broadcast — never a nested-loop over (source, shingle) rows
    val ov = planOf(SparkEntry.queries("curate_source_overlap")(spark, sfDir))
    assert(!ov.contains("CartesianProduct") && !ov.contains("BroadcastNestedLoop"),
      s"overlap must stay shingle-keyed:\n${ov.take(2000)}")
    assert(ov.contains("BroadcastExchange"), "size table must broadcast")
  }

  test("collocations: bigram total shares the frozen pair counts, one pair scan") {
    // the corpus is aggregated exactly twice (unigram counts, bigram counts)
    // and both vocabulary-sized count tables are frozen — a consumer-side
    // re-explode (the pre-fix shape: a third corpus pass just to total the
    // bigrams, plus one unigram pass per join) is a wasted full scan at
    // 100 TB. The final plan therefore reads NO parquet: every branch sits
    // on a materialized count table.
    val plan = planOf(graft.functions.Retrieval.collocations(
      table("documents"), "text", minCount = 2, topK = 10))
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 0, s"corpus scans must happen at freeze time only, got $scans:\n${plan.take(3000)}")
    assert(plan.contains("Scan ExistingRDD"),
      s"branches must read the frozen count tables:\n${plan.take(3000)}")
  }

  test("composed queries: expensive subplans appear once (no recomputation)") {
    // pipeline_curate composes score → filter → exact-dedup as ONE lineage:
    // the documents scan (with the scan-speed scoring on top) must appear
    // exactly once — a dedup shape that joined winners back to the corpus
    // would score the corpus twice
    val curate = planOf(SparkEntry.queries("pipeline_curate")(spark, sfDir))
    val curateScans = "Scan parquet".r.findAllIn(curate).size
    assert(curateScans == 1,
      s"pipeline_curate must scan documents once, got $curateScans:\n${curate.take(2000)}")

    // sample_semantic: k-means TRAINING freezes into a materialized k-row
    // centroid leaf, so the final plan holds exactly one embeddings scan
    // (the assignment fold) — training lineage must not replay inside it
    val sem = planOf(SparkEntry.queries("sample_semantic")(spark, sfDir))
    val semScans = "Scan parquet".r.findAllIn(sem).size
    assert(semScans == 1,
      s"sample_semantic must scan embeddings once (assignment), got $semScans:\n${sem.take(2000)}")
    assert(sem.contains("Scan ExistingRDD") || sem.contains("LocalTableScan"),
      "centroids must arrive as a materialized leaf")
  }

  test("scale diagnostics: top-k cuts are TakeOrdered, vocab broadcasts, no corpus windows") {
    // key skew: the top-k cut must be per-partition heads + merge, never a
    // global sort of the key table
    val skew = planOf(SparkEntry.queries("stats_key_skew")(spark, sfDir))
    assert(skew.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrdered:\n${skew.take(2000)}")
    // OOV: the vocabulary joins back by broadcast, corpus side never
    // nested-loops
    val oov = planOf(SparkEntry.queries("text_oov")(spark, sfDir))
    assert(oov.contains("BroadcastExchange"), "vocab join must broadcast")
    assert(!oov.contains("CartesianProduct") && !oov.contains("BroadcastNestedLoop"),
      s"oov must stay equi-joined:\n${oov.take(2000)}")
    // range bounds: boundary picks ride the bounded bin table — no window
    // function anywhere near the corpus
    val rb = planOf(SparkEntry.queries("layout_range_bounds")(spark, sfDir))
    assert(!rb.contains("Window"),
      s"boundary picks must not window:\n${rb.take(2000)}")
    // boilerplate: gram counts combine map-side before the exchange
    val bp = planOf(SparkEntry.queries("curate_boilerplate")(spark, sfDir))
    assert(bp.contains("partial_count") || bp.contains("partial_sum"),
      s"gram counts must combine map-side:\n${bp.take(2000)}")
  }

  test("round-9 operators: hash joins only, no cartesians, no corpus windows") {
    // linkage: blocking equi-join + broadcast-semi block cap — never BNLJ
    val link = planOf(SparkEntry.queries("link_customers")(spark, sfDir))
    assert(!link.contains("CartesianProduct") && !link.contains("BroadcastNestedLoop"),
      s"linkage must stay equi-joined:\n${link.take(1200)}")
    // overlap join: bucket decomposition keeps the no-equi-key overlap
    // predicate hash-joined
    val ov = planOf(SparkEntry.queries("join_overlap")(spark, sfDir))
    assert(!ov.contains("CartesianProduct") && !ov.contains("BroadcastNestedLoop"),
      s"overlap join must stay hash-joined:\n${ov.take(1200)}")
    // gumbel selection: scan-speed keys + TakeOrdered, no global sort
    val gum = planOf(SparkEntry.queries("sample_gumbel")(spark, sfDir))
    assert(gum.contains("TakeOrdered"),
      s"gumbel top-k must be TakeOrdered, not a global sort:\n${gum.take(1200)}")
    // data card reads only the columns it needs
    val cardRead = readColumns(SparkEntry.queries("curate_datacard")(spark, sfDir))
    assert(!cardRead.contains("n_chars"),
      s"data card must not read unused columns, got $cardRead")
  }

  test("round-10 operators: pruned scans, hash joins, no corpus windows") {
    // MI reads only its two columns from the events scan (audit the
    // pre-freeze joint-count pass — the one that touches the corpus)
    val miRead = readColumns(graft.functions.Stats.jointCounts(
      table("events").select(col("event_type"), hour(col("ts")).as("hr")),
      "event_type", "hr"))
    assert(miRead == Set("event_type", "ts"),
      s"MI must read exactly (event_type, ts), got $miRead")
    // band join: bucket decomposition keeps the no-equi-key band predicate
    // hash-joined
    val band = planOf(SparkEntry.queries("join_band")(spark, sfDir))
    assert(!band.contains("CartesianProduct") && !band.contains("BroadcastNestedLoop"),
      s"band join must stay hash-joined:\n${band.take(1200)}")
    // bootstrap: one aggregation, every replicate map-side partial
    val boot = planOf(SparkEntry.queries("stats_bootstrap")(spark, sfDir))
    assert(boot.contains("partial_sum"),
      s"bootstrap replicates must combine map-side:\n${boot.take(1200)}")
    // temperature sampling: the doc table itself is never shuffled — the
    // only exchanges feed the tiny mass/rate tables and their broadcast
    val temp = planOf(SparkEntry.queries("sample_temperature")(spark, sfDir))
    assert(temp.contains("BroadcastExchange"),
      "rates must arrive by broadcast")
    assert(!temp.contains("SortMergeJoin"),
      s"the corpus must not shuffle for a broadcast-rate join:\n${temp.take(1200)}")
    // AUC: no corpus-wide window — the scan replaced it
    val auc = planOf(SparkEntry.queries("curate_auc")(spark, sfDir))
    assert(!auc.contains("Window [") || !auc.contains("windowspecdefinition()"),
      s"AUC cumulative must ride the prefix scan, not a global window:\n${auc.take(1200)}")
  }

  test("centroid routing is a fold: corpus assignment plans no shuffle, no window") {
    import graft.functions.Vectors
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val cents = Vectors.kMeans(e, "vec_id", "v", k = 4, iters = 1)
    val plan = planOf(Vectors.kMeansAssign(e, "vec_id", "v", cents))
    // the argmin fold routes each vector where it sits: the only exchange
    // allowed is the broadcast of the k-row centroid array
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Window"),
      s"corpus routing must be shuffle-free:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      "centroid array arrives by broadcast")
  }
}
