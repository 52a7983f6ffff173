package graft

import org.apache.spark.sql.functions._
import graft.functions.Curation

/** Domain-level curation: stats correctness on a constructed corpus, verdict
  * semantics (floors/ceilings/blocklist), broadcast shape.
  */
class CurationSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      // goodnet: 3 distinct, reasonable docs
      (1L, "goodnet", "the quick brown fox jumps over the lazy dog and runs to the field"),
      (2L, "goodnet", "a long and winding road leads to the sea and the sand of the shore"),
      (3L, "goodnet", "the cat and the dog share a bowl of food in the warm kitchen light"),
      // dupenet: mirror site — same content three times
      (4L, "dupenet", "identical boilerplate page content here"),
      (5L, "dupenet", "identical boilerplate page content here"),
      (6L, "dupenet", "identical boilerplate page content here"),
      // spamnet: blocklisted regardless of stats
      (7L, "spamnet", "the best offers and the best prices of the best deals of the year"),
      (8L, "spamnet", "the second spam page of the best offers and the finest deals of all")
    ).toDF("doc_id", "source", "text")
  }

  test("domainStats: counts, dup fraction, means per domain") {
    val stats = Curation.domainStats(corpus, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(stats.keySet == Set("goodnet", "dupenet", "spamnet"))
    assert(stats("goodnet")._1 == 3 && stats("dupenet")._1 == 3 && stats("spamnet")._1 == 2)
    // dupenet: 3 docs, 1 distinct fingerprint -> dup_frac = 2/3
    assert(math.abs(stats("dupenet")._3 - 2.0 / 3.0) < 1e-3)
    assert(stats("goodnet")._3 == 0.0 && stats("spamnet")._3 == 0.0)
    // mean_tokens: goodnet docs are 14/15/15 tokens
    assert(math.abs(stats("goodnet")._4 - 44.0 / 3.0) < 1e-3)
    // quality scores live in [0, 1]
    assert(stats.values.forall(s => s._2 >= 0.0 && s._2 <= 1.0))
  }

  test("sourceOverlap: shared shingles and Jaccard on constructed mirrors") {
    import spark.implicits._
    // a and b are word-level mirrors sharing one 3-gram run; c is disjoint
    val docs = Seq(
      (1L, "a", "alpha beta gamma delta"),
      (2L, "b", "alpha beta gamma epsilon"),
      (3L, "c", "one two three four")
    ).toDF("doc_id", "source", "text")
    val out = Curation.sourceOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // a: {alpha beta gamma, beta gamma delta}; b: {alpha beta gamma,
    // beta gamma epsilon} -> share 1 of 3 distinct
    assert(out.keySet == Set(("a", "b")), s"got $out")
    assert(out(("a", "b"))._1 == 1L)
    assert(math.abs(out(("a", "b"))._2 - 1.0 / 3.0) < 1e-5)
  }

  test("curateByDomain: duplication ceiling and blocklist cut; annotation keeps all rows") {
    val out = Curation.curateByDomain(corpus, "source", "text",
      minMeanQuality = 0.0, maxDupFrac = 0.5, minDocs = 1,
      blocklist = Seq("spamnet")).cache()
    assert(out.count() == 8, "annotation must not drop rows")
    val keptBy = out.groupBy("source")
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptBy("goodnet") == 3, "clean domain passes")
    assert(keptBy("dupenet") == 0, "mirror domain fails the duplication ceiling")
    assert(keptBy("spamnet") == 0, "blocklisted domain fails regardless of stats")
    // the stats join must be a broadcast (|domains| rows), never a shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    out.unpersist()
  }

  test("ruleCurate: first violated rule wins by priority, audit partitions the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "short text", "en"),        // violates too_short only
      (2L, ("w " * 40).trim, "zh"),    // long enough but zh: cjk rule
      (3L, ("w " * 40).trim, "en"),    // clean -> kept
      (4L, "tiny", "zh")               // short AND zh: priority -> too_short
    ).toDF("doc_id", "text", "lang")
    val (annotated, audit) = graft.functions.Curation.ruleCurate(docs, Seq(
      "too_short" -> (graft.functions.TextAnalysis.tokenCount(col("text")) < 10),
      "cjk_excluded" -> (col("lang") === "zh")))
    val ann = annotated.collect()
      .map(r => r.getLong(0) -> (Option(r.getString(3)), r.getBoolean(4))).toMap
    assert(ann == Map(
      1L -> (Some("too_short"), false), 2L -> (Some("cjk_excluded"), false),
      3L -> (None, true), 4L -> (Some("too_short"), false)), s"got $ann")
    val a = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == Map("too_short" -> 2L, "cjk_excluded" -> 1L, "kept" -> 1L))
    assert(a.values.sum == docs.count())
  }

  test("paddingAudit: clamp/pad arithmetic exact, empty docs free") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // tokens 0, 10, 100 at ctx 64: kept 0+10+64, pad 0+54+0
    // pad_frac = 54 / (74 + 54) = 0.421875
    val toks = Seq(0L, 10L, 100L).toDF("t")
    val out = graft.functions.Packing.paddingAudit(toks, col("t"), Seq(64))
      .head()
    assert(out.getInt(0) == 64 && out.getLong(1) == 3L &&
      out.getLong(2) == 110L && out.getLong(3) == 54L)
    assert(out.getDouble(4) == 0.421875, s"pad_frac ${out.getDouble(4)}")
  }

  test("piiBySource: per-source rates from constructed hits") {
    import spark.implicits._
    import graft.functions.Curation
    val df = Seq(
      ("a", "mail me at x@y.com and 1.2.3.4"),
      ("a", "clean"),
      ("b", "call 555-123-4567 twice 555-123-9999")).toDF("src", "text")
    val out = Curation.piiBySource(df, "src", col("text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(out("a") == (2L, 1L, 1L, 0L, 0L, 1000.0), s"got ${out("a")}")
    assert(out("b") == (1L, 0L, 0L, 2L, 0L, 2000.0), s"got ${out("b")}")
  }

  test("budgetTrim: best docs kept until budget, boundary exact, first always kept") {
    import spark.implicits._
    import graft.functions.Curation
    val df = Seq((1L, "a", 300L, 0.9), (2L, "a", 400L, 0.8),
      (3L, "a", 500L, 0.7), (4L, "b", 2000L, 0.1)).toDF("id", "src", "tok", "sc")
    val out = Curation.budgetTrim(df, "src", "id", col("tok"), col("sc"), budget = 600L)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    // source a in quality order: 300 (starts at 0), 400 (starts at 300),
    // 500 (starts at 700 >= 600 -> cut)
    assert(out(1L) == (0L, true) && out(2L) == (300L, true)
      && out(3L) == (700L, false), s"got $out")
    // a document bigger than the whole budget still survives if first
    assert(out(4L) == (0L, true))
  }

  test("dataCard: corpus-wide dup flags roll up per slice, quality bounded") {
    import spark.implicits._
    import graft.functions.Curation
    val docs = Seq(
      (0L, "a", "en", "the cat sat on the mat"),
      (1L, "a", "en", "the cat sat on the mat"),
      (2L, "b", "en", "the cat sat on the mat"),
      (3L, "b", "en", "completely different text here")).toDF("doc_id", "source", "lang", "text")
    val card = Curation.dataCard(docs, "doc_id", "text", Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(6), r.getDouble(7), r.getDouble(5))).toMap
    // slice a: both docs duplicate each other; slice b: one doc mirrors
    // slice a's content (corpus-wide fingerprint), the other is unique
    assert(card(("a", "en"))._1 == 2L && card(("a", "en"))._2 == 2L
      && card(("a", "en"))._3 == 1.0)
    assert(card(("b", "en"))._1 == 2L && card(("b", "en"))._2 == 1L
      && card(("b", "en"))._3 == 0.5)
    card.values.foreach { case (_, _, _, q) => assert(q >= 0.0 && q <= 1.0) }
  }

  test("canonicalUrl: case, ports, slash, fragment, tracking params all collapse") {
    import spark.implicits._
    import graft.functions.Curation
    val cases = Seq(
      "http://host.com/a?id=7"                          -> "http://host.com/a?id=7",
      "HTTP://Host.COM:80/a/?utm_source=x&id=7#frag"    -> "http://host.com/a?id=7",
      "  http://host.com/a?utm_campaign=y&id=7  "       -> "http://host.com/a?id=7",
      "https://Host.com:443/"                           -> "https://host.com",
      "https://host.com"                                -> "https://host.com",
      "http://host.com/b/c/"                            -> "http://host.com/b/c",
      "http://host.com/a?page=2"                        -> "http://host.com/a",
      // :8080 is NOT a default port and must survive
      "http://host.com:8080/a"                          -> "http://host.com:8080/a")
    val got = cases.map(_._1).toDF("u")
      .select(Curation.canonicalUrl(col("u"))).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalUrl($in) = $g, want $want") }
    // dup groups: the first three collapse into one group of 3
    val groups = Curation.urlDupGroups(
      cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("id", "url"), "id", "url")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(groups("http://host.com/a?id=7") == (3L, 0L))
    assert(groups("https://host.com") == (2L, 3L))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val vOld = Seq((1L, "stays the same"), (2L, "will change"), (3L, "will be removed"))
      .toDF("doc_id", "text")
    val vNew = Seq((1L, "stays the same"), (2L, "has changed"), (4L, "brand new doc"))
      .toDF("doc_id", "text")
    val out = Curation.snapshotDiff(vOld, vNew, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    // normalization-insensitive: punctuation/case-only edits are unchanged
    val vNew2 = Seq((1L, "STAYS, the (same)!")).toDF("doc_id", "text")
    val st = Curation.snapshotDiff(vOld.filter(col("doc_id") === 1), vNew2,
      "doc_id", "text").head().getString(1)
    assert(st == "unchanged", "content fingerprint must ignore normalization noise")
  }

  test("tokenDrift surfaces an injected token as the top KL contributor") {
    val docs = table("documents")
    val vNew = docs.withColumn("text",
      when(col("doc_id") % 3 === 0, concat(col("text"), lit(" zzznovel"))).otherwise(col("text")))
    val out = Curation.tokenDrift(docs, vNew, "text", k = 5).collect()
    assert(out.length == 5)
    assert(out.map(_.getString(0)).contains("zzznovel"))
    val top = out.maxBy(_.getDouble(3))
    assert(top.getString(0) == "zzznovel" && top.getLong(1) == 0,
      s"injected token must dominate drift, got ${top.getString(0)}")
    // identical snapshots: every contribution is ~0 (only smoothing noise)
    val same = Curation.tokenDrift(docs, docs, "text", k = 3).collect()
    assert(same.forall(r => math.abs(r.getDouble(3)) < 1e-4))
  }

  test("jsDivergence: hand-computed value, symmetric, identical corpora read exactly 0") {
    import spark.implicits._
    // a: x x y (Ta=3), b: x y y (Tb=3), V=2; smoothed p=(.6,.4), q=(.4,.6),
    // m=(.5,.5) -> jsd = .6 ln 1.2 + .4 ln 0.8 = 0.020136 (6dp)
    val a = Seq("x x y").toDF("text")
    val b = Seq("x y y").toDF("text")
    val row = Curation.jsDivergence(a, b, "text").head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 3L && row.getLong(2) == 2L)
    assert(math.abs(row.getDouble(3) - 0.020136) < 1e-6, s"jsd ${row.getDouble(3)}")
    // symmetric by construction
    assert(Curation.jsDivergence(b, a, "text").head().getDouble(3) ==
      row.getDouble(3))
    // identical corpora: p = q at every token -> exactly 0
    val docs = table("documents")
    assert(Curation.jsDivergence(docs, docs, "text").head().getDouble(3) == 0.0)
  }

  test("calibrateScores: group-local z-scores, zero-mean per group, degenerate std 0") {
    import graft.functions.{Curation, TextAnalysis}
    val docs = table("documents")
    val out = Curation.calibrateScores(docs, "lang",
      TextAnalysis.qualityScoreRaw(col("text"))).cache()
    assert(out.count() == docs.count())
    // per-group z means sit at ~0 (rounding noise only)
    out.groupBy("lang").agg(avg("z_score").as("m")).collect().foreach { r =>
      assert(math.abs(r.getDouble(1)) < 0.01, s"lang ${r.getString(0)} mean z ${r.getDouble(1)}")
    }
    // moments are group-local: languages differ in mean
    assert(out.select("lang", "group_mean").distinct().count() ==
      out.select("lang").distinct().count())
    // a constant-score group calibrates to 0, not NaN
    import spark.implicits._
    val const = Curation.calibrateScores(
      Seq((1L, "g", 5.0), (2L, "g", 5.0)).toDF("id", "g", "s"), "g", col("s"))
    assert(const.select("z_score").collect().forall(_.getDouble(0) == 0.0))
    out.unpersist()
  }

  test("curateByDomain: minDocs floor cuts thin domains") {
    val out = Curation.curateByDomain(corpus, "source", "text",
      minMeanQuality = 0.0, maxDupFrac = 1.0, minDocs = 3)
    val kept = out.filter(col("kept")).select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("goodnet", "dupenet"), "2-doc spamnet falls below minDocs=3")
  }

  test("mixturePlan: shares normalize over present sources, cap + shortfall, absent weight redistributes") {
    // weights name a source that is absent ("ghost"): its parts must
    // redistribute via normalization over PRESENT sources only
    val plan = Curation.mixturePlan(corpus, "source", "text",
      Map("goodnet" -> 6.0, "dupenet" -> 2.0, "spamnet" -> 2.0, "ghost" -> 90.0),
      budgetTokens = 100)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    assert(plan.keySet == Set("goodnet", "dupenet", "spamnet"))
    val (gAvail, gTarget, gPlanned, gRate, gShort) = plan("goodnet")
    // goodnet: 6/10 of 100 = 60 target, but only ~42 tokens available ->
    // capped, shortfall reported
    assert(gTarget == 60L)
    assert(gPlanned == math.min(60L, gAvail))
    assert(gShort == gTarget - gPlanned)
    assert(gPlanned < gTarget, "fixture chosen so the cap binds")
    assert(gRate == 1.0, "capped source keeps everything it has")
    // uncapped source: planned == target, keep_rate = target/avail
    val (dAvail, dTarget, dPlanned, dRate, _) = plan("dupenet")
    assert(dTarget == 20L && dPlanned == math.min(20L, dAvail))
    if (dPlanned == dTarget)
      assert(math.abs(dRate - dTarget.toDouble / dAvail) < 1e-6)
    // budget is an upper bound: planned never exceeds it in total
    assert(plan.values.map(_._3).sum <= 100L)
  }

  test("capPerDomain: per-domain ranks, ties to smaller id, cap enforced") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", 5.0), (2L, "x", 9.0), (3L, "x", 9.0), (4L, "x", 1.0),
      (5L, "y", 2.0)).toDF("doc_id", "source", "score")
    val out = Curation.capPerDomain(docs, "source", "doc_id", col("score"), cap = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out == Map(
      2L -> ("x", 1), // tie at 9.0 breaks to the smaller id
      3L -> ("x", 2),
      5L -> ("y", 1)), s"got $out") // small domains keep everything
    // cap >= domain size keeps all rows
    assert(Curation.capPerDomain(docs, "source", "doc_id", col("score"), cap = 10)
      .count() == 5)
  }

  test("boilerplateNgrams: hand-computed df/occ, within-doc repeats count once for df") {
    import spark.implicits._
    val docs = Seq(
      (0L, "copyright acme corp all rights reserved"),
      (1L, "copyright acme corp something else entirely here"),
      // doc 2 repeats the template TWICE — df counts it once, occ twice
      (2L, "copyright acme corp and copyright acme corp again"),
      (3L, "totally unrelated text body")).toDF("doc_id", "text")
    val out = Curation.boilerplateNgrams(docs, "doc_id", "text", n = 3, minDf = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map("copyright acme corp" -> (3L, 4L, 0.75)), s"got $out")
    // minDf bounds the output: raising it past the max df empties the audit
    assert(Curation.boilerplateNgrams(docs, "doc_id", "text", n = 3, minDf = 5).count() == 0)
    // short docs (fewer than n tokens) contribute no n-grams and don't crash
    val short = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    assert(Curation.boilerplateNgrams(short, "doc_id", "text", n = 3, minDf = 1).count() == 0)
    val bi = Curation.boilerplateNgrams(short, "doc_id", "text", n = 2, minDf = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bi == Map("a b" -> 2L), s"got $bi")
  }

  test("perplexityBuckets: per-language thresholds, empty docs excluded, order respects score") {
    val docs = table("documents")
    val out = Curation.perplexityBuckets(docs, "doc_id", "text", "lang").cache()
    // empty/tokenless docs are excluded; everything else is labeled
    val nonEmpty = docs.filter(
      graft.functions.TextAnalysis.tokenCount(col("text")) > 0).count()
    assert(out.count() == nonEmpty)
    assert(out.select("bucket").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("head", "middle", "tail")))
    // thresholds are group-local AND ordered: within every language, every
    // head score >= every middle score >= every tail score
    out.groupBy("lang").agg(
        min(when(col("bucket") === "head", col("avg_logprob"))).as("min_head"),
        max(when(col("bucket") === "middle", col("avg_logprob"))).as("max_mid"),
        min(when(col("bucket") === "middle", col("avg_logprob"))).as("min_mid"),
        max(when(col("bucket") === "tail", col("avg_logprob"))).as("max_tail"))
      .collect().foreach { r =>
        if (!r.isNullAt(1) && !r.isNullAt(2))
          assert(r.getDouble(1) >= r.getDouble(2), s"head below middle in ${r.getString(0)}")
        if (!r.isNullAt(3) && !r.isNullAt(4))
          assert(r.getDouble(3) >= r.getDouble(4), s"middle below tail in ${r.getString(0)}")
      }
    // tercile cut: no bucket swallows the whole language (each lang has
    // spread at sf0.001) and every language keeps a head
    val perLang = out.groupBy("lang").pivot("bucket").count().collect()
    perLang.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("head")), s"${r.getString(0)} lost its head bucket")
    }
    out.unpersist()
  }

  test("raterAgreement: κ=1 on agreement, −1 on perfect disagreement, 0 on independence") {
    import spark.implicits._
    val ids = (0 until 100).toDF("id")
    def kappaOf(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Curation.raterAgreement(ids, a, b).collect()(0)
    val perfect = kappaOf(col("id") % 2 === 0, col("id") % 2 === 0)
    assert(perfect.getAs[Double]("kappa") == 1.0 &&
      perfect.getAs[Double]("po") == 1.0)
    val opposite = kappaOf(col("id") % 2 === 0, col("id") % 2 === 1)
    assert(opposite.getAs[Double]("kappa") == -1.0 &&
      opposite.getAs[Double]("po") == 0.0)
    // independent balanced raters: po = pe = 0.5 exactly → κ = 0
    val indep = kappaOf(col("id") % 2 === 0, (col("id") / 2).cast("int") % 2 === 0)
    assert(indep.getAs[Double]("kappa") == 0.0 &&
      indep.getAs[Double]("pe") == 0.5)
    // constant equal raters: pe = 1 reads κ = 0 by convention, not NaN
    val const = kappaOf(lit(true), lit(true))
    assert(const.getAs[Double]("kappa") == 0.0 &&
      const.getAs[Long]("n11") == 100L)
    // nulls are abstentions, not votes
    val withNull = kappaOf(when(col("id") < 50, col("id") % 2 === 0),
      col("id") % 2 === 0)
    assert(withNull.getAs[Long]("n") == 50L)
  }

  test("mcnemar: signed asymmetry z, clamped Edwards chi2, NULL on zero disagreement") {
    import spark.implicits._
    val ids = (0 until 100).toDF("id")
    def mcOf(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Curation.mcnemar(ids, a, b).collect()(0)
    // A = multiples of 4 (subset of evens), B = evens: n10=0, n01=25
    // -> z = -25/5 = -5, chi2 = (25-1)^2/25 = 23.04
    val strict = mcOf(col("id") % 4 === 0, col("id") % 2 === 0)
    assert(strict.getAs[Long]("n10") == 0L && strict.getAs[Long]("n01") == 25L)
    assert(strict.getAs[Double]("z") == -5.0 &&
      strict.getAs[Double]("chi2") == 23.04)
    // symmetric total disagreement: z 0, chi2 clamps to 0 (not 1/(b+c))
    val sym = mcOf(col("id") % 2 === 0, col("id") % 2 === 1)
    assert(sym.getAs[Double]("z") == 0.0 && sym.getAs[Double]("chi2") == 0.0)
    // |b-c| = 1: continuity correction clamps chi2 to 0, z keeps the sign
    val one = mcOf(col("id") < 26, col("id") < 25)
    assert(one.getAs[Double]("z") == 1.0 && one.getAs[Double]("chi2") == 0.0)
    // perfect agreement: no discordant pairs -> NULL, not 0/0
    val agree = mcOf(col("id") % 2 === 0, col("id") % 2 === 0)
    assert(agree.isNullAt(agree.fieldIndex("z")) &&
      agree.isNullAt(agree.fieldIndex("chi2")))
  }

  test("cochranQ: hand-computed Q over a 3-filter panel, unanimous rows read NULL, null rows drop") {
    import spark.implicits._
    // subjects 0..3: f1=(T,T,T,F) f2=(T,F,T,F) f3=(T,F,F,F)
    // R=(3,1,2,0) sr=6 sr2=14; C=(3,2,1) -> num=3*14-36=6, den=18-14=4,
    // Q=2*6/4=3
    val ids = (0 until 4).toDF("id")
    val out = Curation.cochranQ(ids, Seq(
      col("id") <= 2, col("id").isin(0, 2), col("id") === 0)).head()
    assert(out.getLong(0) == 3L && out.getLong(1) == 4L &&
      out.getLong(2) == 2L && out.getDouble(3) == 3.0, s"got $out")
    // every row unanimous (all-true or all-false): denominator 0 -> NULL
    val un = Curation.cochranQ(ids, Seq(
      col("id") < 2, col("id") < 2, col("id") < 2)).head()
    assert(un.isNullAt(3))
    // a NULL flag drops the whole block
    val withNull = Curation.cochranQ(ids, Seq(
      when(col("id") < 3, col("id") <= 2), col("id").isin(0, 2),
      col("id") === 0)).head()
    assert(withNull.getLong(1) == 3L)
  }

  test("fleissKappa: hand-computed P-bar/P-e/kappa, perfect and unanimous panels") {
    import spark.implicits._
    val ids = (0 until 4).toDF("id")
    // same panel as the cochran spec: R=(3,1,2,0) -> P-bar 2/3, p1 .5,
    // P-e .5; kappa from the ROUNDED pieces: .166667/.5 = .333334
    val out = Curation.fleissKappa(ids, Seq(
      col("id") <= 2, col("id").isin(0, 2), col("id") === 0)).head()
    assert(out.getLong(0) == 3L && out.getLong(1) == 4L)
    assert(out.getDouble(2) == 0.666667 && out.getDouble(3) == 0.5 &&
      out.getDouble(4) == 0.333334, s"got $out")
    // three identical filters: perfect agreement, kappa 1
    val perf = Curation.fleissKappa(ids, Seq(
      col("id") < 2, col("id") < 2, col("id") < 2)).head()
    assert(perf.getDouble(2) == 1.0 && perf.getDouble(4) == 1.0)
    // unanimous all-true everywhere: P-e 1 reads kappa 0 by convention
    val un = Curation.fleissKappa(ids, Seq(lit(true), lit(true), lit(true)))
      .head()
    assert(un.getDouble(3) == 1.0 && un.getDouble(4) == 0.0)
  }
}
