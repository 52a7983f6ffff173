package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Packing, Retrieval, Stats, TextAnalysis, Vectors}

/** Round-5 training-pipeline operators: BM25 retrieval, unigram-LM scoring,
  * histogram quantiles, sliding-window chunking, SemDeDup semantic pairs.
  */
class RetrievalStatsSpec extends SparkSpec {

  private lazy val docs = table("documents")

  test("bm25TopK: scores positive, ranked, and bounded by k") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("hash", "join", "merge"), k = 10).collect()
    assert(out.length <= 10 && out.nonEmpty)
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0), "Lucene-style idf never goes negative")
    assert(scores.sameElements(scores.sorted.reverse), "descending by score")
    // a doc mentioning a term more often than another identical-length doc
    // scores at least as high on that term alone — sanity on the tf term
    assert(out.head.getAs[Long]("n_terms") >= 1)
  }

  test("queryLikelihoodTopK: Dirichlet smoothing scores every doc, tf raises, length drags") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash hash join alpha"),   // 2 hash + 1 join
      (2L, "hash join alpha beta"),   // 1 hash + 1 join, same length
      (3L, "alpha beta gamma delta"), // no query terms, length 4
      (4L, "alpha beta")              // no query terms, length 2
    ).toDF("doc_id", "text")
    val out = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq("hash", "join"), k = 10, mu = 100.0).collect()
    assert(out.length == 4, "every document scores under Dirichlet smoothing")
    val byId = out.map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(byId(1L)._1 > byId(2L)._1, "more tf at equal length must score higher")
    assert(byId(2L)._1 > byId(3L)._1, "a matching doc beats a non-matching one here")
    assert(byId(4L)._1 > byId(3L)._1, "among no-hit docs the shorter wins (length prior)")
    assert(byId(3L)._2 == 0L && byId(1L)._2 == 2L)
    // scores are genuine log-likelihood rates: all negative at mu >> tf
    assert(out.forall(_.getDouble(1) < 0.0))
    // OOV-only query: every in-corpus contribution drops, k bound holds
    val oov = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq("zzz"), k = 2, mu = 100.0).collect()
    assert(oov.length == 2 && oov.forall(_.getLong(2) == 0L))
  }

  test("bm25TopK: a doc containing no query term never appears") {
    val ids = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("hash"), k = 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val without = docs
      .filter(!array_contains(TextAnalysis.tokens(col("text")), "hash"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(without).isEmpty)
  }

  test("collocations: a planted rigid phrase outranks frequency accidents") {
    import spark.implicits._
    import graft.functions.Retrieval
    // "zig zag" always co-occurs (PMI high); "the cat"/"the dog" split
    // "the"'s mass (PMI low); floor of 5 requires enough repetitions
    val docs = (1 to 6).map(i => (i.toLong,
      "zig zag runs here and the cat sees the dog near the cat again"))
      .toDF("doc_id", "text")
    val out = Retrieval.collocations(docs, "text", minCount = 5, topK = 20)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
    val byPair = out.toMap
    assert(byPair.contains("zig zag") && byPair("zig zag")._1 == 6L)
    assert(byPair.contains("the cat"))
    assert(byPair("zig zag")._2 > byPair("the cat")._2,
      "a rigid phrase must out-PMI a common-word pair")
    // ranked descending by pmi
    val pmis = out.map(_._2._2).toSeq
    assert(pmis == pmis.sorted.reverse)
  }

  test("unigramLogProb: negative log-probs, zero-token docs score 0") {
    val out = Retrieval.unigramLogProb(docs, "doc_id", "text")
    assert(out.count() === docs.count(), "every document scored")
    val scored = out.filter(col("n_tokens") > 0)
    assert(scored.filter(col("avg_logprob") >= 0).count() === 0,
      "smoothed probabilities are < 1, so log-probs are negative")
    // more probable (frequent-token) docs score higher than rare-token docs:
    // the max avg_logprob is strictly above the min on any non-trivial corpus
    val mm = scored.agg(min("avg_logprob"), max("avg_logprob")).head
    assert(mm.getDouble(0) < mm.getDouble(1))
  }

  test("histogramQuantiles: cumulative logic picks the first qualifying bin") {
    val ev = table("events")
    val out = Stats.histogramQuantiles(ev, "value", 10.0, Seq(0.5, 0.9))
      .collect().sortBy(_.getAs[Double]("q"))
    assert(out.length === 2)
    val n = ev.count()
    out.foreach { r =>
      val q = r.getAs[Double]("q"); val cum = r.getAs[Long]("cum_count")
      assert(r.getAs[Long]("total") === n)
      assert(cum.toDouble >= q * n, "bin reaches the quantile")
      // exact check against a driver-side sort at test scale
      val exact = ev.select("value").collect().map(_.getDouble(0)).sorted
        .apply(math.ceil(q * n).toInt - 1)
      assert(exact >= r.getAs[Double]("lo") - 10.0 && exact < r.getAs[Double]("hi"),
        s"true q=$q value $exact within one bin of [${r.getAs[Double]("lo")}, ${r.getAs[Double]("hi")})")
    }
    assert(out(0).getAs[Long]("bin") <= out(1).getAs[Long]("bin"), "monotone in q")
  }

  test("tokenEntropyScores: 0 for degenerate, ln(n) for all-distinct, 0 for empty") {
    import spark.implicits._
    import graft.functions.Retrieval
    val d = Seq(
      (1L, "spam spam spam spam"),
      (2L, "four fully distinct tokens"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Retrieval.tokenEntropyScores(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == (4L, 0.0), "degenerate text has zero entropy")
    assert(out(3L) == (0L, 0.0), "empty text scores 0")
    assert(math.abs(out(2L)._2 - math.log(4.0)) < 1e-3,
      s"uniform distinct tokens reach ln(4), got ${out(2L)._2}")
  }

  test("stripHtml: payload blocks die with contents, entities decode after tags") {
    import spark.implicits._
    val cases = Seq(
      "<p>Hello <b>world</b></p>" -> "Hello world",
      "<script>var a = '<p>not text</p>';</script>real" -> "real",
      "<style>.x{color:red}</style>text" -> "text",
      // decoded AFTER tag strip: a literal &lt;c&gt; survives as text
      "a &amp; b &lt;c&gt;" -> "a & b <c>",
      "<!-- <b>gone</b> -->kept" -> "kept",
      "one <br/> two &nbsp; three" -> "one two three")
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.stripHtml(col("h"))).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"stripHtml($in) = '$g', want '$want'") }
    val tags = Seq("<p>a</p><br/><!-- x -->").toDF("h")
      .select(TextAnalysis.htmlTagCount(col("h"))).head().getLong(0)
    assert(tags == 3L, s"p, /p, br are tags; the comment is not: $tags")
  }

  test("readabilityScore: hand-computed Flesch, simple text outranks dense text") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "The cat sat. The dog ran."),  // 6 words, 2 sentences, 6 vowel groups
      (2L, "Incomprehensibilities notwithstanding, parallelization accelerates."),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.readabilityScore(col("text")).as("f"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // doc 1: 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    assert(out(1L).contains(119.19))
    assert(out(2L).get < out(1L).get, "dense latinate text must score lower")
    assert(out(3L).isEmpty, "empty docs read NULL")
  }

  test("ksDrift: hand-computed statistic, identical distributions read 0") {
    import spark.implicits._
    import graft.functions.Stats
    // a: 4 values in bin 0, 4 in bin 1; b: 2 in bin 0, 6 in bin 1
    // CDFs at edges: a = (0.5, 1.0), b = (0.25, 1.0) -> KS = 0.25
    val a = Seq(0.1, 0.2, 0.3, 0.4, 1.1, 1.2, 1.3, 1.4).toDF("v")
    val b = Seq(0.1, 0.2, 1.1, 1.2, 1.3, 1.4, 1.5, 1.6).toDF("v")
    val row = Stats.ksDrift(a, b, "v", width = 1.0).head()
    assert(row.getDouble(0) == 0.25 && row.getLong(1) == 8L && row.getLong(2) == 8L)
    // identical samples: zero drift even with unequal sizes
    val row2 = Stats.ksDrift(a, a.unionAll(a), "v", width = 1.0).head()
    assert(row2.getDouble(0) == 0.0 && row2.getLong(2) == 16L)
    // disjoint supports: KS = 1
    val c = Seq(10.0, 11.0).toDF("v")
    assert(Stats.ksDrift(a, c, "v", width = 1.0).head().getDouble(0) == 1.0)
  }

  test("bpeTrain: hand-computed merge sequence, greedy non-overlap, weighted counts") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    // word counts: hug x3, pug x2, bug x1
    // round 1: (u,g) weighted 6 beats (h,u) 3 -> merge 'ug'
    // round 2: (h,ug) 3 -> 'hug'; round 3: (p,ug) 2 -> 'pug'
    val docs = Seq((0L, "hug hug pug"), (1L, "hug pug bug")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, "text", nMerges = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toMap
    assert(out == Map(
      1 -> ("u", "g", "ug", 6L),
      2 -> ("h", "ug", "hug", 3L),
      3 -> ("p", "ug", "pug", 2L)), s"got $out")
    // greedy non-overlap: 'aaaa' merges to (aa)(aa) in one round, so round
    // 2's best pair is (aa,aa) — an overlapping merge would leave no pair
    val rep = TextAnalysis.bpeTrain(Seq((0L, "aaaa")).toDF("doc_id", "text"),
      "text", nMerges = 2, minPair = 1)
      .collect().map(r => r.getInt(0) -> (r.getString(3), r.getLong(4))).toMap
    // round 1: 3 adjacent (a,a) positions in the word-type, weight 1 -> 3
    assert(rep == Map(1 -> ("aa", 3L), 2 -> ("aaaa", 1L)), s"got $rep")
    // early stop: a single one-char word has no pairs at all
    assert(TextAnalysis.bpeTrain(Seq((0L, "a")).toDF("doc_id", "text"),
      "text", nMerges = 3).count() == 0)
  }

  test("bpeApply: hand-computed encoding with a trained merge table") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    // merges (ug), (hug): hug -> [hug], pug -> [p, ug], bug -> [b, ug]
    val docs = Seq((0L, "hug hug pug"), (1L, "hug pug bug")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeApply(docs, "text", Seq(("u", "g"), ("h", "ug")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // hug x3 -> hug; pug x2 -> p+ug; bug x1 -> b+ug
    assert(out == Map(
      "hug" -> (3L, 1L), // 3 occurrences, 1 word type
      "p" -> (2L, 1L), "b" -> (1L, 1L),
      "ug" -> (3L, 2L)), s"got $out") // in pug (x2) and bug (x1)
    // empty merge table degrades to plain character counts
    val chars = TextAnalysis.bpeApply(Seq((0L, "ab ab")).toDF("doc_id", "text"),
      "text", Nil).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(chars == Map("a" -> 2L, "b" -> 2L), s"got $chars")
    // a symbol repeated within one word counts the word type once
    val rep = TextAnalysis.bpeApply(Seq((0L, "abab")).toDF("doc_id", "text"),
      "text", Seq(("a", "b")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep == Map("ab" -> (2L, 1L)), s"got $rep")
  }

  test("oovRate: hand-computed per-group rates against the corpus top-k vocab") {
    import spark.implicits._
    import graft.functions.Retrieval
    // corpus counts: a:3 b:3 c:1 d:2 -> top-2 vocab (cnt desc, tok asc) = {a, b}
    val docs = Seq(("en", "a a b"), ("en", "a c"), ("de", "b b d d"))
      .toDF("lang", "text")
    val out = Retrieval.oovRate(docs, "text", "lang", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      "en" -> (5L, 1L, 0.2), // c is OOV
      "de" -> (4L, 2L, 0.5)), s"got $out") // d is OOV
    // vocab covering everything reads 0 everywhere
    val full = Retrieval.oovRate(docs, "text", "lang", vocabSize = 10)
      .collect()
    assert(full.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }

  test("keySkew: hand-computed shares and whale factor, top-k cut") {
    import spark.implicits._
    import graft.functions.Stats
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val out = Stats.keySkew(df, "k", topK = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    // total 10, 3 keys, max 6 -> whale factor 6*3/10 = 1.8 on every row
    assert(out == Map(
      "a" -> (6L, 0.6, 3L, 1.8),
      "b" -> (3L, 0.3, 3L, 1.8)), s"got $out") // topK=2 drops "c"
    // uniform keys read whale factor 1.0
    val uni = Stats.keySkew(Seq("x", "x", "y", "y").toDF("k"), "k", topK = 5)
      .collect()
    assert(uni.length == 2 && uni.forall(_.getDouble(4) == 1.0))
  }

  test("lengthBuckets: bounded batches, peers within one bin, deterministic") {
    val plan = Packing.lengthBuckets(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), width = 16, batchSize = 8, shards = 4)
    assert(plan.count() == docs.count(), "assignment is total")
    val stats = Packing.lengthBucketStats(plan).collect()
    assert(stats.forall(_.getAs[Long]("n_rows") <= 8), "batch size bounded")
    // batch peers share a length bin: max-min spread under one bin width
    val spread = plan.groupBy("bin", "shard", "batch")
      .agg((max(col("n_tok")) - min(col("n_tok"))).as("d")).collect()
    assert(spread.forall(_.getAs[Long]("d") < 16))
    // pos is a within-batch ordinal
    assert(plan.filter(col("pos") < 0 || col("pos") >= 8).count() == 0)
    // deterministic: re-evaluation assigns identically
    val a = plan.collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val b = Packing.lengthBuckets(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), width = 16, batchSize = 8, shards = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(a == b)
  }

  test("powerLawAlpha: recovers a planted Pareto tail, uniform counts read steep") {
    import spark.implicits._
    import graft.functions.Stats
    // planted discrete tail: count c appears round(1000/c^2) times -> alpha ~2
    val keys = (1 to 50).flatMap { c =>
      val reps = math.max(1, math.round(1000.0 / (c * c)).toInt)
      (0 until reps).flatMap(r => Seq.fill(c)(s"k${c}_$r"))
    }
    val row = Stats.powerLawAlpha(keys.toDF("k"), "k", xmin = 1).head()
    val alpha = row.getDouble(2)
    assert(alpha > 1.5 && alpha < 2.6, s"planted alpha~2 tail, got $alpha")
    // uniform per-key counts: all mass at one value -> very steep tail
    val uni = (1 to 100).flatMap(i => Seq.fill(3)(s"u$i")).toDF("k")
    val steep = Stats.powerLawAlpha(uni, "k", xmin = 2).head().getDouble(2)
    assert(steep > alpha, s"uniform must read steeper: $steep vs $alpha")
  }

  test("histogram2d: bins exact, shares sum to 1") {
    import spark.implicits._
    import graft.functions.Stats
    val df = Seq((1.0, 1.0), (1.5, 1.2), (11.0, 1.0), (1.0, 25.0))
      .toDF("x", "y")
    val out = Stats.histogram2d(df, "x", "y", 10.0, 10.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map((0L, 0L) -> (2L, 0.5), (1L, 0L) -> (1L, 0.25),
      (0L, 2L) -> (1L, 0.25)), s"got $out")
  }

  test("categoricalEntropy: uniform reads normalized 1, constant reads 0") {
    import spark.implicits._
    import graft.functions.Stats
    val uniform = (1 to 4).flatMap(i => Seq.fill(25)(s"v$i")).toDF("c")
    val u = Stats.categoricalEntropy(uniform, "c").head()
    assert(u.getLong(0) == 100L && u.getLong(1) == 4L)
    assert(u.getDouble(3) == 1.0, s"uniform norm entropy ${u.getDouble(3)}")
    assert(math.abs(u.getDouble(2) - math.log(4.0)) < 1e-5)
    val const = Seq.fill(50)("only").toDF("c")
    val k = Stats.categoricalEntropy(const, "c").head()
    assert(k.getDouble(2) == 0.0 && k.getDouble(3) == 0.0)
  }

  test("correlationMatrix: linear reads 1, anti-linear -1, scrambled near 0") {
    import spark.implicits._
    import graft.functions.Stats
    val df = (1 to 100).map(i => (i.toDouble, 2.0 * i + 3.0, -i.toDouble,
      ((i * 37) % 101).toDouble)).toDF("a", "b", "c", "d")
    val m = Stats.correlationMatrix(df, Seq("a", "b", "c", "d")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(m.size == 6)
    assert(m(("a", "b")) == 1.0 && m(("a", "c")) == -1.0 && m(("b", "c")) == -1.0)
    assert(math.abs(m(("a", "d"))) < 0.3, s"scrambled column: ${m(("a", "d"))}")
  }

  test("giniConcentration: hand-computed Gini, uniform reads 0") {
    import spark.implicits._
    import graft.functions.Stats
    // counts {a:1, b:3}: Lorenz (0.5, 0.25) -> (1, 1); 2·area = 0.75
    val df = (Seq("a") ++ Seq.fill(3)("b")).toDF("k")
    val row = Stats.giniConcentration(df, "k").head()
    assert(row.getLong(0) == 2L && row.getLong(1) == 4L)
    assert(row.getDouble(2) == 0.25, s"gini ${row.getDouble(2)}")
    // uniform keys: exactly 0
    val uni = (1 to 5).flatMap(i => Seq.fill(4)(s"k$i")).toDF("k")
    assert(Stats.giniConcentration(uni, "k").head().getDouble(2) == 0.0)
    // extreme tail: one whale among many singletons approaches 1 from below
    val whale = (Seq.fill(1000)("w") ++ (1 to 100).map(i => s"s$i")).toDF("k")
    val g = Stats.giniConcentration(whale, "k").head().getDouble(2)
    assert(g > 0.85 && g < 1.0, s"gini $g")
  }

  test("psiDrift: hand-computed score, identical distributions read 0") {
    import spark.implicits._
    import graft.functions.Stats
    // a: 4 in bin 0, 4 in bin 1; b: 2 in bin 0, 6 in bin 1; add-one over
    // k=2 bins: pa=(0.5,0.5), pb=(0.3,0.7)
    // PSI = 0.2·ln(5/3) − 0.2·ln(5/7) = 0.169460 (6dp)
    val a = Seq(0.1, 0.2, 0.3, 0.4, 1.1, 1.2, 1.3, 1.4).toDF("v")
    val b = Seq(0.1, 0.2, 1.1, 1.2, 1.3, 1.4, 1.5, 1.6).toDF("v")
    val row = Stats.psiDrift(a, b, "v", width = 1.0).head()
    assert(row.getLong(0) == 2L && row.getLong(1) == 8L && row.getLong(2) == 8L)
    assert(math.abs(row.getDouble(3) - 0.16946) < 1e-5, s"psi ${row.getDouble(3)}")
    // same shape at different sizes: proportions equal -> exactly 0
    val z = Stats.psiDrift(a, a.unionAll(a), "v", width = 1.0).head()
    assert(z.getDouble(3) == 0.0 && z.getLong(2) == 16L)
  }

  test("welchTTest: hand-computed t and Welch-Satterthwaite dof, equal samples read t=0") {
    import spark.implicits._
    import graft.functions.Stats
    // a: n=4 mean 2.5 se2=5/12; b: n=5 mean 6 se2=2
    // t = -3.5/sqrt(29/12) = -2.251436, df = (29/12)^2/(se2a^2/3+se2b^2/4) = 5.5208
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(2.0, 4.0, 6.0, 8.0, 10.0).toDF("v")
    val row = Stats.welchTTest(a, b, "v").head()
    assert(row.getLong(0) == 4L && row.getLong(1) == 5L)
    assert(row.getDouble(2) == 2.5 && row.getDouble(3) == 6.0)
    assert(math.abs(row.getDouble(4) - -2.251436) < 1e-6, s"t ${row.getDouble(4)}")
    assert(math.abs(row.getDouble(5) - 5.5208) < 1e-4, s"df ${row.getDouble(5)}")
    // identical arms: mean difference 0 -> t exactly 0
    assert(Stats.welchTTest(b, b, "v").head().getDouble(4) == 0.0)
  }

  test("trendTest: hand-computed OLS line, exact fit reads r2=1 with null t, flat y reads 0") {
    import spark.implicits._
    import graft.functions.Stats
    // (1,2)(2,4)(3,5)(4,9): slope 2.2, intercept -0.5, r2 0.930769, t 5.18545
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 5.0), (4.0, 9.0)).toDF("x", "y")
    val row = Stats.trendTest(df, col("x"), col("y")).head()
    assert(row.getLong(0) == 4L)
    assert(row.getDouble(1) == 2.2 && row.getDouble(2) == -0.5)
    assert(math.abs(row.getDouble(3) - 0.930769) < 1e-6, s"r2 ${row.getDouble(3)}")
    assert(math.abs(row.getDouble(4) - 5.18545) < 1e-5, s"t ${row.getDouble(4)}")
    // exact fit: r2 = 1, t undefined (NULL, not infinity)
    val exact = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
    val e = Stats.trendTest(exact, col("x"), col("y")).head()
    assert(e.getDouble(1) == 2.0 && e.getDouble(3) == 1.0 && e.isNullAt(4))
    // flat y: zero variance in y -> slope 0, r2 0
    val flat = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    val f = Stats.trendTest(flat, col("x"), col("y")).head()
    assert(f.getDouble(1) == 0.0 && f.getDouble(3) == 0.0)
  }

  test("anovaF: hand-computed F and eta2, identical groups read 0, degenerate cases read null") {
    import spark.implicits._
    import graft.functions.Stats
    // a:(1,2,3) b:(2,4,6) c:(5,5,8) -> SSW 24.6667, SSB 18.6667... F 4.5, eta2 0.6
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0),
      ("b", 6.0), ("c", 5.0), ("c", 5.0), ("c", 8.0)).toDF("g", "v")
    val row = Stats.anovaF(df, col("g"), col("v")).head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 9L)
    assert(row.getLong(2) == 2L && row.getLong(3) == 6L)
    assert(row.getDouble(4) == 4.5 && row.getDouble(5) == 0.6)
    // identical group means: F exactly 0
    val same = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    assert(Stats.anovaF(same, col("g"), col("v")).head().getDouble(4) == 0.0)
    // one group: F undefined -> NULL
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(Stats.anovaF(one, col("g"), col("v")).head().isNullAt(4))
    // zero within-variance: NULL, not infinity
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("g", "v")
    assert(Stats.anovaF(const, col("g"), col("v")).head().isNullAt(4))
  }

  test("exactQuantiles: interpolated order stats match percentile semantics, duplicates honored") {
    import spark.implicits._
    import graft.functions.Stats
    val df = Seq(10.0, 20.0, 30.0, 40.0).toDF("v")
    val out = Stats.exactQuantiles(df, col("v"), Seq(0.0, 0.25, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(out == Map(0.0 -> 10.0, 0.25 -> 17.5, 0.5 -> 25.0, 1.0 -> 40.0),
      s"got $out")
    // duplicates collapse into the count table but weight the positions
    val dup = Seq(1.0, 1.0, 2.0).toDF("v")
    assert(Stats.exactQuantiles(dup, col("v"), Seq(0.5)).head().getDouble(2)
      == 1.0)
    // agreement with Spark's own exact percentile on a larger frame
    val big = (1 to 101).map(i => ((i * 37) % 101).toDouble).toDF("v")
    val qs = Seq(0.1, 0.5, 0.9)
    val mine = Stats.exactQuantiles(big, col("v"), qs)
      .collect().map(_.getDouble(2)).toSeq
    val ref = big.agg(percentile(col("v"), lit(0.5))).head().getDouble(0)
    assert(mine(1) == ref, s"median ${mine(1)} vs percentile $ref")
    assert(mine == Seq(10.0, 50.0, 90.0))
  }

  test("exactQuantiles: NULLs excluded (percentile semantics), empty input keeps per-q rows") {
    import spark.implicits._
    import graft.functions.Stats
    // the round-11 ADVICE repro: [1,2,3,4,null,null] at q=0.5 must read
    // 2.5 (Spark percentile over non-nulls), not 3.5 (nulls bucketed)
    val withNulls = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, null, null).toDF("v")
    val med = Stats.exactQuantiles(withNulls, col("v"), Seq(0.5)).head()
    assert(med.getLong(1) == 4L, s"n must count non-nulls, got ${med.getLong(1)}")
    assert(med.getDouble(2) == 2.5, s"median over non-nulls, got ${med.getDouble(2)}")
    val ref = withNulls.agg(percentile(col("v"), lit(0.5))).head().getDouble(0)
    assert(med.getDouble(2) == ref)
    // documented contract: empty input → one row per q, value NULL, n = 0
    val empty = Seq.empty[Double].toDF("v")
    val rows = Stats.exactQuantiles(empty, col("v"), Seq(0.25, 0.75))
      .collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.25, 0.75))
    assert(rows.forall(r => r.getLong(1) == 0L && r.isNullAt(2)),
      s"per-q NULL rows expected, got ${rows.mkString(",")}")
  }

  test("jonckheereTerpstra: J equals the pairwise MWU sum, z equals tau-b z, ties halved") {
    import spark.implicits._
    import graft.functions.Stats
    // ordered groups with a clear increasing trend + one cross-group tie:
    // a:{1,2} b:{2,3} c:{4,5} — J by hand: (a,b): 1<2,1<3,2<3 =3 + tie 2=2
    // gives 3.5; (a,c): all 4 up = 4; (b,c): all 4 up = 4 → J = 11.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0),
      ("c", 4.0), ("c", 5.0)).toDF("g", "v")
    val r = Stats.jonckheereTerpstra(df, col("g"), col("v")).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L, s"n/k wrong: $r")
    assert(r.getDouble(2) == 11.5, s"J must be 11.5, got ${r.getDouble(2)}")
    // the identity the implementation rides: JT z == Kendall tau-b z
    // with x = group (J − E[J] = S/2, Var(J) = Var(S)/4)
    val kz = Stats.kendallTau(df, col("g"), col("v")).head().getAs[Double]("z")
    assert(r.getDouble(3) == kz, s"JT z ${r.getDouble(3)} must equal tau-b z $kz")
    // monotone-decreasing data flips the sign
    val dec = Seq(("a", 5.0), ("a", 4.0), ("b", 2.0), ("c", 1.0)).toDF("g", "v")
    assert(Stats.jonckheereTerpstra(dec, col("g"), col("v"))
      .head().getDouble(3) < 0.0)
  }

  test("brunnerMunzel: hand-computed placements, ties halved, separation degenerates to NULL") {
    import spark.implicits._
    import graft.functions.Stats
    // x={1,3} y={2,4}: combined ranks 1..4, placements give Sx=Sy=0.5,
    // W = 1/sqrt(2), p_hat = 0.75, df = 2 (scipy.stats.brunnermunzel)
    val x = Seq(1.0, 3.0).toDF("v")
    val y = Seq(2.0, 4.0).toDF("v")
    val r = Stats.brunnerMunzel(x, y, "v").head()
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == 0.75, s"p_hat: $r")
    assert(r.getDouble(3) == 0.707107, s"w: $r")
    assert(r.getDouble(4) == 2.0, s"df: $r")
    // a cross-arm tie contributes half: x={1,2} y={2,3} -> p_hat 0.875,
    // W = 6/(4*sqrt(0.5)) = 2.12132, df = 2
    val xt = Seq(1.0, 2.0).toDF("v")
    val yt = Seq(2.0, 3.0).toDF("v")
    val rt = Stats.brunnerMunzel(xt, yt, "v").head()
    assert(rt.getDouble(2) == 0.875 && rt.getDouble(3) == 2.12132
      && rt.getDouble(4) == 2.0, s"tied case: $rt")
    // complete separation: zero placement variance on both arms -> the
    // statistic is infinite; w/df read NULL, p_hat still reads 1
    val lo = Seq(1.0, 2.0).toDF("v")
    val hi = Seq(5.0, 6.0).toDF("v")
    val rs = Stats.brunnerMunzel(lo, hi, "v").head()
    assert(rs.getDouble(2) == 1.0 && rs.isNullAt(3) && rs.isNullAt(4), s"sep: $rs")
  }

  test("moodMedianTest: hand-computed 2xk chi2 against the pooled interpolated median") {
    import spark.implicits._
    import graft.functions.Stats
    // pooled median of {1,2,3,4} = 2.5; above: a 0/2, b 2/2 -> every
    // cell's E = 1, chi2 = 4
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val r = Stats.moodMedianTest(df, col("g"), col("v")).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      ((4L, 2L, 2.5, 4.0)), s"got $r")
    // identical groups: chi2 reads ~0, never negative
    val flat = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    val f = Stats.moodMedianTest(flat, col("g"), col("v")).head()
    assert(f.getDouble(3) == 0.0, s"got $f")
    // one group: dichotomy carries no between-group information -> NULL
    val one = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "v")
    assert(Stats.moodMedianTest(one, col("g"), col("v")).head().isNullAt(3))
  }

  test("ansariBradley: end-in scores hand-checked, center-straddling ties exact, spread arm scores low") {
    import spark.implicits._
    import graft.functions.Stats
    // x={1,4} (the spread arm, scores 1+1), y={2,3}: AB=2, E=3, Var=1/3
    val x = Seq(1.0, 4.0).toDF("v")
    val y = Seq(2.0, 3.0).toDF("v")
    val r = Stats.ansariBradley(x, y, "v").head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 2L, 2.0)))
    assert(r.getDouble(3) == -1.732051, s"z: $r")
    // a tie block straddling the center: x={2,2} takes the averaged
    // center scores (2 each) -> AB=4, z=+1.732051 (concentrated arm high)
    val xc = Seq(2.0, 2.0).toDF("v")
    val yc = Seq(1.0, 3.0).toDF("v")
    val rc = Stats.ansariBradley(xc, yc, "v").head()
    assert(rc.getDouble(2) == 4.0 && rc.getDouble(3) == 1.732051, s"got $rc")
    // all values tied: zero score variance -> NULL z
    // one 4-way tie block: averaged score 1.5 each -> AB = 3, zero
    // score variance -> NULL z
    val flat = Stats.ansariBradley(Seq(5.0, 5.0).toDF("v"),
      Seq(5.0, 5.0).toDF("v"), "v").head()
    assert(flat.getDouble(2) == 3.0 && flat.isNullAt(3), s"got $flat")
  }

  test("rank statistics exclude NULL values and NULL group keys") {
    import spark.implicits._
    import graft.functions.Stats
    // a null value must not corrupt ranks: with/without nulls identical
    val clean = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val dirty = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("a", null), (null, 9.0)).toDF("g", "v")
    val hc = Stats.kruskalWallis(clean, col("g"), col("v")).head()
    val hd = Stats.kruskalWallis(dirty, col("g"), col("v")).head()
    assert(hc.getDouble(2) == hd.getDouble(2) && hd.getLong(1) == 4L,
      s"KW must ignore null rows: $hc vs $hd")
    val sp = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (null, 1.0), (5.0, null))
      .toDF("x", "y")
    val rho = Stats.spearman(sp, col("x"), col("y")).head()
    assert(rho.getLong(0) == 3L && rho.getDouble(1) == 1.0,
      s"spearman must drop null pairs: $rho")
    val tau = Stats.kendallTau(sp, col("x"), col("y")).head()
    assert(tau.getLong(0) == 3L && tau.getAs[Double]("tau") == 1.0,
      s"kendall must drop null pairs: $tau")
  }

  test("jarqueBera: moment ratios match Spark's builtin skewness/kurtosis, chi2(2) p closed form") {
    import spark.implicits._
    import graft.functions.Stats
    val df = Seq(1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 4.0, 10.0).toDF("v")
    val r = Stats.jarqueBera(df, col("v")).head()
    assert(r.getLong(0) == 8L)
    val ref = df.agg(skewness(col("v")), kurtosis(col("v"))).head()
    assert(math.abs(r.getDouble(3) - ref.getDouble(0)) < 1e-6, "skewness")
    assert(math.abs(r.getDouble(4) - ref.getDouble(1)) < 1e-6, "kurtosis")
    // JB and its exact chi2(2) survival p agree with the hand formula
    val jb = 8.0 / 6.0 * (math.pow(ref.getDouble(0), 2) +
      math.pow(ref.getDouble(1), 2) / 4.0)
    assert(math.abs(r.getDouble(5) - jb) < 1e-5, s"jb ${r.getDouble(5)} vs $jb")
    assert(math.abs(r.getDouble(6) - math.exp(-jb / 2.0)) < 1e-5)
    // constant column: spread degenerates, statistics NULL, n/mean kept
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val c = Stats.jarqueBera(const, col("v")).head()
    assert(c.getLong(0) == 3L && c.getDouble(1) == 5.0 && c.isNullAt(5))
  }

  test("grubbs: studentized max distance flags the right tail, ties go low, degenerate is NULL") {
    import spark.implicits._
    import graft.functions.Stats
    val df = Seq(1.0, 2.0, 3.0, 100.0).toDF("v")
    val r = Stats.grubbsTest(df, col("v")).head()
    val m = 106.0 / 4.0
    val s = math.sqrt((10014.0 - 106.0 * 106.0 / 4.0) / 3.0)
    assert(r.getDouble(1) == 26.5)
    assert(math.abs(r.getDouble(3) - (100.0 - m) / s) < 1e-6)
    assert(r.getString(4) == "high")
    // symmetric data: both tails equal, 'low' wins the tie
    val sym = Seq(1.0, 2.0, 3.0).toDF("v")
    assert(Stats.grubbsTest(sym, col("v")).head().getString(4) == "low")
    // constant column degenerates to NULLs
    assert(Stats.grubbsTest(Seq(7.0, 7.0, 7.0).toDF("v"), col("v"))
      .head().isNullAt(3))
  }

  test("theilU: directional coefficients expose asymmetric dependence, symmetric case reads 1") {
    import spark.implicits._
    import graft.functions.Stats
    // x fully determines y AND vice versa: both Us are 1
    val bij = Seq(("a", 1), ("a", 1), ("b", 2), ("b", 2)).toDF("x", "y")
    val rb = Stats.theilU(bij, "x", "y").head()
    assert(rb.getDouble(6) == 1.0 && rb.getDouble(7) == 1.0)
    // x=(a,a,b,c) y=(1,1,2,2): y is a FUNCTION of x (u_yx=1) but x is
    // not recoverable from y (u_xy = MI/Hx = ln2 / 1.5ln2, rounded pieces)
    val asym = Seq(("a", 1), ("a", 1), ("b", 2), ("c", 2)).toDF("x", "y")
    val ra = Stats.theilU(asym, "x", "y").head()
    assert(ra.getDouble(6) == 0.666666 && ra.getDouble(7) == 1.0,
      s"u_xy ${ra.getDouble(6)} u_yx ${ra.getDouble(7)}")
    // independent columns: both Us 0
    val ind = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("x", "y")
    val ri = Stats.theilU(ind, "x", "y").head()
    assert(ri.getDouble(6) == 0.0 && ri.getDouble(7) == 0.0)
    // constant x: nothing to explain -> u_xy 0 by convention
    val const = Seq(("a", 1), ("a", 2)).toDF("x", "y")
    assert(Stats.theilU(const, "x", "y").head().getDouble(6) == 0.0)
  }

  test("cohensD: hand-computed d and Hedges g, degenerate pooled variance reads NULL") {
    import spark.implicits._
    import graft.functions.Stats
    // a=(1,2,3) b=(2,4,6): sp2=2.5, d=-2/sqrt(2.5), J=0.8
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 4.0, 6.0).toDF("v")
    val row = Stats.cohensD(a, b, "v").head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 3L)
    assert(row.getDouble(2) == 2.0 && row.getDouble(3) == 4.0)
    assert(row.getDouble(4) == -1.264911 && row.getDouble(5) == -1.011929,
      s"d ${row.getDouble(4)} g ${row.getDouble(5)}")
    // identical arms: d exactly 0
    assert(Stats.cohensD(a, a, "v").head().getDouble(4) == 0.0)
    // zero pooled spread: NULL, not infinity
    val c = Seq(5.0, 5.0).toDF("v")
    assert(Stats.cohensD(c, c, "v").head().isNullAt(4))
  }

  test("cliffsDelta: hand-computed dominance with ties, Romano band, empty arm reads NULL") {
    import spark.implicits._
    import graft.functions.Stats
    // a=(1,2,3) b=(2,3,4): #(a>b)=1, #(a<b)=6, 2 ties -> delta -5/9
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0).toDF("v")
    val row = Stats.cliffsDelta(a, b, "v").head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 3L)
    assert(row.getDouble(2) == -0.555556 && row.getString(3) == "large",
      s"delta ${row.getDouble(2)} band ${row.getString(3)}")
    // identical samples: delta 0, negligible
    val same = Stats.cliffsDelta(a, a, "v").head()
    assert(same.getDouble(2) == 0.0 && same.getString(3) == "negligible")
    // total dominance: exactly 1
    val hi = Seq(10.0, 11.0).toDF("v")
    assert(Stats.cliffsDelta(hi, a, "v").head().getDouble(2) == 1.0)
  }

  test("leveneTest: hand-computed Brown-Forsythe F off median deviations, outlier-driven spread detected") {
    import spark.implicits._
    import graft.functions.Stats
    // a:(1,2,3,10) med 2.5 -> |z|=(1.5,.5,.5,7.5); b:(2,2,4) med 2 ->
    // (0,0,2); anova on z: SSW 110/3, SSB 121/21 -> F 11/14, eta2 11/81
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0),
      ("b", 2.0), ("b", 2.0), ("b", 4.0)).toDF("g", "v")
    val r = Stats.leveneTest(df, col("g"), col("v")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 7L &&
      r.getLong(2) == 1L && r.getLong(3) == 5L)
    assert(r.getDouble(4) == 0.785714 && r.getDouble(5) == 0.135802,
      s"f ${r.getDouble(4)} eta2 ${r.getDouble(5)}")
    // identical spreads around different centers: deviation profiles
    // match -> F exactly 0 (the LEVEL difference is invisible here)
    val same = Seq(("a", 1.0), ("a", 3.0), ("a", 5.0),
      ("b", 101.0), ("b", 103.0), ("b", 105.0)).toDF("g", "v")
    assert(Stats.leveneTest(same, col("g"), col("v")).head().getDouble(4) == 0.0)
    // constant groups: zero deviation everywhere -> NULL, not infinity
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    assert(Stats.leveneTest(const, col("g"), col("v")).head().isNullAt(4))
  }

  test("tukeyHsd: hand-computed pairwise q off one pooled MSW, degenerate MSW reads null") {
    import spark.implicits._
    import graft.functions.Stats
    // a:(1,2,3) b:(2,4) c:(5,5,6) -> SSW 14/3, MSW 14/15; Tukey-Kramer q
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0),
      ("c", 5.0), ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val out = Stats.tukeyHsd(df, col("g"), col("v")).collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
      r.getDouble(7))).toSeq == Seq(
      ("a", "b", 3L, 2L, 2.0, 3.0, -1.0, 1.603567),
      ("a", "c", 3L, 3L, 2.0, 5.333333, -3.333333, 5.976143),
      ("b", "c", 2L, 3L, 3.0, 5.333333, -2.333333, 3.741657)),
      s"got ${out.mkString("; ")}")
    // zero within-variance: q NULL (means still reported)
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("g", "v")
    val rc = Stats.tukeyHsd(const, col("g"), col("v")).head()
    assert(rc.getDouble(6) == -1.0 && rc.isNullAt(7))
  }

  test("mannWhitney: hand-computed U and tie-corrected z, all-tied sample reads null z") {
    import spark.implicits._
    import graft.functions.Stats
    // a=(1,2,3) b=(2,3,4,5): U=2 (one tie pair each at 2 and 3 -> half each),
    // ties t=(1,2,2,1,1) -> sum(t3-t)=12, z=-1.440165
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0, 5.0).toDF("v")
    val row = Stats.mannWhitney(a, b, "v").head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 4L)
    assert(row.getDouble(2) == 2.0)
    assert(math.abs(row.getDouble(3) - -1.440165) < 1e-6, s"z ${row.getDouble(3)}")
    // symmetric arms: U = n²/2, z exactly 0
    val sym = Stats.mannWhitney(b, b, "v").head()
    assert(sym.getDouble(2) == 8.0 && sym.getDouble(3) == 0.0)
    // every value tied: zero rank variance -> z NULL, not NaN
    val tied = Seq(7.0, 7.0).toDF("v")
    assert(Stats.mannWhitney(tied, tied, "v").head().isNullAt(3))
  }

  test("kruskalWallis: hand-computed H with and without ties, identical groups read 0, all-tied null") {
    import spark.implicits._
    import graft.functions.Stats
    // a=(1,2) b=(3,4): ranks 1,2,3,4 -> H = 12/20*(9/2+49/2)-15 = 2.4
    val ab = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val row = Stats.kruskalWallis(ab, col("g"), col("v")).head()
    assert(row.getLong(0) == 2L && row.getLong(1) == 4L)
    assert(row.getDouble(2) == 2.4, s"h ${row.getDouble(2)}")
    // ties across groups: a=(1,2,2) b=(2,3) -> tie-corrected H = 1.666667
    val tied = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val ht = Stats.kruskalWallis(tied, col("g"), col("v")).head().getDouble(2)
    assert(math.abs(ht - 1.666667) < 1e-6, s"h $ht")
    // identical group distributions: H exactly 0
    val same = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 1.0), ("b", 2.0),
      ("b", 3.0)).toDF("g", "v")
    assert(Stats.kruskalWallis(same, col("g"), col("v")).head().getDouble(2) == 0.0)
    // every value tied: zero rank variance -> NULL, not NaN
    val const = Seq(("a", 7.0), ("b", 7.0)).toDF("g", "v")
    assert(Stats.kruskalWallis(const, col("g"), col("v")).head().isNullAt(2))
  }

  test("twoProportionZ: hand-computed z, equal rates read 0, all-success reads null") {
    import spark.implicits._
    import graft.functions.Stats
    // a: 6/8, b: 3/10, pooled 9/18 -> z = 0.45/sqrt(0.25*0.225) = 1.897367
    val a = (Seq.fill(6)(true) ++ Seq.fill(2)(false)).toDF("s")
    val b = (Seq.fill(3)(true) ++ Seq.fill(7)(false)).toDF("s")
    val row = Stats.twoProportionZ(a, b, col("s")).head()
    assert(row.getLong(0) == 8L && row.getLong(1) == 10L)
    assert(row.getDouble(2) == 0.75 && row.getDouble(3) == 0.3)
    assert(math.abs(row.getDouble(4) - 1.897367) < 1e-6, s"z ${row.getDouble(4)}")
    // identical rates: z exactly 0
    assert(Stats.twoProportionZ(b, b, col("s")).head().getDouble(4) == 0.0)
    // pooled rate 1: zero variance -> NULL, not NaN
    val full = Seq(true, true).toDF("s")
    assert(Stats.twoProportionZ(full, full, col("s")).head().isNullAt(4))
  }

  test("spearman: hand-computed rho with and without ties, monotone reads 1, constant reads 0") {
    import spark.implicits._
    import graft.functions.Stats
    // x=(1,2,3,4) y=(2,1,4,3): no ties, d2=(1,1,1,1) -> rho = 1 - 24/60 = 0.6
    val df = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0)).toDF("x", "y")
    val row = Stats.spearman(df, col("x"), col("y")).head()
    assert(row.getLong(0) == 4L && row.getDouble(1) == 0.6)
    // tied x: average ranks -> 0.948683
    val tied = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    val rt = Stats.spearman(tied, col("x"), col("y")).head().getDouble(1)
    assert(math.abs(rt - 0.948683) < 1e-6, s"rho $rt")
    // any monotone map: exactly 1 (rank invariance, where Pearson dips)
    val mono = Seq((1.0, 10.0), (2.0, 1000.0), (3.0, 1000000.0)).toDF("x", "y")
    assert(Stats.spearman(mono, col("x"), col("y")).head().getDouble(1) == 1.0)
    // constant y: zero rank variance -> 0
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    assert(Stats.spearman(const, col("x"), col("y")).head().getDouble(1) == 0.0)
  }

  test("kendallTau: hand-computed tau-b and z with and without ties, monotone 1, constant-margin 0/NULL") {
    import spark.implicits._
    import graft.functions.Stats
    // x=(1,2,3,4) y=(2,1,4,3): C=4 D=2, no ties -> tau 4/12, z S/sqrt(156/18)
    val df = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0)).toDF("x", "y")
    val r = Stats.kendallTau(df, col("x"), col("y")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.333333 && r.getDouble(4) == 0.679366,
      s"tau ${r.getDouble(3)} z ${r.getDouble(4)}")
    // tied x margin: C=5 D=0, tau-b 10/sqrt(10*12), z 5/sqrt((156-18)/18)
    val tied = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    val rt = Stats.kendallTau(tied, col("x"), col("y")).head()
    assert(rt.getDouble(3) == 0.912871 && rt.getDouble(4) == 1.805788,
      s"tau ${rt.getDouble(3)} z ${rt.getDouble(4)}")
    // any monotone map: exactly 1 (pair directions are all that matter)
    val mono = Seq((1.0, 10.0), (2.0, 1000.0), (3.0, 1000000.0)).toDF("x", "y")
    assert(Stats.kendallTau(mono, col("x"), col("y")).head().getDouble(3) == 1.0)
    // constant y: all pairs tied on one margin -> tau 0, z NULL
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    val rc = Stats.kendallTau(const, col("x"), col("y")).head()
    assert(rc.getDouble(3) == 0.0 && rc.isNullAt(4))
  }

  test("cramersV: hand-computed value incl. an absent cell, perfect association 1, independence 0") {
    import spark.implicits._
    import graft.functions.Stats
    // a:(1,1,2) b:(1,2,2,2): the (a,?) x (?,?) 2x2 with no absent cells is
    // chi2 1.215278, v 0.416667 over n=7
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 2), ("b", 2),
      ("b", 2)).toDF("x", "y")
    val row = Stats.cramersV(df, "x", "y").head()
    assert(row.getLong(0) == 7L && row.getLong(1) == 2L && row.getLong(2) == 2L)
    assert(math.abs(row.getDouble(3) - 1.215278) < 1e-6, s"chi2 ${row.getDouble(3)}")
    assert(math.abs(row.getDouble(4) - 0.416667) < 1e-6, s"v ${row.getDouble(4)}")
    // perfect association (absent off-diagonal cells must contribute E)
    val perf = Seq(("a", 1), ("a", 1), ("b", 2), ("b", 2)).toDF("x", "y")
    assert(Stats.cramersV(perf, "x", "y").head().getDouble(4) == 1.0)
    // exact independence: v = 0
    val ind = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("x", "y")
    assert(Stats.cramersV(ind, "x", "y").head().getDouble(4) == 0.0)
    // one-category side: undefined -> NULL
    val one = Seq(("a", 1), ("a", 2)).toDF("x", "y")
    assert(Stats.cramersV(one, "x", "y").head().isNullAt(4))
  }

  test("chisqDrift: hand-computed statistic, identical mixes read 0, missing category counts") {
    import spark.implicits._
    import graft.functions.Stats
    // a: 30 x, 10 y; b: 10 x, 30 y. Pooled: x 40, y 40, N 80.
    // E(a,x) = 40·40/80 = 20 -> each of the 4 cells contributes (10)²/20 = 5
    val a = (Seq.fill(30)("x") ++ Seq.fill(10)("y")).toDF("cat")
    val b = (Seq.fill(10)("x") ++ Seq.fill(30)("y")).toDF("cat")
    val row = Stats.chisqDrift(a, b, "cat").head()
    assert(row.getLong(0) == 2L && row.getLong(1) == 40L &&
      row.getLong(2) == 40L && row.getLong(3) == 1L)
    assert(row.getDouble(4) == 20.0, s"chi2 ${row.getDouble(4)}")
    // identical distributions (even at different sizes): chi2 = 0
    val z = Stats.chisqDrift(a, a.unionAll(a), "cat").head()
    assert(z.getDouble(4) == 0.0 && z.getLong(2) == 80L)
    // a category absent on one side still forms a (0-observed) cell
    val c = (Seq.fill(40)("z")).toDF("cat")
    val m = Stats.chisqDrift(a, c, "cat").head()
    assert(m.getLong(0) == 3L && m.getLong(3) == 2L)
    assert(m.getDouble(4) == 80.0, // full separation: chi2 = N
      s"chi2 ${m.getDouble(4)}")
  }

  test("vocabGrowth: first-bucket attribution, running totals, empty-token drop") {
    import spark.implicits._
    import graft.functions.Retrieval
    val docs = Seq(
      (0L, "a b a"),      // bucket 0: tokens 3, new types {a,b}
      (1L, "b c"),        // bucket 0: tokens 2, new type {c}
      (2L, "a d"),        // bucket 1: tokens 2, new type {d}
      (3L, "")            // bucket 1: empty — contributes nothing
    ).toDF("doc_id", "text")
    val out = Retrieval.vocabGrowth(docs, "doc_id", "text", bucketDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      0L -> (5L, 3L, 5L, 3L),
      1L -> (2L, 1L, 7L, 4L)), s"got $out")
  }

  test("winsorize: clamps into the per-group band, interior values untouched") {
    val ev = table("events")
    val out = Stats.winsorize(ev, "event_type", "value", 10.0, 0.05, 0.95).cache()
    assert(out.count() == ev.count())
    // clamp invariant
    assert(out.filter(col("value_clipped") < col("clip_lo") ||
      col("value_clipped") > col("clip_hi")).count() == 0)
    // interior values pass through unchanged
    assert(out.filter(col("value") >= col("clip_lo") && col("value") <= col("clip_hi")
      && col("value_clipped") =!= col("value")).count() == 0)
    // the band is conservative: at most ~10% of rows get clipped
    val clipped = out.filter(col("value_clipped") =!= col("value")).count().toDouble
    assert(clipped / out.count() <= 0.12, s"clipped fraction ${clipped / out.count()}")
    // bounds are group-local: at least two event types differ in thresholds
    assert(out.select("event_type", "clip_hi").distinct().count() >= 2)
    out.unpersist()
  }

  test("bigramLogProb: backoff penalizes held-out docs, short docs score 0") {
    import graft.functions.Retrieval
    val docs = table("documents")
    val out = Retrieval.bigramLogProb(docs, "doc_id", "text",
      isTrain = col("doc_id") % 10 =!= 0).cache()
    assert(out.count() == docs.count())
    // every scored transition log-prob is negative; empty/1-token docs are 0
    assert(out.filter(col("n_transitions") > 0 && col("avg_logprob") >= 0).count() == 0)
    assert(out.filter(col("n_transitions") === 0 && col("avg_logprob") =!= 0.0).count() == 0)
    // held-out docs contain unseen bigrams → stupid backoff drags their
    // mean below the train slice's (which scores exact seen-bigram ratios)
    val mTrain = out.filter(col("doc_id") % 10 =!= 0 && col("n_transitions") > 0)
      .agg(avg("avg_logprob")).head().getDouble(0)
    val mHeld = out.filter(col("doc_id") % 10 === 0 && col("n_transitions") > 0)
      .agg(avg("avg_logprob")).head().getDouble(0)
    assert(mHeld < mTrain,
      s"held-out mean $mHeld should be below train mean $mTrain")
    out.unpersist()
  }

  test("groupedHistogramQuantiles: one row per (group, q), group-local totals and picks") {
    val ev = table("events")
    val out = Stats.groupedHistogramQuantiles(ev, "event_type", "value", 10.0,
      Seq(0.5, 0.9)).collect()
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(out.length === types.size * 2)
    val counts = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val g = r.getString(0); val q = r.getAs[Double]("q")
      assert(r.getAs[Long]("total") === counts(g), s"total for $g is group-local")
      assert(r.getAs[Long]("cum_count").toDouble >= q * counts(g))
      // the grouped pick replays the global algorithm on the group's slice
      val solo = Stats.histogramQuantiles(ev.filter(col("event_type") === g),
        "value", 10.0, Seq(q)).head()
      assert(solo.getAs[Long]("bin") === r.getAs[Long]("bin"),
        s"group $g q=$q bin must match the single-group computation")
    }
  }

  test("slidingChunks: full coverage, stride spacing, clamped last start") {
    val out = Packing.slidingChunks(docs, "doc_id", "text", window = 32, stride = 24)
    val lens = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
    val byDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("chunks"), max(col("start") + col("n_tok")).as("covered"),
        max("n_tok").as("maxw"), min("n_tok").as("minw"))
      .join(lens, "doc_id").collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("covered") === n, "last chunk ends exactly at the doc boundary")
      assert(r.getAs[Long]("maxw") <= 32)
      if (n >= 32) assert(r.getAs[Long]("minw") === 32, "all chunks full-width when n >= window")
      val expected = if (n <= 32) 1L else math.ceil((n - 32).toDouble / 24).toLong + 1
      assert(r.getAs[Long]("chunks") === expected, s"chunk count for n=$n")
    }
    // deterministic fingerprints: identical token windows hash identically
    val again = Packing.slidingChunks(docs, "doc_id", "text", 32, 24)
      .select("doc_id", "chunk", "fp").collect().toSet
    assert(out.select("doc_id", "chunk", "fp").collect().toSet === again)
  }

  test("semanticPairs: pairs are within-cluster and above threshold; subset of brute force") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val pairs = Dedup.semanticPairs(e, "vec_id", "v", k = 4, iters = 1, threshold = 0.3)
      .collect()
    // brute-force ground truth at this tiny scale
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val bf = a.crossJoin(e.select(col("vec_id").as("ib"), col("v").as("vb")))
      .filter(col("ia") < col("ib"))
      .withColumn("c", Vectors.cosine(col("va"), col("vb")))
      .filter(col("c") >= 0.3)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.foreach { r =>
      assert(bf.contains((r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))),
        "every semantic pair is a true cosine pair")
      assert(r.getAs[Double]("cosine") >= 0.3)
    }
  }

  test("semanticPairs maxCluster: a whale cluster's candidate count stays bounded") {
    import spark.implicits._
    // 64 near-identical vectors: k-means collapses them into ONE cluster —
    // the degenerate-embedding whale that would generate 64*63/2 pairs
    val whale = (0L until 64L)
      .map(i => (i, Array(1.0, 1.0 + i * 1e-9, 0.0, 0.0)))
      .toDF("vec_id", "v")
    val uncapped = Dedup.semanticPairs(whale, "vec_id", "v",
      k = 2, iters = 1, threshold = 0.0, maxCluster = Int.MaxValue)
    val capped = Dedup.semanticPairs(whale, "vec_id", "v",
      k = 2, iters = 1, threshold = 0.0, maxCluster = 8)
    val (nAll, nCap) = (uncapped.count(), capped.count())
    // sub-splitting bounds candidates to ~n*maxCluster: with n=64, cap=8 the
    // 8 sub-buckets of expected size 8 yield ~8*(8*7/2)=224 pairs max vs 2016
    assert(nCap < nAll, s"cap must reduce the whale's pair count ($nCap vs $nAll)")
    assert(nCap <= 64L * 8L, s"candidates bounded by ~n*maxCluster, got $nCap")
    // capped pairs are a SUBSET of the uncapped pairs (same scoring, fewer
    // candidates) — the guard degrades recall, never correctness
    val cap = capped.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = uncapped.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cap.subsetOf(all))
  }

  test("dsirScore: target-slice docs score higher on average; empty docs 0") {
    import spark.implicits._
    val out = Retrieval.dsirScore(docs, "doc_id", "text", col("lang") === "en")
    assert(out.count() === docs.count(), "every document scored")
    val byLang = out.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("dsir_score")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en docs must look more target-like than non-en: $byLang")
    // kept is exactly the positive-score predicate
    assert(out.filter(col("kept") =!= (col("dsir_score") > 0.0)).count() === 0)
    val empty = Seq((1L, "", "en"), (2L, "common words", "en"))
      .toDF("doc_id", "text", "lang")
    val e = Retrieval.dsirScore(empty, "doc_id", "text", col("lang") === "en")
      .filter(col("doc_id") === 1).head
    assert(e.getAs[Long]("n_tokens") === 0L && e.getAs[Double]("dsir_score") === 0.0
      && !e.getAs[Boolean]("kept"))
  }

  test("tfidfKeywords: at most perDoc terms, corpus-wide terms score 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "apple banana apple cherry shared"),
      (2L, "banana banana durian shared"),
      (3L, "elderberry shared")).toDF("doc_id", "text")
    val out = Retrieval.tfidfKeywords(d, "doc_id", "text", perDoc = 2).collect()
    assert(out.groupBy(_.getLong(0)).forall(_._2.length <= 2))
    val top1 = out.filter(r => r.getLong(0) == 1L && r.getLong(4) == 1L).head
    assert(top1.getString(1) === "apple", "tf=2, df=1 wins doc 1")
    // a term in every doc has idf = ln(1) = 0 and never outranks a unique one
    val sharedRows = out.filter(_.getString(1) == "shared")
    assert(sharedRows.forall(_.getDouble(3) === 0.0))
  }

  test("rouge2: identical docs score 1.0, disjoint docs 0.0, subset recall 1") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"),      // identical
      (3L, "x y z w"),                            // disjoint from 1
      (4L, "a b c")                               // subset of 1's bigrams
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Retrieval.rouge2(pairs, "id_a", "id_b", d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out((1L, 2L)) === ((1.0, 1.0, 1.0)))
    assert(out((1L, 3L)) === ((0.0, 0.0, 0.0)))
    // doc 4's bigrams (a b, b c) all appear in doc 1: recall-from-b = 1.0
    val (p14, r14, f14) = out((1L, 4L))
    assert(r14 === 1.0 && p14 === 0.5 && f14 > 0.6 && f14 < 0.7)
  }

  test("duplicateSpans: repeated runs merge to maximal spans; unique docs absent") {
    import spark.implicits._
    val run = (1 to 12).map(i => s"w$i").mkString(" ") // 12 shared tokens
    val d = Seq(
      (1L, s"$run tail1 tail2"),
      (2L, s"pre1 pre2 $run"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(d, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: dup 8-grams start at 0..4 -> one maximal span of 12 tokens at 0
    assert(out.contains((1L, 0L, 12L)), s"got ${out.mkString(",")}")
    // doc 2: same 12-token run offset by the 2-token prefix
    assert(out.contains((2L, 2L, 12L)), s"got ${out.mkString(",")}")
    assert(!out.exists(_._1 == 3L), "unique doc contributes no span")
    assert(out.length === 2, "exactly one maximal span per duplicated doc")
  }

  test("hotBands: adjacent hot bins merge into maximal disjoint islands per group") {
    import spark.implicits._
    // group g: bins 0,1,2 hot (30 each), 5 hot, rest cold; h: uniform (no bands)
    val rows =
      (0 to 2).flatMap(b => Seq.fill(30)(("g", b * 10.0 + 1))) ++
      Seq.fill(30)(("g", 51.0)) ++
      (10 to 19).map(b => ("g", b * 10.0 + 1)) ++
      (0 to 9).flatMap(b => Seq.fill(3)(("h", b * 10.0 + 1)))
    val out = Stats.hotBands(rows.toDF("grp", "value"), "grp", "value",
      width = 10.0, num = 12, den = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // g: mean bin count = 130/14 ≈ 9.3 → hot ⇔ cnt ≥ 11.1 → bins {0,1,2} ∪ {5}
    assert(out == Set(("g", 0L, 2L, 3L), ("g", 5L, 5L, 1L)),
      s"expected two islands for g and none for uniform h, got $out")
  }

  test("rankByScore: dense 1-based ranks, score desc, ties break to smaller id") {
    import spark.implicits._
    val df = Seq((10L, 3.0), (20L, 5.0), (30L, 3.0), (40L, 1.0)).toDF("id", "s")
    val r = Retrieval.rankByScore(df, "id", "s")
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(20L -> 1, 10L -> 2, 30L -> 3, 40L -> 4))
  }

  test("rrfFuse: both-list docs outrank single-list docs, absentees contribute zero") {
    import spark.implicits._
    // doc 1 is rank 2 in both lists; docs 2/3 are rank 1 in exactly one
    val a = Seq((2L, 1), (1L, 2)).toDF("id", "r")
    val b = Seq((3L, 1), (1L, 2)).toDF("id", "r")
    val out = Retrieval.rrfFuse(a, "id", "r", b, "id", "r", k0 = 60, k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // 2/(60+2) > 1/(60+1): consensus beats a single first place
    assert(out(1L) > out(2L), s"fused doc must lead: $out")
    // single-list docs with the same rank tie exactly
    assert(out(2L) == out(3L))
    // exact expected values (fixed-order arithmetic, 6dp)
    assert(math.abs(out(1L) - 2.0 / 62.0) < 1e-6)
    assert(math.abs(out(2L) - 1.0 / 61.0) < 1e-6)
  }

  test("poissonBootstrap: replicate means bracket the true mean, deterministic") {
    val orders = table("orders")
    val n = orders.count()
    val trueMean = orders.agg(avg(col("o_totalprice"))).collect()(0).getDouble(0)
    val out = Stats.poissonBootstrap(orders, "o_orderkey", "o_totalprice", 16)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getDecimal(2).doubleValue() / r.getLong(1)))
    assert(out.length == 16 && out.map(_._1).toSet == (0 until 16).toSet)
    // Poisson(1) weights: each replicate's effective n concentrates near n
    // (sd ≈ √n, so ±5√n is > 5 sigma)
    assert(out.forall { case (_, ne, _) =>
      math.abs(ne - n) <= 5 * math.sqrt(n.toDouble) + 1 },
      s"n_eff far from n=$n: ${out.map(_._2).mkString(",")}")
    // every replicate mean lands within a few standard errors of the truth
    assert(out.forall { case (_, _, m) =>
      math.abs(m - trueMean) < 0.2 * trueMean },
      s"replicate means off trueMean=$trueMean: ${out.map(_._3).mkString(",")}")
    // replicate means genuinely vary (the weights aren't all equal)...
    assert(out.map(_._3).distinct.length > 1)
    // ...and the whole frame is a pure function of the input
    val again = Stats.poissonBootstrap(orders, "o_orderkey", "o_totalprice", 16)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getDecimal(2).doubleValue() / r.getLong(1)))
    assert(out.toSeq == again.toSeq)
  }

  test("rocAuc: 1 on perfect ranking, 0 reversed, exact half-credit on ties, null one-class") {
    import spark.implicits._
    val ids = (0 until 100).toDF("id")
    def auc(s: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      Stats.rocAuc(ids, s, y).collect()(0)
    val perfect = auc(col("id"), col("id") >= 50)
    assert(perfect.getAs[Double]("auc") == 1.0 &&
      perfect.getAs[Long]("n_pos") == 50L)
    assert(auc(col("id"), col("id") < 50).getAs[Double]("auc") == 0.0)
    // balanced label within every tied score group: exactly 0.5
    assert(auc(col("id") % 10, (col("id") / 10).cast("int") % 2 === 0)
      .getAs[Double]("auc") == 0.5)
    // a single constant score is all ties: half credit
    assert(auc(lit(7), col("id") % 2 === 0).getAs[Double]("auc") == 0.5)
    // one-class sample: undefined, not 0.5
    assert(auc(col("id"), lit(true)).isNullAt(2))
  }

  test("prCurve and reliability: exact operating points and bin rates") {
    import spark.implicits._
    val ids = (0 until 100).toDF("id")
    val pr = Stats.prCurve(ids, col("id"), col("id") >= 50,
      Seq(0.0, 50.0, 200.0)).collect()
      .map(r => r.getDouble(0) -> r.toSeq.drop(1)).toMap
    assert(pr(50.0) == Seq(50L, 0L, 0L, 1.0, 1.0, 1.0))
    assert(pr(0.0).take(3) == Seq(50L, 50L, 0L) &&
      pr(0.0)(3) == 0.5 && pr(0.0)(5) == 0.666667)
    // nothing kept: precision undefined (null), recall and f1 zero
    assert(pr(200.0).take(3) == Seq(0L, 0L, 50L) &&
      pr(200.0)(3) == null && pr(200.0)(4) == 0.0)
    val rel = Stats.reliability(ids, col("id"), col("id") % 2 === 0, 10.0)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(4))).toMap
    assert(rel.keySet == (0L to 9L).toSet)
    assert(rel(3L) == ((30.0, 10L, 0.5)))
  }

  test("mutualInformation: zero on independence, equals H on identity, nmi in [0,1]") {
    import spark.implicits._
    // uniform independent grid: every ln ratio is ln(1) = 0 exactly
    val ind = (0 until 1200).map(i => (i % 4, (i / 4) % 3)).toDF("x", "y")
    val zi = Stats.mutualInformation(ind, "x", "y").collect()(0)
    assert(zi.getAs[Long]("n") == 1200L && zi.getAs[Long]("n_x") == 4L &&
      zi.getAs[Long]("n_y") == 3L)
    assert(zi.getAs[Double]("mi") == 0.0 && zi.getAs[Double]("nmi") == 0.0)
    // y = f(x) bijective: MI == H(x) == H(y) term-for-term, nmi == 1
    val dep = (0 until 1000).map(i => (i % 5, (i % 5) * 7)).toDF("x", "y")
    val d = Stats.mutualInformation(dep, "x", "y").collect()(0)
    assert(d.getAs[Double]("mi") == d.getAs[Double]("h_x") &&
      d.getAs[Double]("mi") == d.getAs[Double]("h_y"))
    assert(d.getAs[Double]("nmi") == 1.0)
    assert(math.abs(d.getAs[Double]("mi") - math.log(5.0)) < 1e-5)
    // partial dependence sits strictly between
    val mid = (0 until 1200).map(i => (i % 4, if (i % 8 < 4) i % 2 else i % 3))
      .toDF("x", "y")
    val m = Stats.mutualInformation(mid, "x", "y").collect()(0)
    assert(m.getAs[Double]("mi") > 0.0 && m.getAs[Double]("nmi") < 1.0)
  }
}
