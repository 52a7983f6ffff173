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

  test("bm25TopK: a doc containing no query term never appears") {
    val ids = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("hash"), k = 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val without = docs
      .filter(!array_contains(TextAnalysis.tokens(col("text")), "hash"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(without).isEmpty)
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
}
