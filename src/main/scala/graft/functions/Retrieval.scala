package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-level text scoring for training-data curation and retrieval:
  * BM25 ranked search and unigram language-model log-probability (the
  * KenLM-style perplexity-proxy quality filter).
  *
  * Both are two-aggregation plans — a corpus-statistics pass (token df /
  * counts, map-side combined) and a per-document scoring pass — with the
  * statistics table equi-joined back on the token. Every transcendental
  * enters through `ln` of an exactly-reproducible double ratio, and per-term
  * contributions are staged in DECIMAL(18,8) before summation so the
  * per-document total is exact and order-independent — the same discipline
  * as the PQ asymmetric-distance sums, which is what lets an external SQL
  * engine reproduce the scores bit-for-bit.
  */
object Retrieval {

  /** BM25 top-k retrieval (Robertson–Spärck Jones; the Lucene-style
    * `ln(1 + (N-df+0.5)/(df+0.5))` idf that never goes negative):
    * rank documents for a bag of query terms.
    *
    * Scale shape: the token stream is filtered to the query terms BEFORE any
    * aggregation (predicate pushdown on the exploded tokens — candidate set
    * is query-proportional, not corpus-proportional); document lengths and
    * corpus totals come from one scan-speed aggregation each; df and the
    * 1-row stats are broadcast; the final top-k is `orderBy(...).limit(k)`
    * — Spark's TakeOrderedAndProject, a per-partition heap + driver merge,
    * never a global sort or an unpartitioned window.
    *
    * Returns (doc_id-named idCol, score, n_terms) — `score` rounded at 4dp
    * off the exact decimal sum, ordered by (exact score desc, id asc).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val lens = docs.select(col(idCol).as("__did"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("__dl"))
    val stats = lens.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
    val tf = docs.select(col(idCol).as("__did"),
        explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .filter(col("__tok").isin(queryTerms.map(lit(_)): _*))
      .groupBy(col("__did"), col("__tok")).agg(count(lit(1)).as("__tf"))
    val dfTab = tf.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val perTerm = tf.join(lens, Seq("__did"))
      .join(broadcast(dfTab), Seq("__tok"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__n").cast("double") - col("__df") + lit(0.5))
          / (col("__df") + lit(0.5)) + lit(1.0)))
      .withColumn("__s",
        (col("__idf") * (col("__tf") * lit(k1 + 1.0))
          / (col("__tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * (col("__dl").cast("double")
              / (col("__sumdl").cast("double") / col("__n")))))))
      .withColumn("__sd", col("__s").cast(DecimalType(18, 8)))
    perTerm.groupBy(col("__did"))
      .agg(sum(col("__sd")).as("__score"), count(lit(1)).as("n_terms"))
      .orderBy(col("__score").desc, col("__did").asc)
      .limit(k)
      .select(col("__did").as(idCol),
        round(col("__score"), 4).cast("double").as("score"), col("n_terms"))
  }

  /** Unigram LM log-probability scoring (the cheap KenLM-perplexity stand-in
    * curation filters cut on): train add-one-smoothed unigram counts over
    * the corpus itself, score each document by its mean token log-prob
    * `avg ln((C(w)+1)/(T+V))` — low (very negative) means rare/garbled
    * tokens, high means fluent in-distribution text.
    *
    * Scale shape: the count table is one map-side-combined token
    * aggregation; scoring equi-joins it back on the token (AQE picks
    * broadcast when the vocabulary is small). Per-token log-probs stage in
    * DECIMAL(18,8) so the per-document sum is exact; zero-token documents
    * score 0.0 by convention.
    *
    * Returns (idCol, n_tokens, avg_logprob).
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("__did"),
        explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
    val counts = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    val stats = counts.agg(sum(col("__c")).as("__t"), count(lit(1)).as("__v"))
    val scored = toks.join(counts, Seq("__tok"))
      .crossJoin(broadcast(stats))
      .withColumn("__lp",
        log((col("__c").cast("double") + lit(1.0))
          / (col("__t").cast("double") + col("__v"))).cast(DecimalType(18, 8)))
      .groupBy(col("__did"))
      .agg(count(lit(1)).as("n_tokens"),
        // exact decimal sum → one double division → decimal-staged rounding
        // (decimal/bigint division TYPES diverge across engines; double
        // division is IEEE-identical everywhere)
        round((sum(col("__lp")).cast("double") / count(lit(1)))
          .cast(DecimalType(18, 8)), 4).cast("double").as("avg_logprob"))
    docs.select(col(idCol).as("__did")).join(scored, Seq("__did"), "left")
      .select(col("__did").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }
}
