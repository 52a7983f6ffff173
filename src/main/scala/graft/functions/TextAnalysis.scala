package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines.
  *
  * All pure column expressions over `functions._` builtins — codegen'd,
  * whole-stage-compatible, no UDFs — so they run at scan speed over 100 TB of
  * documents. Every function is deterministic and (where claimed) mirrored by
  * an ANSI-SQL oracle in SparkEntry.oracleSql.
  */
object TextAnalysis {

  /** lowercase, strip non-alphanumerics to spaces, collapse whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " "))

  /** whitespace tokens of the normalized text */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** token count (0 for empty/blank text) — native single-pass run count
    * over the lowercased bytes (graft.plans.TokenCountExpr); equals
    * `when(length(normalize(text)) === 0, 0).otherwise(size(tokens(text)))`
    * (pinned in TextNativeParitySpec)
    */
  def tokenCount(text: Column): Column =
    graft.plans.NativeFunctions.tokenCount(text)

  /** A BPE-ish sub-word unit estimate: alpha runs, digit runs and punctuation
    * each count as units, long words count extra units per 4 chars (the
    * common ~4-chars-per-token heuristic).
    */
  def tokenEstimate(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[ ]", ""))) + // spaces ~ word separators
      ceil(length(regexp_replace(text, "[^a-zA-Z0-9]", "")).cast("double") / 4).cast("long")

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "et", "les", "des", "une"),
    "es" -> Seq("el", "los", "y", "las", "una"))

  private def stopCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(words.map(lit(_)): _*)))

  /** n-gram-heuristic language id: score each candidate language by its
    * stopword hits among the tokens; highest count wins, ties break
    * alphabetically, zero hits → 'und' (undetermined). Deterministic by
    * construction — the SQL oracle reproduces it bit-for-bit.
    */
  def langId(text: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (l, ws) => (l, stopCount(text, ws)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight so the alphabetically-first language is the outermost `when`,
    // giving alphabetical tie-break priority
    scored.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** quality score in [0,1]: 0.4·length-score + 0.3·stopword-ratio-score +
    * 0.3·(1 − punctuation-ratio). A classic cheap document-quality heuristic
    * (length, function-word density, punctuation noise).
    */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 4)

  /** unrounded quality score (callers pick their own rounding/
    * canonicalization) — native single pass (graft.plans.QualityScoreRaw),
    * bit-identical in IEEE operation order to the Column formulation
    *   least(len/500, 1)·0.4 + least(nstop·5/ntok, 1)·0.3 + (1−punct/len)·0.3
    * (pinned in TextNativeParitySpec; [[columnQualityScoreRaw]] keeps the
    * Column formulation as the parity reference)
    */
  def qualityScoreRaw(text: Column): Column =
    graft.plans.NativeFunctions.qualityScoreRaw(text)

  /** the pre-round-12 `functions._`-only formulation of [[qualityScoreRaw]]
    * — retained as the executable spec the native expression is pinned to
    */
  def columnQualityScoreRaw(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val toks = columnTokenCount(text).cast("double")
    val stopRatio = when(toks === 0, 0.0)
      .otherwise(least(stopCount(text, stopwords("en")).cast("double") * 5.0 / toks, lit(1.0)))
    val punct = length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))
    val punctRatio = when(length(text) === 0, 1.0)
      .otherwise(punct.cast("double") / length(text).cast("double"))
    lenScore * 0.4 + stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.3
  }

  /** Column-formulation twin of [[tokenCount]] (parity reference) */
  def columnTokenCount(text: Column): Column =
    when(length(normalize(text)) === 0, 0).otherwise(size(tokens(text)))

  /** Gopher-style repetition signal: excess fraction of the most frequent
    * positional n-gram, (max−1)/(nGrams−1) — 0.0 for repetition-free text of
    * ANY length, 1.0 for fully degenerate text (boilerplate). Native counting
    * loop (graft.plans.TopNgramFraction).
    */
  def topNgramFraction(text: Column, n: Int = 2): Column =
    graft.plans.NativeFunctions.topNgramFraction(tokens(text), n)

  /** duplicate-token fraction: 1 − distinct/total tokens (the companion
    * repetition signal; 0 for all-unique token streams)
    */
  def dupTokenFraction(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
  }

  /** Hashing-trick linear-classifier margin (the fasttext-style quality/
    * domain filter of large-scale curation pipelines): each token hashes to
    * an integer "micro-weight" in [-1e6, 1e6] (md5-derived, so the weight
    * table is engine-reproducible without shipping a model file), the
    * document margin is the mean weight. Summation is over LONGs — exact and
    * order-independent, so no floating accumulation order can flip the
    * keep/drop decision across engines or partitionings. Swap
    * [[tokenMicroWeight]] for a broadcast lookup of trained weights at the
    * same plan shape. Pure codegen'd fold — scan speed, no shuffle.
    */
  def tokenMicroWeight(tok: Column, salt: String): Column =
    Sampling.hash60(tok, salt) % 2000001L - 1000000L

  /** sum of token micro-weights (exact LONG arithmetic) — native single
    * pass with one md5 per token (graft.plans.ClassifierMicroSum); equals
    * `aggregate(filter(tokens(text), length > 0), 0L, _ +
    * tokenMicroWeight(_))` (pinned in TextNativeParitySpec) and the DuckDB
    * oracle's per-token md5 sum
    */
  def classifierMicroSum(text: Column, salt: String): Column =
    graft.plans.NativeFunctions.classifierMicroSum(text, salt)

  /** Column-formulation twin of [[classifierMicroSum]] (parity reference) */
  def columnClassifierMicroSum(text: Column, salt: String): Column =
    aggregate(filter(tokens(text), t => length(t) > 0),
      lit(0L), (acc, t) => acc + tokenMicroWeight(t, salt))

  /** mean micro-weight as a double margin in [-1, 1]; 0.0 for empty docs.
    * `label = margin > 0` is the sigmoid-free decision (sigmoid is monotonic,
    * and exp() is the one libm call engines disagree on).
    */
  def classifierMargin(text: Column, salt: String): Column = {
    val n = tokenCount(text)
    when(n === 0, 0.0).otherwise(
      classifierMicroSum(text, salt).cast("double") / (n.cast("double") * 1000000.0))
  }

  /** Corpus-level adjacent-token-pair counts — the scoring pass of one BPE
    * merge step (tokenizer vocabulary induction): most frequent pair wins the
    * merge. One explode + one hash aggregation; partial aggregation
    * (map-side combine) keeps the shuffle at distinct-pair cardinality, not
    * corpus token count — the shape that survives 100 TB.
    */
  def tokenPairs(text: Column): Column = {
    val toks = filter(tokens(text), t => length(t) > 0)
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
  }

  /** Flesch reading-ease estimate — the readability member of the quality
    * stack (alongside [[qualityScore]]'s stopword/punctuation signals):
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)` with
    * sentences counted as `[.!?]+` runs (min 1) and syllables approximated
    * by vowel-group runs (the standard cheap estimator). Pure codegen'd
    * column expression — scan-speed, no shuffle; evaluates in one fixed
    * operation order, decimal-staged to 3dp, so scores are
    * engine-reproducible. Empty/wordless docs read NULL.
    */
  /** markup tag occurrences (opening, closing, or self-closing) */
  def htmlTagCount(html: Column): Column =
    size(regexp_extract_all(html, lit("<[A-Za-z/][^>]*>"), lit(0))).cast("long")

  /** HTML → text extraction — the first stage of every web-crawl pipeline:
    * drop script/style payloads WITH their contents (their text is not
    * prose), drop comments, strip remaining tags, decode the common
    * entities, collapse whitespace. A fixed regexp_replace chain in a
    * single projection — scan speed over 100 TB of crawl, no parser
    * state — using only the regex subset ((?s), non-greedy, classes) Java
    * and RE2 evaluate identically, so the extraction is
    * oracle-reproducible. Order matters and is part of the contract:
    * payload blocks before tags (or their contents would survive),
    * entities after tags (so &lt;p&gt; cannot become markup).
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** code-symbol occurrences: the brace/bracket/operator characters prose
    * barely uses ([[codeScoreRaw]]'s density numerator)
    */
  val codeSymbolPattern: String = "[{}()\\[\\];=<>]"

  /** programming-keyword hits — deliberately excludes English function
    * words (if/for/while) so prose does not false-positive
    */
  val codeKeywordPattern: String =
    "\\b(def|return|import|class|function|var|const|void|null|printf|lambda)\\b"

  def codeSymbolCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, codeSymbolPattern, ""))).cast("long")

  def codeKeywordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(codeKeywordPattern), lit(0))).cast("long")

  /** Code-vs-prose signal for corpus routing — the curation gate that
    * keeps code out of a prose corpus (or routes it to the code mix):
    * capped code-symbol density (per char, ×10) at weight 0.6 plus capped
    * programming-keyword density (per token, ×10) at weight 0.4 — 0 for
    * clean prose, → 1 for real source code. Pure codegen'd `regexp_*`
    * counting at scan speed, fixed operation order, replayable by any
    * RE2-compatible engine.
    */
  def codeScoreRaw(text: Column): Column = {
    val len = length(text).cast("double")
    val symR = when(length(text) === 0, 0.0)
      .otherwise(least(codeSymbolCount(text).cast("double") * 10.0 / len, lit(1.0)))
    val toks = tokenCount(text).cast("double")
    val kwR = when(toks === 0, 0.0)
      .otherwise(least(codeKeywordCount(text).cast("double") * 10.0 / toks, lit(1.0)))
    symR * 0.6 + kwR * 0.4
  }

  def readabilityScore(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sentences = greatest(
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
      .cast("double")
    val syllables = size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("double")
    round(when(words > 0,
        lit(206.835) - lit(1.015) * (words / sentences)
          - lit(84.6) * (syllables / words))
      .cast(org.apache.spark.sql.types.DecimalType(18, 8)), 3).cast("double")
  }

  /** Iterative byte-pair-encoding merge training — the actual tokenizer
    * trainer, not just one round's pair scores ([[tokenPairs]] /
    * text_bpe_pairs): learn `nMerges` merge rules from the corpus, greedy
    * highest-count-first with deterministic lexicographic tie-break.
    *
    * Scale shape — how real BPE trainers stay tractable and the reason
    * this is NOT n corpus passes: the corpus is touched ONCE, collapsing
    * to the (word-type, count) table (map-side combined; the vocabulary
    * is ~10⁶ rows even at web scale); every merge round then runs on that
    * VOCABULARY-sized frame — one pair aggregation weighted by word
    * counts, one 1-row TakeOrdered argmax (a bounded-gate collect), one
    * scan-speed `replace` applying the merge — and the symbol state
    * re-freezes per round so lineage stays flat across rounds.
    *
    * Symbol sequences are stored as `||`-delimited strings
    * (`||h||e||y||`); applying merge (a,b) is the plain non-regex
    * left-to-right replace of `|a||b|` with `|ab|`, which IS the greedy
    * non-overlapping BPE merge semantics ("aaa" + (a,a) → "aa a"), and is
    * reproducible verbatim by any engine's `replace` — symbols stay
    * regex-free because [[normalize]] restricts them to [a-z0-9].
    *
    * Returns one row per learned rule: (step, merge_left, merge_right,
    * merged, pair_count), stopping early if the best pair's weighted
    * count falls below `minPair`.
    */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
               nMerges: Int, minPair: Long = 2): org.apache.spark.sql.DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val spark = docs.sparkSession
    val words = docs.select(explode(tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
    var seqs = bridge.freeze(words.select(col("__cnt"),
      concat(lit("||"), array_join(
        transform(sequence(lit(1), length(col("__w"))),
          i => col("__w").substr(i, lit(1))), "||"),
        lit("||")).as("__s")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var stop = false
    (1 to nMerges).foreach { step =>
      if (!stop) {
        val syms = filter(split(col("__s"), "\\|\\|"), x => x =!= "")
        val best = seqs
          .select(col("__cnt"), syms.as("__l"))
          .select(col("__cnt"), explode(when(size(col("__l")) < 2,
              array().cast("array<string>"))
            .otherwise(transform(slice(col("__l"), lit(1), size(col("__l")) - 1),
              (x, i) => concat(x, lit(" "), element_at(col("__l"), i + 2))))).as("__p"))
          .groupBy(col("__p")).agg(sum(col("__cnt")).as("__pc"))
          .orderBy(col("__pc").desc, col("__p").asc).limit(1)
          .collect()
        if (best.isEmpty || best(0).getLong(1) < minPair) stop = true
        else {
          val parts = best(0).getString(0).split(" ", 2)
          val (a, b) = (parts(0), parts(1))
          merges += ((step, a, b, best(0).getLong(1)))
          seqs = bridge.freeze(seqs.withColumn("__s",
            replace(col("__s"), lit(s"|$a||$b|"), lit(s"|$a$b|"))))
        }
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "merge_left", "merge_right", "pair_count")
      .select(col("step"), col("merge_left"), col("merge_right"),
        concat(col("merge_left"), col("merge_right")).as("merged"),
        col("pair_count"))
  }

  /** Encode the corpus with a trained BPE merge table — the tokenizer
    * APPLY stage that pairs with [[bpeTrain]] (the reference has no
    * tokenizer; this is the training-data-pipeline extension).
    *
    * The corpus collapses to its word-TYPE table first (one pass, counts
    * carried), so the per-word merge replay runs once per distinct word,
    * not once per occurrence — at 100 TB the type table is millions of
    * rows while the corpus is trillions of tokens. Each merge rule is a
    * scan-speed literal `replace` over the `||`-delimited symbol string
    * (same non-overlapping left-to-right semantics as training, see
    * [[bpeTrain]]); the whole chain is ONE codegen'd projection — no
    * joins, no iteration over data. Returns the encoded-corpus symbol
    * vocabulary: (symbol, total_count weighted by word frequency,
    * n_word_types containing the symbol).
    */
  def bpeApply(docs: org.apache.spark.sql.DataFrame, textCol: String,
               merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    val words = docs.select(explode(tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
    val s0 = concat(lit("||"), array_join(
      transform(sequence(lit(1), length(col("__w"))),
        i => col("__w").substr(i, lit(1))), "||"), lit("||"))
    val enc = merges.foldLeft(s0) { case (acc, (a, b)) =>
      replace(acc, lit(s"|$a||$b|"), lit(s"|$a$b|"))
    }
    words
      .select(col("__w"), col("__cnt"),
        explode(filter(split(enc, "\\|\\|"), x => x =!= "")).as("symbol"))
      .groupBy(col("symbol"))
      .agg(sum(col("__cnt")).as("total_count"),
        countDistinct(col("__w")).as("n_word_types"))
  }

  /** content fingerprint: md5 of the normalized text — the exact-dedup key.
    * (md5 rather than xxhash64 so external engines can reproduce it.)
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** 64-bit rolling-style fingerprint for in-engine use (faster than md5,
    * codegen'd): xxhash64 of the normalized text.
    */
  def fingerprint64(text: Column): Column = xxhash64(normalize(text))
}
