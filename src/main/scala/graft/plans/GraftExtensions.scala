package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the engine's native Catalyst expressions — the
  * `SparkSessionExtensions` integration point, so a cluster configured with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or a session built
  * `.withExtensions(new GraftExtensions)`) can call every hot-path
  * expression from PURE SQL:
  *
  * {{{
  *   SELECT doc_id, graft_simhash(graft_shingles(text, 3)) FROM documents
  *   SELECT vec_id, graft_sign_lsh(v, 16) FROM embeddings
  *   SELECT graft_freq_items(token, 50) FROM tokens
  * }}}
  *
  * The expressions themselves live in [[NativeExpressions]] /
  * [[SketchAggregates]] and are unchanged — this file only maps SQL
  * signatures onto their constructors (scalar shape parameters arrive as
  * foldable literals and are evaluated once at resolution). For sessions
  * that already exist (notebooks, tests), [[GraftExtensions.register]]
  * installs the same functions into the live registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = {
    require(e.foldable, s"$fn: argument $pos must be a literal")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument $pos must be an integer literal, got $other")
    }
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (identifier, info, builder) triples in `injectFunction` shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(text, n) - distinct word n-gram shingles"),
      (es: Seq[Expression]) => NgramShingles(es(0), intArg(es(1), "graft_shingles", 2))),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, k) - k-long MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(es(0), intArg(es(1), "graft_minhash", 2))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(shingles) - 64-bit SimHash"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    (FunctionIdentifier("graft_sign_lsh"),
      info("graft_sign_lsh", "graft_sign_lsh(vec, planes[, offset]) - sign-LSH bucket"),
      (es: Seq[Expression]) => SignLshBucket(es(0), intArg(es(1), "graft_sign_lsh", 2),
        if (es.size > 2) intArg(es(2), "graft_sign_lsh", 3) else 0)),
    (FunctionIdentifier("graft_signpack"),
      info("graft_signpack", "graft_signpack(vec) - sign bits packed into 64-bit words"),
      (es: Seq[Expression]) => SignPack(es(0))),
    (FunctionIdentifier("graft_hamming"),
      info("graft_hamming", "graft_hamming(a, b) - Hamming distance of packed sign words"),
      (es: Seq[Expression]) => HammingDistance(es(0), es(1))),
    (FunctionIdentifier("graft_random_projection"),
      info("graft_random_projection",
        "graft_random_projection(vec, k[, offset]) - JL projection to k dims"),
      (es: Seq[Expression]) => RandomProjection(es(0),
        intArg(es(1), "graft_random_projection", 2),
        if (es.size > 2) intArg(es(2), "graft_random_projection", 3) else 0)),
    (FunctionIdentifier("graft_sigmatch"),
      info("graft_sigmatch", "graft_sigmatch(sig_a, sig_b) - matching-position fraction"),
      (es: Seq[Expression]) => SigMatchFraction(es(0), es(1))),
    (FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "graft_winnow(text, k, window) - winnowing fingerprints"),
      (es: Seq[Expression]) => WinnowFingerprints(es(0),
        intArg(es(1), "graft_winnow", 2), intArg(es(2), "graft_winnow", 3))),
    (FunctionIdentifier("graft_top_ngram_frac"),
      info("graft_top_ngram_frac",
        "graft_top_ngram_frac(toks, n) - mass of the most frequent n-gram"),
      (es: Seq[Expression]) => TopNgramFraction(es(0),
        intArg(es(1), "graft_top_ngram_frac", 2))),
    (FunctionIdentifier("graft_freq_items"),
      info("graft_freq_items",
        "graft_freq_items(token, capacity) - Misra-Gries frequent-items sketch"),
      (es: Seq[Expression]) => FrequentItemsSketch(es(0),
        intArg(es(1), "graft_freq_items", 2)).toAggregateExpression()))

  /** install every function into a LIVE session's registry (the
    * post-creation path `spark.sql.extensions` can't reach)
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fi, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fi, builder)
    }
}
