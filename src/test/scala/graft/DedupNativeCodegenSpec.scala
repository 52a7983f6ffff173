package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import graft.plans.NativeFunctions

/** Pins the eight dedup/hash native expressions' generated code to their
  * interpreted eval: the same selection runs once under forced codegen and
  * once under forced interpretation (NO_CODEGEN), and every row must agree
  * exactly — on adversarial edges AND on the real corpus. Also asserts none
  * of them is a CodegenFallback anymore (round-13 directive 3: these are
  * the once-per-document expressions of the corpus-wide dedup path).
  */
class DedupNativeCodegenSpec extends SparkSpec {
  import spark.implicits._

  /** collect `df` under forced-interpreted and forced-codegen expression
    * compilation; both whole-stage settings exercised.
    */
  private def bothModes(build: => org.apache.spark.sql.DataFrame) = {
    def collectWith(factory: String, wholeStage: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", factory)
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try build.collect().map(_.toString).toSeq
      finally {
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
      }
    }
    (collectWith("NO_CODEGEN", "false"), collectWith("CODEGEN_ONLY", "true"))
  }

  private val tokenEdges = Seq(
    Seq.empty[String],                       // minhash: empty -> NULL
    Seq("a"),                                // below shingle/gram width
    Seq("a", "b"),
    Seq("the", "quick", "brown", "fox", "the", "quick", "brown", "fox"),
    Seq("x") ++ (1 to 40).map(i => s"t$i") ++ Seq("x"),
    Seq("ü", "café", "自然", "emoji🙂"),      // multi-byte tokens
    (1 to 200).map(i => s"w${i % 7}"))       // heavy repetition

  test("token expressions: codegen == interpreted on edges and corpus") {
    val edges = tokenEdges.toDF("toks")
    def sel(df: org.apache.spark.sql.DataFrame) = df.select(
      NativeFunctions.ngramShingles(col("toks"), 3).as("sh"),
      NativeFunctions.minhashSignature(
        NativeFunctions.ngramShingles(col("toks"), 3), 16).as("mh"),
      NativeFunctions.simhash64(col("toks")).as("simh"),
      NativeFunctions.winnowFingerprints(col("toks"), 4, 4).as("win"),
      NativeFunctions.topNgramFraction(col("toks"), 2).as("topf"))
    val (interp, gen) = bothModes(sel(edges))
    assert(interp === gen)

    val docs = table("documents")
      .select(split(lower(col("text")), "\\s+").as("toks")).limit(300)
    val (i2, g2) = bothModes(sel(docs))
    assert(i2 === g2)
  }

  test("minhash of an empty shingle set is NULL under codegen too") {
    val df = Seq(Seq.empty[String]).toDF("toks")
      .select(NativeFunctions.minhashSignature(col("toks"), 8).as("mh"))
    val (interp, gen) = bothModes(df)
    assert(interp === gen)
    assert(gen.head.contains("null"))
  }

  test("vector expressions: codegen == interpreted on edges and corpus") {
    val edges = Seq(
      Seq.empty[Double],
      Seq(0.0),
      Seq(1.0, -2.0, 3.0, -4.0),
      (1 to 64).map(i => math.sin(i.toDouble)).toSeq).toDF("v")
    def sel(df: org.apache.spark.sql.DataFrame) = df.select(
      NativeFunctions.signLshBucket(col("v"), 8).as("lsh"),
      NativeFunctions.randomProjection(col("v"), 4).as("proj"))
    val (interp, gen) = bothModes(sel(edges))
    assert(interp === gen)

    val emb = table("embeddings")
      .select(col("embedding").cast("array<double>").as("v")).limit(300)
    val (i2, g2) = bothModes(sel(emb))
    assert(i2 === g2)
  }

  test("sigMatchFraction: codegen == interpreted, including empty arrays") {
    val df = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)),
      (Seq(1L), Seq(1L, 2L))).toDF("a", "b")
      .select(NativeFunctions.sigMatchFraction(col("a"), col("b")).as("f"))
    val (interp, gen) = bothModes(df)
    assert(interp === gen)
    assert(gen === Seq("[0.0]", "[0.6666666666666666]", "[1.0]"))
  }

  test("none of the eight is a CodegenFallback anymore") {
    import graft.plans._
    import org.apache.spark.sql.catalyst.expressions.Literal
    val l = Literal(1)
    val exprs: Seq[Any] = Seq(
      MinHashSignature(l, 4), SimHash64(l), SignLshBucket(l, 4),
      RandomProjection(l, 4), NgramShingles(l, 3), SigMatchFraction(l, l),
      WinnowFingerprints(l, 4, 4), TopNgramFraction(l, 2))
    exprs.foreach { e =>
      assert(!e.isInstanceOf[CodegenFallback],
        s"${e.getClass.getSimpleName} still falls back")
    }
  }
}
