package graft

import org.apache.spark.sql.functions._
import graft.functions.{Curation, Stats}

/** Hand-computed pins for the round-12 panel/planning additions:
  * Krippendorff's alpha (binary, k raters), two-proportion sample-size
  * planning, and Chao1/Good–Turing vocabulary richness.
  */
class PanelVocabSpec extends SparkSpec {
  import spark.implicits._

  test("krippendorffAlpha: hand-computed mixed panel") {
    // votes per doc: (t,t,t),(t,f,f),(f,f,f),(t,t,f) -> R = 3,1,0,2
    // n=4 k=3: sr=6 sr2=14; D_o = 2(18-14)/24 = .333333
    // D_e = 2*6*6/(12*11) = .545455 ; alpha = 1 - do/de = .38889
    val df = Seq((true, true, true), (true, false, false),
      (false, false, false), (true, true, false)).toDF("a", "b", "c")
    val r = Curation.krippendorffAlpha(df,
      Seq(col("a"), col("b"), col("c"))).collect()(0)
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("d_o") === 0.333333)
    assert(r.getAs[Double]("d_e") === 0.545455)
    assert(r.getAs[Double]("alpha") === 0.38889)
  }

  test("krippendorffAlpha: perfect agreement reads 1, unanimity reads NULL") {
    val perfect = Seq((true, true, true), (false, false, false)).toDF("a", "b", "c")
    val p = Curation.krippendorffAlpha(perfect,
      Seq(col("a"), col("b"), col("c"))).collect()(0)
    assert(p.getAs[Double]("d_o") === 0.0 && p.getAs[Double]("alpha") === 1.0)
    val unanimous = Seq((true, true, true), (true, true, true)).toDF("a", "b", "c")
    val u = Curation.krippendorffAlpha(unanimous,
      Seq(col("a"), col("b"), col("c"))).collect()(0)
    assert(u.getAs[Double]("d_e") === 0.0)
    assert(u.isNullAt(u.fieldIndex("alpha")))
  }

  test("stream krippendorff: CochranMonitor replay equals batch") {
    val docs = table("documents")
    val flags = Seq(col("n_chars") <= 500,
      graft.functions.TextAnalysis.tokenCount(col("text")) >= 25,
      col("doc_id") % 2 === 0)
    val cm = new graft.streaming.Streaming.CochranMonitor(flags)
    (0 until 3).foreach(b => cm.update(docs.filter(col("doc_id") % 3 === b)))
    assert(cm.alphaReliability.collect().map(_.toSeq).toSeq ===
      Curation.krippendorffAlpha(docs, flags).collect().map(_.toSeq).toSeq)
  }

  test("powerTwoProp: hand-computed plan at p=.5 vs .25") {
    val a = Seq(true, true, false, false).toDF("s")
    val b = Seq(true, false, false, false).toDF("s")
    val r = Stats.powerTwoProp(a, b, col("s")).collect()(0)
    assert(r.getAs[Double]("p_a") === 0.5 && r.getAs[Double]("p_b") === 0.25)
    assert(r.getAs[Double]("effect") === 0.25)
    // ceil(7.84888... * (0.25 + 0.1875) / 0.0625) = 55
    assert(r.getAs[Long]("n_per_arm") === 55L)
  }

  test("powerTwoProp: tied shares read NULL plan") {
    val a = Seq(true, false).toDF("s")
    val b = Seq(true, false).toDF("s")
    val r = Stats.powerTwoProp(a, b, col("s")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("n_per_arm")))
  }

  test("vocabRichness: hand-computed Chao1 and Good-Turing mass") {
    // tokens: a x3, b x2, c x1 -> N=6 D=3 f1=1 f2=1
    // chao1 = 3 + 1*0/(2*2) = 3.0 ; gt = 1/6 = .166667
    val docs = Seq("a b c", "a b", "a").toDF("text")
    val r = Curation.vocabRichness(docs, col("text")).collect()(0)
    assert(r.getAs[Long]("n_tokens") === 6L)
    assert(r.getAs[Long]("distinct_tokens") === 3L)
    assert(r.getAs[Long]("f1") === 1L && r.getAs[Long]("f2") === 1L)
    assert(r.getAs[Double]("chao1") === 3.0)
    assert(r.getAs[Double]("gt_unseen") === 0.166667)
  }

  test("vocabRichness: all-singleton corpus (f2=0 uses the bias-corrected form)") {
    // tokens x,y,z once each: f1=3 f2=0 -> chao1 = 3 + 3*2/2 = 6.0
    val docs = Seq("x y z").toDF("text")
    val r = Curation.vocabRichness(docs, col("text")).collect()(0)
    assert(r.getAs[Double]("chao1") === 6.0)
    assert(r.getAs[Double]("gt_unseen") === 1.0)
  }
}
