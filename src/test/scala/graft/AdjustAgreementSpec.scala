package graft

import org.apache.spark.sql.functions._
import graft.functions.{Curation, Stats}

/** Hand-computed pins for the round-13 batch-B additions: relative risk /
  * odds ratio with log CIs, the Bonferroni/Holm/Benjamini–Yekutieli
  * adjustment family, and Scott's π / Gwet's AC1 — plus streaming parity
  * through their shared monitor states.
  */
class AdjustAgreementSpec extends SparkSpec {
  import spark.implicits._

  test("riskRatio: 2x2 (30/100 vs 10/100) pins RR=3, OR and Katz/Woolf CIs") {
    val a = (1 to 100).map(i => i <= 30).toDF("s")
    val b = (1 to 100).map(i => i <= 10).toDF("s")
    val r = Stats.riskRatio(a, b, col("s")).collect()(0)
    assert(r.getAs[Double]("rr") === 3.0)
    // log RR se = sqrt(1/30 - 1/100 + 1/10 - 1/100) = sqrt(0.1133333...)
    val seRr = math.sqrt(1.0 / 30 - 1.0 / 100 + 1.0 / 10 - 1.0 / 100)
    assert(math.abs(r.getAs[Double]("rr_lo") -
      math.exp(math.log(3.0) - 1.959964 * seRr)) < 1e-5)
    assert(math.abs(r.getAs[Double]("rr_hi") -
      math.exp(math.log(3.0) + 1.959964 * seRr)) < 1e-5)
    // OR = (30*90)/(10*70) = 27/7
    assert(math.abs(r.getAs[Double]("odds_ratio") - 27.0 / 7.0) < 1e-6)
    val seOr = math.sqrt(1.0 / 30 + 1.0 / 70 + 1.0 / 10 + 1.0 / 90)
    assert(math.abs(r.getAs[Double]("or_lo") -
      math.exp(math.log(27.0 / 7.0) - 1.959964 * seOr)) < 1e-5)
  }

  test("riskRatio: zero success cell reads NULL ratios, not infinities") {
    val a = Seq(true, false).toDF("s")
    val b = Seq(false, false).toDF("s")
    val r = Stats.riskRatio(a, b, col("s")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("rr")))
    assert(r.isNullAt(r.fieldIndex("odds_ratio")))
  }

  test("riskRatio: saturated arm keeps RR but NULLs the odds ratio") {
    val a = Seq(true, true).toDF("s") // xa = na -> OR denominator cell 0
    val b = Seq(true, false).toDF("s")
    val r = Stats.riskRatio(a, b, col("s")).collect()(0)
    assert(r.getAs[Double]("rr") === 2.0)
    assert(r.isNullAt(r.fieldIndex("odds_ratio")))
  }

  test("padjust: textbook panel pins Bonferroni, Holm, and BY") {
    // p = (.01, .02, .03, .04) over keys a..d; m=4, c(4) = 25/12
    val panel = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04))
      .toDF("key", "p")
    val rows = Stats.padjust(panel, "key", "p").collect()
      .map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("rank"), r.getAs[Double]("p_bonf"),
          r.getAs[Double]("p_holm"), r.getAs[Double]("p_by"))).toMap
    assert(rows("a") === ((1L, 0.04, 0.04, 0.083333)))
    // holm: max(4*.01, 3*.02) = .06 ; by: min over j>=2 of p_j*4*c/j
    //   = min(.02*4*2.08333/2, .03*4*2.08333/3, .04*2.08333) = .083333
    assert(rows("b") === ((2L, 0.08, 0.06, 0.083333)))
    assert(rows("c") === ((3L, 0.12, 0.06, 0.083333)))
    assert(rows("d") === ((4L, 0.16, 0.06, 0.083333)))
  }

  test("padjust: duplicate keys and oversized panels fail loudly") {
    val dup = Seq(("a", 0.01), ("a", 0.02)).toDF("key", "p")
    val e1 = intercept[IllegalArgumentException] {
      Stats.padjust(dup, "key", "p")
    }
    assert(e1.getMessage.contains("duplicate key"))
    val wide = (1 to 20).map(i => (s"k$i", 0.01 * i)).toDF("key", "p")
    val e2 = intercept[IllegalArgumentException] {
      Stats.padjust(wide, "key", "p", maxPanel = 10)
    }
    assert(e2.getMessage.contains("maxPanel"))
  }

  test("chanceRobustAgreement: the kappa-paradox table reads high AC1") {
    // 90 both-true, 5 each discordant, 0 both-false: po = .9
    // pibar = (.95 + .95)/2 = .95; pe_scott = .9025 + .0025 = .905
    // pi = (.9-.905)/(1-.905) = -.052632 (paradox); pe_gwet = .095
    // ac1 = (.9-.095)/(1-.095) = .889503
    val rows = (1 to 90).map(_ => (true, true)) ++
      (1 to 5).map(_ => (true, false)) ++ (1 to 5).map(_ => (false, true))
    val df = rows.toDF("a", "b")
    val r = Curation.chanceRobustAgreement(df, col("a"), col("b")).collect()(0)
    assert(r.getAs[Double]("po") === 0.9)
    assert(r.getAs[Double]("pe_scott") === 0.905)
    assert(math.abs(r.getAs[Double]("scott_pi") - (-0.052632)) < 1e-6)
    assert(r.getAs[Double]("pe_gwet") === 0.095)
    assert(math.abs(r.getAs[Double]("gwet_ac1") - 0.889503) < 1e-6)
  }

  test("monitor readouts equal their batch twins after 2 batches") {
    val ev = (1 to 40).map(i => (i.toLong, i % 3 == 0, i % 2 == 0))
      .toDF("id", "arm", "s")
    val pm = new graft.streaming.Streaming.ProportionMonitor(
      col("arm"), col("s"))
    pm.update(ev.filter(col("id") <= 20))
    pm.update(ev.filter(col("id") > 20))
    val batch = Stats.riskRatio(ev.filter(col("arm")),
      ev.filter(!col("arm")), col("s")).collect()(0)
    val stream = pm.ratioEffect.collect()(0)
    assert(batch === stream)

    val km = new graft.streaming.Streaming.KappaMonitor(
      col("arm"), col("s"))
    km.update(ev.filter(col("id") <= 20))
    km.update(ev.filter(col("id") > 20))
    val batchG = Curation.chanceRobustAgreement(ev, col("arm"), col("s"))
      .collect()(0)
    assert(batchG === km.chanceRobustAgreement.collect()(0))
  }
}
