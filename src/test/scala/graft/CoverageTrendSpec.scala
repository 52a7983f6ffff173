package graft

import org.apache.spark.sql.functions._
import graft.functions.{Curation, Stats}

/** Hand-computed pins for the coverage/trend batch: Cochran–Armitage
  * ordered-proportions trend, Chapman capture–recapture, and the Zipf
  * power-law fit.
  */
class CoverageTrendSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- Cochran–Armitage
  test("cochranArmitage: hand-computed rising trend") {
    // w=0: 1/4, w=1: 2/4, w=2: 3/4 -> N=12 X=6 pbar=.5
    // Swx=8 Swn=12 Snww=20; t = 8-6 = 2; v = .25*(20-144/12) = 2
    // z = 2/sqrt(2) = 1.414214
    val rows = Seq.tabulate(12) { i =>
      val w = i / 4; val j = i % 4
      (w.toLong, j < w + 1)
    }
    val df = rows.toDF("w", "s")
    val r = Stats.cochranArmitage(df, col("w"), col("s")).collect()(0)
    assert(r.getAs[Long]("k") === 3L)
    assert(r.getAs[Long]("n") === 12L)
    assert(r.getAs[Long]("x") === 6L)
    assert(r.getAs[Double]("z") === math.rint(2.0 / math.sqrt(2.0) * 1e6) / 1e6)
  }

  test("cochranArmitage: degenerate share (all successes) reads z NULL") {
    val df = Seq((0L, true), (1L, true), (2L, true)).toDF("w", "s")
    val r = Stats.cochranArmitage(df, col("w"), col("s")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("cochranArmitage: NULL score/success rows drop, not silently bias") {
    // same hand-computed table as above plus a NULL-score row and a
    // NULL-success row — they must not inflate n/x or null the moments
    val rows = Seq.tabulate(12) { i =>
      val w = i / 4; val j = i % 4
      (Option(w.toLong), Option(j < w + 1))
    } ++ Seq((None: Option[Long], Option(true)),
      (Option(0L), None: Option[Boolean]))
    val df = rows.toDF("w", "s")
    val r = Stats.cochranArmitage(df, col("w"), col("s")).collect()(0)
    assert(r.getAs[Long]("n") === 12L)
    assert(r.getAs[Long]("x") === 6L)
    assert(r.getAs[Double]("z") === math.rint(2.0 / math.sqrt(2.0) * 1e6) / 1e6)
  }

  // ----------------------------------------------- capture–recapture
  test("captureRecapture: Chapman estimate and SE on a hand pair") {
    // A={1,2,3,4} B={3,4,5}: n_hat = 5*4/3-1 = 5.6667
    // se = sqrt(20*2/36) = 1.0541
    val a = Seq(1, 2, 3, 4).toDF("k")
    val b = Seq(3, 4, 5).toDF("k")
    val r = Stats.captureRecapture(a, b, col("k")).collect()(0)
    assert(r.getAs[Long]("n_a") === 4L)
    assert(r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Long]("m") === 2L)
    assert(r.getAs[Double]("n_hat") === 5.6667)
    assert(r.getAs[Double]("se") ===
      math.rint(math.sqrt(20.0 * 2.0 / 36.0) * 1e4) / 1e4)
  }

  test("captureRecapture: zero overlap stays finite (Chapman correction)") {
    val a = Seq(1, 2).toDF("k")
    val b = Seq(3, 4).toDF("k")
    val r = Stats.captureRecapture(a, b, col("k")).collect()(0)
    assert(r.getAs[Long]("m") === 0L)
    // (3*3)/1 - 1 = 8
    assert(r.getAs[Double]("n_hat") === 8.0)
  }

  test("captureRecapture: duplicate keys within a sample count once") {
    val a = Seq(1, 1, 2, 2).toDF("k")
    val b = Seq(2, 2).toDF("k")
    val r = Stats.captureRecapture(a, b, col("k")).collect()(0)
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Long]("n_b") === 1L)
    assert(r.getAs[Long]("m") === 1L)
  }

  // --------------------------------------------------------- Zipf fit
  test("zipfFit: weighted OLS over midpoint ranks matches plain doubles") {
    // counts a:4 b:2 c:1 -> coc (4,1)(2,1)(1,1) -> ranks 1, 2, 3
    val df = Seq("a a a a b b c").toDF("text")
    val pts = Seq((1.0, 4.0), (2.0, 2.0), (3.0, 1.0))
      .map { case (rk, c) => (math.log(rk), math.log(c)) }
    val w = 3.0
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum - sx * sx / w
    val syy = pts.map(p => p._2 * p._2).sum - sy * sy / w
    val sxy = pts.map(p => p._1 * p._2).sum - sx * sy / w
    val slope = sxy / sxx
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val r = Curation.zipfFit(df, col("text")).collect()(0)
    assert(r.getAs[Long]("n_tokens") === 7L)
    assert(r.getAs[Long]("vocab") === 3L)
    assert(r.getAs[Long]("groups") === 3L)
    assert(math.abs(r.getAs[Double]("slope") - r6(slope)) < 2e-6)
    assert(math.abs(r.getAs[Double]("r2") -
      r6(slope * slope * sxx / syy)) < 2e-6)
    // natural Zipf-ish data: slope negative, good fit
    assert(r.getAs[Double]("slope") < 0.0)
    assert(r.getAs[Double]("r2") > 0.8)
  }

  test("zipfFit: tied ranks use the group midpoint") {
    // counts a:2 b:1 c:1 -> coc (2,1)(1,2) -> ranks 1 and 2.5
    val df = Seq("a a b c").toDF("text")
    val x1 = math.log(1.0); val y1 = math.log(2.0)
    val x2 = math.log(2.5); val y2 = math.log(1.0)
    // weighted: w = (1, 2); slope via weighted moments
    val w = 3.0
    val sx = x1 + 2 * x2; val sy = y1 + 2 * y2
    val sxx = x1 * x1 + 2 * x2 * x2 - sx * sx / w
    val sxy = x1 * y1 + 2 * x2 * y2 - sx * sy / w
    val slope = sxy / sxx
    val r = Curation.zipfFit(df, col("text")).collect()(0)
    assert(r.getAs[Long]("groups") === 2L)
    assert(math.abs(r.getAs[Double]("slope") -
      math.rint(slope * 1e6) / 1e6) < 2e-6)
  }

  test("zipfFit: a single frequency group has no line — NULL fit") {
    val df = Seq("a b c").toDF("text")
    val r = Curation.zipfFit(df, col("text")).collect()(0)
    assert(r.getAs[Long]("groups") === 1L)
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.isNullAt(r.fieldIndex("r2")))
  }
}
