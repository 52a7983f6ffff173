package graft

import org.apache.spark.sql.functions._
import graft.functions.Stats
import graft.streaming.Streaming

/** Hand-computed pins for the tail/homogeneity batch: Breslow–Day OR
  * homogeneity, the Hill tail index, and Kish ESS / design effect.
  */
class TailHomogeneitySpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ Breslow–Day
  private def strataDf(cells: Seq[(Int, Int, Int, Int, Int)]) =
    // (stratum, xa, na, xb, nb) -> rows (stratum, armA, success)
    cells.flatMap { case (st, xa, na, xb, nb) =>
      Seq.fill(xa)((st, true, true)) ++ Seq.fill(na - xa)((st, true, false)) ++
        Seq.fill(xb)((st, false, true)) ++ Seq.fill(nb - xb)((st, false, false))
    }.toDF("st", "arm", "y")

  test("breslowDay: identical strata (homogeneous ORs) read chi2 ~ 0") {
    // same 2x2 in both strata -> each stratum's OR IS the pooled OR
    val df = strataDf(Seq((0, 10, 30, 5, 30), (1, 10, 30, 5, 30)))
    val r = Stats.breslowDay(df, col("st"), col("arm"), col("y")).collect()(0)
    assert(r.getAs[Long]("k_strata") === 2L)
    assert(r.getAs[Long]("df") === 1L)
    assert(math.abs(r.getAs[Double]("chi2_bd")) < 1e-4)
  }

  test("breslowDay: opposite effects across strata read a large chi2") {
    // stratum 0 strongly positive OR, stratum 1 strongly negative
    val df = strataDf(Seq((0, 20, 30, 5, 30), (1, 5, 30, 20, 30)))
    val r = Stats.breslowDay(df, col("st"), col("arm"), col("y")).collect()(0)
    assert(r.getAs[Double]("chi2_bd") > 10.0)
  }

  test("breslowDay: a zero-margin stratum drops (counted), not NaN-poisons") {
    // stratum 1 has NO successes in either arm (m1 = 0): its expected
    // cell sits on the box boundary (v = 0, term 0/0) — it must be
    // EXCLUDED and REPORTED, with the usable strata's chi2 intact
    val good = Seq((0, 10, 30, 5, 30), (2, 12, 30, 6, 30))
    val withDegenerate = strataDf(good :+ (1, 0, 30, 0, 30))
    val r = Stats.breslowDay(withDegenerate,
      col("st"), col("arm"), col("y")).collect()(0)
    assert(r.getAs[Long]("k_strata") === 2L)
    assert(r.getAs[Long]("dropped_strata") === 1L)
    assert(!r.isNullAt(r.fieldIndex("chi2_bd")))
  }

  test("MhMonitor.homogeneity equals the batch over replayed events") {
    val ev = table("events")
    val mm = new Streaming.MhMonitor(col("user_id") % 4,
      to_date(col("ts")) <= lit("2024-01-15").cast("date"),
      col("event_type") === "purchase")
    (0 until 3).foreach(b => mm.update(ev.filter(col("event_id") % 3 === b)))
    assert(mm.homogeneity.collect().toSeq ===
      Stats.breslowDay(ev, col("user_id") % 4,
        to_date(col("ts")) <= lit("2024-01-15").cast("date"),
        col("event_type") === "purchase").collect().toSeq)
  }

  // -------------------------------------------------------- Hill tail
  test("hillTail: exact alpha on a hand-built dyadic tail") {
    // volumes 16, 8, 4 above threshold 2 with k = 3:
    // alpha = 1 / ((ln16 + ln8 + ln4)/3 - ln2) = 1/(2 ln 2)
    val rows =
      Seq.fill(16)("a") ++ Seq.fill(8)("b") ++ Seq.fill(4)("c") ++
        Seq.fill(2)("d") ++ Seq("e", "f")
    val df = rows.toDF("k")
    val r = Stats.hillTail(df, "k", k = 3).collect()(0)
    assert(r.getAs[Long]("n_keys") === 6L)
    assert(r.getAs[Long]("threshold") === 2L)
    assert(r.getAs[Double]("alpha") ===
      math.rint(1.0 / (2.0 * math.log(2.0)) * 1e6) / 1e6)
  }

  test("hillTail: fewer than k+1 keys reads NULL, not a fake tail") {
    val df = Seq("a", "a", "b").toDF("k")
    val r = Stats.hillTail(df, "k", k = 3).collect()(0)
    assert(r.getAs[Long]("n_keys") === 2L)
    assert(r.isNullAt(r.fieldIndex("alpha")))
  }

  test("KeyCountMonitor.tail equals the batch over replayed events") {
    val ev = table("events")
    val km = new Streaming.KeyCountMonitor("user_id")
    (0 until 3).foreach(b => km.update(ev.filter(col("event_id") % 3 === b)))
    assert(km.tail(100).collect().toSeq ===
      Stats.hillTail(ev, "user_id", 100).collect().toSeq)
  }

  // ------------------------------------------------------ ESS / deff
  test("designEffect: equal weights read ESS = n, deff = 1, cv = 0") {
    val r = Stats.designEffect(Seq(2.0, 2.0, 2.0, 2.0).toDF("w"), col("w"))
      .collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("ess") === 4.0)
    assert(r.getAs[Double]("deff") === 1.0)
    assert(r.getAs[Double]("weight_cv") === 0.0)
  }

  test("designEffect: skewed weights shrink the effective sample") {
    // w = (3, 1): ess = 16/10 = 1.6, deff = 2*10/16 = 1.25
    val r = Stats.designEffect(Seq(3.0, 1.0).toDF("w"), col("w"))
      .collect()(0)
    assert(r.getAs[Double]("ess") === 1.6)
    assert(r.getAs[Double]("deff") === 1.25)
    assert(r.getAs[Double]("weight_cv") === math.rint(0.5 * 1e6) / 1e6)
  }

  test("designEffect: non-positive weights drop before the moments") {
    val r = Stats.designEffect(Seq(1.0, 0.0, -2.0, 1.0).toDF("w"), col("w"))
      .collect()(0)
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("deff") === 1.0)
  }

  test("designEffect: NaN weights drop like non-positive ones") {
    // Spark's `w > 0` drops NaN but DuckDB's would keep it (NaN sorts
    // high there) — the explicit !isnan guard keeps both engines aligned
    val r = Stats.designEffect(
      Seq(1.0, Double.NaN, 1.0).toDF("w"), col("w")).collect()(0)
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("deff") === 1.0)
  }
}
