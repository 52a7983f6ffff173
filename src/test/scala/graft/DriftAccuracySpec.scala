package graft

import org.apache.spark.sql.functions._
import graft.functions.{Events, Stats}
import graft.streaming.Streaming

/** Hand-computed pins for the drift/accuracy batch: Page–Hinkley over
  * daily volumes, MASE forecast accuracy, D'Agostino's K² omnibus
  * normality test, and their streaming-readout parity with the batch
  * operators.
  */
class DriftAccuracySpec extends SparkSpec {
  import spark.implicits._

  private def day(s: String) = java.sql.Date.valueOf(s)

  // ------------------------------------------------------ Page–Hinkley
  test("phOfDaily: running-mean deviations, prefix min reset, alarm") {
    // n = 10, 10, 10, 22 with delta = 0.5:
    // t1 rm=10  x=-0.5 m=-0.5 min=-0.5 ph=0
    // t2 rm=10  x=-0.5 m=-1.0 min=-1.0 ph=0
    // t3 rm=10  x=-0.5 m=-1.5 min=-1.5 ph=0
    // t4 rm=13  x=8.5  m= 7.0 min=-1.5 ph=8.5
    val d = Seq(
      ("a", day("2024-01-01"), 10L), ("a", day("2024-01-02"), 10L),
      ("a", day("2024-01-03"), 10L), ("a", day("2024-01-04"), 22L))
      .toDF("event_type", "day", "n")
    val r = Events.phOfDaily(d, delta = 0.5, lambda = 5.0)
      .orderBy(col("day")).collect()
    assert(r.map(_.getAs[Double]("ph")).toSeq === Seq(0.0, 0.0, 0.0, 8.5))
    assert(r.map(_.getAs[Boolean]("alarm")).toSeq ===
      Seq(false, false, false, true))
  }

  test("pageHinkley: flat series never alarms; ph stays at 0") {
    val d = Seq.tabulate(6)(i => ("a", day(f"2024-01-${i + 1}%02d"), 7L))
      .toDF("event_type", "day", "n")
    val r = Events.phOfDaily(d, delta = 0.5, lambda = 5.0).collect()
    assert(r.forall(_.getAs[Double]("ph") === 0.0))
    assert(r.forall(!_.getAs[Boolean]("alarm")))
  }

  test("VolumeMonitor.pageHinkley equals the batch over replayed events") {
    val ev = table("events")
    val vm = new Streaming.VolumeMonitor()
    (0 until 3).foreach(b => vm.update(ev.filter(col("event_id") % 3 === b)))
    val streamed = vm.pageHinkley(delta = 0.5, lambda = 20.0)
      .orderBy(col("event_type"), col("day")).collect().toSeq
    val batch = Events.pageHinkley(ev, "event_type", "ts",
      delta = 0.5, lambda = 20.0)
      .orderBy(col("event_type"), col("day")).collect().toSeq
    assert(streamed === batch)
  }

  // --------------------------------------------------------------- MASE
  test("maseOfDaily: seasonal errors scaled by the one-step-naive MAE") {
    // n = 10,12,14,10,13 on consecutive days, period = 2:
    // fc  |14-10|,|10-12|,|13-14| -> n_fc=3,  sae=7,  mae_fc=2.3333
    // nv  |12-10|,|14-12|,|10-14|,|13-10| -> n_naive=4, sae=11, mae=2.75
    // mase = (7/3)/2.75 = 0.848485
    val d = Seq(
      ("a", day("2024-01-01"), 10L), ("a", day("2024-01-02"), 12L),
      ("a", day("2024-01-03"), 14L), ("a", day("2024-01-04"), 10L),
      ("a", day("2024-01-05"), 13L))
      .toDF("event_type", "day", "n")
    val r = Events.maseOfDaily(d, period = 2).collect()(0)
    assert(r.getAs[Long]("n_fc") === 3L)
    assert(r.getAs[Long]("n_naive") === 4L)
    assert(r.getAs[Double]("mae_fc") === 2.3333)
    assert(r.getAs[Double]("mae_naive") === 2.75)
    assert(r.getAs[Double]("mase") === 0.848485)
  }

  test("maseOfDaily: a perfectly flat series reads mase NULL, not a blowup") {
    val d = Seq.tabulate(4)(i => ("a", day(f"2024-01-${i + 1}%02d"), 5L))
      .toDF("event_type", "day", "n")
    val r = Events.maseOfDaily(d, period = 1).collect()(0)
    assert(r.getAs[Double]("mae_fc") === 0.0)
    assert(r.isNullAt(r.fieldIndex("mase")))
  }

  test("VolumeMonitor.mase equals the batch over replayed events") {
    val ev = table("events")
    val vm = new Streaming.VolumeMonitor()
    (0 until 3).foreach(b => vm.update(ev.filter(col("event_id") % 3 === b)))
    val streamed = vm.mase(period = 7)
      .orderBy(col("event_type")).collect().toSeq
    val batch = Events.maseDaily(ev, "event_type", "ts", period = 7)
      .orderBy(col("event_type")).collect().toSeq
    assert(streamed === batch)
  }

  // ----------------------------------------------------- D'Agostino K²
  test("dagostinoK2: matches an independent plain-double evaluation") {
    // 9 values with one heavy outlier — moments exact at DECIMAL(8,2)
    val vs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 20.0)
    val n = vs.size.toDouble
    val m = vs.sum / n
    val e2 = vs.map(v => v * v).sum / n
    val e3 = vs.map(v => v * v * v).sum / n
    val e4 = vs.map(v => v * v * v * v).sum / n
    val m2 = e2 - m * m
    val m3 = e3 - 3.0 * m * e2 + 2.0 * m * m * m
    val m4 = e4 - 4.0 * m * e3 + 6.0 * m * m * e2 - 3.0 * m * m * m * m
    val g1 = m3 / (m2 * math.sqrt(m2))
    val b2 = m4 / (m2 * m2)
    val y = g1 * math.sqrt((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0)))
    val beta2 = 3.0 * (n * n + 27.0 * n - 70.0) * (n + 1.0) * (n + 3.0) /
      ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
    val w2 = -1.0 + math.sqrt(2.0 * (beta2 - 1.0))
    val dl = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    val ya = y / math.sqrt(2.0 / (w2 - 1.0))
    val zSkew = dl * math.log(ya + math.sqrt(ya * ya + 1.0))
    val eb2 = 3.0 * (n - 1.0) / (n + 1.0)
    val vb2 = 24.0 * n * (n - 2.0) * (n - 3.0) /
      ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0))
    val xk = (b2 - eb2) / math.sqrt(vb2)
    val sb1 = 6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7.0) * (n + 9.0)) *
      math.sqrt(6.0 * (n + 3.0) * (n + 5.0) / (n * (n - 2.0) * (n - 3.0)))
    val a = 6.0 + 8.0 / sb1 *
      (2.0 / sb1 + math.sqrt(1.0 + 4.0 / (sb1 * sb1)))
    val zKurt = ((1.0 - 2.0 / (9.0 * a)) -
      math.cbrt((1.0 - 2.0 / a) /
        (1.0 + xk * math.sqrt(2.0 / (a - 4.0))))) /
      math.sqrt(2.0 / (9.0 * a))
    val k2 = zSkew * zSkew + zKurt * zKurt
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val r = Stats.dagostinoK2(vs.toDF("v"), col("v")).collect()(0)
    assert(r.getAs[Long]("n") === 9L)
    assert(r.getAs[Double]("skewness") === r6(g1))
    assert(r.getAs[Double]("kurtosis") === r6(b2 - 3.0))
    assert(r.getAs[Double]("z_skew") === r6(zSkew))
    assert(r.getAs[Double]("z_kurt") === r6(zKurt))
    assert(r.getAs[Double]("k2") === r6(k2))
    assert(r.getAs[Double]("p") === r6(math.exp(-k2 / 2.0)))
    // the omnibus verdict should agree with the outlier being real
    assert(r.getAs[Double]("p") < 0.05)
  }

  test("dagostinoK2: n < 9 reads NULL statistics (transform needs n >= 9)") {
    val r = Stats.dagostinoK2(
      Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0).toDF("v"), col("v"))
      .collect()(0)
    assert(r.getAs[Long]("n") === 8L)
    assert(r.isNullAt(r.fieldIndex("k2")))
    assert(r.isNullAt(r.fieldIndex("p")))
  }

  test("NormalityMonitor.omnibus equals the batch dagostinoK2") {
    val ev = table("events")
    val nm = new Streaming.NormalityMonitor(col("value"))
    (0 until 3).foreach(b => nm.update(ev.filter(col("event_id") % 3 === b)))
    val streamed = nm.omnibus.collect().toSeq
    val batch = Stats.dagostinoK2(ev, col("value")).collect().toSeq
    assert(streamed === batch)
  }
}
