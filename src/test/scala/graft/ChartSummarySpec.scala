package graft

import org.apache.spark.sql.functions._
import graft.functions.{Events, Stats}
import graft.streaming.Streaming

/** Hand-computed pins for the chart/summary batch: survival-time
  * quantiles, confusion-matrix metrics (MCC/Youden), robust quartile
  * shape, and the p-chart — plus streaming parity for each readout.
  */
class ChartSummarySpec extends SparkSpec {
  import spark.implicits._

  private def day(s: String) = java.sql.Date.valueOf(s)

  // ------------------------------------------------- survival summary
  test("summaryOfSpans: quartile lifetimes off the KM curve, NULL tail") {
    // end = 01-10, censorDays = 2: u1 t=9 cens, u2 t=2 churn,
    // u3 t=2 churn, u4 t=8 cens -> S(2)=0.5 -> t25=2, median=2, t75 NULL
    val spans = Seq(
      ("u1", day("2024-01-01"), day("2024-01-10")),
      ("u2", day("2024-01-01"), day("2024-01-03")),
      ("u3", day("2024-01-02"), day("2024-01-04")),
      ("u4", day("2024-01-01"), day("2024-01-09")))
      .toDF("__u", "__first", "__last")
    val r = Events.summaryOfSpans(spans, censorDays = 2).collect()(0)
    assert(r.getAs[Long]("n_users") === 4L)
    assert(r.getAs[Long]("t25") === 2L)
    assert(r.getAs[Long]("median_t") === 2L)
    assert(r.isNullAt(r.fieldIndex("t75")))
  }

  test("SurvivalMonitor.summary equals the batch over replayed events") {
    val ev = table("events")
    val sm = new Streaming.SurvivalMonitor("user_id", "ts")
    (0 until 3).foreach(b => sm.update(ev.filter(col("event_id") % 3 === b)))
    assert(sm.summary(7).collect().toSeq ===
      Events.survivalSummary(ev, "user_id", "ts", 7).collect().toSeq)
  }

  // ------------------------------------------------ confusion metrics
  test("confusionMetrics: coin-flip cut reads MCC 0, perfect cut reads 1") {
    val coin = Seq((2.0, true), (1.0, false), (-1.0, true), (-2.0, false))
      .toDF("s", "y")
    val rc = Stats.confusionMetrics(coin, col("s"), col("y"), 0.0)
      .collect()(0)
    assert(rc.getAs[Long]("tp") === 1L)
    assert(rc.getAs[Long]("fp") === 1L)
    assert(rc.getAs[Long]("fn") === 1L)
    assert(rc.getAs[Long]("tn") === 1L)
    assert(rc.getAs[Double]("acc") === 0.5)
    assert(rc.getAs[Double]("balanced_acc") === 0.5)
    assert(rc.getAs[Double]("youden_j") === 0.0)
    assert(rc.getAs[Double]("mcc") === 0.0)
    val perfect = Seq((2.0, true), (1.0, true), (-1.0, false), (-2.0, false))
      .toDF("s", "y")
    val rp = Stats.confusionMetrics(perfect, col("s"), col("y"), 0.0)
      .collect()(0)
    assert(rp.getAs[Double]("mcc") === 1.0)
    assert(rp.getAs[Double]("youden_j") === 1.0)
  }

  test("confusionMetrics: one-class input reads NULL rates, not fake 0s") {
    val df = Seq((1.0, true), (-1.0, true)).toDF("s", "y")
    val r = Stats.confusionMetrics(df, col("s"), col("y"), 0.0).collect()(0)
    assert(r.getAs[Double]("tpr") === 0.5)
    assert(r.isNullAt(r.fieldIndex("tnr")))
    assert(r.isNullAt(r.fieldIndex("balanced_acc")))
    assert(r.isNullAt(r.fieldIndex("mcc")))
  }

  test("AucMonitor.confusion equals the batch over replayed events") {
    val ev = table("events").filter(col("event_type").isin("click", "purchase"))
    val am = new Streaming.AucMonitor(col("value"),
      col("event_type") === "purchase")
    (0 until 3).foreach(b => am.update(ev.filter(col("event_id") % 3 === b)))
    assert(am.confusion(50.0).collect().toSeq ===
      Stats.confusionMetrics(ev, col("value"),
        col("event_type") === "purchase", 50.0).collect().toSeq)
  }

  // ------------------------------------------------------ robust shape
  test("robustShape: symmetric 1..9 reads bowley 0") {
    val r = Stats.robustShape((1 to 9).map(_.toDouble).toDF("v"), col("v"))
      .collect()(0)
    assert(r.getAs[Double]("q1") === 3.0)
    assert(r.getAs[Double]("median") === 5.0)
    assert(r.getAs[Double]("q3") === 7.0)
    assert(r.getAs[Double]("iqr") === 4.0)
    assert(r.getAs[Double]("bowley") === 0.0)
    assert(r.getAs[Double]("qcd") === 0.4)
  }

  test("robustShape: right-skewed quartiles read positive bowley") {
    // (1,1,2,4,10,10,10): q1=1.5 q2=4 q3=10 -> bowley 3.5/8.5
    val df = Seq(1.0, 1.0, 2.0, 4.0, 10.0, 10.0, 10.0).toDF("v")
    val r = Stats.robustShape(df, col("v")).collect()(0)
    assert(r.getAs[Double]("q1") === 1.5)
    assert(r.getAs[Double]("q3") === 10.0)
    assert(r.getAs[Double]("bowley") ===
      math.rint(3.5 / 8.5 * 1e6) / 1e6)
  }

  test("KruskalMonitor.shape equals the batch over replayed events") {
    val ev = table("events")
    val km = new Streaming.KruskalMonitor(col("event_type"), col("value"))
    (0 until 3).foreach(b => km.update(ev.filter(col("event_id") % 3 === b)))
    assert(km.shape.collect().toSeq ===
      Stats.robustShape(ev, col("value")).collect().toSeq)
  }

  // ------------------------------------------------------------ p-chart
  test("pchartOfDaily: per-day limits widen on thin days") {
    // day1 (n=10, x=1), day2 (n=2, x=1): center = 1/6
    val d = Seq(
      ("purchase", day("2024-01-01"), 1L), ("click", day("2024-01-01"), 9L),
      ("purchase", day("2024-01-02"), 1L), ("click", day("2024-01-02"), 1L))
      .toDF("event_type", "day", "n")
    val rows = Events.pchartOfDaily(d, "purchase", sigmas = 3.0)
      .orderBy(col("day")).collect()
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val center = 2.0 / 12.0
    val sp1 = 3.0 * math.sqrt(center * (1.0 - center) / 10.0)
    val sp2 = 3.0 * math.sqrt(center * (1.0 - center) / 2.0)
    assert(rows(0).getAs[Double]("p_hat") === 0.1)
    assert(rows(0).getAs[Double]("center") === r6(center))
    assert(rows(0).getAs[Double]("lcl") === r6(math.max(center - sp1, 0.0)))
    assert(rows(0).getAs[Double]("ucl") === r6(math.min(center + sp1, 1.0)))
    assert(!rows(0).getAs[Boolean]("alarm"))
    // the thin day's band is wider, so its 0.5 share still passes
    assert(rows(1).getAs[Double]("ucl") === r6(math.min(center + sp2, 1.0)))
    assert(rows(1).getAs[Double]("ucl") > rows(0).getAs[Double]("ucl"))
    assert(!rows(1).getAs[Boolean]("alarm"))
  }

  test("pchartOfDaily: an out-of-band day alarms") {
    // 9 calm days at 10% + one day at 90%: the hot day breaks the band
    val calm = (1 to 9).flatMap { i =>
      Seq(("purchase", day(f"2024-01-$i%02d"), 10L),
        ("click", day(f"2024-01-$i%02d"), 90L))
    }
    val hot = Seq(("purchase", day("2024-01-10"), 90L),
      ("click", day("2024-01-10"), 10L))
    val rows = Events.pchartOfDaily((calm ++ hot)
        .toDF("event_type", "day", "n"), "purchase")
      .orderBy(col("day")).collect()
    assert(!rows(0).getAs[Boolean]("alarm"))
    assert(rows(9).getAs[Boolean]("alarm"))
  }

  test("VolumeMonitor.pchart equals the batch over replayed events") {
    val ev = table("events")
    val vm = new Streaming.VolumeMonitor()
    (0 until 3).foreach(b => vm.update(ev.filter(col("event_id") % 3 === b)))
    assert(vm.pchart("purchase").orderBy(col("day")).collect().toSeq ===
      Events.pChart(ev, "event_type", "ts", "purchase")
        .orderBy(col("day")).collect().toSeq)
  }
}
