package graft

import org.apache.spark.sql.functions._
import graft.functions.{Curation, Events, Stats}

/** Hand-computed pins for the round-13 batch-C additions: Bartlett's
  * variance-homogeneity test, the TVD/Hellinger/Bhattacharyya divergence
  * trio, and the daily-volume burstiness profile — plus streaming parity
  * through their shared monitor states.
  */
class DispersionSpec extends SparkSpec {
  import spark.implicits._

  test("bartlettTest: two groups with variances 2.5 and 10 pin the chi2") {
    // g1 = {1,2,3,4,5}: var 2.5; g2 = {2,6,10,4,8}: var 10; n=10, k=2
    // sp2 = (4*2.5 + 4*10)/8 = 6.25
    // num = 8*ln(6.25) - (4*ln(2.5) + 4*ln(10))
    // corr = 1 + (1/4 + 1/4 - 1/8)/3
    val df = (Seq(1, 2, 3, 4, 5).map(("a", _)) ++
      Seq(2, 6, 10, 4, 8).map(("b", _))).toDF("g", "v")
    val r = Stats.bartlettTest(df, col("g"), col("v")).collect()(0)
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Long]("n") === 10L)
    val num = 8.0 * math.log(6.25) - (4.0 * math.log(2.5) + 4.0 * math.log(10.0))
    val corr = 1.0 + (0.25 + 0.25 - 0.125) / 3.0
    assert(math.abs(r.getAs[Double]("chi2") - num / corr) < 1e-5)
  }

  test("bartlettTest: equal variances read chi2 ~ 0") {
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(5, 6, 7).map(("b", _)))
      .toDF("g", "v")
    val r = Stats.bartlettTest(df, col("g"), col("v")).collect()(0)
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-9)
  }

  test("bartlettTest: a zero-variance group reads NULL, not -inf") {
    val df = (Seq(4, 4, 4).map(("a", _)) ++ Seq(5, 6, 7).map(("b", _)))
      .toDF("g", "v")
    val r = Stats.bartlettTest(df, col("g"), col("v")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("distributionDistances: identical corpora read zero everywhere") {
    val a = Seq("alpha beta gamma", "alpha beta").toDF("text")
    val r = Curation.distributionDistances(a, a, "text").collect()(0)
    assert(r.getAs[Double]("tvd") === 0.0)
    assert(r.getAs[Double]("hellinger") === 0.0)
    assert(r.getAs[Double]("bhattacharyya") === 0.0)
  }

  test("distributionDistances: single-token corpora pin the smoothed trio") {
    // a = "x", b = "y": vocab {x, y}, ta = tb = 1
    // p = (1+1)/(1+2), (0+1)/(1+2) = (2/3, 1/3); q = (1/3, 2/3)
    // tvd = 0.5*(1/3 + 1/3) = 1/3
    // bc = 2*sqrt(2)/3; hellinger = sqrt(1-bc); bhat = -ln(bc)
    val a = Seq("x").toDF("text")
    val b = Seq("y").toDF("text")
    val r = Curation.distributionDistances(a, b, "text").collect()(0)
    assert(r.getAs[Long]("vocab") === 2L)
    assert(math.abs(r.getAs[Double]("tvd") - 1.0 / 3.0) < 1e-6)
    val bc = 2.0 * math.sqrt(2.0) / 3.0
    assert(math.abs(r.getAs[Double]("hellinger") - math.sqrt(1.0 - bc)) < 1e-6)
    assert(math.abs(r.getAs[Double]("bhattacharyya") + math.log(bc)) < 1e-6)
  }

  test("burstiness: constant dailies read fano=0, 2x-mean spike reads >0") {
    val df = Seq(
      ("a", "2024-01-01", 1), ("a", "2024-01-01", 1), // day1: 2
      ("a", "2024-01-02", 1), ("a", "2024-01-02", 1), // day2: 2
      ("b", "2024-01-01", 1), // day1: 1
      ("b", "2024-01-02", 1), ("b", "2024-01-02", 1),
      ("b", "2024-01-02", 1)) // day2: 3
      .toDF("event_type", "day_s", "x")
      .select(col("event_type"), to_timestamp(col("day_s")).as("ts"))
    val rows = Events.burstiness(df).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("a").getAs[Double]("fano") === 0.0)
    assert(rows("a").getAs[Double]("mean_daily") === 2.0)
    // b: mean 2, var ((1-2)^2+(3-2)^2)/2 = 1 -> fano 0.5, cv2 0.25
    assert(rows("b").getAs[Double]("fano") === 0.5)
    assert(rows("b").getAs[Double]("cv2") === 0.25)
  }

  test("monitor readouts equal their batch twins after 2 batches") {
    val ev = (1 to 60).map(i =>
      (i.toLong, s"t${i % 3}", (i % 7).toDouble,
        java.sql.Timestamp.valueOf(s"2024-01-${"%02d".format(i % 5 + 1)} 01:00:00")))
      .toDF("id", "event_type", "value", "ts")
    val am = new graft.streaming.Streaming.AnovaMonitor(
      col("event_type"), col("value"))
    am.update(ev.filter(col("id") <= 30))
    am.update(ev.filter(col("id") > 30))
    val batchB = Stats.bartlettTest(ev, col("event_type"), col("value"))
      .collect()(0)
    assert(batchB === am.varianceHomogeneity.collect()(0))

    val vm = new graft.streaming.Streaming.VolumeMonitor("event_type", "ts")
    vm.update(ev.filter(col("id") <= 30))
    vm.update(ev.filter(col("id") > 30))
    assert(Events.burstiness(ev).collect().toSeq ===
      vm.burstiness.collect().toSeq)
  }
}
