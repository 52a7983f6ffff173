package graft

import org.apache.spark.sql.functions._
import graft.functions.{Events, Stats}

/** Hand-computed pins for the round-12 additions: Holt's linear smoothing
  * (level/trend/forecast against the sequential textbook recursion) and
  * Benjamini–Hochberg FDR control (rank, step-up envelope, tie handling).
  */
class HoltFdrSpec extends SparkSpec {
  import spark.implicits._

  private def dailyDf(rows: Seq[(String, String, Long)]) =
    rows.toDF("event_type", "day_s", "n")
      .select(col("event_type"), to_date(col("day_s")).as("day"), col("n"))

  test("holtOfDaily: matches the sequential l/b recursion, alpha=beta=0.5") {
    // y = 10, 12, 11, 15  (alpha = beta = 1/2; all dyadic -> exact)
    // l1=10 b1=2 | l2=12 b2=2 | l3=12.5 b3=1.25 | l4=14.375 b4=1.5625
    val d = dailyDf(Seq(
      ("click", "2024-01-01", 10L), ("click", "2024-01-02", 12L),
      ("click", "2024-01-03", 11L), ("click", "2024-01-04", 15L)))
    val r = Events.holtOfDaily(d).collect()(0)
    assert(r.getAs[Long]("d_days") === 4L)
    assert(r.getAs[Double]("level") === 14.375)
    assert(r.getAs[Double]("trend") === 1.5625)
    assert(r.getAs[Double]("forecast") === 15.9375)
  }

  test("holtOfDaily: two days reproduce the init state exactly") {
    // T=2: l2 = y2, b2 = y2 - y1 by construction
    val d = dailyDf(Seq(
      ("view", "2024-01-01", 7L), ("view", "2024-01-02", 13L)))
    val r = Events.holtOfDaily(d).collect()(0)
    assert(r.getAs[Double]("level") === 13.0)
    assert(r.getAs[Double]("trend") === 6.0)
    assert(r.getAs[Double]("forecast") === 19.0)
  }

  test("holtOfDaily: single-day series reads level=y1, NULL trend/forecast") {
    val d = dailyDf(Seq(("rare", "2024-01-05", 3L)))
    val r = Events.holtOfDaily(d).collect()(0)
    assert(r.getAs[Double]("level") === 3.0)
    assert(r.isNullAt(r.fieldIndex("trend")))
    assert(r.isNullAt(r.fieldIndex("forecast")))
  }

  test("holtOfDaily: non-default alpha/beta follow the recursion") {
    // alpha=0.2, beta=0.4; y = 100, 80, 90
    // l1=100 b1=-20 | l2=.2*80+.8*80=80 b2=.4*(-20)+.6*(-20)=-20
    // l3=.2*90+.8*60=66 b3=.4*(66-80)+.6*(-20)=-17.6 ; f=48.4
    val d = dailyDf(Seq(
      ("x", "2024-01-01", 100L), ("x", "2024-01-02", 80L),
      ("x", "2024-01-03", 90L)))
    val r = Events.holtOfDaily(d, alpha = 0.2, beta = 0.4).collect()(0)
    assert(math.abs(r.getAs[Double]("level") - 66.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("trend") - (-17.6)) < 1e-6)
    assert(math.abs(r.getAs[Double]("forecast") - 48.4) < 1e-6)
  }

  test("stream holt: VolumeMonitor replay equals the batch operator") {
    val ev = table("events")
    val vm = new graft.streaming.Streaming.VolumeMonitor("event_type", "ts")
    (0 until 3).foreach(b => vm.update(ev.filter(col("event_id") % 3 === b)))
    val streamed = vm.holt().collect().map(_.toSeq)
    val batch = Events.holtDaily(ev, "event_type", "ts").collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("bhAdjust: hand-computed envelope, rejects and keeps") {
    val panel = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04),
      ("e", 0.2)).toDF("k", "p")
    val out = Stats.bhAdjust(panel, "k", "p", q = 0.05)
      .orderBy(col("key")).collect()
    // raw = p*5/rank = .05,.05,.05,.05,.2 ; envelope = same (monotone)
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.map(_.getAs[Double]("p_bh")).toSeq ===
      Seq(0.05, 0.05, 0.05, 0.05, 0.2))
    assert(out.map(_.getAs[Boolean]("reject")).toSeq ===
      Seq(true, true, true, true, false))
  }

  test("bhAdjust: step-up envelope is monotone (a later small raw rescues earlier ranks)") {
    // p = .04,.045,.09 (m=3): raw = .12, .0675, .09 -> envelope from top:
    // rank3 .09 ; rank2 min(.0675,.09)=.0675 ; rank1 min(.12,.0675)=.0675
    val panel = Seq(("a", 0.04), ("b", 0.045), ("c", 0.09)).toDF("k", "p")
    val out = Stats.bhAdjust(panel, "k", "p", q = 0.1)
      .orderBy(col("rank")).collect()
    val bh = out.map(_.getAs[Double]("p_bh")).toSeq
    assert(bh(0) === bh(1), "rank-1 envelope takes rank-2's smaller raw")
    assert(bh(0) === 0.0675)
    assert(bh(2) === 0.09)
    assert(out.forall(_.getAs[Boolean]("reject")))
  }

  test("bhAdjust: ties break by key deterministically; NULL p rows drop") {
    val panel = Seq[(String, java.lang.Double)](
      ("b", 0.01), ("a", 0.01), ("c", null)).toDF("k", "p")
    val out = Stats.bhAdjust(panel, "k", "p").orderBy(col("key")).collect()
    assert(out.length === 2)
    assert(out.map(r => (r.getAs[String]("key"), r.getAs[Long]("rank"))).toSeq ===
      Seq(("a", 1L), ("b", 2L)))
  }

  test("stream fdr: VolumeMonitor replay equals batch Pettitt->BH") {
    val ev = table("events")
    val vm = new graft.streaming.Streaming.VolumeMonitor("event_type", "ts")
    (0 until 3).foreach(b => vm.update(ev.filter(col("event_id") % 3 === b)))
    val streamed = vm.fdrControl(0.05).collect().map(_.toSeq)
    val batch = Stats.bhAdjust(Events.pettitt(ev, "event_type", "ts"),
      "event_type", "p_approx", 0.05).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
  }
}
