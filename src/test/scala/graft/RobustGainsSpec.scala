package graft

import org.apache.spark.sql.functions._
import graft.functions.{Events, Stats, TextAnalysis}
import graft.streaming.Streaming

/** Hand-computed pins for the robust-stats/gains batch: trimmed mean,
  * MAD, Wald–Wolfowitz runs test, cumulative gains/lift, and their
  * streaming-readout parity with the batch operators.
  */
class RobustGainsSpec extends SparkSpec {
  import spark.implicits._

  private def day(s: String) = java.sql.Date.valueOf(s)

  // --------------------------------------------------------- trimmed
  test("trimmedMean: interval-clamped weights over duplicated values") {
    // (1,1,1,2,3) trim=.2 -> g=1: keep two 1s, one 2 -> 4/3
    val df = Seq(1.0, 1.0, 1.0, 2.0, 3.0).toDF("v")
    val r = Stats.trimmedMean(df, col("v"), trim = 0.2).collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("cut") === 1L)
    assert(r.getAs[Long]("kept") === 3L)
    assert(r.getAs[Double]("mean") === 1.6)
    assert(r.getAs[Double]("trimmed_mean") ===
      math.rint(4.0 / 3.0 * 1e6) / 1e6)
  }

  test("trimmedMean: outlier moves the mean, not the trimmed mean") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v")
    val r = Stats.trimmedMean(df, col("v"), trim = 0.2).collect()(0)
    assert(r.getAs[Double]("mean") === 22.0)
    assert(r.getAs[Double]("trimmed_mean") === 3.0)
  }

  test("KruskalMonitor.trimmed equals the batch over replayed events") {
    val ev = table("events")
    val km = new Streaming.KruskalMonitor(col("event_type"), col("value"))
    (0 until 3).foreach(b => km.update(ev.filter(col("event_id") % 3 === b)))
    assert(km.trimmed(0.1).collect().toSeq ===
      Stats.trimmedMean(ev, col("value"), 0.1).collect().toSeq)
  }

  // ------------------------------------------------------------- MAD
  test("madScale: outlier-immune scale, odd and even n") {
    val odd = Stats.madScale(
      Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v"), col("v")).collect()(0)
    assert(odd.getAs[Double]("median") === 3.0)
    assert(odd.getAs[Double]("mad") === 1.0)
    assert(odd.getAs[Double]("mad_normal") ===
      math.rint(1.4826022185056018 * 1e6) / 1e6)
    val even = Stats.madScale(
      Seq(1.0, 2.0, 3.0, 4.0).toDF("v"), col("v")).collect()(0)
    assert(even.getAs[Double]("median") === 2.5)
    assert(even.getAs[Double]("mad") === 1.0)
  }

  test("KruskalMonitor.scale equals the batch over replayed events") {
    val ev = table("events")
    val km = new Streaming.KruskalMonitor(col("event_type"), col("value"))
    (0 until 3).foreach(b => km.update(ev.filter(col("event_id") % 3 === b)))
    assert(km.scale.collect().toSeq ===
      Stats.madScale(ev, col("value")).collect().toSeq)
  }

  // ------------------------------------------------------- runs test
  test("runsOfDaily: alternating series reads too MANY runs (z > 0)") {
    // n = 5,1,5,1,5,1 -> med 3, runs 6, a=b=3: mu=4, var=1.2
    val d = Seq(5L, 1L, 5L, 1L, 5L, 1L).zipWithIndex.map { case (n, i) =>
      ("a", day(f"2024-01-${i + 1}%02d"), n)
    }.toDF("event_type", "day", "n")
    val r = Events.runsOfDaily(d).collect()(0)
    assert(r.getAs[Long]("n_plus") === 3L)
    assert(r.getAs[Long]("n_minus") === 3L)
    assert(r.getAs[Long]("runs") === 6L)
    assert(r.getAs[Double]("z") ===
      math.rint(2.0 / math.sqrt(1.2) * 1e6) / 1e6)
  }

  test("runsOfDaily: clustered series reads too FEW runs (z < 0)") {
    val d = Seq(1L, 1L, 1L, 5L, 5L, 5L).zipWithIndex.map { case (n, i) =>
      ("a", day(f"2024-01-${i + 1}%02d"), n)
    }.toDF("event_type", "day", "n")
    val r = Events.runsOfDaily(d).collect()(0)
    assert(r.getAs[Long]("runs") === 2L)
    assert(r.getAs[Double]("z") ===
      -(math.rint(2.0 / math.sqrt(1.2) * 1e6) / 1e6))
  }

  test("runsOfDaily: median-equal days drop before run counting") {
    // 1,3,3,5: med = 3; only 1 and 5 survive -> a=1 b=1 runs=2, var=0 -> NULL
    val d = Seq(1L, 3L, 3L, 5L).zipWithIndex.map { case (n, i) =>
      ("a", day(f"2024-01-${i + 1}%02d"), n)
    }.toDF("event_type", "day", "n")
    val r = Events.runsOfDaily(d).collect()(0)
    assert(r.getAs[Long]("n_plus") === 1L)
    assert(r.getAs[Long]("n_minus") === 1L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("VolumeMonitor.runs equals the batch over replayed events") {
    val ev = table("events")
    val vm = new Streaming.VolumeMonitor()
    (0 until 3).foreach(b => vm.update(ev.filter(col("event_id") % 3 === b)))
    assert(vm.runs.orderBy(col("event_type")).collect().toSeq ===
      Events.runsTest(ev, "event_type", "ts")
        .orderBy(col("event_type")).collect().toSeq)
  }

  // ----------------------------------------------------- gains / lift
  test("gainsCurve: separable ranking captures all positives early") {
    // scores 10..1, positives at 10,9,8
    val df = (1 to 10).map(i => (i.toDouble, i >= 8)).toDF("s", "y")
    val rows = Stats.gainsCurve(df, col("s"), col("y"), deciles = 10)
      .collect()
    assert(rows.length === 10)
    val d1 = rows(0)
    assert(d1.getAs[Long]("n_cum") === 1L)
    assert(d1.getAs[Long]("pos_cum") === 1L)
    assert(d1.getAs[Double]("gain") === math.rint(1.0 / 3.0 * 1e6) / 1e6)
    assert(d1.getAs[Double]("lift") ===
      math.rint(1.0 / 3.0 / (1.0 / 10.0) * 1e6) / 1e6)
    val d3 = rows(2)
    assert(d3.getAs[Long]("pos_cum") === 3L)
    assert(d3.getAs[Double]("gain") === 1.0)
    val d10 = rows(9)
    assert(d10.getAs[Long]("n_cum") === 10L)
    assert(d10.getAs[Double]("gain") === 1.0)
    assert(d10.getAs[Double]("lift") === 1.0)
  }

  test("gainsCurve: a tie group straddling a cut reports the boundary row") {
    // scores (5,5,5,1): cumtot rows 3 then 4 -> quartile n_cum 3,3,3,4
    val df = Seq((5.0, true), (5.0, false), (5.0, true), (1.0, false))
      .toDF("s", "y")
    val rows = Stats.gainsCurve(df, col("s"), col("y"), deciles = 4)
      .collect()
    assert(rows.map(_.getAs[Long]("n_cum")).toSeq === Seq(3L, 3L, 3L, 4L))
    assert(rows.map(_.getAs[Long]("pos_cum")).toSeq === Seq(2L, 2L, 2L, 2L))
  }

  test("AucMonitor.gains equals the batch over replayed docs") {
    val docs = table("documents")
    val score = TextAnalysis.classifierMicroSum(col("text"), "clf-v1")
    val label = round(TextAnalysis.qualityScoreRaw(col("text"))
      .cast(org.apache.spark.sql.types.DecimalType(18, 8)), 4)
      .cast("double") >= 0.5
    val am = new Streaming.AucMonitor(score, label)
    (0 until 3).foreach(b => am.update(docs.filter(col("doc_id") % 3 === b)))
    assert(am.gains(10).collect().toSeq ===
      Stats.gainsCurve(docs, score, label, 10).collect().toSeq)
  }
}
