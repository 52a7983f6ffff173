package graft

import org.apache.spark.sql.functions._
import graft.functions.{Events, Stats}
import graft.streaming.Streaming

/** Hand-computed pins for the sequential/calibration batch: Wald SPRT,
  * expected calibration error, and daily mix evenness — plus streaming
  * parity for the state-backed readouts.
  */
class SequentialCalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def day(s: String) = java.sql.Date.valueOf(s)

  // --------------------------------------------------------------- SPRT
  test("sprtOfCounts: LLR against Wald bounds, all three decisions") {
    def llr(n: Long, x: Long): Double =
      x * math.log(0.22 / 0.18) +
        (n.toDouble - x) * math.log((1.0 - 0.22) / (1.0 - 0.18))
    val upper = math.log((1.0 - 0.2) / 0.05)
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val cont = Stats.sprtOfCounts(Seq((100L, 30L)).toDF("__pn_b", "__px_b"),
      0.18, 0.22).collect()(0)
    assert(cont.getAs[Double]("llr") === r6(llr(100, 30)))
    assert(cont.getAs[Double]("upper") === r6(upper))
    assert(cont.getAs[String]("decision") === "continue")
    val h1 = Stats.sprtOfCounts(Seq((100L, 35L)).toDF("__pn_b", "__px_b"),
      0.18, 0.22).collect()(0)
    assert(h1.getAs[String]("decision") === "accept_h1")
    val h0 = Stats.sprtOfCounts(Seq((100L, 10L)).toDF("__pn_b", "__px_b"),
      0.18, 0.22).collect()(0)
    assert(h0.getAs[String]("decision") === "accept_h0")
  }

  test("sprt batch wrapper collapses raw rows to the exact count pair") {
    val df = (1 to 100).map(i => i <= 30).toDF("y")
    val r = Stats.sprt(df, col("y"), 0.18, 0.22).collect()(0)
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Long]("x") === 30L)
  }

  test("ProportionMonitor.sequential equals the batch over replayed events") {
    val ev = table("events")
    val half = to_date(col("ts")) <= lit("2024-01-15").cast("date")
    val pm = new Streaming.ProportionMonitor(half,
      col("event_type") === "purchase")
    (0 until 3).foreach(b => pm.update(ev.filter(col("event_id") % 3 === b)))
    assert(pm.sequential(0.18, 0.22).collect().toSeq ===
      Stats.sprt(ev.filter(!half), col("event_type") === "purchase",
        0.18, 0.22).collect().toSeq)
  }

  // ---------------------------------------------------------------- ECE
  test("calibrationError: bin-weighted gaps, worst bin as MCE") {
    // bin0: p=.05 x2, y=(T,F) -> gap .45; bin9: p=.95 x2, y=(T,T) -> .05
    val df = Seq((0.05, true), (0.05, false), (0.95, true), (0.95, true))
      .toDF("p", "y")
    val r = Stats.calibrationError(df, col("p"), col("y"), bins = 10)
      .collect()(0)
    assert(r.getAs[Int]("bins") === 10)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("ece") === 0.25)
    assert(r.getAs[Double]("mce") === 0.45)
  }

  test("calibrationError: p = 1.0 clamps into the top bin; perfect is 0") {
    val df = Seq((1.0, true), (0.0, false)).toDF("p", "y")
    val r = Stats.calibrationError(df, col("p"), col("y"), bins = 10)
      .collect()(0)
    assert(r.getAs[Double]("ece") === 0.0)
    assert(r.getAs[Double]("mce") === 0.0)
  }

  // ----------------------------------------------------- mix evenness
  test("evennessOfDaily: balanced day reads 1, single-type day reads NULL") {
    val d = Seq(
      ("a", day("2024-01-01"), 5L), ("b", day("2024-01-01"), 5L),
      ("a", day("2024-01-02"), 7L),
      ("a", day("2024-01-03"), 9L), ("b", day("2024-01-03"), 1L))
      .toDF("event_type", "day", "n")
    val rows = Events.evennessOfDaily(d).orderBy(col("day")).collect()
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    assert(rows(0).getAs[Double]("evenness") === 1.0)
    assert(rows(0).getAs[Double]("entropy") === r6(math.log(2.0)))
    assert(rows(1).getAs[Double]("entropy") === 0.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("evenness")))
    val h = -(0.9 * math.log(0.9)) - 0.1 * math.log(0.1)
    assert(math.abs(rows(2).getAs[Double]("evenness") -
      r6(h / math.log(2.0))) < 2e-6)
  }

  test("VolumeMonitor.evenness equals the batch over replayed events") {
    val ev = table("events")
    val vm = new Streaming.VolumeMonitor()
    (0 until 3).foreach(b => vm.update(ev.filter(col("event_id") % 3 === b)))
    assert(vm.evenness.orderBy(col("day")).collect().toSeq ===
      Events.mixEvenness(ev, "event_type", "ts")
        .orderBy(col("day")).collect().toSeq)
  }
}
