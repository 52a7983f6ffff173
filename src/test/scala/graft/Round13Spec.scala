package graft

import org.apache.spark.sql.functions._
import graft.functions.{Events, Stats}
import graft.streaming.Streaming

/** Hand-computed pins for the round-13 additions: two-sample KS, CUPED,
  * Cochran–Mantel–Haenszel, Nelson–Aalen, the holtOfDaily over-length
  * guard, the bhAdjust panel guards, and LSM compaction on a migrated
  * keyed monitor.
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- KS
  test("ksTwoSample: exact sup-gap, z and p on a hand-computed pair") {
    // a = (1,2,3), b = (2,3,3,4): F_a = 1/3, 2/3, 1, 1; F_b = 0, 1/4, 3/4, 1
    // integer gaps |cum_a*4 - cum_b*3| = 4, 5, 3, 0 -> D = 5/12
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 3.0, 4.0).toDF("v")
    val r = Stats.ksTwoSample(a, b, "v").collect()(0)
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_b") === 4L)
    val d = math.rint(5.0 / 12.0 * 1e6) / 1e6
    assert(r.getAs[Double]("d") === d)
    val z = d * math.sqrt(12.0 / 7.0)
    assert(r.getAs[Double]("z") === math.rint(z * 1e6) / 1e6)
    val p = math.min(2.0 * math.exp(-2.0 * z * z), 1.0)
    assert(r.getAs[Double]("p_approx") === math.rint(p * 1e6) / 1e6)
  }

  test("ksTwoSample: identical samples read D = 0, p = 1") {
    val a = Seq(1.0, 2.0, 5.0).toDF("v")
    val r = Stats.ksTwoSample(a, a, "v").collect()(0)
    assert(r.getAs[Double]("d") === 0.0)
    assert(r.getAs[Double]("p_approx") === 1.0)
  }

  test("AucMonitor.distributionTest equals the batch ksTwoSample") {
    val ev = table("events").filter(col("event_type").isin("click", "purchase"))
    val am = new Streaming.AucMonitor(col("value"), col("event_type") === "click")
    (0 until 3).foreach(b => am.update(ev.filter(col("event_id") % 3 === b)))
    val streamed = am.distributionTest.collect()(0)
    val batch = Stats.ksTwoSample(
      ev.filter(col("event_type") === "click").select(col("value")),
      ev.filter(col("event_type") === "purchase").select(col("value")),
      "value").collect()(0)
    assert(streamed === batch)
  }

  // ------------------------------------------------------------- CUPED
  test("cuped: perfectly correlated covariate removes all variance") {
    // x = 1..4, y = 2x: theta = 2, rho2 = 1, var_y = 5, var_y_cuped = 0
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0)).toDF("x", "y")
    val r = Stats.cuped(df, "x", "y").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("theta") === 2.0)
    assert(r.getAs[Double]("rho2") === 1.0)
    assert(r.getAs[Double]("var_y") === 5.0)
    assert(r.getAs[Double]("var_y_cuped") === 0.0)
  }

  test("cuped: constant covariate reads NULL theta (nothing to regress on)") {
    val df = Seq((1.0, 2.0), (1.0, 4.0), (1.0, 9.0)).toDF("x", "y")
    val r = Stats.cuped(df, "x", "y").collect()(0)
    assert(r.isNullAt(r.fieldIndex("theta")))
    assert(r.isNullAt(r.fieldIndex("rho2")))
  }

  test("CorrMonitor.cuped equals the batch cuped") {
    val li = table("lineitem")
    val cm = new Streaming.CorrMonitor(Seq("l_quantity", "l_extendedprice"))
    (0 until 3).foreach(b => cm.update(li.filter(col("l_orderkey") % 3 === b)))
    val streamed = cm.cuped("l_quantity", "l_extendedprice").collect()(0)
    val batch = Stats.cuped(li, "l_quantity", "l_extendedprice").collect()(0)
    assert(streamed === batch)
  }

  // --------------------------------------------------------------- CMH
  test("mantelHaenszel: hand-computed two-stratum table") {
    // S1: a (4, 2), b (4, 1) -> oe 0.5, var 240/448, orn .75, ord .25
    // S2: a (2, 2), b (4, 1) -> oe 1.0, var 0.4,     orn 1.0, ord 0
    def rows(st: Int, arm: Boolean, succ: Int, fail: Int) =
      Seq.fill(succ)((st, arm, true)) ++ Seq.fill(fail)((st, arm, false))
    val df = (rows(1, arm = true, 2, 2) ++ rows(1, arm = false, 1, 3) ++
      rows(2, arm = true, 2, 0) ++ rows(2, arm = false, 1, 3))
      .toDF("st", "arm", "succ")
    val r = Stats.mantelHaenszel(df, col("st"), col("arm"), col("succ"))
      .collect()(0)
    assert(r.getAs[Long]("k_strata") === 2L)
    assert(r.getAs[Long]("n_a") === 6L)
    assert(r.getAs[Long]("n_b") === 8L)
    // terms stage at DECIMAL(28,10) before the sum — replicate exactly
    def st10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val sv = (st10(4.0 * 4.0 * 3.0 * 5.0 / (8.0 * 8.0 * 7.0)) + st10(0.4)).toDouble
    val chi2 = 1.5 * 1.5 / sv
    assert(r.getAs[Double]("chi2_mh") === math.rint(chi2 * 1e6) / 1e6)
    assert(r.getAs[Double]("or_mh") === 7.0) // 1.75 / 0.25
  }

  test("mantelHaenszel: single-row strata contribute nothing; all-tiny panel reads NULL") {
    val df = Seq((1, true, true), (2, false, true)).toDF("st", "arm", "succ")
    val r = Stats.mantelHaenszel(df, col("st"), col("arm"), col("succ"))
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("chi2_mh")))
    assert(r.isNullAt(r.fieldIndex("or_mh")))
  }

  test("MhMonitor readout equals the batch mantelHaenszel") {
    val ev = table("events")
    val stratum = col("user_id") % 4
    val arm = to_date(col("ts")) <= lit("2024-01-15").cast("date")
    val succ = col("event_type") === "purchase"
    val mm = new Streaming.MhMonitor(stratum, arm, succ)
    (0 until 3).foreach(b => mm.update(ev.filter(col("event_id") % 3 === b)))
    assert(mm.readout.collect()(0) ===
      Stats.mantelHaenszel(ev, stratum, arm, succ).collect()(0))
  }

  // ------------------------------------------------------ Nelson–Aalen
  test("nelsonAalen: hand-computed life table") {
    // spans: t=0 churn, t=4 churn, t=5 censored, t=12 censored (end 01-15)
    // n_risk 4,3,2,1; hazard .25, 1/3, 0, 0; H = .25, .583333, ., .
    val ev = Seq(
      (1L, "2024-01-01"), // u1: t=0, churned
      (2L, "2024-01-01"), (2L, "2024-01-05"), // u2: t=4, churned
      (3L, "2024-01-03"), (3L, "2024-01-15"), // u3: t=12, censored
      (4L, "2024-01-10"), (4L, "2024-01-15")) // u4: t=5, censored
      .toDF("user_id", "d").select(col("user_id"),
        col("d").cast("timestamp").as("ts"))
    val rows = Events.nelsonAalen(ev, "user_id", "ts", censorDays = 7)
      .orderBy(col("t_days")).collect()
    assert(rows.map(_.getAs[Long]("n_risk")).toSeq === Seq(4L, 3L, 2L, 1L))
    assert(rows.map(_.getAs[Double]("hazard")).toSeq ===
      Seq(0.25, 0.333333, 0.0, 0.0))
    assert(rows.map(_.getAs[Double]("cum_hazard")).toSeq ===
      Seq(0.25, 0.583333, 0.583333, 0.583333))
  }

  test("SurvivalMonitor.hazard equals the batch nelsonAalen") {
    val ev = table("events")
    val sm = new Streaming.SurvivalMonitor("user_id", "ts")
    (0 until 3).foreach(b => sm.update(ev.filter(col("event_id") % 3 === b)))
    val streamed = sm.hazard(censorDays = 7).orderBy(col("t_days")).collect()
    val batch = Events.nelsonAalen(ev, "user_id", "ts", censorDays = 7)
      .orderBy(col("t_days")).collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  // -------------------------------------------------------------- guards
  test("holtOfDaily: a series longer than maxDays+1 fails loudly, not NULL") {
    val d = Seq(("click", "2024-01-01", 5L), ("click", "2024-01-02", 6L),
      ("click", "2024-01-03", 7L), ("click", "2024-01-04", 8L))
      .toDF("event_type", "day_s", "n")
      .select(col("event_type"), to_date(col("day_s")).as("day"), col("n"))
    val e = intercept[Exception] {
      Events.holtOfDaily(d, maxDays = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("raise maxDays")))
  }

  test("bhAdjust: panels wider than maxPanel fail loudly before the m² join") {
    val p = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03)).toDF("k", "p")
    val e = intercept[IllegalArgumentException] {
      Stats.bhAdjust(p, "k", "p", maxPanel = 2)
    }
    assert(e.getMessage.contains("maxPanel"))
  }

  test("bhAdjust: duplicate panel keys fail loudly (rank would skew)") {
    val p = Seq(("a", 0.01), ("a", 0.01), ("b", 0.02)).toDF("k", "p")
    val e = intercept[IllegalArgumentException] {
      Stats.bhAdjust(p, "k", "p")
    }
    assert(e.getMessage.contains("duplicate"))
  }

  // ------------------------------------------------- batch-2 operators
  test("simpsonConcentration: hand-computed keys") {
    // a,a,a,b: lambda = 3*2/(4*3) = 0.5; diversity .5; effective 2
    val df = Seq("a", "a", "a", "b").toDF("k")
    val r = graft.functions.Stats.simpsonConcentration(df, "k").collect()(0)
    assert(r.getAs[Long]("n_keys") === 2L)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("simpson") === 0.5)
    assert(r.getAs[Double]("diversity") === 0.5)
    assert(r.getAs[Double]("effective_keys") === 2.0)
  }

  test("KeyCountMonitor.concentration equals the batch simpson") {
    val ev = table("events")
    val km = new Streaming.KeyCountMonitor("user_id")
    (0 until 3).foreach(b => km.update(ev.filter(col("event_id") % 3 === b)))
    assert(km.concentration().collect()(0) ===
      graft.functions.Stats.simpsonConcentration(ev, "user_id").collect()(0))
  }

  test("cohenH: p=.25 vs p=.75 reads h = -pi/3, large") {
    val a = (Seq(true) ++ Seq.fill(3)(false)).toDF("s")
    val b = (Seq.fill(3)(true) ++ Seq(false)).toDF("s")
    val r = Stats.cohenH(a, b, col("s")).collect()(0)
    val h = 2.0 * math.asin(math.sqrt(0.25)) - 2.0 * math.asin(math.sqrt(0.75))
    assert(r.getAs[Double]("h") === math.rint(h * 1e6) / 1e6)
    assert(r.getAs[String]("magnitude") === "large")
  }

  test("cronbachAlpha: duplicated item reads 1, independent items read 0") {
    val dup = Seq(Seq(1.0, 1.0), Seq(2.0, 2.0), Seq(3.0, 3.0)).toDF("v")
    val r1 = graft.functions.Vectors.cronbachAlpha(dup, "v", Seq(0, 1)).collect()(0)
    assert(r1.getAs[Double]("alpha") === 1.0)
    val ind = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 1.0), Seq(0.0, 0.0))
      .toDF("v")
    val r2 = graft.functions.Vectors.cronbachAlpha(ind, "v", Seq(0, 1)).collect()(0)
    assert(r2.getAs[Double]("alpha") === 0.0)
  }

  test("keyness: hand-computed Haldane log odds, ordered") {
    val docs = Seq(("apple apple banana", true), ("banana banana cherry", false))
      .toDF("text", "t")
    val rows = graft.functions.Retrieval.keyness(docs, "text", col("t"),
      topK = 10, minCount = 1).collect()
    assert(rows.map(_.getAs[String]("token")).toSeq ===
      Seq("apple", "banana", "cherry"))
    val loApple = math.log(2.5 / 1.5) - math.log(0.5 / 3.5)
    assert(rows(0).getAs[Double]("log_odds") === math.rint(loApple * 1e6) / 1e6)
    assert(rows(0).getAs[Long]("cnt_target") === 2L)
    assert(rows(0).getAs[Long]("cnt_rest") === 0L)
  }

  // ------------------------------------ replay batch-count independence
  // The bench gate builds every replayed family state from 3 micro-batches
  // where round 12 used 5 — legitimate ONLY because these monitors are
  // additive (readout = f(total folded state)). Pin it: 2-batch, 5-batch
  // and single-batch replays must read out identically.
  test("additive monitors: readouts are batch-count independent (3 vs 5 replay)") {
    val ev = table("events")
    def splits(n: Int) = (0 until n).map(b => ev.filter(col("event_id") % n === b))
    def vol(n: Int) = {
      val m = new Streaming.VolumeMonitor("event_type", "ts")
      splits(n).foreach(m.update)
      m.anomalies().orderBy(col("event_type"), col("day")).collect().toSeq
    }
    assert(vol(2) === vol(5))
    def auc(n: Int) = {
      val m = new Streaming.AucMonitor(col("value"), col("event_type") === "click")
      splits(n).foreach(m.update)
      m.readout.collect().toSeq
    }
    assert(auc(1) === auc(5))
    def prop(n: Int) = {
      val m = new Streaming.ProportionMonitor(
        to_date(col("ts")) <= lit("2024-01-15").cast("date"),
        col("event_type") === "purchase")
      splits(n).foreach(m.update)
      m.readout.collect().toSeq
    }
    assert(prop(2) === prop(5))
  }

  // ------------------------------------------------- LSM compaction pin
  test("KeyCountMonitor: 10 batches (past maxDeltas compaction) equal one batch") {
    val ev = table("events")
    val many = new Streaming.KeyCountMonitor("user_id")
    (0 until 10).foreach(b => many.update(ev.filter(col("event_id") % 10 === b)))
    val once = new Streaming.KeyCountMonitor("user_id")
    once.update(ev)
    assert(many.skew(5).collect().toSeq === once.skew(5).collect().toSeq)
    assert(many.gini().collect().toSeq === once.gini().collect().toSeq)
  }
}
