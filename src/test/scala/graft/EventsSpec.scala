package graft

import org.apache.spark.sql.functions._
import graft.functions.Events

/** Strictly-ordered funnel semantics on a constructed stream. */
class EventsSpec extends SparkSpec {

  test("funnel: strict ordering, partial progress, absent users") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full ordered chain
      (1L, "view", 10L), (1L, "click", 20L), (1L, "signup", 30L), (1L, "purchase", 40L),
      // user 2: clicked BEFORE viewing — click must not count; re-clicks later
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 15L),
      // user 3: view only
      (3L, "view", 10L),
      // user 4: purchase without any prior steps
      (4L, "purchase", 10L)
    ).toDF("user_id", "event_type", "t")
      .withColumn("ts", timestamp_micros(col("t") * 1000000L)).drop("t")
    val out = Events.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "signup", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(out == Map(1L -> 4, 2L -> 2, 3L -> 1, 4L -> 0))
    // strictness detail: user 2's counted click is the one AFTER the view
    val u2 = Events.funnel(ev.filter(col("user_id") === 2), "user_id",
      "event_type", "ts", Seq("view", "click")).head()
    assert(u2.getTimestamp(2).getTime == 15000L, "pre-view click must be ignored")
  }

  test("dailyAutocorr: planted weekly cycle spikes at lag 7, noise-free alternation at lag 1") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp((day.toLong * 86400L + i) * 1000L)
    // period-7 cycle: day volume = 10 + 8*(day % 7 == 0): lag-7 pairs are
    // identical (corr 1), lag-1 pairs mix levels
    val ev = (1 to 42).flatMap { d =>
      val n = if (d % 7 == 0) 18 else 10
      (0 until n).map(i => ("cyc", ts(d, i)))
    }.toDF("event_type", "ts")
    val out = Events.dailyAutocorr(ev, "event_type", "ts", maxLag = 7)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out(7) == 1.0, s"lag-7 must be exactly 1 on a pure cycle: ${out(7)}")
    assert(out(1) < 0.0, s"lag-1 mixes levels and reads negative: ${out(1)}")
  }

  test("typeLift: perfect co-occurrence lifts above 1, disjoint pairs absent") {
    import spark.implicits._
    def ts(i: Int) = new java.sql.Timestamp(i * 1000L)
    // users 1-4 do A and B together; users 5-8 do only C — (A,B) always
    // co-occur (lift = 2 with P(A)=P(B)=1/2), (A,C) never do
    val ev = (1 to 4).flatMap(u => Seq((u.toLong, "A", ts(u)), (u.toLong, "B", ts(u + 10)))) ++
      (5 to 8).map(u => (u.toLong, "C", ts(u)))
    val out = Events.typeLift(ev.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("A", "B")) == (4L, 2.0), s"got $out")
    assert(!out.contains(("A", "C")) && !out.contains(("B", "C")))
  }

  test("hourlyProfile: bounded table, shares sum to 1 per type") {
    val ev = table("events")
    val out = Events.hourlyProfile(ev, "event_type", "ts").collect()
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 24))
    val byType = out.groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(3)).sum)
    byType.foreach { case (t, s) =>
      assert(math.abs(s - 1.0) < 1e-3, s"type $t shares sum to $s") }
  }

  test("cusum: linear creep alarms where the per-day z-test stays silent") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400L + i) * 1000L)
    // type "creep": day t has t events (t=1..20) — max |z| ~1.65, never a
    // 2-sigma spike, but the cumulative drift is unmistakable
    val creep = (1 to 20).flatMap(t => (0 until t).map(i => ("creep", ts(t, i))))
    // type "flat": constant volume — CUSUM must stay exactly 0
    val flat = (1 to 20).flatMap(t => (0 until 5).map(i => ("flat", ts(t, i))))
    val ev = (creep ++ flat).toDF("event_type", "ts")
    val zAnomalies = Events.dailyAnomalies(ev, "event_type", "ts")
      .filter(col("is_anomaly")).count()
    assert(zAnomalies == 0, "the creep never spikes past 2 sigma")
    val cs = Events.cusum(ev, "event_type", "ts").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(3), r.getBoolean(4))).toMap
    assert(cs.values.forall(_._1 >= 0.0), "CUSUM is never negative")
    assert(cs.filter(_._1._1 == "flat").values.forall(v => v._1 == 0.0 && !v._2),
      "constant volume reads exactly 0")
    assert(cs.filter(_._1._1 == "creep").values.exists(_._2),
      "the creep must eventually alarm")
  }

  test("ewmaDaily: hand-computed chart values and widening limits") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400L + i) * 1000L)
    // one type, daily n = 10, 10, 22: mean 14, std sqrt(32); lambda=0.5 ->
    // Z = 12, 11, 16.5; limits mean +- 3*std*sqrt(1/3*(1-0.25^t))
    val ev = Seq(1 -> 10, 2 -> 10, 3 -> 22)
      .flatMap { case (d, n) => (0 until n).map(i => ("a", ts(d, i))) }
      .toDF("event_type", "ts")
    val out = Events.ewmaDaily(ev, "event_type", "ts",
        lambda = 0.5, limitSigmas = 3.0)
      .orderBy(col("day")).collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(12.0, 11.0, 16.5))
    assert(out.map(_.getDouble(4)).toSeq == Seq(5.5147, 4.5132, 4.2789))
    assert(out.map(_.getDouble(5)).toSeq == Seq(22.4853, 23.4868, 23.7211))
    assert(out.forall(!_.getBoolean(6)), "all points inside the limits")
    // the limits widen monotonically toward the asymptote
    val widths = out.map(r => r.getDouble(5) - r.getDouble(4))
    assert(widths.sliding(2).forall(w => w(1) > w(0)))
  }

  test("mannKendall: hand-computed S/z/Theil-Sen per type, tie-degenerate z is NULL") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400L + i) * 1000L)
    def series(tpe: String, vals: Seq[Int]) = vals.zipWithIndex.flatMap {
      case (n, d) => (0 until n).map(i => (tpe, ts(d + 1, i)))
    }
    // a: 3,5,4,6,6 -> S=7, one value tie (tv=18), var=282/18,
    //    z=(7-1)/sqrt(var)=1.515873; slopes median 0.625
    // b: 1,2,3,4 strictly up -> S=6, z=5/sqrt(156/18)=1.698416, slope 1
    // c: 5,5,5 all tied -> S=0, var=0 -> z NULL, slope 0
    val ev = (series("a", Seq(3, 5, 4, 6, 6)) ++ series("b", Seq(1, 2, 3, 4))
      ++ series("c", Seq(5, 5, 5))).toDF("event_type", "ts")
    val out = Events.mannKendall(ev, "event_type", "ts").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 5L, 7L), ("b", 4L, 6L), ("c", 3L, 0L)), s"got ${out.mkString("; ")}")
    assert(out(0).getDouble(3) == 1.515873 && out(0).getDouble(4) == 0.625)
    assert(out(1).getDouble(3) == 1.698416 && out(1).getDouble(4) == 1.0)
    assert(out(2).isNullAt(3) && out(2).getDouble(4) == 0.0)
  }

  test("pettitt: hand-computed K locates the level shift, constant series reads p 1") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400L + i) * 1000L)
    def series(tpe: String, vals: Seq[Int]) = vals.zipWithIndex.flatMap {
      case (n, d) => (0 until n).map(i => (tpe, ts(d + 1, i)))
    }
    // a: 1,1,1,5,5,5 -> U = -3,-6,-9,-6,-3 (t<6), K=9 at t=3,
    //    p = 2 exp(-486/252) = 0.290711
    // b: 2,2,2,2 constant -> K=0 everywhere, first-day tie-break, p 1
    // c: 1,5,2,6,3,7,4,8 sawtooth -> K=11 at t=3, p 0.567072
    val ev = (series("a", Seq(1, 1, 1, 5, 5, 5)) ++ series("b", Seq(2, 2, 2, 2))
      ++ series("c", Seq(1, 5, 2, 6, 3, 7, 4, 8))).toDF("event_type", "ts")
    val out = Events.pettitt(ev, "event_type", "ts").collect()
    // series position t maps to epoch day t (t=1 -> 1970-01-02), so the
    // t=3 break reads calendar day-of-month 4
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDate(3).toLocalDate.getDayOfMonth, r.getDouble(4))).toSeq == Seq(
      ("a", 6L, 9L, 4, 0.290711), ("b", 4L, 0L, 2, 1.0),
      ("c", 8L, 11L, 4, 0.567072)), s"got ${out.mkString("; ")}")
  }

  test("acfDaily: hand-computed lag correlations per type, zero-variance series reads NULL") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400L + i) * 1000L)
    def series(tpe: String, vals: Seq[Int]) = vals.zipWithIndex.flatMap {
      case (n, d) => (0 until n).map(i => (tpe, ts(d + 1, i)))
    }
    // a: 1,2,3,4 -> r1 1.25/5, r2 -1.5/5, r3 -2.25/5
    // b: 1,3,1,3 alternating -> r1 -0.75, r2 0.5, r3 -0.25
    // c: 5,5,5 constant -> zero variance, r NULL at every lag
    val ev = (series("a", Seq(1, 2, 3, 4)) ++ series("b", Seq(1, 3, 1, 3))
      ++ series("c", Seq(5, 5, 5))).toDF("event_type", "ts")
    val out = Events.acfDaily(ev, "event_type", "ts", maxLag = 3).collect()
    val byKey = out.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(byKey(("a", 1L)) == ((3L, 0.25)) && byKey(("a", 2L)) == ((2L, -0.3))
      && byKey(("a", 3L)) == ((1L, -0.45)), s"got ${out.mkString("; ")}")
    assert(byKey(("b", 1L)) == ((3L, -0.75)) && byKey(("b", 2L)) == ((2L, 0.5))
      && byKey(("b", 3L)) == ((1L, -0.25)))
    assert(byKey(("c", 1L))._2 == null && byKey(("c", 2L))._2 == null)
    // c has 3 days -> lag 3 has zero pairs -> the row is absent entirely
    assert(!byKey.contains(("c", 3L)))
    assert(out.length == 8, s"expected 8 (3+3+2) rows, got ${out.length}")
  }

  test("ljungBox: pooled Q matches hand-computed ACF terms, degenerate series reads NULL") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400L + i) * 1000L)
    def series(tpe: String, vals: Seq[Int]) = vals.zipWithIndex.flatMap {
      case (n, d) => (0 until n).map(i => (tpe, ts(d + 1, i)))
    }
    // a: r = (0.25, -0.3, -0.45), n=4 -> Q = 4*6*(r1²/3 + r2²/2 + r3²/1)
    // b: r = (-0.75, 0.5, -0.25)     -> Q = 24*0.375 = 9.0
    // c: constant -> every r NULL and lag 3 absent -> Q NULL, m = 0
    val ev = (series("a", Seq(1, 2, 3, 4)) ++ series("b", Seq(1, 3, 1, 3))
      ++ series("c", Seq(5, 5, 5))).toDF("event_type", "ts")
    val out = Events.ljungBox(ev, "event_type", "ts", maxLag = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    assert(out("a") == ((4L, 3L, 6.44)), s"got ${out("a")}")
    assert(out("b") == ((4L, 3L, 9.0)), s"got ${out("b")}")
    assert(out("c") == ((3L, 0L, null)), s"got ${out("c")}")
  }

  test("durbinWatson: alternating residuals read DW near 4, perfect trend reads NULL") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400L + i) * 1000L)
    def series(tpe: String, vals: Seq[Int]) = vals.zipWithIndex.flatMap {
      case (n, d) => (0 until n).map(i => (tpe, ts(d + 1, i)))
    }
    // a: 1,2,3,4 is a perfect line -> slope 1, zero residual energy -> NULL
    // b: 1,3,1,3 -> slope 0.4, e = (-.4, 1.2, -1.2, .4), DW = 10.88/3.2
    // c: constant -> slope 0, zero residuals -> NULL
    val ev = (series("a", Seq(1, 2, 3, 4)) ++ series("b", Seq(1, 3, 1, 3))
      ++ series("c", Seq(5, 5, 5))).toDF("event_type", "ts")
    val out = Events.durbinWatson(ev, "event_type", "ts").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    assert(out("a") == ((4L, 1.0, null)), s"got ${out("a")}")
    assert(out("b") == ((4L, 0.4, 3.4)), s"got ${out("b")}")
    assert(out("c") == ((3L, 0.0, null)), s"got ${out("c")}")
  }

  test("wilcoxonSignedRank + signTest: hand-computed paired day diffs, zeros drop, ties average") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400L + i) * 1000L)
    def burst(tpe: String, day: Int, n: Int) =
      (0 until n).map(i => (tpe, ts(day, i)))
    // day: A,B = (3,1)(1,1)(0,2)(5,1)(1,3) -> d = +2, 0(drop), -2, +4, -2
    // |d| ranks: three 2s share rank 2, the 4 gets rank 4
    // W+ = 2 + 4 = 6, mu = 5, var = 7.5 - 24/48 = 7 -> z = 1/sqrt(7)
    val ev = (burst("A", 1, 3) ++ burst("B", 1, 1) ++ burst("A", 2, 1)
      ++ burst("B", 2, 1) ++ burst("B", 3, 2) ++ burst("A", 4, 5)
      ++ burst("B", 4, 1) ++ burst("A", 5, 1) ++ burst("B", 5, 3))
      .toDF("event_type", "ts")
    val w = Events.wilcoxonSignedRank(ev, "A", "B").head()
    assert((w.getLong(0), w.getLong(1), w.getDouble(2), w.getDouble(3)) ==
      ((5L, 4L, 6.0, 0.377964)), s"got $w")
    val s = Events.signTest(ev, "A", "B").head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3),
      s.getDouble(4)) == ((5L, 4L, 2L, 2L, 0.0)), s"got $s")
    // identical series: every diff is zero -> n = 0, NULL statistics
    val same = (burst("A", 1, 2) ++ burst("B", 1, 2)).toDF("event_type", "ts")
    val w0 = Events.wilcoxonSignedRank(same, "A", "B").head()
    assert(w0.getLong(0) == 1L && w0.getLong(1) == 0L && w0.isNullAt(2)
      && w0.isNullAt(3), s"got $w0")
  }

  test("friedmanTest: hand-computed chi2/W, within-day ties corrected, absent type-days count 0") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400L + i) * 1000L)
    def burst(tpe: String, day: Int, n: Int) =
      (0 until n).map(i => (tpe, ts(day, i)))
    // volumes: d1 a1 b2 c3; d2 a1 b2 c3; d3 a3 b2 c1; d4 a2 b2 c2 (tied)
    // rank sums: a 7, b 8, c 9 -> ssbn 194; chi_u = 12·194/48 − 48 = 0.5
    // tie term day4: 3³−3 = 24 -> c = 1 − 24/96 = 0.75
    // chi2 = 0.5/0.75 = 0.666667; W = chi2/(4·2) = 0.083333
    val ev = (burst("a", 1, 1) ++ burst("b", 1, 2) ++ burst("c", 1, 3)
      ++ burst("a", 2, 1) ++ burst("b", 2, 2) ++ burst("c", 2, 3)
      ++ burst("a", 3, 3) ++ burst("b", 3, 2) ++ burst("c", 3, 1)
      ++ burst("a", 4, 2) ++ burst("b", 4, 2) ++ burst("c", 4, 2))
      .toDF("event_type", "ts")
    val f = Events.friedmanTest(ev).head()
    assert((f.getLong(0), f.getLong(1), f.getDouble(2), f.getDouble(3)) ==
      ((4L, 3L, 0.666667, 0.083333)), s"got $f")
    // a type absent on a day is a volume-0 measurement, not a lost block:
    // dropping c's day-1 events keeps 4 complete blocks of 3
    val sparse = ev.filter(!(col("event_type") === "c"
      && to_date(col("ts")) === java.sql.Date.valueOf("1970-01-01")))
    val g = Events.friedmanTest(sparse).head()
    assert(g.getLong(0) == 4L && g.getLong(1) == 3L && !g.isNullAt(2), s"got $g")
    // all types identical every day: chi2 degenerates to NULL via the
    // tie divisor (every within-day rank tied)
    val flat = (burst("a", 1, 2) ++ burst("b", 1, 2)
      ++ burst("a", 2, 2) ++ burst("b", 2, 2)).toDF("event_type", "ts")
    val h = Events.friedmanTest(flat).head()
    assert(h.isNullAt(2) && h.isNullAt(3), s"got $h")
  }

  test("pageTrendTest: hand-computed L and z, perfect ordering maximizes L") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      (day.toLong * 86400L + i) * 1000L)
    def burst(tpe: String, day: Int, n: Int) =
      (0 until n).map(i => (tpe, ts(day, i)))
    // volumes d1/d2: a1 b2 c3; d3: a3 b2 c1 -> rank sums a 5, b 6, c 7
    // L = 1·5 + 2·6 + 3·7 = 38; E = 3·3·16/4 = 36; Var = 3·9·4·8/144 = 6
    // z = 2/sqrt(6) = 0.816497
    val ev = (burst("a", 1, 1) ++ burst("b", 1, 2) ++ burst("c", 1, 3)
      ++ burst("a", 2, 1) ++ burst("b", 2, 2) ++ burst("c", 2, 3)
      ++ burst("a", 3, 3) ++ burst("b", 3, 2) ++ burst("c", 3, 1))
      .toDF("event_type", "ts")
    val p = Events.pageTrendTest(ev).head()
    assert((p.getLong(0), p.getLong(1), p.getDouble(2), p.getDouble(3)) ==
      ((3L, 3L, 38.0, 0.816497)), s"got $p")
    // perfectly ordered every day: L hits its max n·k(k+1)(2k+1)/6 = 42
    val mono = (burst("a", 1, 1) ++ burst("b", 1, 2) ++ burst("c", 1, 3)
      ++ burst("a", 2, 1) ++ burst("b", 2, 2) ++ burst("c", 2, 3)
      ++ burst("a", 3, 1) ++ burst("b", 3, 2) ++ burst("c", 3, 3))
      .toDF("event_type", "ts")
    val q = Events.pageTrendTest(mono).head()
    assert(q.getDouble(2) == 42.0 && q.getDouble(3) > p.getDouble(3), s"got $q")
  }

  test("rfmSegments: quintile scores bounded, monotone in the metric, code composes") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // 10 customers, increasing frequency/monetary, decreasing recency
    val orders = (1 to 10).flatMap { c =>
      (1 to c).map(i => (c.toLong, d(f"2024-01-${c}%02d"), c * 100.0 + i))
    }.toDF("cust", "odate", "price")
    val out = graft.functions.Events.rfmSegments(orders, "cust", "odate", "price")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out.size == 10)
    out.values.foreach { case (r, f, m, code) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
      assert(code == r * 100 + f * 10 + m)
    }
    // customer 10 ordered most, most recently, for the most: all-5 champion
    assert(out(10L) == ((5L, 5L, 5L, 555L)), s"got ${out(10L)}")
    // customer 1: one old cheap order: all-1 lost
    assert(out(1L) == ((1L, 1L, 1L, 111L)), s"got ${out(1L)}")
    // frequency scores never decrease as order counts increase
    val fseq = (1 to 10).map(c => out(c.toLong)._2)
    assert(fseq == fseq.sorted, s"f monotone: $fseq")
  }

  test("kaplanMeier: hand-computed curve, censored users leave the risk set without dropping S") {
    import spark.implicits._
    def ts(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    // corpus end = day 20 (u99's last). censorDays=7: churned iff last <= 13.
    // lifetimes/status: u1 0d churn, u2 0d churn, u3 2d churn, u4 3d censored
    // (last=day 18), u5 3d churn, u99 5d censored (last=end)
    val ev = Seq(
      (1L, 1), (2L, 3), (3L, 5), (3L, 7), (4L, 15), (4L, 18),
      (5L, 2), (5L, 5), (99L, 15), (99L, 20)
    ).toDF("user_id", "day").select(col("user_id"),
      expr("timestamp_millis(CAST(day AS LONG) * 86400000)").as("ts"))
    val out = Events.kaplanMeier(ev, "user_id", "ts", censorDays = 7)
      .orderBy(col("t_days")).collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4))).toSeq == Seq(
      (0, 6L, 2L, 0L, 0.666667), (2, 4L, 1L, 0L, 0.5),
      (3, 3L, 1L, 1L, 0.333333), (5, 1L, 0L, 1L, 0.333333)),
      s"got ${out.mkString("; ")}")
    // risk set extinguishes: u3 censored out at t=10, u4 (the only user
    // left at risk) churns at t=12 -> d = n there, curve reads an exact 0
    // (the extinction flag, never ln(0))
    val dead = Seq((3L, 10), (3L, 20), (4L, 0), (4L, 12)).toDF("user_id", "day")
      .select(col("user_id"),
        expr("timestamp_millis(CAST(day AS LONG) * 86400000)").as("ts"))
    val s0 = Events.kaplanMeier(dead, "user_id", "ts", censorDays = 7)
      .orderBy(col("t_days")).collect()
    assert(s0.map(_.getDouble(4)).toSeq == Seq(1.0, 0.0), s0.mkString("; "))
  }

  test("logRank: hand-computed O/E/z against pooled risk sets, identical cohorts read z=0") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Int)]) = rows.toDF("user_id", "day")
      .select(col("user_id"),
        expr("timestamp_millis(CAST(day AS LONG) * 86400000)").as("ts"))
    // corpus end = day 30; censor 7 -> churn iff last <= 22
    // arm a lifetimes: (0 churn), (2 churn), (5 censored)
    val a = mk(Seq((2L, 1), (4L, 1), (4L, 3), (6L, 24), (6L, 29)))
    // arm b: (0 churn), (3 censored), (3 churn), (5 censored w/ last=end)
    val b = mk(Seq((1L, 2), (3L, 25), (3L, 28), (5L, 5), (5L, 8),
      (13L, 25), (13L, 30)))
    val row = Events.logRank(a, b, "user_id", "ts", censorDays = 7).head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 4L && row.getLong(2) == 2L)
    assert(row.getDouble(3) == 1.5071, s"e_a ${row.getDouble(3)}")
    assert(math.abs(row.getDouble(4) - 0.539145) < 1e-6, s"z ${row.getDouble(4)}")
    // a cohort against itself: O = E exactly -> z = 0
    val same = Events.logRank(b, b, "user_id", "ts", censorDays = 7).head()
    assert(same.getDouble(4) == 0.0)
  }

  test("cadence: metronomic user flags robotic, irregular human does not") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // bot: 12 events exactly 60s apart (std 0); human: irregular gaps
    val bot = (0 until 12).map(i => (1L, ts(i * 60L), (100 + i).toLong))
    val human = Seq(0L, 30L, 100L, 400L, 500L, 1200L, 1300L, 2000L, 2100L,
      3000L, 3500L, 5000L).zipWithIndex.map { case (s, i) => (2L, ts(s), (200 + i).toLong) }
    val ev = (bot ++ human).toDF("user_id", "ts", "event_id")
    val out = Events.cadence(ev, "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    val (n1, g1, m1, s1, rob1) = out(1L)
    assert(n1 == 12 && g1 == 11 && m1 == 60.0 && s1 == 0.0 && rob1)
    val (_, _, _, s2, rob2) = out(2L)
    assert(s2 > 0.0 && !rob2, s"human flagged robotic: $s2")
    // a single-event user has no gaps and drops out
    val single = Events.cadence(Seq((9L, ts(0), 1L)).toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "event_id")
    assert(single.count() == 0)
  }

  test("retention: cohorts by first day, offsets count distinct active users") {
    import spark.implicits._
    val day = 86400000000L // micros
    val ev = Seq(
      // users 1,2 start day 0; user 1 returns day 1 and day 3, user 2 never
      (1L, 0L), (1L, day), (1L, 3 * day), (1L, 3 * day + 1000L),
      (2L, 500L),
      // user 3 starts day 1, returns day 2
      (3L, day), (3L, 2 * day)
    ).toDF("user_id", "t").withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val out = Events.retention(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("1970-01-01", 0) -> 2L, ("1970-01-01", 1) -> 1L, ("1970-01-01", 3) -> 1L,
      ("1970-01-02", 0) -> 1L, ("1970-01-02", 1) -> 1L),
      s"got $out")
  }

  test("stickiness: trailing-window distinct users, DAU/WAU ratio") {
    import spark.implicits._
    val day = 86400000000L
    val ev = Seq(
      // day 0: users 1,2; day 1: user 1; day 3: user 3
      (1L, 0L), (2L, 1000L), (1L, day), (3L, 3 * day)
    ).toDF("user_id", "t").withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val out = Events.stickiness(ev, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // WAU(day d) counts users active in [d-6, d]: all prior activity is
    // within 7 days of every later day here
    assert(out("1970-01-01") == ((2L, 2L, 1.0)))
    assert(out("1970-01-02") == ((1L, 2L, 0.5)))
    assert(out("1970-01-04") == ((1L, 3L, 0.333333)))
  }

  test("lastTouchAttribution: nearest preceding non-conversion wins, none for cold starts") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view then click then purchase -> click credited
      (1L, 1L, "view", 10L), (2L, 1L, "click", 20L), (3L, 1L, "purchase", 30L),
      // user 1 again: second purchase with no new touch -> still click
      (4L, 1L, "purchase", 40L),
      // user 2: purchase with no preceding events -> none
      (5L, 2L, "purchase", 10L),
      // user 3: same-timestamp tie broken by event id (view id 6 < purchase id 7)
      (6L, 3L, "view", 10L), (7L, 3L, "purchase", 10L)
    ).toDF("event_id", "user_id", "event_type", "t")
      .withColumn("ts", timestamp_micros(col("t") * 1000L)).drop("t")
    val out = Events.lastTouchAttribution(ev, "user_id", "event_type", "ts",
        "event_id", "purchase")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("click" -> 2L, "none" -> 1L, "view" -> 1L), s"got $out")
  }

  test("sessionize: gap splits, ordinals per user, strict rollup") {
    import spark.implicits._
    val min = 60000000L // micros
    val ev = Seq(
      // user 1: two sessions — 0..29min (3 events), then a 31-min gap
      (1L, 1L, 0L), (2L, 1L, 10 * min), (3L, 1L, 29 * min),
      (4L, 1L, 60 * min), (5L, 1L, 70 * min),
      // user 2: exactly-30-min gap does NOT split (strict >)
      (6L, 2L, 0L), (7L, 2L, 30 * min)
    ).toDF("event_id", "user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val out = Events.sessionize(ev, "user_id", "ts", "event_id", gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getTimestamp(2).getTime, r.getTimestamp(3).getTime, r.getLong(4))).toMap
    assert(out.size == 3)
    assert(out((1L, 1L)) == ((0L, 29 * 60000L, 3L)))
    assert(out((1L, 2L)) == ((60 * 60000L, 70 * 60000L, 2L)))
    assert(out((2L, 1L)) == ((0L, 30 * 60000L, 2L)), "a gap of exactly 30min must not split")
  }

  test("dailyAnomalies: spike day flags, constant type reads z 0") {
    import spark.implicits._
    val day = 86400000000L
    // 'click': nine days of 10 then a day of 50 -> z = 3, a >2σ spike
    // 'view': constant 7 -> std 0, z 0, never anomalous
    val rows =
      (0 until 9).flatMap(d => Seq.fill(10)(("click", d.toLong * day))) ++
        Seq.fill(50)(("click", 9L * day)) ++
        (0 until 4).flatMap(d => Seq.fill(7)(("view", d.toLong * day)))
    val ev = rows.toDF("event_type", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val out = Events.dailyAnomalies(ev, "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out.size == 14)
    // click: mean 14, var = (9·100 + 2500)/10 − 196 = 144, std 12, z 3
    val spike = out(("click", "1970-01-10"))
    assert(spike._1 == 50L && spike._3, s"spike day must flag: $spike")
    assert(math.abs(spike._2 - 3.0) < 1e-6)
    assert((0 until 9).forall(d => !out(("click", s"1970-01-0${d + 1}"))._3))
    assert((0 until 4).forall { d =>
      val v = out(("view", s"1970-01-0${d + 1}"))
      v._2 == 0.0 && !v._3
    })
  }

  test("rollingDailyStats: rows-semantics trailing mean, per-type isolation") {
    import spark.implicits._
    val day = 86400000000L
    // 'a': counts 2,4,6 on days 0,1,3 (day 2 absent — rows semantics: the
    // window spans observed days only); 'b': a single day
    val rows = Seq.fill(2)(("a", 0L)) ++ Seq.fill(4)(("a", day)) ++
      Seq.fill(6)(("a", 3 * day)) ++ Seq.fill(5)(("b", 0L))
    val ev = rows.toDF("event_type", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val out = Events.rollingDailyStats(ev, "event_type", "ts", window = 2)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("a", "1970-01-01")) == ((2L, 1L, 2.0)))
    assert(out(("a", "1970-01-02")) == ((4L, 2L, 3.0)))
    // day 4's window reaches back to day 2 (the previous OBSERVED day)
    assert(out(("a", "1970-01-04")) == ((6L, 2L, 5.0)))
    assert(out(("b", "1970-01-01")) == ((5L, 1L, 5.0)))
  }

  test("funnelLatency: per-transition count/mean/p50 from the step chain") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "signup", 30L), (1L, "purchase", 40L),
      (2L, "view", 10L), (2L, "click", 15L)
    ).toDF("user_id", "event_type", "t")
      .withColumn("ts", timestamp_micros(col("t") * 1000000L)).drop("t")
    val out = Events.funnelLatency(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "signup", "purchase"), width = 4.0)
      .collect().map(r => r.getString(1) ->
        (r.getInt(0), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // view->click: users 1 (10s) and 2 (5s): mean 7.5; bins(4s): {1:1, 2:1},
    // p50 = first bin reaching cum 1 -> bin 1 -> hi = 8.0
    assert(out("view->click") == ((1, 2L, 7.5, 8.0)), s"got $out")
    assert(out("click->signup") == ((2, 1L, 10.0, 12.0)))
    assert(out("signup->purchase") == ((3, 1L, 10.0, 12.0)))
  }

  test("transitions: user-isolated lead pairs, row probabilities sum to 1") {
    import spark.implicits._
    val ev = Seq(
      // user 1: a -> b -> a -> c
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L), (1L, "c", 40L, 4L),
      // user 2: b -> a; the cross-user boundary (1's c, 2's b) must NOT pair
      (2L, "b", 5L, 5L), (2L, "a", 15L, 6L),
      // user 3: single event — contributes no hop
      (3L, "c", 10L, 7L),
      // user 4: same-ts tie broken by event id: a(8) -> b(9)
      (4L, "a", 50L, 8L), (4L, "b", 50L, 9L)
    ).toDF("user_id", "event_type", "t", "event_id")
      .withColumn("ts", timestamp_micros(col("t") * 1000000L)).drop("t")
    val out = Events.transitions(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      ("a", "b") -> (2L, 0.666667), ("a", "c") -> (1L, 0.333333),
      ("b", "a") -> (2L, 1.0)), s"got $out")
    // per-from probabilities must sum to ~1
    val sums = out.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._2).sum)
    assert(sums.forall { case (_, s) => math.abs(s - 1.0) < 1e-4 })
  }

  test("seasonalForecast: lag-period prediction, hand-computed MAE/MAPE, lone days drop") {
    import spark.implicits._
    def day(d: Int, k: Int) = (0 until k).map(i => ("a", d.toLong * 86400L + i))
    // type a: 4 events on day 1, 6 on day 8, 5 on day 15
    // forecasts: day8 <- 4 (ae 2), day15 <- 6 (ae 1)
    val rows = day(1, 4) ++ day(8, 6) ++ day(15, 5) ++
      Seq(("b", 86400L)) // type b: single day, nothing to score
    val ev = rows.toDF("event_type", "t")
      .withColumn("ts", timestamp_micros(col("t") * 1000000L)).drop("t")
    val out = Events.seasonalForecast(ev, "event_type", "ts", period = 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // mae = (2+1)/2 = 1.5; mape = (2/6 + 1/5)/2 -> 0.2667 at 4dp
    assert(out == Map("a" -> (2L, 1.5, 0.2667)), s"got $out")
    // a period with no matching history scores nothing
    assert(Events.seasonalForecast(ev, "event_type", "ts", period = 3).count() == 0)
  }

  test("entryPaths: first-k prefix per user, tie-break by id, short histories kept") {
    import spark.implicits._
    val ev = Seq(
      // user 1: a -> b -> c -> d (4th event must not enter a depth-3 path)
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "c", 30L, 3L), (1L, "d", 40L, 4L),
      // user 2: same prefix a -> b -> c
      (2L, "a", 5L, 5L), (2L, "b", 6L, 6L), (2L, "c", 7L, 7L),
      // user 3: short history — depth-2 path
      (3L, "b", 10L, 8L), (3L, "a", 20L, 9L),
      // user 4: same-ts tie broken by event id: a(10) then b(11)
      (4L, "a", 50L, 10L), (4L, "b", 50L, 11L), (4L, "a", 60L, 12L)
    ).toDF("user_id", "event_type", "t", "event_id")
      .withColumn("ts", timestamp_micros(col("t") * 1000000L)).drop("t")
    val out = Events.entryPaths(ev, "user_id", "event_type", "ts", "event_id", depth = 3)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out == Map(
      "a>b>c" -> (3, 2L), // users 1 and 2
      "b>a" -> (2, 1L), // user 3's whole (short) history
      "a>b>a" -> (3, 1L)), s"got $out") // user 4, tie-broken by id
  }

  test("funnel on the corpus: counts monotone down the funnel") {
    val ev = table("events")
    val out = Events.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "signup", "purchase")).cache()
    assert(out.count() == ev.select("user_id").distinct().count())
    val reached = (1 to 4).map(i => out.filter(col("steps_completed") >= i).count())
    assert(reached == reached.sorted.reverse, s"funnel counts must shrink: $reached")
    // null pattern consistent with the completion count
    assert(out.filter(col("steps_completed") >= 2 && col("step_2_ts").isNull).count() == 0)
    assert(out.filter(col("steps_completed") < 4 && col("step_4_ts").isNotNull).count() == 0)
    out.unpersist()
  }

  test("interarrivalHistogram: gaps isolated per (user, type), tail capped") {
    import spark.implicits._
    val min = 60000000L // micros
    val ev = Seq(
      // user 1 clicks at 0, 5min, 25min → gaps of 5min (bucket 0) and
      // 20min (bucket 2); its lone view contributes no gap
      (1L, 1L, "click", 0L), (2L, 1L, "click", 5 * min), (3L, 1L, "click", 25 * min),
      (4L, 1L, "view", 2 * min),
      // user 2's click at 3min must NOT pair with user 1's stream;
      // a 30-hour gap caps at the overflow bucket
      (5L, 2L, "click", 3 * min), (6L, 2L, "click", 3 * min + 1800 * min)
    ).toDF("event_id", "user_id", "event_type", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val out = Events.interarrivalHistogram(ev, "user_id", "event_type", "ts",
        "event_id", widthSeconds = 600L, capBuckets = 144)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("click", 0L) -> ((0L, 1L)),
      ("click", 2L) -> ((1200L, 1L)),
      ("click", 144L) -> ((86400L, 1L))), s"got $out")
  }
}
