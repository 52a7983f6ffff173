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
}
