package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.tables._

class ScdSpec extends SparkSpec {

  private def freshScd2() = {
    val ev = table("events")
    val dim = new ScdDimension("user_scd", "user_key",
      Seq("user_id", "event_type", "version", "valid_from", "valid_to"),
      Seq("user_id"), "version", "valid_from", "valid_to",
      maxTo = lit(null).cast(TimestampType))
    dim.init(ev.select(lit(0L).as("user_key"), col("user_id"), col("event_type"),
      lit(1).as("version"), col("ts").as("valid_from"), col("ts").as("valid_to")).limit(0))
    dim
  }

  test("scd2 invariants: contiguous versions, one open version, no overlap") {
    val dim = freshScd2()
    dim.scdensure(table("events").select(col("user_id"), col("event_type"), col("ts")), col("ts"))
    val d = dim.current.cache()
    // exactly one open (valid_to IS NULL) version per member
    val open = d.filter(col("valid_to").isNull)
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(open == 0)
    // versions are 1..n contiguous
    val bad = d.groupBy("user_id")
      .agg(min("version").as("mn"), max("version").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n")).count()
    assert(bad == 0)
    // intervals chain: valid_to of version v == valid_from of version v+1
    val a = d.select(col("user_id"), col("version"), col("valid_to"))
    val b = d.select(col("user_id"), (col("version") - 1).as("version"),
      col("valid_from").as("next_from"))
    val broken = a.join(b, Seq("user_id", "version"))
      .filter(!(col("valid_to") <=> col("next_from"))).count()
    assert(broken == 0)
    // consecutive versions differ in the tracked attribute
    val c = d.select(col("user_id"), col("version"), col("event_type"))
    val nxt = d.select(col("user_id"), (col("version") - 1).as("version"),
      col("event_type").as("next_type"))
    val dup = c.join(nxt, Seq("user_id", "version"))
      .filter(col("event_type") === col("next_type")).count()
    assert(dup == 0)
    // keys unique
    assert(d.select("user_key").distinct().count() == d.count())
  }

  test("scd2 incremental == single batch (version structure)") {
    val ev = table("events")
    val single = freshScd2()
    single.scdensure(ev.select(col("user_id"), col("event_type"), col("ts")), col("ts"))
    val twoPhase = freshScd2()
    val mid = ev.agg(percentile_approx(col("ts"), lit(0.5), lit(100))).head().getTimestamp(0)
    twoPhase.scdensure(ev.filter(col("ts") <= mid)
      .select(col("user_id"), col("event_type"), col("ts")), col("ts"))
    twoPhase.scdensure(ev.filter(col("ts") > mid)
      .select(col("user_id"), col("event_type"), col("ts")), col("ts"))
    // same member/version/value/interval structure (keys may differ by batch order)
    val proj = Seq("user_id", "event_type", "version", "valid_from", "valid_to")
    val s1 = single.current.select(proj.map(col): _*).collect().toSet
    val s2 = twoPhase.current.select(proj.map(col): _*).collect().toSet
    assert(s1 == s2)
  }

  test("lookupAsOf finds the version valid at probe time") {
    val dim = freshScd2()
    dim.scdensure(table("events").select(col("user_id"), col("event_type"), col("ts")), col("ts"))
    // probing exactly at a version's valid_from returns that version's key
    val probes = dim.current.filter(col("version") === 2)
      .select(col("user_id"), col("valid_from").as("pts"), col("user_key").as("expected"))
    val out = dim.lookupAsOf(probes, col("pts"))
    assert(out.filter(col("user_key") =!= col("expected")).count() == 0)
  }

  test("closeCurrent closes only open versions") {
    val dim = freshScd2()
    dim.scdensure(table("events").select(col("user_id"), col("event_type"), col("ts")), col("ts"))
    val end = lit("2030-01-01 00:00:00").cast(TimestampType)
    dim.closeCurrent(end)
    assert(dim.current.filter(col("valid_to").isNull).count() == 0)
    assert(dim.current.filter(col("valid_to") === end).count() ==
      dim.current.select("user_id").distinct().count())
  }

  test("scd1 keeps one row per member with latest value") {
    val ev = table("events")
    val dim = new TypeOneScdDimension("u1", "user_key",
      Seq("user_id", "event_type"), Seq("user_id"), Seq("event_type"))
    dim.init(ev.select(lit(0L).as("user_key"), col("user_id"), col("event_type")).limit(0))
    dim.scdensure(ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id")),
      struct(col("ts"), col("event_id")))
    val d = dim.current.cache()
    assert(d.groupBy("user_id").count().filter(col("count") =!= 1).count() == 0)
    // value matches the last event per user
    val last = ev.withColumn("rn", expr(
      "row_number() over (partition by user_id order by ts desc, event_id desc)"))
      .filter(col("rn") === 1).select(col("user_id"), col("event_type").as("expected"))
    assert(d.join(last, "user_id").filter(col("event_type") =!= col("expected")).count() == 0)
  }

  test("accumulating fact merge: nulls never clobber") {
    import spark.implicits._
    val fact = new AccumulatingSnapshotFactTable("acc", Seq("id"), Seq("ref"), Seq("m"))
    fact.init(Seq((1L, "r1", 10.0), (2L, null.asInstanceOf[String], 20.0))
      .toDF("id", "ref", "m"))
    fact.merge(Seq((1L, null.asInstanceOf[String], 99.0), (3L, "r3", 30.0))
      .toDF("id", "ref", "m"))
    val m = fact.current.collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(m(1L) == ("r1", 99.0)) // null ref ignored, measure updated
    assert(m(2L) == (null, 20.0)) // untouched
    assert(m(3L) == ("r3", 30.0)) // inserted
  }

  test("fact ensure compare=true raises on measure mismatch") {
    import spark.implicits._
    val fact = new FactTable("f", Seq("id"), Seq("m"))
    fact.init(Seq((1L, 10.0)).toDF("id", "m"))
    fact.ensure(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "m"), compare = true)
    assert(fact.current.count() == 2)
    intercept[IllegalArgumentException] {
      fact.ensure(Seq((1L, 11.0)).toDF("id", "m"), compare = true)
    }
  }
}
