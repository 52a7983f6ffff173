package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.tables._

/** SCD2 fidelity knobs mirrored from the reference
  * (pygrametl/tables.py:1046-1109, 1274-1421, 1486-1528 and
  * tests/tables/test_Dimension.py:1284-1689).
  */
class ScdFidelitySpec extends SparkSpec {
  import spark.implicits._

  private def mkScd(minFrom: Option[org.apache.spark.sql.Column] = None,
                    type1atts: Seq[String] = Nil,
                    type1LatestOnly: Set[String] = Set.empty,
                    orderingatt: Option[String] = None) = {
    val dim = new ScdDimension("scdf", "key",
      Seq("uid", "status", "city", "version", "vfrom", "vto"), Seq("uid"),
      "version", "vfrom", "vto", maxTo = lit(null).cast(TimestampType),
      type1atts = type1atts, minFrom = minFrom,
      type1LatestOnly = type1LatestOnly, orderingatt = orderingatt)
    dim.init(Seq.empty[(Long, String, String, String, Int, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("key", "uid", "status", "city", "version", "vfrom", "vto"))
    dim
  }

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("minfrom never leaks into the close time of an existing member's open row") {
    // degenerate-but-legal state: a NULL-version open row (user-initialized
    // data). The member's batch row is assigned version 1, so minFrom
    // rewrites its OPEN time — but the old row must still close at the REAL
    // first change time, not at minFrom.
    val dim = new ScdDimension("scdmf0", "key",
      Seq("uid", "status", "version", "vfrom", "vto"), Seq("uid"),
      "version", "vfrom", "vto", maxTo = lit(null).cast(TimestampType),
      minFrom = Some(lit(ts(0))))
    dim.init(Seq((1L, "u1", "old", "x"))
      .toDF("key", "uid", "status", "ig").select(col("key"), col("uid"), col("status"),
        lit(null).cast("int").as("version"),
        lit(ts(50)).as("vfrom"), lit(null).cast(TimestampType).as("vto")))
    dim.scdensure(Seq(("u1", "new", ts(500))).toDF("uid", "status", "ts"), col("ts"))
    val oldRow = dim.current.filter(col("key") === 1L).head()
    assert(oldRow.getTimestamp(oldRow.fieldIndex("vto")) == ts(500),
      s"old open row must close at the real change time, got ${oldRow}")
    // and the NEW row opens at the real change time too (minFrom applies only
    // to join-miss members) — otherwise the intervals would overlap
    val newRow = dim.current.filter(col("key") =!= 1L).head()
    assert(newRow.getTimestamp(newRow.fieldIndex("vfrom")) == ts(500),
      s"existing member's new version must not open at minFrom, got ${newRow}")
  }

  test("minfrom: first version of a new member opens at the configured value (incl. NULL)") {
    val dim = mkScd(minFrom = Some(lit(null)))
    val batch = Seq(
      ("u1", "a", "cph", ts(100)), ("u1", "b", "cph", ts(200)),
      ("u2", "a", "aal", ts(150))).toDF("uid", "status", "city", "ts")
    dim.scdensure(batch, col("ts"))
    val rows = dim.current.orderBy("uid", "version")
      .select("uid", "version", "vfrom", "vto").collect()
    // version 1 rows open at NULL (minfrom), later versions at their change time
    assert(rows.filter(_.getInt(1) == 1).forall(_.isNullAt(2)))
    val u1v2 = rows.find(r => r.getString(0) == "u1" && r.getInt(1) == 2).get
    assert(u1v2.getTimestamp(2) == ts(200))
    // v1's close time is still the REAL change time, not minfrom
    val u1v1 = rows.find(r => r.getString(0) == "u1" && r.getInt(1) == 1).get
    assert(u1v1.getTimestamp(3) == ts(200))
  }

  test("srcdate semantics: a new from-date alone forces a new version") {
    val dim = mkScd()
    val b1 = Seq(("u1", "a", "cph", ts(100))).toDF("uid", "status", "city", "ts")
    dim.scdensure(b1, col("ts"))
    // same attributes, later date: default keeps 1 version, srcdate makes 2
    val b2 = Seq(("u1", "a", "cph", ts(500))).toDF("uid", "status", "city", "ts")
    dim.scdensure(b2, col("ts"))
    assert(dim.current.count() == 1, "unchanged attributes must not version by default")
    dim.scdensure(b2, col("ts"), newVersionOnNewFrom = true)
    assert(dim.current.count() == 2, "a changed source date must force a new version")
    val closed = dim.current.filter(col("version") === 1).head()
    assert(closed.getAs[java.sql.Timestamp]("vto") == ts(500))
  }

  test("type-1 all-versions vs latest-only propagation") {
    val dim = mkScd(type1atts = Seq("city"), type1LatestOnly = Set.empty)
    val hist = Seq(
      ("u1", "a", "cph", ts(100)), ("u1", "b", "cph", ts(200)),
      ("u1", "c", "cph", ts(300))).toDF("uid", "status", "city", "ts")
    dim.scdensure(hist, col("ts"))
    // type-1 change only (city moves): no new version, all versions updated
    val t1 = Seq(("u1", "c", "aar", ts(400))).toDF("uid", "status", "city", "ts")
    dim.scdensure(t1, col("ts"))
    val d = dim.current
    assert(d.count() == 3, "type-1-only change must not create a version")
    assert(d.filter(col("city") === "aar").count() == 3, "updateall propagates to all versions")

    val dimL = mkScd(type1atts = Seq("city"), type1LatestOnly = Set("city"))
    dimL.scdensure(hist, col("ts"))
    dimL.scdensure(t1, col("ts"))
    val dl = dimL.current
    assert(dl.count() == 3)
    assert(dl.filter(col("city") === "aar").count() == 1, "latest-only touches newest version")
    assert(dl.filter(col("version") === 3).head().getAs[String]("city") == "aar")
  }

  test("orderingatt=toatt: newest version selected with NULL ranked first") {
    // versions whose vto is NULL (open) must win the newest-version race even
    // if version numbers were loaded out of order (reference NULLS FIRST)
    val dim = mkScd(orderingatt = Some("vto"))
    dim.init(Seq(
      (1L, "u1", "a", "cph", 7, ts(100), ts(200)),  // closed, odd version no.
      (2L, "u1", "b", "cph", 3, ts(200), null.asInstanceOf[java.sql.Timestamp]))
      .toDF("key", "uid", "status", "city", "version", "vfrom", "vto"))
    // unchanged vs the OPEN version (status=b) → no new version
    dim.scdensure(Seq(("u1", "b", "cph", ts(300))).toDF("uid", "status", "city", "ts"),
      col("ts"))
    assert(dim.current.count() == 2)
    // changed vs the open version → new version, closes the open one
    dim.scdensure(Seq(("u1", "c", "cph", ts(400))).toDF("uid", "status", "city", "ts"),
      col("ts"))
    assert(dim.current.count() == 3)
    assert(dim.current.filter(col("vto").isNull).count() == 1)
  }

  test("lookupAsOf interval-endpoint inclusivity flags (reference lookupasof)") {
    val dim = mkScd()
    dim.init(Seq(
      (1L, "u1", "a", "cph", 1, ts(100), ts(200)),
      (2L, "u1", "b", "cph", 2, ts(200), null.asInstanceOf[java.sql.Timestamp]))
      .toDF("key", "uid", "status", "city", "version", "vfrom", "vto"))
    val probe = Seq(("u1", ts(200))).toDF("uid", "pts")
    // default [from, to): the probe at the boundary belongs to the NEW version
    val def_ = dim.lookupAsOf(probe, col("pts")).select("key").head().getLong(0)
    assert(def_ == 2L)
    // (from, to]: the boundary belongs to the OLD version
    val alt = dim.lookupAsOf(probe, col("pts"),
      fromInclusive = false, toInclusive = true).select("key").head().getLong(0)
    assert(alt == 1L)
  }

  test("namemapping on scdensure resolves physical source columns") {
    val dim = mkScd()
    val batch = Seq(("u1", "a", "cph", ts(100)), ("u1", "b", "cph", ts(200)))
      .toDF("user", "st", "cty", "eventtime")
    dim.scdensure(batch, col("eventtime"),
      namemapping = Map("uid" -> "user", "status" -> "st", "city" -> "cty"))
    val d = dim.current
    assert(d.count() == 2)
    assert(d.filter(col("uid") === "u1" && col("status") === "b").count() == 1)
  }

  test("snowflake scdensure: child level ensured, SCD2 at root over the child's key") {
    val child = new Dimension("etype", "etype_key", Seq("etype"), Seq("etype"))
    child.init(Seq.empty[(Long, String)].toDF("etype_key", "etype"))
    val root = new ScdDimension("root", "key",
      Seq("uid", "etype_key", "version", "vfrom", "vto"), Seq("uid"),
      "version", "vfrom", "vto", maxTo = lit(null).cast(TimestampType))
    root.init(Seq.empty[(Long, String, Long, Int, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("key", "uid", "etype_key", "version", "vfrom", "vto"))
    val flake = new SnowflakedDimension(Seq(root.asInstanceOf[Dimension] -> Seq(child)))
    val batch = Seq(
      ("u1", "click", ts(100)), ("u1", "view", ts(200)), ("u1", "click", ts(300)),
      ("u2", "view", ts(150))).toDF("uid", "etype", "ts")
    flake.scdensure(batch, col("ts"))
    assert(child.current.count() == 2)
    val r = root.current.orderBy("uid", "version").collect()
    assert(r.length == 4) // u1: click→view→click, u2: view
    // root's type-2 attribute is the child's surrogate key
    val clickKey = child.current.filter(col("etype") === "click").head().getLong(0)
    assert(r(0).getAs[Long]("etype_key") == clickKey)
    // non-SCD root rejects scdensure
    val plain = new SnowflakedDimension(Seq(
      new Dimension("p", "k", Seq("a"), Seq("a")).asInstanceOf[Dimension] -> Seq(child)))
    intercept[IllegalArgumentException] { plain.scdensure(batch, col("ts")) }
  }
}
