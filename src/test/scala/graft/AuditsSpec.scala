package graft

import org.apache.spark.sql.functions._
import graft.functions.{Audits, Events}

/** Referential-integrity / reconciliation audits + basket & cohort
  * analytics on constructed frames with hand-checked verdicts.
  */
class AuditsSpec extends SparkSpec {

  test("fkAudit: orphans, childless parents, and rates from hand-built tables") {
    import spark.implicits._
    // children: keys 1,1,2,3(orphan),null(orphan); parents: 1,2,4(childless)
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(3L), None).toDF("fk")
    val parent = Seq(1L, 2L, 4L).toDF("pk")
    val r = Audits.fkAudit(child, "fk", parent, "pk").head()
    assert(r.getLong(0) == 5L, s"child rows: $r")
    assert(r.getLong(1) == 4L, s"child keys (null is a key group): $r")
    assert(r.getLong(2) == 2L, s"orphan rows (3 and null): $r")
    assert(r.getLong(3) == 2L, s"orphan keys: $r")
    assert(r.getLong(4) == 3L && r.getLong(5) == 1L, s"parents: $r")
    assert(r.getDouble(6) == 0.4, s"rate: $r")
  }

  test("reconcileSum: exact-decimal diffs, tolerance verdicts, missing children") {
    import spark.implicits._
    val parent = Seq((1L, 10.00), (2L, 20.00), (3L, 5.00)).toDF("k", "total")
    // child sums: k1 = 10.00 (match), k2 = 19.98 (off by 2 cents), k3 absent
    val child = Seq((1L, 4.0), (1L, 6.0), (2L, 9.99), (2L, 9.99)).toDF("k", "amt")
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val r = Audits.reconcileSum(parent, "k", col("total"),
      child, "k", col("amt").cast(dec), tol = 0.01).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 2L, 1L, 1L, 1L)), s"got $r")
    assert(r.getDouble(5) == 0.02, s"max diff: $r")
  }

  test("basketPairs: supports/confidence/lift hand-checked, mega-basket capped") {
    import spark.implicits._
    // baskets: {a,b} x3, {a,c}, {b,c}, {a}, plus a degenerate 4-item basket
    val rows = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (4L, "a"), (4L, "c"), (5L, "b"), (5L, "c"), (6L, "a"),
      (7L, "w"), (7L, "x"), (7L, "y"), (7L, "z"))
    val df = rows.toDF("basket", "item")
    val out = Events.basketPairs(df, "basket", "item",
      minSupport = 2, topN = 10, maxBasket = 3).collect()
    // only (a,b) reaches support 2+; basket 7 (4 items > cap) generates none
    assert(out.length == 1, s"got ${out.mkString(",")}")
    val r = out.head
    // n=6 capped baskets hold items; s_ab=3, s_a=5, s_b=4
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 3L && r.getLong(3) == 5L && r.getLong(4) == 4L)
    assert(r.getDouble(5) == 0.6, s"confidence 3/5: $r")
    assert(r.getDouble(6) == 0.9, s"lift 3*6/(5*4): $r")
  }

  test("cohortLtv: ages from first-order month, cumulative revenue exact") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val orders = Seq(
      (1L, d("2024-01-05"), 10.0), (1L, d("2024-02-20"), 5.0),
      (1L, d("2024-03-01"), 2.5),
      (2L, d("2024-02-10"), 100.0), (2L, d("2024-02-11"), 50.0))
      .toDF("cust", "odate", "amt")
    val out = Events.cohortLtv(orders, "cust", "odate", "amt")
      .orderBy(col("cohort_month"), col("age_months")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 1L, 10.0, 10.0),
      ("2024-01-01", 1L, 1L, 5.0, 15.0),
      ("2024-01-01", 2L, 1L, 2.5, 17.5),
      ("2024-02-01", 0L, 1L, 150.0, 150.0)), s"got ${out.mkString(",")}")
  }
}
