package graft

import org.apache.spark.sql.functions._
import graft.plans.SketchFunctions

/** TypedImperativeAggregate frequent-items sketch (Misra–Gries). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def freq(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(SketchFunctions.freqItems(col("tok"), cap).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.token"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact counts when distinct keys fit the capacity, across partitions") {
    val df = spark.sparkContext.parallelize(
      Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(7)("c"), numSlices = 8)
      .toDF("tok")
    val got = freq(df, 16)
    assert(got == Map("a" -> 100L, "b" -> 60L, "c" -> 7L))
  }

  test("beyond capacity: bounded size and the heavy hitter survives") {
    // 500 distinct rare keys + one heavy hitter, capacity 8
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map(i => s"rare_$i") ++ Seq.fill(400)("heavy")
    val df = spark.sparkContext.parallelize(rnd.shuffle(rows), 8).toDF("tok")
    val got = freq(df, 8)
    assert(got.size <= 8, s"sketch exceeded capacity: ${got.size}")
    assert(got.contains("heavy"), "heavy hitter must survive Misra-Gries decrements")
    // estimates never overcount; undercount bounded by per-level n/capacity
    // decrements (update + merge-trim levels)
    assert(got("heavy") <= 400L && got("heavy") >= 400L - 2 * (900L / 8L))
  }
}
