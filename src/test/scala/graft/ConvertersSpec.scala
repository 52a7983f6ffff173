package graft

import org.apache.spark.sql.functions._
import graft.core.Converters

/** Failable converter edge semantics beyond the fn_converters oracle query
  * (which exercises the string hot path).
  */
class ConvertersSpec extends SparkSpec {

  test("getInt: numeric overflow yields the default, not a wrapped value") {
    import spark.implicits._
    val df = Seq(3000000000L, 5L).toDF("v")
    val out = df.select(Converters.getInt(col("v"), lit(-1)).as("i"))
      .collect().map(_.getInt(0)).toSet
    assert(out == Set(-1, 5), "long above Int.MaxValue must hit the default")
  }

  test("getInt: unparseable strings still take the exception-free path") {
    import spark.implicits._
    val df = Seq("42", "nope", "").toDF("s")
    val out = df.select(Converters.getInt(col("s"), lit(0)).as("i"))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(out == Seq(0, 0, 42))
  }

  test("getFloat: double input passes through; string parses or defaults") {
    import spark.implicits._
    val out = Seq(("1.5", 2.5)).toDF("s", "d")
      .select(Converters.getFloat(col("s")).as("a"), Converters.getFloat(col("d")).as("b"))
      .head()
    assert(out.getDouble(0) == 1.5 && out.getDouble(1) == 2.5)
  }
}
