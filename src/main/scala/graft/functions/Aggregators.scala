package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator

/** Group-by aggregators.
  *
  * Reference: pygrametl/aggregators.py — `Sum`, `Count`, `CountDistinct`
  * (exact, per-group set), `Max`, `Min`, `Avg`, each a `process/finish` state
  * machine keyed by group. Spark-first these are the built-in hash aggregates
  * (partial map-side combine + final merge — the scalable form of the
  * reference's per-group dict). `CountDistinct` is exact like the reference
  * (aggregators.py:82-91); `approxCountDistinct` is the 100 TB-scale option
  * (HLL sketch, one pass, no distinct shuffle).
  */
object Aggregators {
  def sum_(c: Column): Column = sum(c)
  def count_(c: Column): Column = count(c)
  def countDistinct_(c: Column): Column = count_distinct(c)
  def approxCountDistinct(c: Column, rsd: Double = 0.05): Column = approx_count_distinct(c, rsd)
  def max_(c: Column): Column = max(c)
  def min_(c: Column): Column = min(c)
  def avg_(c: Column): Column = avg(c)

  /** groupBy + aggregate in one call — the `AggregatingStep`/`Aggregator`
    * protocol collapsed into a plan (reference: steps.py:467-561).
    */
  def aggregate(df: DataFrame, groupCols: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
}

/** The custom-aggregator extension point: reference `Aggregator.process /
  * finish` (aggregators.py:49-54) maps to
  * `org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT]` — a typed,
  * mergeable (hence distributed) state machine. GeometricMean is the worked
  * example; register with `functions.udaf` for SQL use.
  */
object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
  def zero: (Double, Long) = (0.0, 0L)
  def reduce(b: (Double, Long), a: Double): (Double, Long) =
    if (a > 0) (b._1 + math.log(a), b._2 + 1) else b
  def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) = (x._1 + y._1, x._2 + y._2)
  def finish(b: (Double, Long)): Double = if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
