package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix scans.
  *
  * `Window.orderBy(...)` with no partition spec moves EVERY row to one task
  * ("No Partition Defined" — the single-partition cliff this codebase bans),
  * yet running totals over a totally ordered frame are a real operator need
  * (vocabulary-growth curves, cumulative distributions, Lorenz curves). This
  * is the classic two-pass parallel scan (Blelloch 1990, "Prefix sums and
  * their applications") expressed in DataFrame ops, so Catalyst still sees
  * declarative plans.
  */
object Scans {

  /** Exact distributed running totals of `sumCols` in `orderCol` order —
    * the scale-safe replacement for an unpartitioned cumulative window.
    *
    * Plan shape: ONE `repartitionByRange(orderCol)` so each partition holds
    * a contiguous key range; per-partition running sums via a PARTITIONED
    * window; each partition's offset = the summed totals of all earlier
    * partitions, computed on the ≤`numPartitions`-row totals table with a
    * triangular self-join (bounded by CONFIG, not data — and no window at
    * all, so plan audits stay zero-warning) and broadcast back. Total cost:
    * one range shuffle of the frame + two tiny jobs — no single-partition
    * stage anywhere.
    *
    * Exactness: integral/decimal sums are associative, so the two-pass
    * result is bit-identical to the single-partition window's. Callers with
    * IEEE-double columns should stage them in decimal first (house rule for
    * engine-reproducible sums). `orderCol` must be unique — running totals
    * over ties are order-ambiguous under ANY plan.
    *
    * Returns the input columns plus `cum_<col>` for each of `sumCols`.
    */
  def cumulative(df: DataFrame, orderCol: String, sumCols: Seq[String],
                 numPartitions: Int = 0): DataFrame = {
    require(sumCols.nonEmpty, "sumCols must be non-empty")
    require(!df.columns.contains("__pid"), "__pid is reserved")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val rp = df.repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    // per-partition totals: ≤ `parts` rows from here on
    val totals = rp.groupBy(col("__pid"))
      .agg(sum(col(sumCols.head)).as(s"__t_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(c)).as(s"__t_$c")): _*)
    // offset of partition p = totals of all partitions before p; a
    // triangular self-join over the config-bounded totals table
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col(s"b.__t_${sumCols.head}")), lit(0L))
          .as(s"__o_${sumCols.head}"),
        sumCols.tail.map(c =>
          coalesce(sum(col(s"b.__t_$c")), lit(0L)).as(s"__o_$c")): _*)
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val outCols: Seq[Column] = df.columns.toSeq.map(col) ++
      sumCols.map(c => (sum(col(c)).over(w) + col(s"__o_$c")).as(s"cum_$c"))
    rp.join(broadcast(offsets), Seq("__pid")).select(outCols: _*)
  }
}
