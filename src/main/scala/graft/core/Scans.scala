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
    * engine-reproducible sums). `orderCol` must be unique and NUMERIC —
    * running totals over ties are order-ambiguous under ANY plan.
    *
    * Determinism: the bucket id is a PURE FUNCTION of the key — a literal
    * when-chain against range boundaries fetched once by `approxQuantile` —
    * never `spark_partition_id()` over a range exchange. The frame feeds
    * both the totals table and the final join, i.e. the plan references it
    * TWICE; `repartitionByRange` re-SAMPLES its boundaries per physical
    * evaluation, so a physical-partition id can silently differ between the
    * two subtrees when exchange reuse doesn't collapse them (observed under
    * small shuffle-partition counts: offsets keyed against one partitioning,
    * window sums against another — corrupted totals). Key-derived buckets
    * make every re-evaluation agree by construction; WHICH boundaries the
    * quantile sketch picks only moves rows between buckets, never the sums.
    *
    * Returns the input columns plus `cum_<col>` for each of `sumCols`.
    */
  def cumulative(df: DataFrame, orderCol: String, sumCols: Seq[String],
                 numPartitions: Int = 0): DataFrame = {
    require(sumCols.nonEmpty, "sumCols must be non-empty")
    require(!df.columns.contains("__pid"), "__pid is reserved")
    require(df.schema(orderCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"cumulative needs a numeric order key, got ${df.schema(orderCol).dataType}")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val bounds: Array[Double] =
      if (parts <= 1) Array.empty
      else df.select(col(orderCol).cast("double").as("__k"))
        .stat.approxQuantile("__k", probs, 0.01).distinct.sorted
    val key = col(orderCol).cast("double")
    val pid: Column =
      if (bounds.isEmpty) lit(0)
      else bounds.zipWithIndex.tail
        .foldLeft(when(key <= bounds(0), 0)) { case (acc, (b, i)) =>
          acc.when(key <= b, i)
        }.otherwise(bounds.length)
    val rp = df.withColumn("__pid", pid).repartition(parts, col("__pid"))
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
