package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Surrogate-key assignment strategies.
  *
  * Reference: the default `idfinder` is a sequential MAX(key)+1 counter
  * (pygrametl/tables.py:234-243, 460-462) and the parallel variant hands out
  * integer ranges per worker (`getsharedsequencefactory`,
  * pygrametl/parallel.py:1121-1177). The idfinder contract is "any unique
  * value" — density is not required — which is what makes a distributed
  * assigner legal.
  */
trait KeyAssigner extends Serializable {

  /** Add column `keyCol` with unique values > maxExisting to `newMembers`. */
  def assign(newMembers: DataFrame, keyCol: String, maxExisting: Long, orderBy: Seq[Column]): DataFrame

  /** Like `assign`, additionally reporting the new max key when the
    * assignment already knows it (saves the caller a max-scan job per
    * mutation). Default: unknown.
    */
  def assignWithMax(newMembers: DataFrame, keyCol: String, maxExisting: Long,
                    orderBy: Seq[Column]): (DataFrame, Option[Long]) =
    (assign(newMembers, keyCol, maxExisting, orderBy), None)
}

/** maxExisting + row_number() ordered by the lookup attributes: dense,
  * deterministic keys. The window is single-partition, which is fine when the
  * per-batch *new member* set is small (the common dimensional case) — the
  * big input has already been deduplicated/anti-joined down before this runs.
  * For huge new-member sets use [[PartitionRangeAssigner]].
  */
object MaxPlusRowNumberAssigner extends KeyAssigner {
  def assign(newMembers: DataFrame, keyCol: String, maxExisting: Long, orderBy: Seq[Column]): DataFrame = {
    val w = Window.orderBy(orderBy: _*)
    newMembers.withColumn(keyCol, row_number().over(w).cast("long") + lit(maxExisting))
  }
}

/** Distributed key assignment without a global window: each partition gets a
  * disjoint id range (`partitionId * stride + rowInPartition`), the set-wise
  * form of the reference's shared-sequence interval scheme
  * (pygrametl/parallel.py:1121-1177). Keys are unique but sparse — allowed by
  * the idfinder contract. 100 TB-safe: no shuffle, no single partition.
  */
final class PartitionRangeAssigner(stride: Long = 1L << 33) extends KeyAssigner {
  def assign(newMembers: DataFrame, keyCol: String, maxExisting: Long, orderBy: Seq[Column]): DataFrame = {
    // monotonically_increasing_id = partitionId(31 bits) << 33 | rowInPartition
    val base = ((maxExisting / stride) + 1) * stride
    newMembers.withColumn(keyCol, monotonically_increasing_id() + lit(base))
  }
}

/** Dense, deterministic keys WITHOUT the single-partition window: range-
  * repartition on `orderBy`, sort within partitions (global order), then
  * `zipWithIndex` — key = maxExisting + 1 + global position. Produces exactly
  * the keys `MaxPlusRowNumberAssigner` would (row_number over the global
  * order) but stays parallel: zipWithIndex runs one lightweight count job per
  * batch instead of funnelling every row through one WindowExec partition.
  * This is the default assigner — dense like the reference's MAX(key)+1
  * counter (pygrametl/tables.py:234-243), scale-safe like its interval scheme.
  */
object DistributedDenseAssigner extends KeyAssigner {
  def assign(newMembers: DataFrame, keyCol: String, maxExisting: Long, orderBy: Seq[Column]): DataFrame =
    assignWithMax(newMembers, keyCol, maxExisting, orderBy)._1

  override def assignWithMax(newMembers: DataFrame, keyCol: String, maxExisting: Long,
                             orderBy: Seq[Column]): (DataFrame, Option[Long]) = {
    val spark = newMembers.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = newMembers.repartitionByRange(parts, orderBy.map(_.asc): _*)
      .sortWithinPartitions(orderBy.map(_.asc): _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(keyCol,
        org.apache.spark.sql.types.LongType, nullable = false))
    // hand-rolled zipWithIndex: the per-partition count pass is the same job
    // zipWithIndex runs internally, but here the driver also learns the total
    // -- so the new max key is known without another scan
    val rdd0 = sorted.rdd
    val counts = rdd0.mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var k = maxExisting + offsets(i)
      it.map { r => k += 1; org.apache.spark.sql.Row.fromSeq(r.toSeq :+ k) }
    }
    (spark.createDataFrame(rdd, schema), Some(maxExisting + total))
  }
}
