package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-aware join-side policy.
  *
  * The reference caches whole dimensions in driver memory when told to
  * (pygrametl/tables.py:549-616 — unbounded dicts for `cachesize<0`); the
  * Spark analogue is a broadcast hash join, but broadcasting an *unbounded*
  * side is the classic 100 TB failure mode (a 500M-row dimension OOMs every
  * executor). Policy here: hint broadcast only when Catalyst's own size
  * estimate is under a threshold, otherwise leave the plan unhinted so
  * Catalyst/AQE picks a shuffle join (and can still convert to broadcast at
  * runtime if actual stats allow).
  */
object Joins {

  /** Default cap for an explicitly hinted broadcast side (64 MiB estimated). */
  val BroadcastThresholdBytes: Long = 64L << 20

  /** Catalyst's plan-time size estimate for `df` in bytes. Unknown sizes
    * (e.g. opaque RDD scans without origin stats) surface as Long.MaxValue
    * and are treated as "too big to hint".
    */
  def estimatedSize(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Hint broadcast iff the estimated size is under `threshold`; otherwise
    * return `df` unhinted (AQE decides).
    */
  def maybeBroadcast(df: DataFrame, threshold: Long = BroadcastThresholdBytes): DataFrame =
    if (estimatedSize(df) <= BigInt(threshold)) broadcast(df) else df
}
