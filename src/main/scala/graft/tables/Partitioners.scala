package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioner equivalents.
  *
  * Reference: `BasePartitioner` (round-robin over table parts,
  * pygrametl/tables.py:3503-3541), `DimensionPartitioner` (hash of
  * lookupatts, tables.py:3544-3652), `FactTablePartitioner` (hash of
  * keyrefs, tables.py:3655-3711). These exist in the reference to spread
  * row-at-a-time work over OS processes; in Spark the same idea is shuffle
  * partitioning, so each maps to a repartition recipe that co-locates the
  * rows the downstream join/aggregate needs together.
  */
object Partitioners {

  /** BasePartitioner: spread rows round-robin over n partitions. */
  def roundRobin(df: DataFrame, n: Int): DataFrame = df.repartition(n)

  /** DimensionPartitioner: co-locate rows by lookup attributes so a
    * subsequent ensure/lookup shuffle is already satisfied.
    */
  def byLookupAtts(df: DataFrame, lookupatts: Seq[String], n: Int): DataFrame =
    df.repartition(n, lookupatts.map(col): _*)

  /** FactTablePartitioner: co-locate facts by keyrefs (pre-shuffle for the
    * key-resolution joins and fact-table merge).
    */
  def byKeyrefs(df: DataFrame, keyrefs: Seq[String], n: Int): DataFrame =
    df.repartition(n, keyrefs.map(col): _*)

  /** range partitioning for ordered writes / skew-resistant sorts */
  def byRange(df: DataFrame, cols: Seq[String], n: Int): DataFrame =
    df.repartitionByRange(n, cols.map(col): _*)

  /** salt a skewed key: append a random-ish (hash-derived, deterministic)
    * salt in [0, buckets) to break a hot key across reducers; aggregate
    * partially on (key, salt), then finally on key.
    */
  def salted(df: DataFrame, keyCol: String, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(keyCol), monotonically_increasing_id()), lit(buckets)))

  /** Skew-safe equi join: salt the big (skewed) side's key and replicate the
    * small side across every salt bucket, then join on (key, salt) — the hot
    * key's rows spread over `buckets` reducers instead of one. Row-identical
    * to the plain join. AQE's skew-join rewrites sort-merge joins the same
    * way at runtime; this is the explicit form for when the optimizer can't
    * see the skew (pre-aggregated stats missing, stateful downstream ops).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val saltedBig = salted(big, key, buckets)
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L)))) // long: matches pmod's type
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
