package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. `ExpressionUtils` is private[sql] in
  * Spark 4's classic backend; this object lives in the org.apache.spark.sql
  * namespace solely to re-expose the conversions custom Catalyst expressions
  * need, plus one checkpoint-hygiene helper. No other internals are touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly materialize `df` (RDD-level localCheckpoint) and rebuild a CLEAN
    * leaf over the checkpointed blocks, reporting the row count for free.
    *
    * Why not `Dataset.localCheckpoint`: (a) it bakes the physical plan's
    * outputOrdering/outputPartitioning into the resulting LogicalRDD — those
    * expressions carry exprIds that go stale when the plan is cached and
    * reused under self-join deduplication (InMemoryRelation.withOutput then
    * fails on the unmapped attribute); (b) the count() that materializes the
    * blocks here is the SAME single job — callers that need the delta size
    * (key assignment) get it without a second pass.
    *
    * The `.copy()` is required: the executed plan reuses UnsafeRow buffers
    * per partition, and the persisted blocks must hold independent rows.
    */
  def freezeCounted(df: DataFrame): (DataFrame, Long) = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val n = rdd.count() // the one job: computes, persists, truncates lineage, counts
    frozenCounts.put((spark.sparkContext.applicationId, rdd.id), n)
    (spark.internalCreateDataFrame(rdd, df.schema), n)
  }

  def freeze(df: DataFrame): DataFrame = freezeCounted(df)._1

  // ------------------------------------------------------------------
  // materialized-size introspection (round 16, guide §2: partitioning
  // should derive from input size, not a constant)
  // ------------------------------------------------------------------

  /** (applicationId, rdd id) → row count for every frame this JVM froze.
    * One small pair per freeze — bounded by freezes per JVM, never by
    * data — so no eviction is needed. Keyed by application so a later
    * SparkContext (rdd ids restart at 0) can never alias a stale entry
    * and make [[knownCount]] report a bogus count (round 17, ADVICE).
    */
  private val frozenCounts =
    scala.collection.concurrent.TrieMap.empty[(String, Int), Long]

  /** An upper bound on `df`'s row count, if `df` is a frame produced by
    * [[freezeCounted]] in this JVM — possibly under cheap row-local
    * wrappers (Project/Filter/SubqueryAlias only; anything else returns
    * None). Free: no job runs. Exact for Project/SubqueryAlias chains;
    * a Filter only removes rows, so the bound stays valid for partition
    * sizing. Lets downstream operators size their partitioning from the
    * REAL input instead of a config constant.
    */
  def knownCount(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
    val appId = df.sparkSession.sparkContext.applicationId
    @annotation.tailrec
    def leaf(p: LogicalPlan): Option[Long] = p match {
      case l: org.apache.spark.sql.execution.LogicalRDD => frozenCounts.get((appId, l.rdd.id))
      case pr: Project => leaf(pr.child)
      case f: Filter => leaf(f.child)
      case a: SubqueryAlias => leaf(a.child)
      case _ => None
    }
    leaf(df.queryExecution.analyzed)
  }

  /** [[freezeCounted]] unless `df` already IS a frozen frame (modulo
    * projections) — avoids re-checkpointing a frame a caller or a monitor
    * state froze moments ago (one redundant materialization job per call
    * otherwise).
    */
  def ensureFrozenCounted(df: DataFrame): (DataFrame, Long) =
    knownCount(df) match {
      case Some(n) => (df, n)
      case None => freezeCounted(df)
    }

  def ensureFrozen(df: DataFrame): DataFrame = ensureFrozenCounted(df)._1
}
