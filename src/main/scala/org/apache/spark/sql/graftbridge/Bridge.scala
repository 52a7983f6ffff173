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
    (spark.internalCreateDataFrame(rdd, df.schema), n)
  }

  def freeze(df: DataFrame): DataFrame = freezeCounted(df)._1
}
