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

  /** Eagerly materialize `df` (localCheckpoint) and rebuild a CLEAN leaf over
    * the checkpointed blocks. `Dataset.localCheckpoint` bakes the physical
    * plan's outputOrdering/outputPartitioning into the resulting LogicalRDD;
    * those expressions carry exprIds that go stale when the plan is cached
    * and reused under self-join deduplication (InMemoryRelation.withOutput
    * then fails on the unmapped attribute). Re-wrapping the InternalRow scan
    * via internalCreateDataFrame drops that metadata — zero-copy, the RDD is
    * the block scan itself.
    */
  def freeze(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    val spark = ck.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(ck.queryExecution.toRdd, ck.schema)
  }
}
