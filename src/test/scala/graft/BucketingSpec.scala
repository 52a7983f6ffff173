package graft

import org.apache.spark.sql.functions._
import graft.sources.Writers

/** Bucketed tables make repeated equi joins shuffle-free: the plan for a
  * join of two same-bucketed tables must contain NO shuffle exchange.
  */
class BucketingSpec extends SparkSpec {

  test("join of two same-bucketed tables runs without a shuffle") {
    val orders = table("orders").select(col("o_orderkey"), col("o_totalprice"))
    val lineitem = table("lineitem").select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Writers.bucketedTable(orders, "b_orders", Seq("o_orderkey"), 8, Seq("o_orderkey"))
    Writers.bucketedTable(lineitem, "b_lineitem", Seq("o_orderkey"), 8, Seq("o_orderkey"))

    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // results identical to the plain (shuffling) join
    val expected = orders.join(lineitem, "o_orderkey")
      .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("qty"))
    assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
