package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Dev tool: sweep every SparkEntry query's physical plan for WindowExec
  * nodes with an EMPTY partition spec — the "Moving all data to a single
  * partition" scale defect this codebase bans. Prints one line per
  * offending query with the window's ordering for attribution.
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE wraps plans in AdaptiveSparkPlanExec, which collect() does NOT
      // traverse — with it on, this audit is blind (round-10 lesson:
      // text_vocab_growth's single-partition window hid behind it)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan
        val hits = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            w.orderSpec.map(_.sql).mkString(",")
        }
        if (hits.nonEmpty) { bad += 1; println(s"UNPARTITIONED_WINDOW $name: ${hits.mkString(" | ")}") }
      } catch { case e: Throwable => println(s"ANALYZE_FAIL $name: ${e.getMessage}") }
    }
    println(s"WINDOW_AUDIT_DONE bad=$bad")
    spark.stop()
  }
}
