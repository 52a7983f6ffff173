package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans of representative queries to
  * audit pushdown, broadcast choice, and whole-stage codegen spans.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("fact_load", "q1_agg", "dim_ensure", "src_filtering", "sim_bruteforce",
        "search_bm25", "text_tfidf", "curate_by_domain", "sample_weighted",
        "events_funnel")
    names.foreach { q =>
      println(s"\n========== $q ==========")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
