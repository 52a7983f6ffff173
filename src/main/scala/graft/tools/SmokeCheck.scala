package graft.tools

import org.apache.spark.sql.SparkSession

/** Pre-gate analysis smoke-check: constructs EVERY `SparkEntry.queries` plan
  * against the given sf dir and forces analysis (no execution). A reader that
  * stops analyzing against current testdata — e.g. a schema change in a
  * parquet input — fails HERE in seconds instead of silently dropping queries
  * from the correctness gate.
  *
  * Usage: `runMain graft.tools.SmokeCheck /root/testdata/sf0.01`
  * Exit code 1 if any query fails to analyze; prints one line per failure.
  */
object SmokeCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-smokecheck")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).queryExecution.assertAnalyzed(); None }
        catch { case e: Throwable =>
          Some(name -> e.getMessage.linesIterator.take(2).mkString(" | "))
        }
    }
    failures.foreach { case (n, m) => println(s"SMOKE FAIL $n: $m") }
    println(s"SMOKE ${graft.SparkEntry.queries.size - failures.size}/" +
      s"${graft.SparkEntry.queries.size} analyzed OK against $sfDir")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
