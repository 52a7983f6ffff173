package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line with
  * per-query seconds. Results are written to the `noop` sink so the full
  * plan executes (a bare count() lets Catalyst prune most of the work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warm-up so the alphabetically-first query doesn't absorb
    // executor spin-up, codegen compiler and parquet-footer costs (~5s)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Freeze-heavy queries (dedup, SCD state, streaming replays) leave
    // localCheckpoint blocks and broadcasts behind; ContextCleaner only
    // reclaims them after a driver GC, so across ~116 queries in one JVM
    // the accumulation GC-thrashes later queries into fake 3-5x timings
    // (the same honest-timing fix ScaleBench carries). Every query is
    // self-contained, so releasing everything between queries is safe.
    def releaseTransients(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // optional args = query-name filter (local iteration; the driver passes none)
    val wanted = args.toSet
    val selected =
      if (wanted.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(q => wanted(q._1))
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      releaseTransients()
      name -> math.round(sec * 1000) / 1000.0
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = math.round(results.map(_._2).sum * 1000) / 1000.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout rides a log pipe that can truncate the (large) per-query map;
    // the file is the durable machine-readable artifact
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
  }
}
