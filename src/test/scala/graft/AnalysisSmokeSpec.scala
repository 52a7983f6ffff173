package graft

/** Every gate query must at least ANALYZE against the current testdata.
  * Round 7 lost 28 gate queries silently when a testdata regeneration changed
  * the events `ts` encoding; this spec turns that failure mode into a named
  * red test. Construction only — no job execution beyond what a query's own
  * builder needs (bounded metadata actions).
  */
class AnalysisSmokeSpec extends SparkSpec {

  test("all SparkEntry queries analyze against current testdata") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).queryExecution.assertAnalyzed(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getMessage.linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("every query has an oracle or a documented rows-only check") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle entries without a query: ${o -- q}")
  }
}
