package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * CRASH-SURVIVABILITY (round-14: the driver's Verify phase died mid-run
  * and the round's official correctness artifact was literally `{}`):
  *   - `oracle_sql.json` is written FIRST, before any query dump — a run
  *     killed at any point leaves an out-dir the oracle compare can score
  *     for every query that did complete, instead of scoring nothing.
  *   - The dump loop is RESUMABLE: a query dir already carrying Spark's
  *     `_SUCCESS` marker is skipped (mode("overwrite") wipes partial dirs,
  *     so presence of the marker proves a complete prior dump), so a
  *     re-invocation with the same outDir finishes the remaining queries
  *     instead of restarting from zero. SPARK_GRAFT_VERIFY_RESUME=0 forces
  *     a full re-dump (determinism checks).
  *   - One `{"verify_progress":...}` line per 25 queries — a killed run's
  *     log tail shows how far it got.
  *   - local[8] default (was 4): the full 416-query gate's serial dump is
  *     the exposure window; 8 cores roughly halve it. Still a small, fixed
  *     shuffle-partition count — the property that exposed the round-10
  *     partition-nondeterminism bug is the smallness, not the exact 4.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (local iteration
    // only — the driver always calls with two args and gets every query)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // resume only applies to the FULL gate: a filtered local iteration
    // means "re-run these names now", never "skip what exists"
    val resume = only.isEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_RESUME", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle json BEFORE the dumps (atomic rename so a kill mid-write can
    // never leave a truncated json in place of a complete one)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val oraclePath = Paths.get(s"$outDir/oracle_sql.json")
    // STALENESS GUARD for resume: an out-dir is only resumable if its
    // existing oracle_sql.json EQUALS the current one — the oracle map is
    // the gate's definition, so equality proves the prior dumps came from
    // the same gate (and any prior dump that passes the same oracle is a
    // correct result even across code-internal changes). A differing or
    // absent oracle json means the out-dir predates a gate change: every
    // dump there is suspect, so resume is disabled and mode("overwrite")
    // rewrites all of them.
    val resumable = resume && Files.exists(oraclePath) &&
      Files.readString(oraclePath) == json
    if (resume && !resumable && Files.exists(oraclePath))
      System.err.println("[verify] existing out-dir has a DIFFERENT oracle " +
        "map — stale gate; resume disabled, re-dumping everything")
    val tmp = Paths.get(s"$outDir/oracle_sql.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, oraclePath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)

    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    var written = 0
    var skipped = 0
    var done = 0
    selected.foreach { case (name, fn) =>
      val marker = Paths.get(s"$outDir/$name/_SUCCESS")
      if (resumable && Files.exists(marker)) { skipped += 1; written += 1 }
      else try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        written += 1
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      done += 1
      if (done % 25 == 0 || done == selected.size)
        println(s"""{"verify_progress":$done,"of":${selected.size},""" +
          s""""written":$written,"skippedComplete":$skipped}""")
    }
    // gate-vs-artifact consistency: a silently-dropped query (round-7
    // failure mode) must be structurally impossible — when running the
    // full gate, every registered query must have produced a dump, and
    // the counts are emitted so the driver artifact can be audited
    // against SparkEntry.queries.size. The check runs with the oracle
    // json already on disk, so a single failed query still leaves a
    // complete, comparable artifact for every other query.
    println(s"[verify] queries registered=${SparkEntry.queries.size} " +
      s"selected=${selected.size} written=$written " +
      s"(resumedPast=$skipped) oracles=${SparkEntry.oracleSql.size}")
    spark.stop()
    if (only.isEmpty)
      require(written == SparkEntry.queries.size,
        s"verify wrote $written dumps but SparkEntry.queries registers " +
          s"${SparkEntry.queries.size} — a gate query failed to execute")
  }
}
