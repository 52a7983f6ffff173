package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}
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
  *
  * WALL-TIME + SELF-EVIDENCE (round-16: the driver's ~70-min phase ran out
  * of clock before its own DuckDB compare TWICE, writing `{}` both times):
  *   - The dump loop is CONCURRENT: SPARK_GRAFT_VERIFY_THREADS (default 4)
  *     workers submit independent Spark jobs (FAIR scheduler so small jobs
  *     interleave instead of queueing). Each query runs on its OWN
  *     `spark.newSession()` — temp views (fn_sql_extensions,
  *     SQLTransformingSource) and session-conf mutations (EventsReader's
  *     nanosAsLong) are per-session state in Spark, so sessions make the
  *     parallel dumps mutually invisible without any per-query locking.
  *     Cached/replayed monitor states (ReplayCache) key on applicationId
  *     and live in the shared SparkContext, so they are still built once.
  *   - Verify emits its OWN machine-readable evidence: one
  *     `verify_summary.jsonl` line per completed query (rows written +
  *     sha256 of the canonicalized result — columns sorted by name, rows
  *     sorted as rendered strings, the same shape check.py compares),
  *     appended as each dump lands, plus a consolidated
  *     `verify_summary.json` at the end. Even if the driver's DuckDB
  *     compare never runs, the out-dir proves per-query what was produced.
  *   - Resume STALENESS is keyed on the oracle map AND a code fingerprint
  *     (mtime+size walk of the classpath entries that hold graft classes):
  *     a Spark-side plan rewrite leaves the oracle unchanged, and resuming
  *     past it would score dumps produced by OLD code as if the new code
  *     ran (round-15 ADVICE). A fingerprint mismatch disables resume.
  */
object Verify {

  /** Fingerprint of the code that is about to run: for every classpath
    * entry that contains graft classes, the jar's (path,size,mtime) — or,
    * for a classes directory, the (relpath,size,mtime) of every .class
    * file under it. Any recompile changes some class file's mtime, so a
    * matching fingerprint proves prior dumps came from byte-identical
    * build outputs. Conservative by design: a rebuild with identical
    * sources also invalidates (resume is a crash-recovery fast path, not
    * a cache).
    */
  private def codeFingerprint(): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def feed(s: String): Unit = md.update(s.getBytes("UTF-8"))
    val src = SparkEntry.getClass.getProtectionDomain.getCodeSource
    val roots: Seq[java.io.File] =
      if (src != null && src.getLocation != null)
        Seq(new java.io.File(src.getLocation.toURI))
      else // layered classloader: fall back to scanning java.class.path
        System.getProperty("java.class.path").split(java.io.File.pathSeparator)
          .toSeq.map(new java.io.File(_))
          .filter(f => f.getName.startsWith("graft") || f.isDirectory)
    roots.sortBy(_.getPath).foreach { root =>
      if (root.isFile) feed(s"${root.getPath}:${root.length}:${root.lastModified}\n")
      else if (root.isDirectory) {
        val base = root.toPath
        import scala.jdk.CollectionConverters._
        Files.walk(base).iterator().asScala
          .filter(p => p.toString.endsWith(".class"))
          .map(p => s"${base.relativize(p)}:${Files.size(p)}:" +
            s"${Files.getLastModifiedTime(p).toMillis}\n")
          .toSeq.sorted.foreach(feed)
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def atomicWrite(path: java.nio.file.Path, content: String): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** rows + sha256 of the canonicalized result, read BACK from the dump
    * that check.py/the driver will score (so the hash covers exactly the
    * artifact on disk, not a separate execution). Canonical form mirrors
    * check.py: columns sorted by name; each value rendered to a string
    * (null → `\N`); rows sorted lexicographically; sha256 over
    * tab-joined, newline-terminated rows.
    */
  private def summarize(sess: SparkSession, dir: String): (Long, String) = {
    val df = sess.read.parquet(dir)
    val cols = df.columns.sorted
    val rendered = df.selectExpr(cols.map(c => s"`$c`"): _*).collect().map {
      row => cols.indices.map { i =>
        if (row.isNullAt(i)) "\\N" else String.valueOf(row.get(i))
      }.mkString("\t")
    }.sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rendered.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
    (rendered.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (local iteration
    // only — the driver always calls with two args and gets every query)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val threads = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt)
    // resume only applies to the FULL gate: a filtered local iteration
    // means "re-run these names now", never "skip what exists"
    val resume = only.isEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_RESUME", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // concurrent dump jobs: FAIR lets a 0.2 s readout land while a
      // heavy dedup query holds the cluster, instead of queueing FIFO
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // oracle json BEFORE the dumps (atomic rename so a kill mid-write can
    // never leave a truncated json in place of a complete one)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val oraclePath = Paths.get(s"$outDir/oracle_sql.json")
    val fp = codeFingerprint()
    val fpPath = Paths.get(s"$outDir/verify_code_fingerprint.txt")
    // STALENESS GUARD for resume: an out-dir is only resumable if its
    // existing oracle_sql.json EQUALS the current one (same gate
    // definition) AND its recorded code fingerprint EQUALS the current
    // build (same code — an implementation rewrite with an unchanged
    // oracle must NOT be scored off old dumps). Anything else means the
    // out-dir predates a gate or code change: every dump there is
    // suspect, so resume is disabled and mode("overwrite") rewrites all.
    val oracleSame = Files.exists(oraclePath) &&
      Files.readString(oraclePath) == json
    val fpSame = Files.exists(fpPath) && Files.readString(fpPath) == fp
    val resumable = resume && oracleSame && fpSame
    if (resume && !resumable && (Files.exists(oraclePath) || Files.exists(fpPath)))
      System.err.println("[verify] existing out-dir is from a " +
        (if (!oracleSame) "DIFFERENT oracle map (stale gate)"
         else "DIFFERENT build (stale code)") +
        " — resume disabled, re-dumping everything")
    atomicWrite(oraclePath, json)
    atomicWrite(fpPath, fp)

    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // incremental self-evidence: one jsonl line per completed query,
    // appended under a lock and flushed — a killed run still leaves a
    // parseable per-query record next to the dumps it describes
    val jsonlPath = Paths.get(s"$outDir/verify_summary.jsonl")
    Files.deleteIfExists(jsonlPath)
    val jsonlLock = new Object
    val summary = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def record(name: String, rows: Long, sha: String, resumed: Boolean): Unit = {
      val entry = s"""{"rows":$rows,"sha256":"$sha","resumed":$resumed}"""
      summary.put(name, entry)
      jsonlLock.synchronized {
        Files.writeString(jsonlPath, s"""{"query":${q(name)},"rows":$rows,""" +
          s""""sha256":"$sha","resumed":$resumed}""" + "\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      }
    }

    val written = new java.util.concurrent.atomic.AtomicInteger(0)
    val skipped = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val tasks = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      pool.submit(new Runnable { def run(): Unit = {
        val qDir = s"$outDir/$name"
        val marker = Paths.get(s"$qDir/_SUCCESS")
        // per-query session: temp views / session conf are isolated, so
        // concurrent queries cannot observe each other's catalog writes
        val sess = spark.newSession()
        if (resumable && Files.exists(marker)) {
          skipped.incrementAndGet(); written.incrementAndGet()
          try { val (r, h) = summarize(sess, qDir); record(name, r, h, resumed = true) }
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name resumed-summary failed: ${e.getMessage}")
          }
        } else try {
          fn(sess, sfDir).coalesce(1).write.mode("overwrite").parquet(qDir)
          written.incrementAndGet()
          val (r, h) = summarize(sess, qDir)
          record(name, r, h, resumed = false)
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        val d = done.incrementAndGet()
        if (d % 25 == 0 || d == selected.size)
          println(s"""{"verify_progress":$d,"of":${selected.size},""" +
            s""""written":${written.get},"skippedComplete":${skipped.get}}""")
      }})
    }
    tasks.foreach(_.get())
    pool.shutdown()

    // consolidated summary (atomic): the committable per-round artifact —
    // query → rows + canonical result sha, independent of the driver's
    // own compare ever running
    val consolidated = summary.entrySet().iterator()
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (consolidated.hasNext) { val e = consolidated.next(); entries += e.getKey -> e.getValue }
    atomicWrite(Paths.get(s"$outDir/verify_summary.json"),
      entries.sortBy(_._1).map { case (k, v) => s"${q(k)}: $v" }
        .mkString("{\n", ",\n", "\n}"))

    // gate-vs-artifact consistency: a silently-dropped query (round-7
    // failure mode) must be structurally impossible — when running the
    // full gate, every registered query must have produced a dump, and
    // the counts are emitted so the driver artifact can be audited
    // against SparkEntry.queries.size. The check runs with the oracle
    // json already on disk, so a single failed query still leaves a
    // complete, comparable artifact for every other query.
    println(s"[verify] queries registered=${SparkEntry.queries.size} " +
      s"selected=${selected.size} written=${written.get} " +
      s"(resumedPast=${skipped.get}) oracles=${SparkEntry.oracleSql.size} " +
      s"threads=$threads")
    spark.stop()
    if (only.isEmpty)
      require(written.get == SparkEntry.queries.size,
        s"verify wrote ${written.get} dumps but SparkEntry.queries registers " +
          s"${SparkEntry.queries.size} — a gate query failed to execute")
  }
}
