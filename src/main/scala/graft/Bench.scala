package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line with
  * per-query seconds. Results are written to the `noop` sink so the full
  * plan executes (a bare count() lets Catalyst prune most of the work).
  *
  * Timing honesty: 150 queries in ONE JVM contaminate each other —
  * ContextCleaner reclaims broadcasts/shuffle files asynchronously after a
  * driver GC, so late queries absorb the reclamation of their predecessors
  * and read up to 5× their isolated time (round-6 evidence: text_rouge
  * 12.4s in-suite vs 2.3s isolated; round-7 evidence: even ~25-query
  * slices inflated the heavy tail 2–5×). The gate therefore runs in THREE
  * phases:
  *
  *   1. FRESH-JVM SLICES of ~14 queries (same classpath/JVM flags as the
  *      parent), each child timing its slice with an untimed GC+settle
  *      pause between queries; the `slices` field records the layout.
  *      Slices group by replayed-monitor family (SparkEntry.benchFamilies)
  *      so readouts sharing one cached monitor state land in one child.
  *   2. SOLO AUDIT: the N slowest queries from phase 1 are re-timed ONE
  *      PER FRESH JVM — the canonical per-query number for the heavy tail
  *      is the solo time, and the `solo` field records BOTH numbers so the
  *      residual slice contamination is itself measurable from the
  *      artifact.
  *   3. An `sf1` section re-times the most expensive queries against a
  *      synthesized 10×-sf0.1 dataset (tools.ScaleData); each child times
  *      a query's sf0.1 base AND its sf1 twin back-to-back in the SAME
  *      JVM, so the reported wall ratio — the cliff detector (shuffle
  *      spill, broadcast thresholds) sf0.1 alone cannot show — never
  *      divides by a number measured under different JVM conditions.
  *
  * The whole gate runs against a wall-clock budget
  * (SPARK_GRAFT_BENCH_BUDGET_S, default 2700): every phase checks the
  * clock before each fork and SKIPS remaining work once its share is
  * spent (slices 72%, solo 88%, sf1 100%), marking the output
  * `"truncated":true` — a partial-but-parseable artifact always beats an
  * rc-124 timeout (round-11 lesson). Each completed fork also prints a
  * one-line `{"metric":"progress",...}` update so even a hard-killed run
  * leaves its latest state in a 2000-char log tail.
  *
  * Invocations:
  *   (no args)                 driver gate: all three phases
  *   name1 name2 ...           local iteration: run just these, in-process
  *   --slice OUT name1 ...     child: time the names, write {"n":sec} JSON
  *   --pair OUT BASE SF1 n...  child: time each name at BASE then SF1,
  *                             write {"n@base":sec,"n@sf1":sec}
  *   --gen-sf1 SFDIR OUTDIR    child: synthesize the 10× dataset
  */
object Bench {

  // ---------------------------------------------------------------- session
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // delete shuffle files synchronously when the cleaner fires, instead
      // of queueing them behind the next query's timed window
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** JVM/session warm-up so the first timed query doesn't absorb executor
    * spin-up, codegen compiler and parquet-footer costs. Beyond the basic
    * range-sum + flagship pass, a handful of DIVERSE tiny queries run at
    * sf0.001 (aggregation, join, window, and the driver-loop-heavy
    * streaming-monitor replay): a slice's first queries otherwise pay the
    * JIT of Spark's planner/executor internals that later queries get for
    * free — measured at up to 2× on monitor-loop queries (stream_components
    * 12.9s cold vs 5.7s warm in the same JVM).
    */
  private def warmUp(spark: SparkSession): Unit = {
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val warmDir = "/root/testdata/sf0.001"
    Seq("q1_agg", "dim_lookup", "events_sessionize", "stream_components").foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    releaseTransients(spark)
  }

  /** Untimed inter-query cleanup: unpersist whatever the query cached, then
    * give ContextCleaner a GC to notice dead weak refs and a settle window
    * to drain its reference queue — so the NEXT timer starts on a quiet JVM.
    */
  private def releaseTransients(spark: SparkSession): Unit = {
    // cached replay-family states (SparkEntry.ReplayCache) are
    // localCheckpointed — dropping their blocks would be unrecoverable, so
    // they are exempt from the transient sweep (bounded count tables)
    val keep = SparkEntry.pinnedReplayRddIds
    spark.sparkContext.getPersistentRDDs.values
      .filterNot(r => keep.contains(r.id)).foreach(_.unpersist(blocking = false))
    // 250 (was 400): at 416 queries the inter-query settle alone cost
    // ~3 min of the 45-min budget; 250 ms still lets the cleaner drain
    val settleMs = sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE_MS", "250").toLong
    System.gc()
    Thread.sleep(settleMs / 2)
    System.gc() // second pass collects objects only freed by cleaner work above
    Thread.sleep(settleMs - settleMs / 2)
  }

  /** Times each named query (sorted) against sfDir in THIS JVM. */
  private def timeQueries(spark: SparkSession, sfDir: String,
                          names: Seq[String]): Seq[(String, Double)] =
    names.sorted.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      releaseTransients(spark)
      name -> math.round(sec * 1000) / 1000.0
    }

  // ----------------------------------------------------------------- fork
  /** Re-invokes this class in a fresh JVM with the parent's own classpath
    * and JVM flags (--add-opens etc.). Returns the exit code.
    */
  private def fork(mainArgs: Seq[String], extraEnv: Map[String, String]): Int = {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench") ++ mainArgs
    val pb = new ProcessBuilder(cmd: _*)
    pb.inheritIO()
    extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.start().waitFor()
  }

  /** Parses the flat numeric map a slice child writes: {"name":sec,...} */
  private def parseSlice(path: java.nio.file.Path): Seq[(String, Double)] = {
    val txt = java.nio.file.Files.readString(path)
    """"([^"]+)":([-0-9.eE]+)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq
  }

  private def toJsonMap(results: Seq[(String, Double)]): String =
    results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  // -------------------------------------------------------- budget clock
  /** Wall-clock budget for the whole no-args gate (round-11 lesson: the
    * three-phase gate outgrew the driver's bench timeout and left an rc-124
    * artifact with NO parseable output). All phases check the clock before
    * every fork; when the budget runs out the remaining work is SKIPPED and
    * the final line carries `"truncated":true` — a degraded-but-parseable
    * artifact always beats a timeout.
    */
  private val gateStart = System.nanoTime()
  private def elapsedSec: Double = (System.nanoTime() - gateStart) / 1e9
  private lazy val budgetSec: Double =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "2700").toDouble
  @volatile private var truncated = false

  /** One short progress line per completed fork: even a run killed by an
    * external timeout leaves a parseable latest-state line in a log TAIL.
    */
  private def progress(phase: String, done: Int, of: Int, sumSec: Double): Unit =
    println(f"""{"metric":"progress","phase":"$phase","done":$done,"of":$of,""" +
      f""""elapsedSec":${math.round(elapsedSec)}%d,"sumSec":${math.round(sumSec)}%d}""")

  /** Forks one child per slice; returns per-query seconds plus the names
    * that were SKIPPED because `deadline` passed (they get no timing this
    * run — recorded so the artifact says so explicitly), or None if any
    * launched child failed (caller falls back to in-process timing).
    */
  private def runSlices(slices: Seq[Seq[String]], sfDir: String, tag: String,
                        deadline: Double): Option[(Seq[(String, Double)], Seq[String])] = {
    val acc = Seq.newBuilder[(String, Double)]
    val skipped = Seq.newBuilder[String]
    var ok = true
    slices.zipWithIndex.foreach { case (names, i) =>
      if (!ok || elapsedSec > deadline) {
        if (ok && elapsedSec > deadline) truncated = true
        skipped ++= names
      } else {
        val out = java.nio.file.Files.createTempFile(s"graft_bench_${tag}_$i", ".json")
        val code = fork(Seq("--slice", out.toString) ++ names,
          Map("SPARK_GRAFT_SF_DIR" -> sfDir))
        val good = code == 0 && java.nio.file.Files.exists(out) &&
          java.nio.file.Files.size(out) > 2
        if (good) {
          acc ++= parseSlice(out)
          val sum = acc.result().map(_._2).sum
          progress(tag, i + 1, slices.size, sum)
        } else {
          System.err.println(s"[bench] slice $tag/$i exited $code; falling back in-process")
          ok = false
        }
        java.nio.file.Files.deleteIfExists(out)
      }
    }
    if (ok) Some((acc.result(), skipped.result())) else None
  }

  // ------------------------------------------------------------------ main
  def main(args: Array[String]): Unit = args.toList match {

    // child: time a slice of queries, write the flat map, exit
    case "--slice" :: out :: names =>
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val spark = session()
      warmUp(spark)
      val results = timeQueries(spark, sfDir, names)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out), toJsonMap(results))
      spark.stop()

    // child: time each name at the base dir THEN the sf1 dir, same JVM —
    // paired numbers share identical JVM/JIT/cleaner conditions, so their
    // ratio is meaningful even if both carry the same additive noise
    case "--pair" :: out :: baseDir :: sf1Dir :: names =>
      val spark = session()
      warmUp(spark)
      val pairs = names.sorted.flatMap { name =>
        val b = timeQueries(spark, baseDir, Seq(name)).head._2
        val s = timeQueries(spark, sf1Dir, Seq(name)).head._2
        Seq(s"$name@base" -> b, s"$name@sf1" -> s)
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out), toJsonMap(pairs))
      spark.stop()

    // child: synthesize the 10x dataset
    case "--gen-sf1" :: sfDir :: outDir :: Nil =>
      val spark = session()
      graft.tools.ScaleData.generate(spark, sfDir, outDir)
      spark.stop()

    // local iteration: run the named queries in-process, print the line
    case names @ (_ :: _) =>
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val spark = session()
      warmUp(spark)
      val known = names.filter(SparkEntry.queries.contains)
      emit(timeQueries(spark, sfDir, known), sfDir, slices = Nil, extra = "")
      spark.stop()

    // driver gate
    case Nil =>
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      // 26 (was 18): at 416 queries the ~38 s/slice JVM+warmup overhead
      // dominated the sf phase (24 slices × 38 s ≈ 15 min of pure
      // startup); fewer, larger slices buy the budget headroom back and
      // let the 22-readout vol family pack WITH neighbors instead of
      // forcing an oversized solo slice
      val sliceSize = sys.env.getOrElse("SPARK_GRAFT_BENCH_SLICE_SIZE", "26").toInt
      // FAMILY-ATOMIC slice packing: readouts sharing a cached monitor
      // state (SparkEntry.benchFamilies) must land in ONE child JVM, or
      // the second child rebuilds the state and inflates its slice. Plain
      // grouped(n) over a family-sorted list still splits families at
      // slice boundaries, so families pack next-fit in name order instead;
      // a family larger than the cap gets its own (oversized) slice. The
      // layout field records the final grouping explicitly.
      val groups = SparkEntry.queries.keys.toSeq
        .groupBy(n => SparkEntry.benchFamilies.getOrElse(n, n))
        .toSeq.sortBy(_._1).map(_._2.sorted.toVector)
      val slices: Seq[Seq[String]] =
        groups.foldLeft(Vector.empty[Vector[String]]) { (acc, g) =>
          if (acc.nonEmpty && acc.last.size + g.size <= sliceSize)
            acc.init :+ (acc.last ++ g)
          else acc :+ g
        }
      // phase 1 owns the clock up to 72% of budget; solo to 88%; sf1 the rest
      val (phase1, untimed, layout) =
        runSlices(slices, sfDir, "sf", deadline = budgetSec * 0.72) match {
          case Some((rs, sk)) => (rs, sk, slices)
          case None => // fork unavailable (e.g. launched under a layered
            // classloader where java.class.path lacks the app jar): one-JVM
            // fallback keeps the gate alive, at reduced timing fidelity
            val spark = session()
            warmUp(spark)
            val rs = timeQueries(spark, sfDir, slices.flatten)
            spark.stop()
            (rs, Nil, Nil)
        }
      val (results, soloJson) = runSoloAudit(phase1, sfDir,
        forked = layout.nonEmpty, deadline = budgetSec * 0.88)
      val sf1Json = if (sys.env.getOrElse("SPARK_GRAFT_BENCH_SF1", "1") == "0") ""
        else runSf1Section(results, sfDir)
      val untimedJson = if (untimed.isEmpty) ""
        else s""","untimed":${untimed.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
      emit(results, sfDir, layout, soloJson + sf1Json + untimedJson)
  }

  /** Phase 2: re-time the N slowest phase-1 queries ONE PER FRESH JVM.
    * The solo number replaces the slice number in the reported map (it is
    * the honest per-query cost); the `solo` JSON keeps both so the artifact
    * itself quantifies any residual in-slice contamination.
    */
  private def runSoloAudit(phase1: Seq[(String, Double)], sfDir: String,
                           forked: Boolean, deadline: Double): (Seq[(String, Double)], String) = {
    // 12 (was 15): each solo JVM costs ~30 s of startup against the wall
    // budget; the 13th-15th heaviest queries are already covered by their
    // slice timings and the sf1 pairing keeps its own top-15
    val soloN = sys.env.getOrElse("SPARK_GRAFT_BENCH_SOLO_N", "12").toInt
    if (!forked || soloN <= 0) return (phase1, "")
    if (elapsedSec > deadline) { truncated = true; return (phase1, "") }
    val targets = phase1.sortBy(-_._2).take(soloN).map(_._1).sorted
    runSlices(targets.map(Seq(_)), sfDir, "solo", deadline) match {
      case Some((ss, _)) =>
        val sliceMap = phase1.toMap
        // a solo run is ONE JVM's single sample — an unlucky GC/compile
        // pause can triple it (measured: edit_verify 17.4s solo vs 4.4s
        // in-slice vs 3.8s clean re-run). A solo far above its own slice
        // time is self-contradictory, so re-measure once and keep the
        // minimum — best-of-n, the standard wall-clock noise floor.
        val suspicious = ss.filter { case (q, t) =>
          t > math.max(2.0 * sliceMap.getOrElse(q, t), sliceMap.getOrElse(q, t) + 2.0)
        }.map(_._1)
        val retried: Map[String, Double] =
          if (suspicious.isEmpty) Map.empty
          else runSlices(suspicious.sorted.map(Seq(_)), sfDir, "solo2", deadline)
            .map(_._1.toMap).getOrElse(Map.empty)
        val soloMap = ss.toMap.map { case (q, t) =>
          q -> math.min(t, retried.getOrElse(q, t))
        }
        val merged = phase1.map { case (q, t) => q -> soloMap.getOrElse(q, t) }
        val audit = soloMap.keys.toSeq.sorted.map { q =>
          s""""$q":{"slice":${sliceMap(q)},"solo":${soloMap(q)}}"""
        }.mkString("{", ",", "}")
        (merged, s""","solo":$audit""")
      case None =>
        System.err.println("[bench] solo audit fork failed; keeping slice times")
        (phase1, "")
    }
  }

  /** sf1 section: generate the 10× dataset (cached across rounds), then for
    * the N most expensive queries time the sf0.1 base and the sf1 twin
    * BACK-TO-BACK in the same child JVM (`--pair` mode) — the reported
    * ratio never divides numbers measured under different JVM conditions
    * (round-7 lesson: ratios against contaminated gate bases both hid a
    * real 17× cliff and invented a 0.33 "speedup").
    */
  private def runSf1Section(results: Seq[(String, Double)], sfDir: String): String =
    try {
      if (elapsedSec > budgetSec * 0.88) { truncated = true; return "" }
      val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_SF1_N", "15").toInt
      val pairSlice = sys.env.getOrElse("SPARK_GRAFT_BENCH_SF1_SLICE", "5").toInt
      val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_BENCH_SF1_DIR", "target/bench_sf1")
      if (!graft.tools.ScaleData.isGenerated(sf1Dir, sfDir)) {
        // stale output from a DIFFERENT base sf dir: delete before regen —
        // generate() itself would early-return on the old marker otherwise.
        // SAFETY: only a directory carrying the _GRAFT_SCALE_OK marker is
        // provably ours to wipe; a non-empty unmarked directory means the
        // env var points somewhere that is NOT generated scale data —
        // refuse rather than recursively delete a stranger's tree
        val dir = java.nio.file.Paths.get(sf1Dir)
        if (java.nio.file.Files.exists(dir)) {
          import scala.jdk.CollectionConverters._
          val marked = java.nio.file.Files.exists(dir.resolve("_GRAFT_SCALE_OK"))
          val empty = !java.nio.file.Files.list(dir).iterator().asScala.hasNext
          require(marked || empty,
            s"refusing to delete $sf1Dir: non-empty and not marked as " +
              "generated scale data (_GRAFT_SCALE_OK missing) — check " +
              "SPARK_GRAFT_BENCH_SF1_DIR")
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
        val code = fork(Seq("--gen-sf1", sfDir, sf1Dir), Map.empty)
        require(code == 0 && graft.tools.ScaleData.isGenerated(sf1Dir, sfDir),
          s"sf1 generation exited $code")
      }
      val top0 = results.sortBy(-_._2).take(n).map(_._1).sorted
      val pairGroups = top0.grouped(math.max(1, pairSlice)).toSeq
      val acc = Seq.newBuilder[(String, Double)]
      var ok = true
      var ranGroups = 0
      pairGroups.zipWithIndex.foreach { case (names, i) =>
        if (ok && elapsedSec <= budgetSec) {
          val out = java.nio.file.Files.createTempFile(s"graft_bench_sf1_$i", ".json")
          val code = fork(Seq("--pair", out.toString, sfDir, sf1Dir) ++ names, Map.empty)
          val good = code == 0 && java.nio.file.Files.exists(out) &&
            java.nio.file.Files.size(out) > 2
          if (good) {
            acc ++= parseSlice(out)
            ranGroups += 1
            progress("sf1", i + 1, pairGroups.size, acc.result().map(_._2).sum)
          } else {
            System.err.println(s"[bench] sf1 pair slice $i exited $code")
            ok = false
          }
          java.nio.file.Files.deleteIfExists(out)
        } else if (ok) truncated = true
      }
      val top = pairGroups.take(ranGroups).flatten
      if (!ok) ""","sf1":{"error":"pair fork failed"}"""
      else {
        val m = acc.result().toMap
        val sf1 = top.map(q => q -> m(s"$q@sf1"))
        val bases = top.map(q => q -> m(s"$q@base"))
        val ratios = top.map { q =>
          q -> math.round(m(s"$q@sf1") / math.max(m(s"$q@base"), 0.001) * 100) / 100.0
        }
        val worst = if (ratios.isEmpty) 0.0 else ratios.map(_._2).max
        s""","sf1":{"dir":"$sf1Dir","copies":10,"queries":${toJsonMap(sf1)},""" +
          s""""basePaired":${toJsonMap(bases)},""" +
          s""""ratioVsBase":${toJsonMap(ratios)},"worstRatio":$worst}"""
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] sf1 section failed: ${e.getMessage}")
      s""","sf1":{"error":"${e.getMessage.replace('"', '\'')}"}"""
    }

  private def emit(results: Seq[(String, Double)], sfDir: String,
                   slices: Seq[Seq[String]], extra: String): Unit = {
    val total = math.round(results.map(_._2).sum * 1000) / 1000.0
    val layout = slices
      .map(s => s.map("\"" + _ + "\"").mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${toJsonMap(results)},"sf":"$sfDir","truncated":$truncated,""" +
      s""""slices":$layout$extra}"""
    // the full per-query artifact: stdout rides a log pipe that keeps only
    // a ~2000-char TAIL, so the big map goes to a durable file (commit it
    // per round) and to stdout first (for humans reading the whole log)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(json)
    // LAST line: a compact summary guaranteed to fit the tail capture —
    // total, the 10 slowest queries, the sf1 worst ratio, and where the
    // full table lives. This is the line the driver's parser sees.
    val slow = results.sortBy(-_._2).take(10)
    val worst = """"worstRatio":([-0-9.eE]+)""".r
      .findFirstMatchIn(extra).map(_.group(1)).getOrElse("null")
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""sf":"$sfDir","nQueries":${results.size},""" +
      s""""queries":${toJsonMap(slow)},"queriesTruncatedTo":${slow.size},""" +
      s""""sf1WorstRatio":$worst,"truncated":$truncated,""" +
      s""""elapsedSec":${math.round(elapsedSec)},"budgetSec":${math.round(budgetSec)},""" +
      s""""full":"$out"}""")
  }
}
