package graft

import org.apache.spark.sql.functions._
import graft.tables._

/** The reference's named dimension/fact variants keep their distinctive
  * behavior (bulk-writer save contract, subprocess piping, caching).
  */
class VariantsSpec extends SparkSpec {
  import spark.implicits._

  test("BulkDimension saves through the bulkloader contract (fieldsep/nullsubst CSV)") {
    val d = new BulkDimension("bd", "key", Seq("name", "attr"), Seq("name"),
      fieldSep = "|", nullSubst = "\\N")
    d.init(Seq.empty[(Long, String, String)].toDF("key", "name", "attr"))
    d.ensure(Seq(("a", "x"), ("b", null)).toDF("name", "attr"))
    val out = java.nio.file.Files.createTempDirectory("graft_bulk").toString + "/bd"
    d.save(out)
    val lines = spark.read.text(out).as[String].collect().sorted
    assert(lines.length == 2)
    assert(lines(0) == "1|a|x")
    assert(lines(1) == "2|b|\\N") // NULL substituted per bulkloader contract
  }

  test("SubprocessFactTable pipes rendered partitions to the consumer") {
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val f = new SubprocessFactTable("sp", Seq("k"), Seq("m"),
      consume = it => it.foreach(TestPipeSink.lines.add), fieldSep = "\t")
    f.initEmpty(Seq.empty[(Long, Double)].toDF("k", "m"))
    TestPipeSink.lines.clear()
    f.insert(Seq((1L, 2.5), (2L, 3.5)).toDF("k", "m"))
    val got = TestPipeSink.lines.toArray(Array.empty[String]).sorted
    assert(got.toSeq == Seq("1\t2.5", "2\t3.5"))
    assert(f.current.count() == 2) // state also kept for lookups
    assert(sink.isEmpty) // the local queue is unused; executors wrote the shared one
  }

  test("SubprocessFactTable.command pipes partitions into a real process") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sp").toString
    val f = new SubprocessFactTable("spc", Seq("k"), Seq("m"),
      consume = SubprocessFactTable.command(
        Seq("/bin/sh", "-c", s"cat > $dir/part_$$$$.txt")))
    f.initEmpty(Seq.empty[(Long, Double)].toDF("k", "m"))
    f.insert(spark.range(0, 50).select(col("id").as("k"), col("id").cast("double").as("m")))
    val written = new java.io.File(dir).listFiles().toSeq
      .flatMap(p => scala.io.Source.fromFile(p).getLines().toSeq)
    assert(written.size == 50, s"expected 50 piped lines, got ${written.size}")
    assert(written.contains("7\t7.0"))
    // a failing command fails the job
    val bad = new SubprocessFactTable("spf", Seq("k"), Seq("m"),
      consume = SubprocessFactTable.command(Seq("/bin/sh", "-c", "exit 3")))
    bad.initEmpty(Seq.empty[(Long, Double)].toDF("k", "m"))
    intercept[org.apache.spark.SparkException] {
      bad.insert(Seq((1L, 1.0)).toDF("k", "m"))
    }
  }

  test("SubprocessFactTable.insert computes its input exactly once") {
    val acc = spark.sparkContext.longAccumulator("subproc_evals")
    TestPipeSink.lines.clear()
    val f = new SubprocessFactTable("sp2", Seq("k"), Seq("m"),
      consume = it => it.foreach(TestPipeSink.lines.add))
    f.initEmpty(Seq.empty[(Long, Double)].toDF("k", "m"))
    val in = spark.range(0, 100).as[Long].map { x => acc.add(1); x }.toDF("k")
      .withColumn("m", col("k").cast("double"))
    f.insert(in)
    assert(f.current.count() == 100)
    assert(TestPipeSink.lines.size() == 100)
    assert(acc.value == 100L, s"input must compute once, evaluated ${acc.value} rows")
  }

  test("BatchFactTable: nothing buffers driver-side in a lazy engine") {
    val f = new BatchFactTable("bf", Seq("k"), Seq("m"))
    f.initEmpty(Seq.empty[(Long, Double)].toDF("k", "m"))
    f.insert(Seq((1L, 1.0)).toDF("k", "m"))
    assert(f.awaitingRows == 0L)
    assert(f.current.count() == 1)
  }

  test("CachedDimension state is Spark-cached") {
    val d = new CachedDimension("cd", "key", Seq("name"), Seq("name"))
    d.init(Seq((1L, "a")).toDF("key", "name"))
    assert(d.current.storageLevel.useMemory)
  }
}

/** executor-visible sink for the subprocess pipe test (local mode: same JVM) */
object TestPipeSink {
  val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
