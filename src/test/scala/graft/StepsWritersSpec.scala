package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Sources, Writers}
import graft.steps.Steps
import graft.tables.Partitioners

class StepsWritersSpec extends SparkSpec {

  test("conditional step routes rows to true/false branches") {
    val (hi, lo) = Steps.conditional(table("orders"), col("o_totalprice") > 250000)
    assert(hi.count() + lo.count() == table("orders").count())
    assert(hi.filter(col("o_totalprice") <= 250000).count() == 0)
  }

  test("copy step fans out to multiple consumers") {
    val outs = Steps.copyTo(table("nation"), Seq(
      _.select("n_name"),
      _.groupBy("n_regionkey").count()))
    assert(outs(0).count() == 25 || outs(0).count() > 0)
    assert(outs(1).columns.contains("count"))
  }

  test("mapping step requireTargets=true raises naming the missing column") {
    val e = intercept[IllegalArgumentException] {
      Steps.mapping(table("nation").select(col("n_name")),
        Map("n_name" -> ((c: org.apache.spark.sql.Column) => upper(c)),
          "absent_col" -> ((c: org.apache.spark.sql.Column) => c)),
        requireTargets = true)
    }
    assert(e.getMessage.contains("absent_col"))
  }

  test("copyTo(cache=true) pins nothing in the CacheManager") {
    val outs = Steps.copyTo(table("nation"), Seq(
      (d: org.apache.spark.sql.DataFrame) => d.filter(col("n_regionkey") === 0),
      (d: org.apache.spark.sql.DataFrame) => d.filter(col("n_regionkey") =!= 0)), cache = true)
    assert(outs.map(_.count()).sum == table("nation").count())
    // re-plan the same source: if copyTo had cache()'d it, the CacheManager
    // would rewrite this fresh plan to an InMemoryRelation
    val replanned = table("nation").queryExecution.withCachedData
    assert(!replanned.toString.contains("InMemoryRelation"),
      "copyTo must materialize via localCheckpoint, not leak a CacheManager entry")
  }

  test("mapping step skips absent columns (requiretargets=false)") {
    val out = Steps.mapping(table("nation"),
      Map("n_name" -> (c => lower(c)), "absent_col" -> (c => c)),
      requireTargets = false)
    assert(out.filter(col("n_name") =!= lower(col("n_name"))).count() == 0)
  }

  test("csv round trip: bulkCsv write + typedCsv read") {
    val dir = java.nio.file.Files.createTempDirectory("graftcsv").toString + "/out"
    val src = table("nation")
    Writers.bulkCsv(src, dir, fieldSep = ";")
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = Sources.typedCsv(spark, dir, schema, delimiter = ";", header = false)
    assert(back.count() == src.count())
    assert(back.select(sum("n_nationkey")).head().getLong(0) ==
      src.select(sum("n_nationkey")).head().getLong(0))
  }

  test("delimited rendering uses fieldsep and nullsubst") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("a", "b")
    val lines = Writers.delimited(df, "|", "NULLSUB").collect().map(_.getString(0)).toSet
    assert(lines == Set("1|NULLSUB", "2|x"))
  }

  test("foreachPartition sink consumes every row") {
    val acc = spark.sparkContext.longAccumulator("rows")
    Writers.foreachPartitionSink(table("customer"))(it => it.foreach(_ => acc.add(1)))
    assert(acc.value == table("customer").count())
  }

  test("partitioners co-locate by key") {
    val df = Partitioners.byLookupAtts(table("orders"), Seq("o_custkey"), 8)
    assert(df.rdd.getNumPartitions == 8)
    // all rows of one key land in one partition
    val parts = df.select(col("o_custkey"), spark_partition_id().as("p"))
      .groupBy("o_custkey").agg(count_distinct(col("p")).as("np"))
      .filter(col("np") =!= 1).count()
    assert(parts == 0)
  }

  test("printStep taps a bounded sample and passes the frame through; garbage discards") {
    import graft.steps.Steps
    val df = spark.range(100).toDF("id")
    var printed = ""
    val out = Steps.printStep(df, rows = 5, s => printed = s)
    assert(out eq df, "printStep must pass the frame through unchanged")
    assert(printed.startsWith("id"), s"header expected, got: $printed")
    // 5 sample rows + header + ellipsis marker, never the full frame
    assert(printed.linesIterator.size == 7, s"bounded sample, got:\n$printed")
    assert(printed.endsWith("..."), "a larger frame is marked as truncated")
    val (keep, drop) = Steps.conditional(df, col("id") < 10)
    Steps.garbage(drop) // explicit terminal discard — must trigger nothing
    assert(keep.count() == 10)
  }

  test("salted partitioner bounds each salt bucket") {
    val salted = Partitioners.salted(table("lineitem"), "l_returnflag", 8)
    assert(salted.select("__salt").distinct().count() <= 8)
  }
}
