package graft

import org.apache.spark.sql.functions._
import graft.dtt.Dttr

/** `.dtt` file runner over the ported reference corpus
  * (reference: the .dtt files under tests/drawntabletesting/dttr + the
  * dttr.py runner).
  */
class DttrSpec extends SparkSpec {

  private val dir = "src/test/resources/dttr"

  private val etl: Map[String, org.apache.spark.sql.DataFrame] => Map[String, org.apache.spark.sql.DataFrame] =
    tables => tables.map { case (n, df) =>
      if (n == "sale") n -> df.withColumn("total", col("price") + 1.0) else n -> df
    }

  test("parseBlocks: headers, assertions, connections, external sources") {
    val content =
      """book@dw, equal
        || bid:int (pk) | title:text |
        || ------------ | ---------- |
        |csv rows.csv ,""".stripMargin
    val Seq(b) = Dttr.parseBlocks(content)
    assert(b.name == "book" && b.connection.contains("dw"))
    assert(b.assertion.contains("equal"))
    assert(b.source.contains(("csv", Seq("rows.csv", ","))))
  }

  test("corpus: every ported .dtt file passes (equal/subset/disjoint/csv-feed/etl+vars)") {
    val results = Dttr.runDir(spark, dir, etl)
    assert(results.size == 5, s"expected 5 corpus files, saw ${results.map(_._1)}")
    val failures = results.filter(_._2.isDefined)
    assert(failures.isEmpty, s"corpus failures: $failures")
  }

  test("runCli (the main's body) runs the corpus and reports zero failures") {
    val failures = Dttr.runCli(spark, dir, etl)
    assert(failures == 0)
  }

  test("custom reader hook: registered keyword feeds external rows") {
    Dttr.registerReader("range", (s, dt, args, _) =>
      s.range(args.head.toLong).select(
        col("id").as(dt.columns.head._1),
        concat(lit("v"), col("id")).as(dt.columns(1)._1)))
    val content =
      """gen
        || k:int (pk) | v:text |
        || ---------- | ------ |
        |range 3
        |
        |gen, equal
        || k:int (pk) | v:text |
        || ---------- | ------ |
        || 0          | v0     |
        || 1          | v1     |
        || 2          | v2     |""".stripMargin
    Dttr.run(spark, content, dir) // throws on assertion failure
  }

  test("a violated postcondition fails with a drawn-row report") {
    val content =
      """t
        || k:int (pk) | v:text |
        || ---------- | ------ |
        || 1          | a      |
        |
        |t, equal
        || k:int (pk) | v:text |
        || ---------- | ------ |
        || 1          | WRONG  |""".stripMargin
    val e = intercept[AssertionError] { Dttr.run(spark, content, dir) }
    assert(e.getMessage.contains("assertEqual failed"))
  }
}
