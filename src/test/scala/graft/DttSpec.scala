package graft

import org.apache.spark.sql.functions._
import graft.dtt.DrawnTable

class DttSpec extends SparkSpec {

  test("drawn table parses header types and rows") {
    val t = DrawnTable(spark,
      """| bid:int (pk) | title:text          | price:double |
         | ------------ | ------------------- | ------------ |
         | 1            | Unknown             | 10.5         |
         | 2            | Nineteen Eighty-Four| NULL         |""")
    assert(t.primaryKey == Seq("bid"))
    assert(t.df.count() == 2)
    assert(t.df.filter(col("price").isNull).count() == 1)
  }

  test("assertEqual passes on matching content and fails on drift") {
    val t = DrawnTable(spark,
      """| k:int | v:text |
         | ----- | ------ |
         | 1     | a      |
         | 2     | b      |""")
    t.assertEqual(t.ensure())
    import spark.implicits._
    intercept[AssertionError] {
      t.assertEqual(Seq((1L, "a"), (2L, "CHANGED")).toDF("k", "v"))
    }
  }

  test("variables: $_ wildcards, $_! non-null, $name binds across rows") {
    import spark.implicits._
    val actual = Seq((1L, "x", "same"), (2L, "y", "same")).toDF("k", "v", "w")
    DrawnTable(spark,
      """| k:int | v:text | w:text |
         | ----- | ------ | ------ |
         | 1     | $_     | $w     |
         | 2     | $_!    | $w     |""").assertEqual(actual)
    // $name binding violation: w differs between rows
    val actual2 = Seq((1L, "x", "one"), (2L, "y", "two")).toDF("k", "v", "w")
    intercept[AssertionError] {
      DrawnTable(spark,
        """| k:int | v:text | w:text |
           | ----- | ------ | ------ |
           | 1     | $_     | $w     |
           | 2     | $_     | $w     |""").assertEqual(actual2)
    }
  }

  test("assertSubset and assertDisjoint") {
    import spark.implicits._
    val actual = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    DrawnTable(spark,
      """| k:int | v:text |
         | ----- | ------ |
         | 2     | b      |""").assertSubset(actual)
    DrawnTable(spark,
      """| k:int | v:text |
         | ----- | ------ |
         | 9     | z      |""").assertDisjoint(actual)
    intercept[AssertionError] {
      DrawnTable(spark,
        """| k:int | v:text |
           | ----- | ------ |
           | 1     | a      |""").assertDisjoint(actual)
    }
  }

  test("lifecycle: ensure/create/addItems/reset/drop mirror the reference Table") {
    val t = DrawnTable(spark,
      """| id:int (pk) | name:text |
         | ----------- | --------- |
         | 1           | a         |
         | 2           | b         |""")
    t.ensure("dtt_life") // absent -> created with drawn rows
    assert(spark.table("dtt_life").count() == 2)
    t.ensure("dtt_life") // present and matching -> verified, no raise
    t.addItems("dtt_life", Seq(Seq(3L, "c")))
    assert(spark.table("dtt_life").count() == 3)
    intercept[AssertionError] { t.ensure("dtt_life") } // diverged from drawing
    t.reset("dtt_life") // drop-create-insert cycle restores the drawn state
    t.assertEqual(spark.table("dtt_life"))
    t.drop("dtt_life")
    assert(!spark.catalog.tableExists("dtt_life"))
  }

  test("DTT as ETL precondition/postcondition harness") {
    // precondition: drawn dimension seed; run ensure; postcondition drawing
    val seed = DrawnTable(spark,
      """| k:int | brand:text |
         | ----- | ---------- |
         | 1     | acme       |""").ensure()
    val dim = new graft.tables.Dimension("dtt_dim", "k", Seq("brand"), Seq("brand"))
    dim.init(seed)
    import spark.implicits._
    dim.ensure(Seq("acme", "zeta").toDF("brand"))
    DrawnTable(spark,
      """| k:int | brand:text |
         | ----- | ---------- |
         | 1     | acme       |
         | 2     | zeta       |""").assertEqual(dim.current)
  }
}
