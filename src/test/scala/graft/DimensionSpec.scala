package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables._

class DimensionSpec extends SparkSpec {

  private def freshDim() = {
    val dim = new Dimension("d", "k", Seq("p_brand"), Seq("p_brand"))
    dim.init(table("part").select(lit(0L).as("k"), col("p_brand")).limit(0))
    dim
  }

  test("ensure assigns dense keys to new members ordered by lookupatts") {
    val dim = freshDim()
    dim.ensure(table("part").select(col("p_brand")))
    val rows = dim.current.orderBy(col("k")).collect()
    val brands = rows.map(_.getString(1))
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    assert(brands.sorted.toSeq == brands.toSeq) // keys follow brand order
  }

  test("ensure is idempotent: ensure . ensure == ensure") {
    val dim = freshDim()
    dim.ensure(table("part").select(col("p_brand")))
    val once = dim.current.collect().toSet
    dim.ensure(table("part").select(col("p_brand")))
    assert(dim.current.collect().toSet == once)
  }

  test("keys are unique and continue from existing max") {
    val dim = freshDim()
    dim.ensure(table("part").filter(col("p_size") < 20).select(col("p_brand")))
    val max1 = dim.current.agg(max(col("k"))).head().getLong(0)
    dim.ensure(table("part").select(col("p_brand")))
    val all = dim.current.select(col("k")).collect().map(_.getLong(0))
    assert(all.distinct.length == all.length)
    assert(dim.current.filter(col("k") > max1).count() ==
      dim.current.count() - max1)
  }

  test("lookup returns defaultIdValue on miss") {
    val dim = new Dimension("d2", "k", Seq("p_brand"), Seq("p_brand"), defaultIdValue = -99L)
    dim.init(table("part").filter(col("p_size") < 10)
      .select(col("p_partkey").as("k"), col("p_brand")).dropDuplicates("p_brand"))
    val out = dim.lookup(table("part").select(col("p_brand")))
    assert(out.filter(col("k") === -99L).count() > 0)
    assert(out.filter(col("k").isNull).count() == 0)
  }

  test("update overwrites only non-null update columns") {
    import spark.implicits._
    val dim = new Dimension("d3", "k", Seq("a", "b"), Seq("a"))
    dim.init(Seq((1L, "x", "old1"), (2L, "y", "old2")).toDF("k", "a", "b"))
    dim.update(Seq((1L, null.asInstanceOf[String])).toDF("k", "b")
      .withColumn("b", lit("new1")))
    val m = dim.current.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(1L) == "new1" && m(2L) == "old2")
  }

  test("update/merge with duplicate keys never multiplies state rows") {
    import spark.implicits._
    val dim = new Dimension("d3b", "k", Seq("a", "b"), Seq("a"))
    dim.init(Seq((1L, "x", "old1"), (2L, "y", "old2")).toDF("k", "a", "b"))
    dim.update(Seq((1L, "dup1"), (1L, "dup2")).toDF("k", "b"))
    assert(dim.current.count() == 2, "duplicate update keys must not fan out rows")

    val fact = new AccumulatingSnapshotFactTable("af", Seq("k"), Seq("r"), Seq("m"))
    fact.init(Seq((1L, 10L, 1.0)).toDF("k", "r", "m"))
    fact.merge(Seq((1L, 11L, 2.0), (1L, 12L, 3.0), (2L, 13L, 4.0)).toDF("k", "r", "m"))
    assert(fact.current.count() == 2, "duplicate merge keys must not fan out facts")
  }

  test("update/merge orderCol: deterministic last-write-wins for conflicting keys") {
    import spark.implicits._
    val dim = new Dimension("d3c", "k", Seq("a", "b"), Seq("a"))
    dim.init(Seq((1L, "x", "old")).toDF("k", "a", "b"))
    dim.update(Seq((1L, "w1", 1L), (1L, "w2", 2L)).toDF("k", "b", "seq"),
      orderCol = Some(col("seq")))
    assert(dim.current.filter(col("k") === 1L).head().getString(2) == "w2",
      "latest update by orderCol must win")

    val fact = new AccumulatingSnapshotFactTable("af2", Seq("k"), Seq("r"), Seq("m"))
    fact.init(Seq((1L, 10L, 1.0)).toDF("k", "r", "m"))
    fact.merge(Seq((1L, 11L, 2.0, 1L), (1L, 12L, 3.0, 2L)).toDF("k", "r", "m", "seq"),
      orderCol = Some(col("seq")))
    val r = fact.current.filter(col("k") === 1L).head()
    assert(r.getLong(1) == 12L && r.getDouble(2) == 3.0, "latest merge row by orderCol must win")
  }

  test("getByKey/getByVals accept namemapping") {
    import spark.implicits._
    val dim = new Dimension("d5nm", "k", Seq("a"), Seq("a"))
    dim.init(Seq((1L, "x"), (2L, "y")).toDF("k", "a"))
    val byKey = dim.getByKey(Seq(2L).toDF("kk"), Map("k" -> "kk"))
    assert(byKey.head().getString(1) == "y")
    val byVals = dim.getByVals(Map("aa" -> "x"), Map("a" -> "aa"))
    assert(byVals.head().getLong(0) == 1L)
  }

  test("namemapping resolves physical to logical columns") {
    val dim = freshDim()
    val renamed = table("part").select(col("p_brand").as("brand_physical"))
    dim.ensure(renamed, namemapping = Map("p_brand" -> "brand_physical"))
    assert(dim.current.count() > 0)
  }

  test("rowexpander runs only on new members") {
    val dim = new Dimension("d4", "k", Seq("p_brand", "expanded"), Seq("p_brand"))
    dim.init(table("part").select(lit(0L).as("k"), col("p_brand"), lit("seed").as("expanded")).limit(0))
    dim.ensure(table("part").select(col("p_brand")).withColumn("expanded", lit("batch1")),
      rowexpander = df => df.withColumn("expanded", lit("exp1")))
    assert(dim.current.filter(col("expanded") =!= "exp1").count() == 0)
    // second ensure: no new members -> expander output unchanged
    dim.ensure(table("part").select(col("p_brand")).withColumn("expanded", lit("batch2")),
      rowexpander = df => df.withColumn("expanded", lit("exp2")))
    assert(dim.current.filter(col("expanded") === "exp2").count() == 0)
  }

  test("snowflake ensure resolves keys bottom-up") {
    val input = table("customer")
      .join(table("nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_name"), col("n_name"))
    val nationDim = new Dimension("nd", "n_key", Seq("n_name"), Seq("n_name"))
    val custDim = new Dimension("cd", "cu_key", Seq("c_name", "n_key"), Seq("c_name"))
    nationDim.init(input.select(lit(0L).as("n_key"), col("n_name")).limit(0))
    custDim.init(input.select(lit(0L).as("cu_key"), col("c_name"), lit(0L).as("n_key")).limit(0))
    val flake = new SnowflakedDimension(Seq(custDim -> Seq(nationDim)))
    val out = flake.ensure(input)
    assert(out.filter(col("cu_key").isNull || col("n_key").isNull).count() == 0)
    // every customer has exactly one key, every nation key consistent
    assert(custDim.current.count() == input.select("c_name").distinct().count())
  }

  test("PartitionRangeAssigner produces unique keys above max") {
    val assigner = new PartitionRangeAssigner(1L << 20)
    val df = table("part").select(col("p_brand")).distinct()
    val keyed = assigner.assign(df, "k", 5000L, Seq(col("p_brand")))
    val keys = keyed.select("k").collect().map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
    assert(keys.forall(_ > 5000L))
  }
}
