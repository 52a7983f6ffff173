package graft

import org.apache.spark.sql.functions._
import graft.functions.Layout

class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits (Morton order)") {
    import spark.implicits._
    // (x, y, expected): z = interleave(x even bits, y odd bits)
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (0L, 2L, 8L), (3L, 3L, 15L), (5L, 3L, 27L))
    val df = cases.map(c => (c._1, c._2)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z"))
    assert(df.as[Long].collect().toSeq == cases.map(_._3))
  }

  test("zValue is monotone-compatible with locality: adjacent cells share prefixes") {
    import spark.implicits._
    // points in the same 2x2 cell differ only in the low 2 z-bits
    val df = Seq((4L, 6L), (5L, 6L), (4L, 7L), (5L, 7L)).toDF("x", "y")
      .select((Layout.zValue(col("x"), col("y"), 8) / 4).cast("long").as("cell"))
    assert(df.distinct().count() == 1)
  }

  test("zorderStats bounds both dimensions per file") {
    val o = table("orders")
    val stats = Layout.zorderStats(o,
      (col("o_custkey") % 256).cast("long"),
      (datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")) % 256)
        .cast("long"),
      bits = 8, files = 16).collect()
    assert(stats.nonEmpty && stats.length <= 16)
    // each file covers a z-range of 4096 = 64x64 worth of cells: both
    // dimension spreads must be bounded by the cell extent (<= 255 trivially,
    // but the x-range of one file is at most 64 wide after interleave)
    stats.foreach { r =>
      val (xMin, xMax) = (r.getLong(2), r.getLong(3))
      assert(xMax - xMin <= 64, s"file ${r.getLong(0)} x-spread ${xMax - xMin}")
    }
  }

  test("shardBalanced balances token totals within one max document") {
    val d = table("documents").select(col("doc_id"),
      graft.functions.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val assigned = Layout.shardBalanced(d, "doc_id", "n_tokens", 4)
    assert(assigned.count() == d.count()) // assignment is total
    val totals = Layout.shardStats(assigned, "n_tokens")
      .select(col("total_size")).collect().map(_.getLong(0))
    assert(totals.length == 4)
    val maxDoc = d.agg(max("n_tokens")).head().getAs[Number](0).longValue()
    assert(totals.max - totals.min <= maxDoc,
      s"spread ${totals.max - totals.min} exceeds max doc $maxDoc")
  }

  test("compactionPlan: smalls binned near target, bigs kept, assignment total") {
    import spark.implicits._
    // 20 small files of 100B + 3 big ones; target 1000 -> ceil(2000/1000)=2 groups
    val files = ((0 until 20).map(i => (i.toLong, 100L)) ++
      Seq((100L, 900L), (101L, 1500L), (102L, 650L))).toDF("file_id", "bytes")
    val plan = Layout.compactionPlan(files, "file_id", "bytes",
      targetBytes = 1000L, minBytes = 600L)
    assert(plan.count() == 23, "every file gets a verdict")
    val kept = plan.filter(col("group_id") === -1).select("file_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(100L, 101L, 102L), "healthy files are never rewritten")
    val groups = plan.filter(col("group_id") >= 0)
      .groupBy("group_id").agg(sum("bytes").as("b"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(groups.length == 2, s"ceil(2000/1000) groups, got ${groups.length}")
    // uniform smalls: the serpentine deal lands every group exactly on 1000
    assert(groups.forall(_._2 == 1000L), s"got ${groups.toSeq}")
    // nothing small: planner returns only keeps
    val none = Layout.compactionPlan(files.filter(col("bytes") >= 600),
      "file_id", "bytes", 1000L, 600L)
    assert(none.count() == 3 && none.filter(col("group_id") =!= -1).count() == 0)
  }

  test("random projection preserves norms within JL distortion bounds") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val k = 16
    val dist = e.withColumn("p", graft.plans.NativeFunctions.randomProjection(col("v"), k))
      .select((sqrt(lit(12.0 / k)) * graft.functions.Vectors.norm(col("p"))
        / graft.functions.Vectors.norm(col("v"))).as("d"))
      .agg(avg("d"), min("d"), max("d")).head()
    // mean distortion near 1, individual rows within a loose JL band for k=16
    assert(math.abs(dist.getDouble(0) - 1.0) < 0.15, s"mean ${dist.getDouble(0)}")
    assert(dist.getDouble(1) > 0.4 && dist.getDouble(2) < 1.8,
      s"range [${dist.getDouble(1)}, ${dist.getDouble(2)}]")
  }

  test("rangeBounds: octile boundaries monotone, deterministic, equal the sample's quantile picks") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Layout.rangeBounds(df, "v", "id", nParts = 4, width = 10.0,
      sampleFrac = 0.5).orderBy(col("q")).collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(0.25, 0.5, 0.75))
    // boundaries non-decreasing in q; each pick's cumulative mass covers q·N
    assert(out.map(_.getLong(1)).toSeq == out.map(_.getLong(1)).toSeq.sorted)
    out.foreach(r => assert(r.getLong(4).toDouble >= r.getDouble(0) * r.getLong(5)))
    // composition: identical to the quantile pick over the SAME hash sample
    val expected = graft.functions.Stats.histogramQuantiles(
      graft.functions.Sampling.sampleByHash(df, "id", 0.5, salt = "range-v1"),
      "v", 10.0, Seq(0.25, 0.5, 0.75)).orderBy(col("q")).collect()
    assert(out.sameElements(expected))
    // deterministic: a second run reproduces the boundaries exactly
    assert(Layout.rangeBounds(df, "v", "id", nParts = 4, width = 10.0,
      sampleFrac = 0.5).orderBy(col("q")).collect().sameElements(out))
  }

  test("random projection is deterministic across evaluations") {
    val e = table("embeddings").limit(20)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    def fp() = e.select(col("vec_id"),
        md5(concat_ws(",", transform(graft.plans.NativeFunctions.randomProjection(col("v"), 8),
          x => floor(x * 10000 + lit(0.5)).cast("long").cast("string")))).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp() == fp())
  }
}
