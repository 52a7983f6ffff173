package graft

import org.apache.spark.sql.functions._
import graft.plans.SketchFunctions

/** TypedImperativeAggregate frequent-items sketch (Misra–Gries). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def freq(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(SketchFunctions.freqItems(col("tok"), cap).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.token"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact counts when distinct keys fit the capacity, across partitions") {
    val df = spark.sparkContext.parallelize(
      Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(7)("c"), numSlices = 8)
      .toDF("tok")
    val got = freq(df, 16)
    assert(got == Map("a" -> 100L, "b" -> 60L, "c" -> 7L))
  }

  test("beyond capacity: bounded size and the heavy hitter survives") {
    // 500 distinct rare keys + one heavy hitter, capacity 8
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map(i => s"rare_$i") ++ Seq.fill(400)("heavy")
    val df = spark.sparkContext.parallelize(rnd.shuffle(rows), 8).toDF("tok")
    val got = freq(df, 8)
    assert(got.size <= 8, s"sketch exceeded capacity: ${got.size}")
    assert(got.contains("heavy"), "heavy hitter must survive Misra-Gries decrements")
    // estimates never overcount; undercount bounded by per-level n/capacity
    // decrements (update + merge-trim levels)
    assert(got("heavy") <= 400L && got("heavy") >= 400L - 2 * (900L / 8L))
  }

  test("count-min: estimates always upper-bound true counts; wide sketch is exact") {
    import graft.functions.{Stats, TextAnalysis}
    val toks = table("documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "").cache()
    val truec = toks.groupBy("token").agg(count(lit(1)).as("true_cnt"))
    val sk = Stats.countMinSketch(toks, "token", depth = 4, width = 512)
    // the count-weighted builder over the aggregated table is cell-for-cell
    // identical to the stream builder — the one-corpus-pass composition
    val skW = Stats.countMinSketchOfCounts(truec, "token", "true_cnt",
      depth = 4, width = 512)
    assert(sk.exceptAll(skW).count() == 0 && skW.exceptAll(sk).count() == 0,
      "weighted and stream sketches must hold identical cells")
    assert(sk.count() <= 4 * 512, "sketch size is data-independent")
    val est = Stats.countMinEstimate(sk, truec, "token", depth = 4, width = 512)
    val joined = est.join(truec, Seq("token")).cache()
    // CMS guarantee: never undercounts, for EVERY key
    assert(joined.filter(col("cms_est") < col("true_cnt")).count() == 0)
    // a sketch much wider than the key domain collides nowhere → exact
    val nKeys = truec.count()
    val wide = Stats.countMinEstimate(
      Stats.countMinSketch(toks, "token", depth = 4, width = 1 << 20),
      truec, "token", depth = 4, width = 1 << 20)
    val exact = wide.join(truec, Seq("token"))
      .filter(col("cms_est") =!= col("true_cnt")).count()
    assert(exact == 0, s"width 2^20 over $nKeys keys should be collision-free")
    // an unseen key estimates 0 or a small collision, never a large phantom
    val unseen = Stats.countMinEstimate(sk,
      spark.createDataFrame(Seq(Tuple1("zzz_never_a_token"))).toDF("token"),
      "token", depth = 4, width = 512).head().getLong(1)
    val total = toks.count()
    assert(unseen <= total * 3 / 512, s"phantom estimate $unseen beyond CMS bound")
    joined.unpersist(); toks.unpersist()
  }

  test("HLL: estimate within the rsd envelope across cardinality regimes") {
    import spark.implicits._
    import graft.functions.Stats
    // m=256 → rsd ≈ 1.04/16 ≈ 6.5%; allow 4σ. Cover the linear-counting
    // regime (n << m), the crossover, and the raw-estimator regime (n >> m)
    for (n <- Seq(50, 600, 20000)) {
      val keys = spark.range(n).select(concat(lit("key"), col("id")).as("k"))
      val est = Stats.hllEstimate(Stats.hllRegisters(keys, "k", b = 8), b = 8)
        .head().getDouble(2)
      assert(math.abs(est - n) <= math.max(4 * 0.065 * n, 8.0),
        s"n=$n estimated $est")
    }
  }

  test("HLL: registers are max-mergeable — union sketch == merged shard sketches") {
    import graft.functions.Stats
    val a = spark.range(0, 3000).selectExpr("concat('k', id) AS k")
    val b = spark.range(2000, 5000).selectExpr("concat('k', id) AS k")
    val union = Stats.hllRegisters(a.unionAll(b), "k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val merged = Stats.hllRegisters(a, "k")
      .unionAll(Stats.hllRegisters(b, "k"))
      .groupBy("bucket").agg(max("reg").as("reg"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(union == merged, "register-wise max must equal the union sketch")
    // duplicates never move a register: re-unioning a shard changes nothing
    val dup = Stats.hllRegisters(a.unionAll(b).unionAll(a), "k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dup == union)
  }

  test("bloom: no false negatives, union-mergeable, FPR in a sane band") {
    import spark.implicits._
    import graft.functions.Stats
    val in = (0 until 400).map(i => s"k$i").toDF("key")
    val bits = Stats.bloomBits(in, "key", m = 4096, k = 3)
    // every inserted key probes present — the bloom guarantee
    val probeIn = Stats.bloomProbe(bits, in, "key", m = 4096, k = 3)
    assert(probeIn.filter(!col("might_present")).count() == 0)
    // disjoint probes: false positives exist but stay near (1-e^-kn/m)^k
    val out = (0 until 2000).map(i => s"x$i").toDF("key")
    val fpr = Stats.bloomProbe(bits, out, "key", m = 4096, k = 3)
      .filter(col("might_present")).count().toDouble / 2000
    assert(fpr < 0.1, s"fpr $fpr implausibly high for m=4096,k=3,n=400")
    // mergeable: union of shard bit tables == bits of the union
    val a = Stats.bloomBits(in.filter(col("key") < "k2"), "key", 4096, 3)
    val b = Stats.bloomBits(in.filter(col("key") >= "k2"), "key", 4096, 3)
    val merged = a.unionByName(b).distinct()
    assert(merged.collect().map(_.getLong(0)).toSet ==
      bits.collect().map(_.getLong(0)).toSet)
  }

  test("HLL overlap: union estimate exact vs true-union sketch, intersection in envelope") {
    import graft.functions.Stats
    // |A|=3000, |B|=3000, |A∩B|=1000, |A∪B|=5000
    val a = spark.range(0, 3000).selectExpr("concat('k', id) AS k")
    val b = spark.range(2000, 5000).selectExpr("concat('k', id) AS k")
    val row = Stats.hllOverlap(a, b, "k", b = 8).head()
    val (estA, estB, estU, estI) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    // mergeability is exact: the overlap's union estimate IS the estimate
    // of the true union's own sketch, bit for bit
    val trueU = Stats.hllEstimate(Stats.hllRegisters(a.unionAll(b), "k"), b = 8)
      .head().getDouble(2)
    assert(estU == trueU, s"union estimate must be the union sketch's: $estU vs $trueU")
    // each estimate within 4σ (rsd ≈ 6.5% at m=256); intersection within
    // the summed envelope of its three constituents
    assert(math.abs(estA - 3000) <= 4 * 0.065 * 3000)
    assert(math.abs(estB - 3000) <= 4 * 0.065 * 3000)
    assert(math.abs(estU - 5000) <= 4 * 0.065 * 5000)
    assert(math.abs(estI - 1000) <= 4 * 0.065 * (3000 + 3000 + 5000),
      s"intersection estimate $estI out of envelope")
    assert(math.abs(estI - (estA + estB - estU)) < 0.02,
      "intersection must be the inclusion-exclusion of the three estimates")
  }
}
