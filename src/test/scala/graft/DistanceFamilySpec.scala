package graft

import org.apache.spark.sql.functions._
import graft.functions.Stats

/** Hand-computed pins for the distribution-distance family additions:
  * two-sample Cramér–von Mises, two-sample Anderson–Darling, and the
  * bucketed 1-D Wasserstein-1 distance — plus batch-vs-streaming parity
  * of the AucMonitor readouts that share their count state.
  */
class DistanceFamilySpec extends SparkSpec {
  import spark.implicits._

  private def arm(vals: Seq[Double]) = vals.toDF("value")

  test("cramerVonMises: a={1,2} vs b={2,3} reads T=0.1875 and its z") {
    // distinct values 1,2,3; gaps (.5, .5, 0) weighted (1,2,1):
    // T = (4/16) * (1*.25 + 2*.25 + 0) = 0.1875
    // E[T] = (1+1/4)/6 = 0.2083333; Var[T] = (5/720)*((64-24-8)/16)
    //      = 0.0138889; z = (0.1875 - E)/sqrt(Var) = -0.1767767
    val r = Stats.cramerVonMises(arm(Seq(1.0, 2.0)), arm(Seq(2.0, 3.0)),
      "value").collect()(0)
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("t") === 0.1875)
    assert(math.abs(r.getAs[Double]("z") - (-0.176777)) < 1e-5)
  }

  test("cramerVonMises: identical samples read T=0") {
    val r = Stats.cramerVonMises(arm(Seq(1.0, 2.0, 3.0)),
      arm(Seq(1.0, 2.0, 3.0)), "value").collect()(0)
    assert(r.getAs[Double]("t") === 0.0)
  }

  test("andersonDarling2: a={1,2} vs b={2,3} reads A2=1.0 exactly") {
    // interior values: v=1 (B=1, g=2): 1*(2/1)*(2/3) = 4/3
    //                  v=2 (B=3, g=2): 2*(2/3)*(2/1) = 8/3
    // A2 = (4/3 + 8/3) / (2*2) = 1.0
    val r = Stats.andersonDarling2(arm(Seq(1.0, 2.0)), arm(Seq(2.0, 3.0)),
      "value").collect()(0)
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("a2") === 1.0)
  }

  test("andersonDarling2: identical samples read A2=0") {
    val r = Stats.andersonDarling2(arm(Seq(1.0, 2.0)), arm(Seq(1.0, 2.0)),
      "value").collect()(0)
    assert(r.getAs[Double]("a2") === 0.0)
  }

  test("wasserstein1: unit shift reads W1=1.0 at width 1") {
    // a={1,2}, b={2,3}: CDF gap 0.5 across [1,2) and [2,3) -> 0.5+0.5
    val r = Stats.wasserstein1(arm(Seq(1.0, 2.0)), arm(Seq(2.0, 3.0)),
      "value", width = 1.0).collect()(0)
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("w1") === 1.0)
  }

  test("wasserstein1: single shared bucket reads W1=0.0 (not empty)") {
    val r = Stats.wasserstein1(arm(Seq(1.0)), arm(Seq(1.5)),
      "value", width = 10.0).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Double]("w1") === 0.0)
  }

  test("wasserstein1: asymmetric arms integrate the weighted CDF gap") {
    // a={0}, b={10,30}: buckets 0,1,3 at width 10
    // bucket 0: |F_a-F_b| = 1; span 1 bucket -> 10.0
    // bucket 1: |1 - 0.5| = .5; span 2 buckets -> 10.0
    val r = Stats.wasserstein1(arm(Seq(0.0)), arm(Seq(10.0, 30.0)),
      "value", width = 10.0).collect()(0)
    assert(r.getAs[Double]("w1") === 20.0)
  }

  test("AucMonitor shapeTest/tailTest/transportDistance equal the batch") {
    val a = arm(Seq(1.0, 2.0, 2.0, 5.0)).withColumn("__l", lit(true))
    val b = arm(Seq(2.0, 3.0, 4.0)).withColumn("__l", lit(false))
    val all = a.unionByName(b)
    val m = new graft.streaming.Streaming.AucMonitor(col("value"), col("__l"))
    // two disjoint micro-batches
    m.update(all.filter(col("value") <= 2.0))
    m.update(all.filter(col("value") > 2.0))
    val batchCvm = Stats.cramerVonMises(a.drop("__l"), b.drop("__l"),
      "value").collect()(0)
    val streamCvm = m.shapeTest.collect()(0)
    assert(batchCvm.getAs[Double]("t") === streamCvm.getAs[Double]("t"))
    assert(batchCvm.getAs[Double]("z") === streamCvm.getAs[Double]("z"))
    val batchAd = Stats.andersonDarling2(a.drop("__l"), b.drop("__l"),
      "value").collect()(0)
    val streamAd = m.tailTest.collect()(0)
    assert(batchAd.getAs[Double]("a2") === streamAd.getAs[Double]("a2"))
    val batchW1 = Stats.wasserstein1(a.drop("__l"), b.drop("__l"),
      "value", width = 2.0).collect()(0)
    val streamW1 = m.transportDistance(2.0).collect()(0)
    assert(batchW1.getAs[Double]("w1") === streamW1.getAs[Double]("w1"))
  }
}
