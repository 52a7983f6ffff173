package graft

import org.apache.spark.sql.functions._
import graft.functions.Graphs

class GraphsSpec extends SparkSpec {

  test("pageRankScaled: star center outranks leaves, leaves tie exactly") {
    import spark.implicits._
    // star: 1 joined to 2..6 — the center receives five contributions/round
    val pairs = (2L to 6L).map(i => (1L, i)).toDF("id_a", "id_b")
    val out = Graphs.pageRankScaled(pairs, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 6)
    val leaves = (2L to 6L).map(out)
    assert(leaves.distinct.size == 1, "symmetric leaves must tie bit-exactly")
    assert(out(1L) > leaves.head, "center must outrank leaves")
  }

  test("pageRankScaled: deterministic, mass ~conserved, iterations=0 is uniform") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    def run() = Graphs.pageRankScaled(pairs, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    // bit-identical across runs (integer arithmetic, no shuffle-order terms)
    assert(run() == run())
    val r = run()
    // damped update redistributes but floor-divide only LOSES mass: total in
    // (N*scale*(1-epsilon), N*scale]
    val total = r.values.sum
    assert(total <= 6L * 1000000000L && total > 6L * 1000000000L * 99 / 100,
      s"mass drifted: $total")
    // 0 iterations: the uniform start, one row per node
    val r0 = Graphs.pageRankScaled(pairs, iterations = 0)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r0.size == 6 && r0.values.forall(_ == 1000000000L))
    // the isolated pair 5-6 is symmetric: exact tie at the stationary point
    assert(r(5L) == r(6L))
  }

  test("degreeHistogram: star graph = one hub + n tied leaves") {
    import spark.implicits._
    val pairs = (2L to 6L).map(i => (1L, i)).toDF("id_a", "id_b")
    val out = Graphs.degreeHistogram(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 5L, 5L -> 1L), s"got $out")
  }

  test("neighborJaccard: predicts the missing edge of a path, skips existing") {
    import spark.implicits._
    // path 1-2-3: (1,3) is the only distance-2 non-edge; jaccard = 1/1
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Graphs.neighborJaccard(path).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // deg(1)=deg(3)=1, common={2} → 1000·1 div (1+1−1) = 1000
    assert(out == Map((1L, 3L) -> ((1L, 1L, 1L, 1000L))), s"got $out")
    // triangle 1-2-3 complete: every candidate pair is already an edge
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(Graphs.neighborJaccard(tri).count() == 0)
  }

  test("neighborJaccard: hub cap suppresses candidates through heavy centers") {
    import spark.implicits._
    // star around 1 with 5 leaves: all leaf pairs go through the hub
    val pairs = (2L to 6L).map(i => (1L, i)).toDF("id_a", "id_b")
    assert(Graphs.neighborJaccard(pairs, maxDegree = 64).count() == 10)
    // cap below the hub degree: no path centers survive
    assert(Graphs.neighborJaccard(pairs, maxDegree = 4).count() == 0)
  }

  test("neighborJaccard: equals a brute-force reference on random graphs") {
    import spark.implicits._
    // pins the array-local wedge expansion (sorted neighbor arrays,
    // positions i < j) against an independent driver-side solve — full
    // degrees in the denominator, common counted only through centers
    // with degree ≤ maxDegree, existing edges excluded
    val rng = new scala.util.Random(15)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 4
      val maxDeg = 4L + trial
      val raw = Seq.fill(n * 3)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val adj = raw.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val expected = (for {
        (c, nbrs) <- adj.toSeq if nbrs.size <= maxDeg
        a <- nbrs; b <- nbrs if a < b
      } yield (a, b)).groupBy(identity).map { case ((a, b), ws) =>
        (a, b) -> (ws.size.toLong, adj(a).size.toLong, adj(b).size.toLong)
      }.filter { case ((a, b), _) => !adj(a).contains(b) }
        .map { case ((a, b), (common, da, db)) =>
          (a, b) -> ((common, da, db, 1000 * common / (da + db - common)))
        }
      val got = Graphs.neighborJaccard(raw.toDF("id_a", "id_b"), maxDegree = maxDeg)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(got == expected, s"trial $trial (${raw.size} edges): got $got\nexpected $expected")
    }
  }

  private implicit class ToSorted(a: Array[(Long, Long)]) {
    def toSortedMap: scala.collection.immutable.SortedMap[Long, Long] =
      scala.collection.immutable.SortedMap(a: _*)
  }
}
