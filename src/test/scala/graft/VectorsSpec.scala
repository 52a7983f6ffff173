package graft

import org.apache.spark.sql.functions._
import graft.functions.Vectors

class VectorsSpec extends SparkSpec {

  test("dot / norm / cosine match manual computation") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      Vectors.dot(col("a"), col("b")).as("d"),
      Vectors.norm(col("a")).as("n"),
      Vectors.cosine(col("a"), col("b")).as("c"),
      Vectors.euclidean(col("a"), col("b")).as("e")).head()
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(27.0)) < 1e-12)
  }

  test("cosineHistogram: shares sum to 1, deterministic sample, pair count bounded") {
    import graft.functions.Vectors
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val h = Vectors.cosineHistogram(e, "vec_id", "v", width = 0.1, sampleMod = 4)
    val rows = h.collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    val nPairs = rows.map(_.getLong(2)).sum
    val nSample = e.filter(
      graft.functions.Sampling.hashBucket(col("vec_id"), 4, "dh") === 0).count()
    assert(nPairs == nSample * (nSample - 1) / 2, "every sampled pair binned once")
    val again = Vectors.cosineHistogram(e, "vec_id", "v", width = 0.1, sampleMod = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.map(r => r.getLong(0) -> r.getLong(2)).toMap == again)
  }

  test("knnLabelEval: clustered labels vote correctly, majority ties break small") {
    import spark.implicits._
    import graft.functions.Vectors
    // two tight clusters with distinct labels: every query's neighbors
    // share its label, so the vote is always right
    val a = (0 until 6).map(i => (i.toLong, Seq(1.0, 0.01 * i, 0.0), 1))
    val b = (10 until 16).map(i => (i.toLong, Seq(0.0, 0.01 * (i - 10), 1.0), 2))
    val e = (a ++ b).toDF("vec_id", "v", "label")
    val out = Vectors.knnLabelEval(e, "vec_id", "v", "label",
      e.filter(col("vec_id").isin(0L, 10L)), k = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getBoolean(4))).toMap
    assert(out(0L) == (1, 1, true) && out(10L) == (2, 2, true), s"got $out")
  }

  test("ndcgOfRanking: perfect order reads 1, disorder and misses cost") {
    import spark.implicits._
    import graft.functions.Vectors
    val truth = Seq((1L, 10L, 1.0, 1), (1L, 11L, 0.5, 2), (1L, 12L, 0.2, 3))
      .toDF("query_id", "neighbor_id", "rel", "rank")
    def ndcg(ranked: Seq[(Long, Long, Int)]): Double =
      Vectors.ndcgOfRanking(ranked.toDF("query_id", "neighbor_id", "rank"),
        truth, k = 3).head().getDouble(3)
    val perfect = ndcg(Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)))
    assert(perfect == 1.0, s"perfect ranking must read 1.0, got $perfect")
    val reversed = ndcg(Seq((1L, 12L, 1), (1L, 11L, 2), (1L, 10L, 3)))
    assert(reversed < perfect && reversed > 0.0)
    // an unjudged item at rank 1 scores rel 0 and costs the most
    val missed = ndcg(Seq((1L, 99L, 1), (1L, 10L, 2), (1L, 11L, 3)))
    assert(missed < reversed, s"missing the top hit must cost most: $missed vs $reversed")
  }

  test("mmrTopK: duplicate of the top hit loses to a diverse candidate") {
    import spark.implicits._
    import graft.functions.Vectors
    // id 1 and id 2 are identical; id 3 equally relevant but diverse —
    // plain top-2 keeps the duplicate, MMR must prefer the diverse hit
    val e = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.9, 0.436, 0.0)),
      (2L, Seq(0.9, 0.436, 0.0)),
      (3L, Seq(0.9, -0.436, 0.0))).toDF("vec_id", "v")
    val out = Vectors.mmrTopK(e, "vec_id", "v", queryId = 0L,
      candK = 3, k = 3, lambda = 0.6)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L), s"got ${out.toSeq}")
    assert(out.forall(r => r._3 > 0.8), "all candidates were highly relevant")
    // deterministic across evaluations
    val again = Vectors.mmrTopK(e, "vec_id", "v", queryId = 0L,
      candK = 3, k = 3, lambda = 0.6)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("hammingTopK: packed XOR+popcount equals the sign-mismatch definition; rerank is exact cosine on the pool") {
    import spark.implicits._
    // 70 dims forces TWO packed words (64 + 6) — exercises word boundaries
    val dim = 70
    def vec(seed: Int) = Array.tabulate(dim)(i =>
      if (((seed * 31 + i * 17) % 7) < 3) -1.0 - i else 1.0 + i)
    val e = (0 until 30).map(i => (i.toLong, vec(i))).toDF("vec_id", "v")
    val q = e.filter(col("vec_id") < 3)
    val got = Vectors.hammingTopK(q, e, "vec_id", "v", "vec_id", "v", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // naive: per pair, count sign mismatches on the raw arrays
    val raw = (0 until 30).map(i => i.toLong -> vec(i)).toMap
    def ham(a: Array[Double], b: Array[Double]) =
      a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }.toLong
    val naive = (0L until 3L).flatMap { qi =>
      raw.keys.filter(_ != qi).toSeq
        .map(ci => (ci, ham(raw(qi), raw(ci))))
        .sortBy { case (ci, h) => (h, ci) }.take(5).zipWithIndex
        .map { case ((ci, h), r) => (qi, ci, h, r + 1) }
    }.toSet
    assert(got.toSet == naive, s"packed hamming must equal the definition")
    // rerank: cosine order within the hamming pool, k bound holds
    val rr = Vectors.hammingRerankTopK(q, e, "vec_id", "v", "vec_id", "v",
      m = 10, k = 3).collect()
    assert(rr.length == 9)
    rr.groupBy(_.getLong(0)).values.foreach { rows =>
      val cs = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cs.sameElements(cs.sorted.reverse), "rerank must order by cosine")
    }
  }

  test("bruteForceTopK returns k ranked neighbors per query") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val out = Vectors.bruteForceTopK(e.filter(col("vec_id") < 5), e,
      "vec_id", "v", "vec_id", "v", k = 3).cache()
    assert(out.groupBy("query_id").count().filter(col("count") =!= 3).count() == 0)
    // ranks are 1..3 and cosine non-increasing within query
    val bad = out.groupBy("query_id")
      .agg(min("rank").as("mn"), max("rank").as("mx")).filter(col("mn") =!= 1 || col("mx") =!= 3)
    assert(bad.count() == 0)
  }

  test("IVF top-1 recall vs brute force is usable (nProbe cluster search)") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 50)
    val brute = Vectors.bruteForceTopK(q, e, "vec_id", "v", "vec_id", "v", k = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Vectors.ivfTopK(q, e, "vec_id", "v", "vec_id", "v",
      k = 1, nCentroids = 16, nProbe = 4)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = brute.count { case (qid, nid) => ivf.get(qid).contains(nid) }
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.5, s"IVF top-1 recall $recall too low")
  }

  test("sim_ann_recall query: per-query recall floor holds") {
    val out = SparkEntry.queries("sim_ann_recall")(spark, sfDir)
      .select(col("query_id"), col("recall")).collect()
    assert(out.nonEmpty)
    val avg = out.map(_.getDouble(1)).sum / out.length
    assert(avg >= 0.5, s"avg ANN top-5 recall $avg below floor")
  }

  test("ANN top-1 recall vs brute force is usable (multi-probe sign-LSH)") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 50)
    val brute = Vectors.bruteForceTopK(q, e, "vec_id", "v", "vec_id", "v", k = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = Vectors.annTopK(q, e, "vec_id", "v", "vec_id", "v", k = 1, planes = 4)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = brute.count { case (qid, nid) => ann.get(qid).contains(nid) }
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.5, s"ANN top-1 recall $recall too low")
  }

  test("kMeans: training reduces total within-cluster distance; assignment is total") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    def cost(centroids: org.apache.spark.sql.DataFrame): Double =
      Vectors.kMeansAssign(e, "vec_id", "v", centroids)
        .agg(sum("d2")).head().getDouble(0)
    val seed = Vectors.kMeans(e, "vec_id", "v", k = 8, iters = 0) // init only
    val trained = Vectors.kMeans(e, "vec_id", "v", k = 8, iters = 2)
    assert(cost(trained) < cost(seed), "Lloyd rounds must not increase cost")
    val assign = Vectors.kMeansAssign(e, "vec_id", "v", trained)
    assert(assign.count() == e.count(), "every vector gets exactly one cluster")
    assert(assign.select("cluster").distinct().count() <= 8)
    // determinism: retraining yields the identical model
    val again = Vectors.kMeans(e, "vec_id", "v", k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val first = trained.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == first, "training must be bit-deterministic")
  }

  test("IVF with trained centroids: same plan shape, recall at least holds") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 50)
    val brute = Vectors.bruteForceTopK(q, e, "vec_id", "v", "vec_id", "v", k = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trained = Vectors.kMeans(e, "vec_id", "v", k = 16, iters = 2)
    val ivf = Vectors.ivfTopK(q, e, "vec_id", "v", "vec_id", "v",
      k = 1, nProbe = 4, trained = Some(trained))
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = brute.count { case (qid, nid) => ivf.get(qid).contains(nid) }
      .toDouble / brute.size
    assert(recall >= 0.5, s"trained-IVF top-1 recall $recall too low")
  }

  test("PQ: complete encoding, ranked ADC output, usable top-5 recall vs exact") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val n = e.count()
    val codebook = Vectors.pqTrain(e, "vec_id", "v", dim = 64, m = 16, k = 32, iters = 1).cache()
    // every subspace trained a codebook of at most k entries, at least 1
    val perSub = codebook.groupBy("sub").count().collect().map(r => r.getLong(1))
    assert(perSub.length == 16 && perSub.forall(c => c >= 1 && c <= 32))
    // every vector encodes in every subspace
    val codes = Vectors.pqEncode(e, "vec_id", "v", dim = 64, m = 16, codebook)
    assert(codes.count() == n * 16)
    val q = e.filter(col("vec_id") < 10)
    val out = Vectors.pqTopK(q, e, "vec_id", "v", "vec_id", "v",
      k = 5, dim = 64, m = 16, kSub = 32, iters = 1).cache()
    assert(out.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    // approximate distance is non-decreasing with rank
    val disordered = out.as("a").join(out.as("b"),
      col("a.query_id") === col("b.query_id") && col("a.rank") === col("b.rank") - 1)
      .filter(col("a.d2") > col("b.d2")).count()
    assert(disordered == 0)
    // recall vs exact squared-euclidean top-5 (same metric ADC approximates)
    val exact = q.select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(e.select(col("vec_id").as("cid"), col("v").as("cv")))
      .filter(col("qid") =!= col("cid"))
      .withColumn("d2", Vectors.dot(col("qv"), col("qv"))
        - lit(2.0) * Vectors.dot(col("qv"), col("cv"))
        + Vectors.dot(col("cv"), col("cv")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("rn") <= 5).select(col("qid"), col("cid"))
    val hits = exact.join(out.select(col("query_id").as("qid"),
      col("neighbor_id").as("cid")), Seq("qid", "cid"), "left_semi").count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.3, s"PQ-ADC top-5 recall $recall too low for 16x32 codebooks")
    codebook.unpersist(); out.unpersist()
  }

  test("IVFADC: candidates pruned to probed clusters, subset of plain PQ ranking") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 10)
    val out = Vectors.ivfPqTopK(q, e, "vec_id", "v", "vec_id", "v",
      k = 5, dim = 64, m = 16, kSub = 32, iters = 1, nCoarse = 16, nProbe = 4).cache()
    // every query returns ranked results (pruning may yield < k only if its
    // probed clusters are tiny; with nProbe=4 of 16 that cannot happen here)
    assert(out.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    val disordered = out.as("a").join(out.as("b"),
      col("a.query_id") === col("b.query_id") && col("a.rank") === col("b.rank") - 1)
      .filter(col("a.d2") > col("b.d2")).count()
    assert(disordered == 0)
    // IVFADC distances agree with plain PQ-ADC for pairs both consider:
    // same codebooks, same ADC sum — pruning must not change the value
    val pq = Vectors.pqTopK(q, e, "vec_id", "v", "vec_id", "v",
      k = 5, dim = 64, m = 16, kSub = 32, iters = 1)
      .select(col("query_id"), col("neighbor_id"), col("d2").as("pq_d2"))
    val mismatch = out.join(pq, Seq("query_id", "neighbor_id"))
      .filter(col("d2") =!= col("pq_d2")).count()
    assert(mismatch == 0, "ADC distance must be identical with and without IVF pruning")
    out.unpersist()
  }

  test("int8 quantization: bounded values, bounded error, zero-vector safe") {
    import spark.implicits._
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val out = e.select(col("vec_id"), Vectors.int8Scale(col("v")).as("s"),
      Vectors.int8Quantize(col("v")).as("q"), Vectors.int8Error(col("v")).as("err"))
      .cache()
    // every quantized component within [-127, 127]
    assert(out.filter(exists(col("q"),
      x => x > 127 || x < -127)).count() == 0)
    // per-component reconstruction error <= (scale/2)^2 + bias => err <= n*(s/2+eps)^2
    val bad = out.filter(col("err") > lit(64.0) * (col("s") / 2 + lit(1e-9))
      * (col("s") / 2 + lit(1e-9))).count()
    assert(bad == 0, "reconstruction error must stay within half-step per dim")
    val z = Seq((1L, Array.fill(4)(0.0))).toDF("vec_id", "v")
    val zr = z.select(Vectors.int8Scale(col("v")).as("s"),
      Vectors.int8Quantize(col("v")).as("q"), Vectors.int8Error(col("v")).as("e")).head()
    assert(zr.getDouble(0) == 0.0 && zr.getSeq[Int](1).forall(_ == 0) && zr.getDouble(2) == 0.0)
    out.unpersist()
  }

  test("negativeSample: negatives exclude self and near neighbors, draw is stable") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 10)
    val out = Vectors.negativeSample(q, e, "vec_id", "v", "vec_id", "v",
      k = 5, excludeK = 5, salt = "t").cache()
    assert(out.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    assert(out.filter(col("query_id") === col("negative_id")).count() == 0)
    // no negative may sit in the query's exact top-5 neighborhood
    val near = Vectors.bruteForceTopK(q, e, "vec_id", "v", "vec_id", "v", 5)
      .select(col("query_id"), col("neighbor_id").as("negative_id"))
    assert(out.join(near, Seq("query_id", "negative_id"), "left_semi").count() == 0)
    // deterministic: the same salt re-draws the same negatives
    val again = Vectors.negativeSample(q, e, "vec_id", "v", "vec_id", "v",
      k = 5, excludeK = 5, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // a different salt draws a different set
    val other = Vectors.negativeSample(q, e, "vec_id", "v", "vec_id", "v",
      k = 5, excludeK = 5, salt = "u")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(other != again)
    // explain-audit: the bucketed draw plans no all-pairs operator — the
    // candidate pool comes from a bucket equi-join, never a cross join
    val phys = Vectors.negativeSample(q, e, "vec_id", "v", "vec_id", "v",
      k = 5, excludeK = 5, salt = "t").queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), "no cartesian product")
    assert(!phys.contains("BroadcastNestedLoopJoin"), "no broadcast nested loop")
    out.unpersist()
  }

  test("rerank: results drawn from the PQ shortlist, cosine recall beats raw ADC order") {
    val e = table("embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 10)
    val out = Vectors.pqRerankTopK(q, e, "vec_id", "v", "vec_id", "v",
      k = 5, shortlist = 25, dim = 64, m = 16, kSub = 32, iters = 1).cache()
    // exactly 5 ranked neighbors per query, descending cosine
    assert(out.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    val disordered = out.as("a").join(out.as("b"),
      col("a.query_id") === col("b.query_id") && col("a.rank") === col("b.rank") - 1)
      .filter(col("a.cosine") < col("b.cosine")).count()
    assert(disordered == 0)
    // every result is inside the 25-wide ADC shortlist
    val shortlist = Vectors.pqTopK(q, e, "vec_id", "v", "vec_id", "v",
      k = 25, dim = 64, m = 16, kSub = 32, iters = 1)
      .select(col("query_id"), col("neighbor_id"))
    assert(out.select(col("query_id"), col("neighbor_id"))
      .join(shortlist, Seq("query_id", "neighbor_id"), "left_anti").count() == 0)
    // rerank recall vs exact cosine top-5 must be at least PQ-only recall
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val exact = q.select(col("vec_id").as("qid"), col("v").as("qv"))
        .crossJoin(e.select(col("vec_id").as("cid"), col("v").as("cv")))
        .filter(col("qid") =!= col("cid"))
        .withColumn("cos", Vectors.cosine(col("qv"), col("cv")))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("cid").asc)))
        .filter(col("rn") <= 5).select(col("qid"), col("cid"))
      exact.join(res.select(col("query_id").as("qid"), col("neighbor_id").as("cid")),
        Seq("qid", "cid"), "left_semi").count().toDouble / exact.count()
    }
    val pqOnly = Vectors.pqTopK(q, e, "vec_id", "v", "vec_id", "v",
      k = 5, dim = 64, m = 16, kSub = 32, iters = 1)
    val (rRerank, rPq) = (recallOf(out), recallOf(pqOnly))
    assert(rRerank >= rPq,
      s"rerank recall $rRerank must not fall below PQ-only recall $rPq")
    assert(rRerank >= 0.5, s"reranked top-5 cosine recall $rRerank too low")
    out.unpersist()
  }

  test("dimensionProfile: exact moments per dimension, dead dims read std 0") {
    import spark.implicits._
    val vecs = Seq(
      Seq(1.0, 5.0, -2.0),
      Seq(3.0, 5.0, 2.0),
      Seq(5.0, 5.0, 0.0)).toDF("v")
    val out = Vectors.dimensionProfile(vecs, "v")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(0)._1 == 3L && out(0)._2 == 3.0 && out(0)._4 == 1.0 && out(0)._5 == 5.0)
    assert(math.abs(out(0)._3 - math.sqrt(8.0 / 3.0)) < 1e-6)
    // the constant (dead) dimension: zero std, mean = the constant
    assert(out(1) == ((3L, 5.0, 0.0, 5.0, 5.0)))
    assert(out(2)._2 == 0.0 && out(2)._4 == -2.0 && out(2)._5 == 2.0)
  }

  test("clusterQuality: cohesion and separation on planted clusters") {
    import spark.implicits._
    // two tight clusters far apart: cluster around (0,0) with spread 1,
    // cluster around (100,0) with spread 2
    val vecs = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)),
      (10L, Seq(100.0, 0.0)), (11L, Seq(102.0, 0.0))
    ).toDF("vec_id", "v")
    val cents = Seq((1L, Seq(0.0, 0.0)), (10L, Seq(100.0, 0.0)))
      .toDF("cluster", "centroid")
    val out = Vectors.clusterQuality(vecs, "vec_id", "v", cents)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    // cluster 1: members d2 = 0,1,1 -> mean 2/3; cluster 10: d2 = 0,4 -> 2
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - 0.6667) < 1e-9)
    assert(out(10L)._1 == 2L && out(10L)._2 == 2.0)
    // separation: the only other centroid, d2 = 100^2
    assert(out(1L)._3 == 10L && out(1L)._4 == 10000.0)
    assert(out(10L)._3 == 1L && out(10L)._4 == 10000.0)
  }

  test("profileDrift: a planted re-scale surfaces as mean_shift and std_ratio") {
    import spark.implicits._
    val oldSnap = Seq(Seq(1.0, 5.0), Seq(3.0, 5.0)).toDF("v")
    // dim 0 re-scaled 2x, dim 1 stays constant (std 0 -> NULL ratio)
    val newSnap = Seq(Seq(2.0, 5.0), Seq(6.0, 5.0)).toDF("v")
    val out = Vectors.profileDrift(oldSnap, newSnap, "v")
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.isNullAt(6))).toMap
    assert(out(0) == ((2.0, 4.0, 2.0, false)))
    assert(out(1) == ((5.0, 5.0, 0.0, true)), "dead dim must read NULL std_ratio")
    // dim 0's std doubled: ratio 2
    val ratio = Vectors.profileDrift(oldSnap, newSnap, "v")
      .filter(col("dim") === 0).head().getDouble(6)
    assert(ratio == 2.0)
  }

  test("kCenterCoreset: greedy farthest-first on a planted geometry") {
    import spark.implicits._
    // four tight clusters at the corners of a square, one point far out;
    // farthest-first must visit the outlier and three distinct corners
    // before ever taking a second point from a covered corner
    val pts = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.1, 0.0)),
      (10L, Seq(10.0, 0.0)), (11L, Seq(10.1, 0.0)),
      (20L, Seq(0.0, 10.0)), (21L, Seq(0.1, 10.0)),
      (30L, Seq(10.0, 10.0)), (31L, Seq(10.1, 10.0)),
      (99L, Seq(50.0, 50.0))).toDF("vec_id", "v")
    val out = Vectors.kCenterCoreset(pts, "vec_id", "v", k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(1, 2, 3, 4, 5), "ranks are 1..k")
    assert(out.head._2 == 1L && out.head._3 == 0.0, "seed is the smallest id at d2=0")
    assert(out(1)._2 == 99L, "first greedy pick is the outlier")
    // the five selections cover all four corners plus the outlier: no two
    // picks from the same tight pair
    val corners = out.map(_._2 / 10L).toSet
    assert(corners == Set(0L, 1L, 2L, 3L, 9L), s"picks must spread: ${out.mkString(",")}")
    // covering radius never increases round over round
    val radii = out.drop(1).map(_._3).toSeq
    assert(radii == radii.sortBy(-_), s"d2 must be non-increasing: ${radii.mkString(",")}")
  }

  test("covarianceMatrix: hand-computed moments on a perfectly correlated pair") {
    import spark.implicits._
    // y = 2x exactly: cov(0,0)=2/3, cov(0,1)=4/3, cov(1,1)=8/3
    val vecs = Seq(Seq(1.0f, 2.0f), Seq(2.0f, 4.0f), Seq(3.0f, 6.0f))
      .toDF("embedding")
    val out = Vectors.covarianceMatrix(vecs, "embedding", Seq(0, 1))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out.keySet == Set((0, 0), (0, 1), (1, 1)))
    val (n, mi, mj, c01) = out((0, 1))
    assert(n == 3L && mi == 2.0 && mj == 4.0)
    assert(math.abs(c01 - 4.0 / 3.0) < 1e-6, s"cov(0,1)=$c01")
    assert(math.abs(out((0, 0))._4 - 2.0 / 3.0) < 1e-6)
    assert(math.abs(out((1, 1))._4 - 8.0 / 3.0) < 1e-6)
    // null vectors are excluded, not poisoning the moments
    val withNull = vecs.unionAll(Seq(Option.empty[Seq[Float]]).toDF("embedding"))
    assert(Vectors.covarianceMatrix(withNull, "embedding", Seq(0, 1))
      .collect().map(_.getLong(2)).forall(_ == 3L))
  }

  test("topComponent: diagonal covariance yields the dominant axis and its variance") {
    import spark.implicits._
    // dim 0 carries variance 1.25 (values 0..3), dim 1 is constant:
    // top component is exactly (1, 0) with eigenvalue 1.25
    val vecs = Seq(Seq(0.0f, 7.0f), Seq(1.0f, 7.0f), Seq(2.0f, 7.0f),
      Seq(3.0f, 7.0f)).toDF("embedding")
    val out = Vectors.topComponent(vecs, "embedding", Seq(0, 1), iters = 10)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(0)._1 == 1.0 && out(1)._1 == 0.0, s"loadings $out")
    assert(out(0)._2 == 1.25, s"eigenvalue ${out(0)._2}")
    // rotation: y = x exactly → dominant direction (1,1)/√2, λ = 2·var(x)
    val corr = Seq(Seq(0.0f, 0.0f), Seq(1.0f, 1.0f), Seq(2.0f, 2.0f),
      Seq(3.0f, 3.0f)).toDF("embedding")
    val c = Vectors.topComponent(corr, "embedding", Seq(0, 1), iters = 10)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(c(0)._1 - math.sqrt(0.5)) < 1e-6 &&
      math.abs(c(1)._1 - math.sqrt(0.5)) < 1e-6, s"loadings $c")
    assert(math.abs(c(0)._2 - 2.5) < 1e-6, s"eigenvalue ${c(0)._2}")
  }
}
