package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity over embedding columns (`array<float>`/`array<double>`).
  *
  * Pure higher-order-function expressions (`zip_with` dot products,
  * `aggregate` reductions) — codegen'd, no UDF boxing — plus ANN via
  * deterministic sign-LSH bucketing. The brute-force path broadcasts the
  * smaller side and is the exactness baseline; the LSH path is the 100 TB
  * scale path (one shuffle keyed by bucket).
  */
object Vectors {

  /** Native codegen'd dot product (graft.plans.DotProduct) — identical
    * left-to-right accumulation to the HOF formulation it replaces.
    */
  def dot(a: Column, b: Column): Column = graft.plans.NativeFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** cosine with precomputed norms: mathematically and bit-identically the
    * same as [[cosine]] (sqrt(dot(v,v)) is the same double whether computed
    * inline or staged in a column), but O(pairs) work drops to one dot.
    */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column = dot(a, b) / (na * nb)

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, v) => s + v))

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors. The corpus side is broadcast (it is the small side in
    * the typical "probe a reference set" pattern); per-query top-k is a
    * window over the join result. Exact — the ANN baseline.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qId: String, qVec: String, cId: String, cVec: String,
                     k: Int): DataFrame = {
    val q = queries.select(col(qId).as("__qid"), col(qVec).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val c = corpus.select(col(cId).as("__cid"), col(cVec).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val joined = q.crossJoin(broadcast(c))
      .filter(col("__qid") =!= col("__cid"))
      .withColumn("cosine", cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    val w = Window.partitionBy(col("__qid")).orderBy(col("cosine").desc, col("__cid").asc)
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("__qid").as("query_id"), col("__cid").as("neighbor_id"),
        round(col("cosine").cast(org.apache.spark.sql.types.DecimalType(18, 8)), 4)
          .cast("double").as("cosine"),
        col("__rn").as("rank"))
  }

  /** Deterministic pseudo-random hyperplane component: plane p, dim d →
    * a value in [-0.5, 0.5) derived from xxhash64 — reproducible across
    * runs/engines without RNG state.
    */
  private def planeComponent(p: Column, d: Column): Column =
    (pmod(xxhash64(p, d), lit(10000L)).cast("double") / 10000.0) - 0.5

  /** Sign-LSH bucket id: the sign bits of `planes` random-hyperplane dot
    * products, packed into a long. Similar vectors (small angle) collide
    * with high probability.
    */
  def signLshBucket(vec: Column, planes: Int): Column = {
    val signs = transform(sequence(lit(0), lit(planes - 1)), p => {
      val d = aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1), i => planeComponent(p, i)),
          (x, w) => x * w),
        lit(0.0), (s, v) => s + v)
      when(d >= 0, 1L).otherwise(0L)
    })
    aggregate(signs, lit(0L), (acc, s) => acc * 2 + s)
  }

  /** ANN top-k via sign-LSH with multi-probe: queries join the corpus only
    * within their bucket (plus optionally neighboring 1-bit-flip buckets for
    * recall), then exact cosine + window top-k. One equi shuffle on the
    * bucket id instead of a cross join — the scale path.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame,
              qId: String, qVec: String, cId: String, cVec: String,
              k: Int, planes: Int = 8, multiProbe: Boolean = true): DataFrame = {
    val cB = corpus.select(col(cId).as("__cid"), col(cVec).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
      .withColumn("__bucket", signLshBucket(col("__cv"), planes))
    val qBase = queries.select(col(qId).as("__qid"), col(qVec).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
      .withColumn("__b0", signLshBucket(col("__qv"), planes))
    // multi-probe: also probe the `planes` buckets at hamming distance 1
    val qB =
      if (!multiProbe) qBase.withColumn("__bucket", col("__b0"))
      else qBase.withColumn("__bucket",
        explode(array_union(array(col("__b0")),
          transform(sequence(lit(0), lit(planes - 1)),
            i => col("__b0").bitwiseXOR(pow(lit(2.0), i).cast("long"))))))

    val joined = qB.join(cB, Seq("__bucket"))
      .filter(col("__qid") =!= col("__cid"))
      .withColumn("cosine", cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    val w = Window.partitionBy(col("__qid")).orderBy(col("cosine").desc, col("__cid").asc)
    joined.select(col("__qid"), col("__cid"), col("cosine")).distinct()
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("__qid").as("query_id"), col("__cid").as("neighbor_id"),
        round(col("cosine").cast(org.apache.spark.sql.types.DecimalType(18, 8)), 4)
          .cast("double").as("cosine"),
        col("__rn").as("rank"))
  }
}
