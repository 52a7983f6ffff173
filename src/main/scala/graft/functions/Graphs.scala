package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate pair graph — centrality signals
  * for curation: a document whose near-dup neighborhood is large and densely
  * connected is template/boilerplate mass (high rank), while an isolated
  * near-dup pair is a benign mirror. (Reference scope: pygrametl has no graph
  * operators; this extends the engine for training-data pipelines alongside
  * [[Dedup.connectedComponents]] and [[Dedup.triangleCounts]].)
  *
  * All arithmetic is INTEGER-scaled: ranks live as `rank × scale` longs and
  * every step is exact integer multiply / floor-divide / sum — deterministic,
  * order-independent, and bit-identical across engines (a double PageRank
  * sums contributions in shuffle order, which flips low bits run to run and
  * engine to engine; scaled-integer floor division never does).
  */
object Graphs {

  /** Fixed-iteration PageRank over the undirected pair graph, scaled-integer
    * arithmetic (Page et al. 1999, "The PageRank Citation Ranking").
    *
    * Input: one row per unordered pair (`idA` < `idB`); the graph is
    * symmetrized internally (both orientations out of ONE pass — the same
    * single-evaluation discipline as [[Dedup.connectedComponents]], since the
    * upstream pair pipeline is expensive). Every node starts at
    * `scale` (uniform mass, unnormalized — PageRank is scale-equivariant, so
    * skipping the 1/N normalization keeps the longs large and exact), and
    * each round applies
    *
    *   r'(v) = (scale·(dampDen−dampNum)) div dampDen
    *         + (dampNum · Σ_{u→v} (r(u) div deg(u))) div dampDen
    *
    * with floor division at exactly two points, so the fixpoint is a pure
    * function of the edge set. The symmetrized graph has no dangling nodes
    * (every endpoint has degree ≥ 1) and every node receives at least its
    * partner's contribution, so the inner aggregation covers the node set.
    *
    * 100 TB notes: one round = one equi-join (edges+deg × ranks on the
    * source key) and one hash aggregation on the destination key — two
    * shuffles, both keyed and map-side combined; never an all-pairs step.
    * The edge frame (with per-source degree attached once) freezes before
    * the loop and ranks re-materialize per round, so lineage stays flat
    * across iterations — the [[Dedup.connectedComponents]] loop discipline.
    * State is one long per node: |V| of the PAIR graph, which for a near-dup
    * pass is the duplicated slice of the corpus, not the corpus.
    *
    * Returns (node, rank) — rank is the scaled long; divide by `scale` for
    * the conventional value.
    */
  def pageRankScaled(pairs: DataFrame, idA: String = "id_a",
                     idB: String = "id_b", iterations: Int = 3,
                     scale: Long = 1000000000L,
                     dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0, 1)")
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val fwd = pairs.select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
    val edges = fwd.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst")).distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    // degree rides the edge rows so a round needs only ONE join (ranks)
    val edgesD = bridge.freeze(edges.join(deg, Seq("src")))
    val base = (scale * (dampDen - dampNum)) / dampDen
    var ranks = bridge.freeze(
      edgesD.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(scale)))
    for (_ <- 0 until iterations) {
      ranks = bridge.freeze(
        edgesD.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), expr("rank div __deg").as("__c"))
          .groupBy(col("node"))
          .agg((lit(base) + expr(s"($dampNum * sum(__c)) div $dampDen")).as("rank")))
    }
    ranks
  }
}
