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

  /** symmetrized, deduplicated edge frame from an unordered pair frame —
    * both orientations out of ONE pass over the (expensive) pair input
    */
  private def symmetrize(pairs: DataFrame, idA: String, idB: String): DataFrame =
    pairs.select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
      .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst")).distinct()

  /** Degree distribution of the pair graph: how many nodes have each
    * degree — the first diagnostic read on any near-dup graph (a heavy
    * high-degree tail means template mass / hub documents that will blow up
    * downstream pairwise work; see [[neighborJaccard]]'s hub cap).
    *
    * Scale shape: two keyed hash aggregations (node → degree, degree →
    * count), both map-side combined; output is bounded by the max degree,
    * not the corpus. Returns (degree, n_nodes).
    */
  def degreeHistogram(pairs: DataFrame, idA: String = "id_a",
                      idB: String = "id_b"): DataFrame =
    symmetrize(pairs, idA, idB)
      .groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      .groupBy(col("__deg").as("degree")).agg(count(lit(1)).as("n_nodes"))

  /** Neighborhood-Jaccard link prediction over the pair graph: for every
    * NON-edge pair (a, b) that shares at least one common neighbor, score
    * the pair by Jaccard of the two neighborhoods — the classic "these two
    * documents never matched directly, but they match the same third
    * documents" signal that recovers near-dup pairs the banding missed
    * (LSH recall is < 1 by construction; the graph closes part of the gap).
    *
    * Candidate generation walks length-2 paths THROUGH each node, so a hub
    * of degree d would emit d² candidates; nodes with degree > `maxDegree`
    * are excluded as path centers (their neighbor pairs are template mass,
    * already condemned wholesale by cluster-level ops). `common` therefore
    * counts common neighbors of degree ≤ `maxDegree`, while deg_a/deg_b and
    * the Jaccard denominator use FULL degrees. The score is scaled-integer
    * permille — `(1000·common) div (deg_a + deg_b − common)` — exact and
    * engine-reproducible.
    *
    * Scale shape: the edge frame freezes once; each eligible center's
    * neighborhood collapses to ONE row holding a sorted array of
    * (neighbor, degree) structs — bounded at maxDegree entries by the hub
    * cap — and the length-2 paths expand ARRAY-LOCALLY from that row
    * (pairs of array positions i < j), streaming straight into the
    * map-side-combined (a, b) aggregation. No row-level self-join: the
    * old wedge shape sort-merge-joined the path frame against itself,
    * holding two sorted copies of every (center, neighbor) row — the one
    * working set in the family that spilled under memory pressure at 10×
    * data (round-14: 1.5× quiet but 2.4–5.6× under mild ambient load).
    * The array form's biggest shuffle payload is one row per center with
    * ≤ maxDegree struct entries, and each endpoint's degree rides inside
    * the struct, so no node-proportional (id → deg) join ever touches the
    * candidate set (that post-join crossing the broadcast threshold was
    * the round-14 10× cliff). The anti-join against existing edges is one
    * more keyed shuffle. Never an all-pairs step. Returns
    * (id_a, id_b, common, deg_a, deg_b, jaccard_pm) with id_a < id_b.
    */
  def neighborJaccard(pairs: DataFrame, idA: String = "id_a",
                      idB: String = "id_b", maxDegree: Long = 64L): DataFrame = {
    require(maxDegree >= 1, "maxDegree must be positive")
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val edges = bridge.freeze(symmetrize(pairs, idA, idB))
    val deg = bridge.freeze(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val centers = deg.filter(col("deg") <= maxDegree).select(col("src"))
    // one row per center: neighbors sorted by id (struct sort is
    // lexicographic and dst is unique within a center, so the order — and
    // therefore every emitted pair — is deterministic regardless of
    // collect_list's arrival order), each carrying its own full degree
    val nbrs = edges.join(centers, Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("__dd")), Seq("dst"))
      .groupBy(col("src"))
      .agg(sort_array(collect_list(struct(col("dst"), col("__dd")))).as("__ns"))
    // array-local pair expansion: positions i < j of the sorted array give
    // exactly the dst_i < dst_j wedge pairs the old self-join produced
    val cand = nbrs
      .select(explode(expr(
        "flatten(transform(__ns, (x, i) -> " +
          "transform(slice(__ns, i + 2, size(__ns)), y -> " +
          "struct(x.dst as id_a, y.dst as id_b, " +
          "x.__dd as deg_a, y.__dd as deg_b))))")).as("__p"))
      .groupBy(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"))
      .agg(count(lit(1)).as("common"),
        first(col("__p.deg_a")).as("deg_a"), first(col("__p.deg_b")).as("deg_b"))
    val existing = edges.select(col("src").as("id_a"), col("dst").as("id_b"))
    cand.join(existing, Seq("id_a", "id_b"), "left_anti")
      .select(col("id_a"), col("id_b"), col("common"),
        col("deg_a"), col("deg_b"),
        expr("(1000 * common) div (deg_a + deg_b - common)").as("jaccard_pm"))
  }
}
