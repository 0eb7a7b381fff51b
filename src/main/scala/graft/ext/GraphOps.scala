package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain edge-list DataFrames — the
  * companion family to the connected-components labeling in [[Dedup]]
  * (dupClustersStar) and the co-purchase triangle counting in the
  * relational layer.
  */
object GraphOps {

  /** PageRank over an UNDIRECTED edge list (`ea`, `eb`), in EXACT
    * integer arithmetic so the result is engine-reproducible: ranks
    * are scaled to ppm-of-uniform (every node starts at 1,000,000) and
    * one iteration is
    *
    *   r'(v) = 150000 + (85 · Σ_{u∈N(v)} (r(u) div deg(u))) div 100
    *
    * i.e. damping 0.85 with the classic (1−d) teleport term, all
    * divisions integer (deterministic truncation — both operands are
    * non-negative, so Spark's `div` and an ANSI `//` agree). Fixed
    * iteration count: rank queries want a deterministic answer, and
    * 3–5 iterations already order hubs correctly on bounded-diameter
    * co-occurrence graphs; convergence-driven stopping belongs to the
    * caller loop (same localCheckpoint pattern as dupClustersStar).
    *
    * Scale shape per iteration: one broadcast-or-shuffle join of the
    * rank table onto the out-degree table (|V| rows), one equi-join of
    * shares onto the symmetric edge list keyed by src, one
    * partial-aggregated shuffle keyed by dst. Lineage is truncated
    * every iteration, so plans stay flat at any iteration count.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 3,
      checkpointEvery: Int = 4): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val sym = edges.select(col("ea").as("src"), col("eb").as("dst"))
      .unionByName(edges.select(col("eb").as("src"), col("ea").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var rank = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (i <- 1 to iterations) {
      val shares = rank.join(deg, rank("node") === deg("src"))
        .select(col("node").as("src"), expr("r div deg").as("share"))
      // every node of a symmetric edge list has at least one in-edge,
      // so the dst-keyed aggregate covers all of V — no dangling fixup
      rank = sym.join(shares, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("in_sum"))
        .select(col("node"), expr("150000 + (85 * in_sum) div 100").as("r"))
      // lineage truncation is only needed when plans would grow deep —
      // each eager localCheckpoint costs a full job, so a short fixed
      // run composes lazily and long runs truncate periodically
      if (i % checkpointEvery == 0 && i < iterations)
        rank = Checkpoints.truncate(rank)
    }
    // ONE final materialization: the returned frame must not depend on
    // the caches being unpersisted below (the lazy tail would silently
    // recompute the whole edge subtree per downstream action)
    rank = Checkpoints.truncate(rank)
    deg.unpersist()
    sym.unpersist()
    rank.select(col("node"), col("r").as("rank_ppm"))
  }

  /** Per-edge neighborhood Jaccard — the classic link-prediction /
    * community-strength score: for every edge (a, b), the overlap of
    * the two endpoints' neighbor sets,
    * |N(a)∩N(b)| · 1e6 div (deg(a) + deg(b) − |N(a)∩N(b)|), exact ppm.
    * An edge inside a dense community scores high; a bridge scores 0.
    *
    * Scale shape: the intersection count is the WEDGE join — the
    * symmetric edge list self-joined on the shared endpoint (the same
    * shape as triangle counting, cost Σ deg(w)² over wedge centers w,
    * NOT |V|²); degrees are a |V|-row aggregate joined back on each
    * endpoint. Hot hubs dominate the wedge stage exactly as in
    * triangle counting — AQE skew-split applies; a production run over
    * a power-law graph caps or samples super-hub wedge centers first
    * (the standard mitigation, semantics-changing, so left to the
    * caller).
    */
  /** k-core decomposition membership: iteratively peel nodes of degree
    * < k until a fixpoint — the surviving subgraph is the k-core, the
    * standard "dense cohesive community" extraction. Returns the
    * surviving nodes with their core-internal degree.
    *
    * Scale shape per round: one symmetric-degree aggregate + two
    * semi-joins that shrink the edge list; the edge set REPLACES
    * itself ([[Checkpoints.truncate]] cuts lineage — reliable
    * checkpoints on a cluster when `spark.graft.checkpointDir` is
    * set, localCheckpoint otherwise), and convergence is an
    * edge-count fixpoint. Rounds are bounded by the peel depth —
    * power-law graphs converge in a few dozen rounds; each round's
    * cost shrinks with the graph. (No DuckDB oracle: per-round
    * aggregation is outside recursive-CTE SQL — the spec pins
    * semantics on hand-built graphs instead.)
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var e = Checkpoints.truncate(edges.select(col("ea"), col("eb"))
      .filter(col("ea") =!= col("eb")).distinct())
    var prevEdges = -1L
    var round = 0
    var nEdges = e.count()
    while (nEdges != prevEdges && nEdges > 0 && round < maxRounds) {
      prevEdges = nEdges
      val sym = e.select(col("ea").as("u"), col("eb").as("v"))
        .unionByName(e.select(col("eb").as("u"), col("ea").as("v")))
      val keep = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("u"))
      e = Checkpoints.truncate(
        e.join(keep.select(col("u").as("ea")), Seq("ea"), "left_semi")
          .join(keep.select(col("u").as("eb")), Seq("eb"), "left_semi"))
      nEdges = e.count()
      round += 1
    }
    val sym = e.select(col("ea").as("u"), col("eb").as("v"))
      .unionByName(e.select(col("eb").as("u"), col("ea").as("v")))
    sym.groupBy(col("u")).agg(count(lit(1)).as("core_degree"))
      .select(col("u").as("node"), col("core_degree"))
  }

  /** Degree-assortativity covariance components: over all DIRECTED
    * edge endpoints (u, v), the exact integer sums needed for the
    * degree-degree correlation (n, Σdu, Σdv, Σdu·dv and the covariance
    * numerator n·Σdu·dv − Σdu·Σdv). Positive = hubs attach to hubs
    * (social-style), negative = hub-and-spoke (tech-style) — a
    * one-row graph fingerprint. The float Pearson denominator is left
    * to the consumer: the SIGN and the exact components are the
    * engine-portable part.
    */
  /** Synchronous label-propagation communities (Raghavan et al. 2007,
    * made deterministic): every node starts as its own label; each
    * round it adopts the MOST FREQUENT label among its neighbors,
    * ties broken to the smallest label, all nodes updating from the
    * previous round's labels simultaneously. Communities are denser
    * than connected components (a CC splits along sparse cuts because
    * the mode, unlike reachability, respects edge multiplicity of
    * labels).
    *
    * Scale shape per round: ONE equi-join of the symmetrized edge list
    * with the n-row label frame, a (node, label) count aggregate, and
    * a top-1 window — all keyed by node, O(|E|) rows moved, never a
    * label broadcast or a driver loop over nodes. The label frame is
    * lineage-truncated per round like the CC/PageRank iterators.
    * Fixed `rounds` keeps it oracle-re-derivable; classic LPA's
    * run-to-stability needs the same rounds-bounded discipline at
    * cluster scale anyway (oscillation on bipartite-ish structure is
    * the known failure of run-to-convergence).
    *
    * Input: (ea, eb) undirected edges. Output: (node, community,
    * community_size).
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sym = Checkpoints.truncate(
      edges.select(col("ea").as("src"), col("eb").as("dst"))
        .unionByName(edges.select(col("eb").as("src"), col("ea").as("dst")))
        .distinct())
    var lab = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    (1 to rounds).foreach { _ =>
      val neigh = sym
        .join(lab.select(col("node").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("src").orderBy(col("c").desc, col("label"))
      lab = Checkpoints.truncate(neigh
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("src").as("node"), col("label")))
    }
    val sizes = lab.groupBy(col("label")).agg(count(lit(1)).as("community_size"))
    lab.join(sizes, Seq("label"))
      .select(col("node"), col("label").as("community"), col("community_size"))
  }

  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val und = edges.select(col("ea").as("u"), col("eb").as("v"))
      .unionByName(edges.select(col("eb").as("u"), col("ea").as("v")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    und
      .join(deg.select(col("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dv")), Seq("v"))
      .agg(count(lit(1)).as("n_endpoints"),
        sum(col("du")).as("sum_du"),
        sum(col("dv")).as("sum_dv"),
        sum(col("du") * col("dv")).as("sum_dudv"))
      .withColumn("cov_numer", expr("n_endpoints * sum_dudv - sum_du * sum_dv"))
      .withColumn("assortative", col("cov_numer") > 0)
  }

  /** Two-hop reach per node: |{w : dist(u, w) ≤ 2}| — the
    * friend-of-friend audience size that ranks influence beyond raw
    * degree. Exact distinct count over the union of 1-hop and 2-hop
    * endpoints (self excluded).
    *
    * Shape: the 2-hop frontier is the wedge join (symmetric edges
    * self-joined on the shared middle — Σ deg(w)² wedge rows, the
    * triangle/Jaccard cost class), distinct-counted per source
    * together with the 1-hop frontier; hub middles skew exactly like
    * every wedge op (AQE skew-split applies).
    */
  def twoHopReach(edges: DataFrame): DataFrame = {
    val und = edges.select(col("ea").as("u"), col("eb").as("v"))
      .unionByName(edges.select(col("eb").as("u"), col("ea").as("v")))
    val oneHop = und
    val twoHop = und.select(col("u"), col("v").as("mid"))
      .join(und.select(col("u").as("mid"), col("v")), Seq("mid"))
      .filter(col("u") =!= col("v"))
      .select(col("u"), col("v"))
    oneHop.unionByName(twoHop)
      .groupBy(col("u"))
      .agg(countDistinct(col("v")).as("reach_2hop"))
      .select(col("u").as("node"), col("reach_2hop"))
  }

  def neighborJaccard(edges: DataFrame): DataFrame = {
    val und = edges.select(col("ea").as("u"), col("eb").as("v"))
      .unionByName(edges.select(col("eb").as("u"), col("ea").as("v")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val common = und.select(col("u").as("a"), col("v").as("w"))
      .join(und.select(col("u").as("b"), col("v").as("w")), Seq("w"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
    edges.select(col("ea").as("a"), col("eb").as("b"))
      .join(common, Seq("a", "b"), "left")
      .na.fill(0L, Seq("n_common"))
      .join(deg.select(col("u").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("u").as("b"), col("deg").as("deg_b")), Seq("b"))
      .select(col("a"), col("b"), col("n_common"), col("deg_a"), col("deg_b"),
        expr("n_common * 1000000 div (deg_a + deg_b - n_common)").as("jaccard_ppm"))
  }
}
