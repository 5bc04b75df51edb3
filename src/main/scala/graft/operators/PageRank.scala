package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic PageRank over an undirected pair graph — the graph-
  * authority companion to [[Dedup.nearDupGroups]]'s connected
  * components: where CC answers "which docs form one duplication
  * cluster", rank answers "which doc is the HUB of its cluster" (the
  * most-connected template/boilerplate carrier — the doc a curation
  * pipeline inspects first).
  *
  * Arithmetic is the exact integer micro-unit lattice (same discipline
  * as the k-means trainer): ranks live in 1e-6 units, every division is
  * integer floor division (`div` in Spark, `//` in DuckDB — identical
  * on non-negatives), so k iterations are bit-identical across engines
  * and the oracle can unroll the same iterations as SQL CTEs. The
  * floored remainders simply leak out of the system (total mass decays
  * slightly) — fine for a RANKING signal, and the price of cross-engine
  * exactness.
  *
  * Scale shape: degrees ride on the edge list (one window pass,
  * persisted through the cache pool); each iteration is ONE
  * edges⋈ranks equi-join + ONE aggregation by destination — the
  * standard distributed PageRank round, k shuffles total, nothing
  * quadratic, no driver-side data movement (the loop is plan
  * composition only).
  */
object PageRank {

  private val Unit6 = 1000000L

  /** Rank in micro-units after `iters` damped rounds over the
    * bidirectional closure of `pairs` (id_a, id_b). Every node of the
    * pair graph has degree ≥ 1 and receives inflow each round (edges
    * are bidirectional), so the node set is stable across iterations.
    * Output (UNORDERED): doc_id, rank_micro.
    */
  def rankMicro(pairs: DataFrame, iters: Int = 4, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val base = Unit6 * (100L - dampingPct) / 100L
    // both directions in one pass (no self-union re-execution — the
    // same explode trick as nearDupGroups), degree attached per source
    val byU = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    val edges = CachePool.track(pairs
      .select(explode(array(
        struct(col("id_a").as("u"), col("id_b").as("v")),
        struct(col("id_b").as("u"), col("id_a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .withColumn("deg", count(lit(1)).over(byU)))
    var rank = edges.select(col("u").as("id")).distinct()
      .withColumn("r", lit(Unit6))
    for (_ <- 1 to iters) {
      rank = edges.join(rank, edges("u") === rank("id"))
        .select(col("v"), expr("r div deg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("inflow"))
        .select(col("v").as("id"),
          (lit(base) + expr(s"($dampingPct * inflow) div 100")).as("r"))
    }
    rank.select(col("id").as("doc_id"), col("r").as("rank_micro"))
  }

  /** PERSONALIZED PageRank on the same exact micro-unit lattice as
    * [[rankMicro]]: the teleport mass lands only on the
    * personalization set instead of uniformly, so the stationary rank
    * measures proximity TO THOSE SOURCES through the graph — "which
    * docs sit closest to this known-bad boilerplate family" rather
    * than global hubness. Identical iteration shape (one equi-join +
    * one destination aggregation per round, degrees riding the edge
    * list); the source set joins in as a broadcast-small flag frame,
    * both for the initial mass and the per-round base term. Sources
    * absent from the graph contribute nothing — exactly the oracle's
    * node-set semantics. Output (UNORDERED): doc_id, ppr_micro.
    */
  def personalizedRankMicro(pairs: DataFrame, sources: DataFrame,
                            iters: Int = 4, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val base = Unit6 * (100L - dampingPct) / 100L
    val byU = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    val edges = CachePool.track(pairs
      .select(explode(array(
        struct(col("id_a").as("u"), col("id_b").as("v")),
        struct(col("id_b").as("u"), col("id_a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .withColumn("deg", count(lit(1)).over(byU)))
    val src = CachePool.track(sources
      .select(col(sources.columns.head).cast("long").as("id")).distinct()
      .withColumn("is_src", lit(true)))
    var rank = edges.select(col("u").as("id")).distinct()
      .join(broadcast(src), Seq("id"), "left")
      .select(col("id"), when(col("is_src"), lit(Unit6)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      rank = edges.join(rank, edges("u") === rank("id"))
        .select(col("v"), expr("r div deg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("inflow"))
        .join(broadcast(src), col("v") === src("id"), "left")
        .select(col("v").as("id"),
          (when(col("is_src"), lit(base)).otherwise(lit(0L)) +
            expr(s"($dampingPct * inflow) div 100")).as("r"))
    }
    rank.select(col("id").as("doc_id"), col("r").as("ppr_micro"))
  }

  /** Multi-source bounded-hop BFS over the undirected pair graph: the
    * shortest hop distance for EVERY ordered (src, dst) pair reachable
    * within `maxHops` — the neighborhood-radius query ("how far is each
    * near-duplicate from each other member of its cluster"; hop count =
    * transitive-contamination depth, the thing [[Dedup.nearDupGroups]]'s
    * flat components erase).
    *
    * Spark-first shape: the textbook frontier-expansion loop as plan
    * composition — each round is ONE frontier⋈edges equi-join, a
    * distinct, and an anti-join against the already-reached set (which
    * both dedups states and makes first-reach = min-hops by
    * construction). `maxHops` bounded rounds, each a key-partitioned
    * shuffle; state is (src, dst) pairs actually reachable — never
    * materializes anything quadratic in the node count unless the graph
    * really is that dense. The oracle re-derives the same distances
    * declaratively (recursive CTE + min(d)).
    *
    * Output (UNORDERED): src_id, doc_id, hops (1-based; self pairs
    * excluded).
    */
  def boundedHops(pairs: DataFrame, maxHops: Int,
                  aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    require(maxHops >= 1)
    val edges = CachePool.track(
      pairs.select(col(aCol).as("u"), col(bCol).as("v"))
        .union(pairs.select(col(bCol).as("u"), col(aCol).as("v"))))
    var frontier = CachePool.track(
      edges.select(col("u").as("src_id"), col("v").as("doc_id")).distinct()
        .withColumn("hops", lit(1L)))
    var reached = frontier
    for (h <- 2 to maxHops) {
      val next = frontier.as("f").join(edges.as("e"), col("f.doc_id") === col("e.u"))
        .select(col("f.src_id").as("src_id"), col("e.v").as("doc_id"))
        .distinct()
        .filter(col("src_id") =!= col("doc_id"))
        .join(reached.select(col("src_id"), col("doc_id")), Seq("src_id", "doc_id"), "left_anti")
        .withColumn("hops", lit(h.toLong))
      frontier = CachePool.track(next)
      reached = CachePool.track(reached.union(frontier))
    }
    reached
  }

  /** Hop-bounded WEIGHTED shortest paths from every node — the
    * weighted twin of [[boundedHops]] (multi-source Bellman–Ford):
    * minimum total edge weight over walks of at most `maxHops` edges,
    * hop count breaking cost ties (fewest hops among equal-cost
    * walks). Both criteria ride ONE integer lattice — `cost·10 + hops`
    * (hence `maxHops ≤ 9`) — so the answer is engine-exact, no double
    * accumulation anywhere.
    *
    * Per relaxation round the frontier keeps only the per-(src, dst)
    * minimum: any continuation of a dominated walk is dominated
    * (non-negative weights), so each of the `maxHops − 1` rounds is
    * one co-partitioned join + partial-aggregated min — state is
    * bounded by reachable PAIRS, never by walk count, and the round
    * count is a compile-time constant, not data-dependent. That is the
    * 100 TB shape: k joins over a pair-keyed frame, no driver loop,
    * no walk enumeration (the DuckDB oracle DOES enumerate walks
    * declaratively — recursive CTE — and must agree).
    */
  def weightedHops(pairs: DataFrame, maxHops: Int,
                   aCol: String = "id_a", bCol: String = "id_b",
                   wCol: String = "w"): DataFrame = {
    require(maxHops >= 1 && maxHops <= 9, "hops ride a base-10 tie lattice")
    val edges = CachePool.track(
      pairs.select(col(aCol).as("u"), col(bCol).as("v"), col(wCol).cast("long").as("w"))
        .union(pairs.select(col(bCol).as("u"), col(aCol).as("v"), col(wCol).cast("long").as("w"))))
    var frontier = CachePool.track(
      edges.groupBy(col("u").as("src_id"), col("v").as("doc_id"))
        .agg(min(col("w")).as("cost"))
        .withColumn("hops", lit(1L)))
    var best = frontier
    for (h <- 2 to maxHops) {
      val next = frontier.as("f").join(edges.as("e"), col("f.doc_id") === col("e.u"))
        .filter(col("e.v") =!= col("f.src_id"))
        .groupBy(col("f.src_id").as("src_id"), col("e.v").as("doc_id"))
        .agg(min(col("f.cost") + col("e.w")).as("cost"))
        .withColumn("hops", lit(h.toLong))
      frontier = CachePool.track(next)
      best = best.union(frontier)
    }
    best.groupBy(col("src_id"), col("doc_id"))
      .agg(min(col("cost") * 10 + col("hops")).as("c"))
      .selectExpr("src_id", "doc_id",
        "c DIV 10 AS cost_ppm", "c % 10 AS hops")
  }

  /** Per-node triangle count + local clustering coefficient over the
    * undirected pair graph — the third graph-health primitive next to
    * connected components (membership) and PageRank (authority): a
    * near-dup cluster whose members form many triangles is a dense
    * template family (one boilerplate mutated everywhere); a triangle-
    * free star is one hub copied once into many places. Curation
    * treats the two differently, so the coefficient is a first-class
    * corpus-cartography column.
    *
    * Algorithm is the standard degree-ordered edge orientation (public
    * knowledge; cf. Suri & Vassilvitskii, "Counting Triangles and the
    * Curse of the Last Reducer", WWW 2011): orient every edge toward
    * the (degree, id)-larger endpoint, build wedges from each node's
    * out-edges, close them against the oriented edge set. Out-degrees
    * under this orientation are O(√m), so the wedge table — the only
    * super-linear intermediate — is bounded by m^1.5 instead of the
    * Σdeg² a hub-heavy graph would produce; every triangle is counted
    * exactly once, no orientation-dependent result.
    *
    * Scale shape: two equi-joins (wedge build on the shared tail,
    * wedge close on the (v,w) pair) + one explode/agg for per-node
    * counts; the oriented edge table is pool-persisted and reused by
    * both joins. Output (ORDERED): doc_id, degree, n_tri, cc_ppm
    * (= round(2·n_tri·1e6 / (deg·(deg−1))), 0 below degree 2).
    */
  def triangleStats(pairs: DataFrame): DataFrame = {
    val e = pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .distinct()
    val deg = CachePool.track(
      e.select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("d")))
    val fwd = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oe = CachePool.track(e
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
      .select(
        when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("v"),
        when(fwd, col("db")).otherwise(col("da")).as("dv")))
    val wedges = oe.select(col("u"), col("v").as("y"), col("dv").as("dy"))
      .join(oe.select(col("u"), col("v").as("z"), col("dv").as("dz")), Seq("u"))
      .filter(col("dy") < col("dz") || (col("dy") === col("dz") && col("y") < col("z")))
    val tri = wedges
      .join(oe.select(col("u").as("y"), col("v").as("z")), Seq("y", "z"))
      .select(col("u").as("x"), col("y"), col("z"))
    val perNode = tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("d").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("d") >= 2,
          round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) * lit(1000000.0)
            / (col("d") * (col("d") - lit(1L)))).cast("long"))
          .otherwise(lit(0L)).as("cc_ppm"))
      .orderBy("doc_id")
  }

  /** Common-neighbor structural similarity: every node pair sharing at
    * least one neighbor, with the shared-neighbor count, both degrees,
    * the neighbor-set Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| in exact
    * floor-ppm, and whether the pair is itself an edge (is_edge = 0 →
    * a link-prediction candidate; 1 → closed triad). The count-based
    * cousin of Adamic–Adar that needs no per-neighbor log, so the
    * whole output sits on an integer lattice.
    *
    * Scale shape: wedge enumeration self-joins the adjacency list on
    * the CENTER node — Σ deg(u)² work, fine on the degree-bounded
    * near-dup graph; on hubby graphs pass maxCenterDegree to drop
    * high-degree centers first (the standard wedge-sampling
    * compromise, same knob family as triangleStats' orientation).
    */
  def commonNeighbors(pairs: DataFrame,
                      maxCenterDegree: Int = Int.MaxValue): DataFrame = {
    val e = pairs.select(least(col("id_a"), col("id_b")).as("a"),
      greatest(col("id_a"), col("id_b")).as("b")).distinct()
    val adj = CachePool.track(
      e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v"))))
    val deg = CachePool.track(adj.groupBy(col("u")).agg(count(lit(1)).as("d")))
    // the hub cap is opt-in: don't pay the degree join on the default path
    val centers =
      if (maxCenterDegree == Int.MaxValue) adj
      else adj.join(deg.filter(col("d") <= maxCenterDegree), "u")
        .select(col("u"), col("v"))
    val cn = centers.select(col("u"), col("v").as("ya"))
      .join(centers.select(col("u"), col("v").as("yb")), Seq("u"))
      .filter(col("ya") < col("yb"))
      .groupBy(col("ya").as("na"), col("yb").as("nb"))
      .agg(count(lit(1)).as("common"))
    cn.join(deg.select(col("u").as("na"), col("d").as("deg_a")), "na")
      .join(deg.select(col("u").as("nb"), col("d").as("deg_b")), "nb")
      .join(e.select(col("a").as("na"), col("b").as("nb"), lit(1L).as("edge_flag")),
        Seq("na", "nb"), "left")
      .select(col("na").as("id_a"), col("nb").as("id_b"), col("common"),
        col("deg_a"), col("deg_b"),
        expr("common * 1000000 div (deg_a + deg_b - common)").as("nbr_jaccard_ppm"),
        coalesce(col("edge_flag"), lit(0L)).as("is_edge"))
      .orderBy("id_a", "id_b")
  }

  /** Degree assortativity (Newman's r) of the undirected pair graph:
    * do high-degree docs link to other high-degree docs (template
    * families clumping, r → 1) or to leaves (hub-and-spoke copying,
    * r < 0)? With per-edge endpoint degrees (j, k) and m edges,
    * r = (4m·S1 − S2²) / (2m·S3 − S2²) for S1 = Σjk, S2 = Σ(j+k),
    * S3 = Σ(j²+k²) — moment sums kept as exact DECIMAL(38,0) (per-edge
    * BIGINT products, as q_gini), ONE double expression finish rounded
    * to ppm, zero denominator NULL-guarded in double both engines.
    * Scale shape: degree table + two key-co-partitioned joins + one
    * map-side-combined moment aggregation — no windows, no collect.
    */
  def assortativity(pairs: DataFrame): DataFrame = {
    val e = CachePool.track(
      pairs.select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b")).distinct())
    val deg = CachePool.track(
      e.select(col("a").as("u")).unionByName(e.select(col("b").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("d")))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    e.join(deg.select(col("u").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("u").as("b"), col("d").as("db")), "b")
      .agg(count(lit(1)).as("n_edges"),
        sum((col("da") * col("db")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast(org.apache.spark.sql.types.LongType).as("s1"),
        sum((col("da") + col("db")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast(org.apache.spark.sql.types.LongType).as("s2"),
        sum((col("da") * col("da") + col("db") * col("db"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast(org.apache.spark.sql.types.LongType).as("s3"))
      .crossJoin(broadcast(nNodes))
      .select(col("n_nodes"), col("n_edges"), col("s1"), col("s2"), col("s3"))
      .withColumn("assort_ppm", expr(
        "CASE WHEN 2.0 * CAST(n_edges AS DOUBLE) * CAST(s3 AS DOUBLE) " +
          "- CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) = 0.0 THEN NULL " +
          "ELSE CAST(round((4.0 * CAST(n_edges AS DOUBLE) * CAST(s1 AS DOUBLE) " +
          "- CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) " +
          "/ (2.0 * CAST(n_edges AS DOUBLE) * CAST(s3 AS DOUBLE) " +
          "- CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) * 1000000.0) AS BIGINT) END"))
  }
}
