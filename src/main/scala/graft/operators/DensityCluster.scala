package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-density clustering — the cell-level DBSCAN approximation
  * (public knowledge: Ester et al. 1996 for the density semantics; the
  * grid formulation follows the GriDBSCAN/CLIQUE family): quantize
  * points to integer grid cells, call a cell CORE when its count
  * exceeds `densityFactor`× the global mean cell density, merge
  * 8-adjacent core cells into clusters, and attach non-core cells that
  * touch a cluster as BORDER mass. Everything rides an integer lattice
  * (counts, cell ids, the exact `n·totalCells > factor·N` core test),
  * so the clustering is engine-identical and oracle-checkable — the
  * property the reference's racy parallel sweep
  * (`cluster/cluster.go:1379`) gives up.
  *
  * Scale shape: ONE count shuffle keyed by cell (map-side combined —
  * input rows never travel), after which every structure is bounded by
  * |non-empty cells|, not |points|: the neighbor expansion is 9×|core
  * cells|, component labels come from [[Dedup.nearDupGroups]]'s
  * pointer-jumping propagation (O(log diameter) tiny rounds), and the
  * output is |clusters| rows. At 100 TB the only term that grows is
  * the first aggregation, which is the minimum any density estimate
  * pays.
  */
object DensityCluster {

  /** @param pts        points with integer cell coords (`id`, `cx`, `cy`)
    * @param totalCells fixed grid size (|x-cells| · |y-cells|) — a
    *                   layout constant, NOT data-derived, so the core
    *                   threshold is deterministic
    * @param densityFactor core iff n · totalCells > densityFactor · N
    * Output: one row per cluster — cluster_id (min cell key in the
    * component), n_cells, n_core_points, n_border_points, and the
    * core-cell bounding box.
    */
  /** Per-cell point counts — the ONLY |points|-sized stage of
    * [[gridDbscan]]. Map-side combined, so the one shuffle carries
    * ≤ |cells| × |partitions| rows however many points feed it
    * (`DensityClusterSpec` measures this at N and 10N, the pyramid
    * skew contract). The scalar key multiplier just has to clear the
    * bounded cy range.
    */
  def cellCounts(pts: DataFrame): DataFrame =
    pts.groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
      .select((col("cx") * lit(1000000L) + col("cy")).as("k"),
        col("cx"), col("cy"), col("n"))

  def gridDbscan(pts: DataFrame, totalCells: Long,
                 densityFactor: Long): DataFrame = {
    val counts = CachePool.track(cellCounts(pts))
    val total = counts.agg(sum(col("n")).as("nn"))
    val core = CachePool.track(
      counts.crossJoin(broadcast(total))
        .filter(col("n") * lit(totalCells) > lit(densityFactor) * col("nn"))
        .select(col("k"), col("cx"), col("cy"), col("n")))
    // 8-neighbourhood edges between core cells: expand each core cell
    // to its 9 neighbour keys and equi-join back (never a theta join)
    val offsets = Seq(-1L, 0L, 1L)
    val nbrKeys = offsets.flatMap(dx => offsets.map(dy => (dx, dy)))
      .filterNot { case (dx, dy) => dx == 0 && dy == 0 }
      .map { case (dx, dy) =>
        struct(((col("cx") + lit(dx)) * lit(1000000L) + col("cy") + lit(dy)).as("nk"))
      }
    val edges = core
      .select(col("k"), explode(array(nbrKeys: _*)).as("o"))
      .select(col("k"), col("o.nk").as("nk"))
      .join(core.select(col("k").as("nk")), "nk")
      .filter(col("k") < col("nk"))
      .select(col("k").as("id_a"), col("nk").as("id_b"))
    // components over the touching core cells; isolated core cells are
    // their own singleton cluster
    val comp = Dedup.nearDupGroups(edges)
      .select(col("doc_id").as("k"), col("group_id").as("cluster_id"))
    val labeled = CachePool.track(
      core.join(comp, Seq("k"), "left")
        .select(col("k"), col("cx"), col("cy"), col("n"),
          coalesce(col("cluster_id"), col("k")).as("cluster_id")))
    // border mass: non-core cells adjacent to ≥1 core cell contribute
    // their points to the (deterministic: min) touching cluster
    val nonCore = counts.join(labeled.select(col("k")), Seq("k"), "left_anti")
    val border = nonCore
      .select(col("k"), col("n"), explode(array(nbrKeys: _*)).as("o"))
      .select(col("k"), col("n"), col("o.nk").as("nk"))
      .join(labeled.select(col("k").as("nk"), col("cluster_id")), "nk")
      .groupBy(col("k"), col("n"))
      .agg(min(col("cluster_id")).as("cluster_id"))
      .groupBy(col("cluster_id"))
      .agg(sum(col("n")).as("n_border_points"))
    labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_core_points"),
        min(col("cx")).as("min_cx"), max(col("cx")).as("max_cx"),
        min(col("cy")).as("min_cy"), max(col("cy")).as("max_cy"))
      .join(border, Seq("cluster_id"), "left")
      .select(col("cluster_id"), col("n_cells"), col("n_core_points"),
        coalesce(col("n_border_points"), lit(0L)).as("n_border_points"),
        col("min_cx"), col("max_cx"), col("min_cy"), col("max_cy"))
      .orderBy(col("cluster_id"))
  }
}
