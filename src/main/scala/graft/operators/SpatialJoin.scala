package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial join — "which places lie within radius r of
  * each point" over planar lon/lat degrees (the reference's cluster
  * distance geometry is likewise planar over projected coordinates;
  * reference: cluster/cluster.go grid cell neighborhood checks).
  *
  * Shape, not a cross join: both sides are bucketed into square grid
  * cells of side `radius`; a place is replicated to every cell its
  * radius-bbox covers (≤ 3×3 = 9 cells), a point lands in exactly one
  * cell, and candidates meet through an ordinary equi-join on the cell
  * key — at 100 TB this is one shuffle whose fan-in per reducer is
  * bounded by local point density, the standard distributed spatial
  * join. The exact predicate (squared Euclidean degree distance ≤ r²)
  * then filters candidates; the join is LOSSLESS vs the naive
  * all-pairs definition, which the DuckDB oracle still uses.
  *
  * Skew note: a celebrity cell (urban hot spot) is an AQE skew-join
  * case, same as any hot equi-key; the cell key composes with salting
  * if a single cell ever exceeds a reducer.
  */
object SpatialJoin {

  /** All (point, place) pairs with planar degree distance ≤ radius.
    * Output (UNORDERED): id, place_id, dist2 (exact IEEE squared
    * distance — engine-deterministic, no transcendentals).
    *
    * @param points  (idCol, lon, lat)
    * @param places  (placeIdCol, lon, lat) — typically ≪ points, so the
    *                exploded side broadcasts; AQE shuffles if not
    */
  def radiusJoin(points: DataFrame, places: DataFrame, radius: Double,
                 idCol: String = "id", placeIdCol: String = "place_id"): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val cs = lit(radius)
    def cellOf(c: org.apache.spark.sql.Column) = floor(c / cs).cast("long")
    val pts = points.select(col(idCol), col("lon").as("p_lon"), col("lat").as("p_lat"),
      cellOf(col("lon")).as("cx"), cellOf(col("lat")).as("cy"))
    val plc = places.select(col(placeIdCol), col("lon").as("q_lon"), col("lat").as("q_lat"),
        explode(sequence(cellOf(col("lon") - cs), cellOf(col("lon") + cs))).as("cx"),
        col("lat"))
      .select(col(placeIdCol), col("q_lon"), col("q_lat"), col("cx"),
        explode(sequence(cellOf(col("lat") - cs), cellOf(col("lat") + cs))).as("cy"))
    val dlon = col("p_lon") - col("q_lon")
    val dlat = col("p_lat") - col("q_lat")
    pts.join(plc, Seq("cx", "cy"))
      .withColumn("dist2", dlon * dlon + dlat * dlat)
      .filter(col("dist2") <= lit(radius * radius))
      .select(col(idCol), col(placeIdCol), col("dist2"))
  }

  /** Nearest place within `radius` of each point (points with no place
    * in range drop out). Output (UNORDERED): id, place_id, dist2.
    * Deterministic: ties break to the smallest place id.
    */
  def nearestWithin(points: DataFrame, places: DataFrame, radius: Double,
                    idCol: String = "id", placeIdCol: String = "place_id"): DataFrame = {
    val byPoint = Window.partitionBy(col(idCol))
      .orderBy(col("dist2"), col(placeIdCol))
    radiusJoin(points, places, radius, idCol, placeIdCol)
      .withColumn("rn", row_number().over(byPoint))
      .filter(col("rn") === 1)
      .select(col(idCol), col(placeIdCol), col("dist2"))
  }

  /** Strict point-in-convex-polygon containment on an INTEGER
    * coordinate lattice: a point is inside a CCW-wound convex polygon
    * iff every edge cross product (x₂−x₁)(pᵧ−y₁) − (y₂−y₁)(pₓ−x₁) is
    * > 0 — pure 64-bit integer arithmetic, so the containment set is
    * exactly reproducible in any engine (the SQL oracle evaluates the
    * same products). Boundary points (cross = 0) are OUTSIDE by
    * definition; pick lattice-odd polygon vertices if the boundary
    * must not touch data.
    */
  def insideConvex(poly: Seq[(Long, Long)],
                   x: org.apache.spark.sql.Column,
                   y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    poly.indices.map { i =>
      val (x1, y1) = poly(i)
      val (x2, y2) = poly((i + 1) % poly.size)
      (lit(x2 - x1) * (y - lit(y1)) - lit(y2 - y1) * (x - lit(x1))) > 0
    }.reduce(_ && _)

  /** Geofence report: per named convex zone, the count of contained
    * points, the smallest contained id, and exact integer coordinate
    * sums (so a centroid can be derived without float accumulation).
    * Zones with no points surface as explicit zeros.
    *
    * Scale shape: ONE scan evaluates every zone's containment test as
    * conditional aggregate columns (map-side combined, |zones| output
    * columns); the per-zone rows are unpivoted from the single
    * aggregate row — the broadcast-polygon geofence join specialised
    * to the aggregate-report case.
    */
  def geofenceCounts(pts: DataFrame, zones: Seq[(String, Seq[(Long, Long)])],
                     idCol: String = "id", xCol: String = "centi_lon",
                     yCol: String = "centi_lat"): DataFrame = {
    val aggs = zones.flatMap { case (name, poly) =>
      val in = insideConvex(poly, col(xCol), col(yCol))
      Seq(count(when(in, 1)).as(s"${name}_n"),
        min(when(in, col(idCol))).as(s"${name}_min_id"),
        sum(when(in, col(xCol))).as(s"${name}_sx"),
        sum(when(in, col(yCol))).as(s"${name}_sy"))
    }
    val wide = pts.agg(aggs.head, aggs.tail: _*)
    zones.map { case (name, _) =>
      wide.select(lit(name).as("zone"),
        col(s"${name}_n").as("n_inside"),
        coalesce(col(s"${name}_min_id"), lit(-1L)).as("min_id"),
        coalesce(col(s"${name}_sx"), lit(0L)).as("sum_x"),
        coalesce(col(s"${name}_sy"), lit(0L)).as("sum_y"))
    }.reduce(_ unionByName _).orderBy("zone")
  }
}
