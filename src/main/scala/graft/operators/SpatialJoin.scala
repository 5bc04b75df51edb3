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
}
