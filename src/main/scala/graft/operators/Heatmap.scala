package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid kernel-density heatmap — the server-side density surface a map
  * front end shades (the aggregation-side sibling of
  * [[DensityCluster]]'s clustering view over the same cell grid).
  *
  * Discrete Epanechnikov-style INTEGER kernel:
  * `w(dx,dy) = max(0, r²+1 − (dx²+dy²))` — every density is an exact
  * int64 Σ count·w, so the result is engine-exact with no float
  * anywhere (the centi-degree cell snap upstream is already pure
  * integer arithmetic).
  *
  * Scale shape: one map-side-combined cell count (|points| → |cells|),
  * then each cell explodes to its ≤ (2r+1)² kernel offsets — a
  * constant fan-out of the CELL table, not the point table — and one
  * more combined groupBy. Nothing quadratic, nothing global.
  */
object Heatmap {

  /** @param cells one row per point with integer cell coords
    * @return (cell_x, cell_y, density), unordered
    */
  def kde(cells: DataFrame, radius: Int,
          cxCol: String = "cx", cyCol: String = "cy"): DataFrame = {
    require(radius >= 0 && radius <= 16, s"unreasonable kernel radius $radius")
    val counts = cells.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"))
      .agg(count(lit(1)).as("n"))
    val offsets = for {
      dx <- -radius to radius
      dy <- -radius to radius
      w = radius * radius + 1 - (dx * dx + dy * dy)
      if w > 0
    } yield (dx, dy, w.toLong)
    val offCol = array(offsets.map { case (dx, dy, w) =>
      struct(lit(dx).as("dx"), lit(dy).as("dy"), lit(w).as("w"))
    }: _*)
    counts.select(col("cx"), col("cy"), col("n"), explode(offCol).as("o"))
      .groupBy((col("cx") + col("o.dx")).as("cell_x"),
        (col("cy") + col("o.dy")).as("cell_y"))
      .agg(sum(col("n") * col("o.w")).as("density"))
  }
}
