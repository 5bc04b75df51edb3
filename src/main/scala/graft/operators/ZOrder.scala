package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) spatial layout — the storage-layout operator for
  * multi-dimensional locality at scale (public knowledge: Morton 1966;
  * the same interleaved-bit clustering Delta/Iceberg OPTIMIZE ZORDER
  * applies before writing files). Sorting or range-partitioning on the
  * Morton code places spatially-near points in the same file, so a
  * viewport/range scan touches few files — the file-layout complement
  * to the catalog's tile_z5 partition pruning.
  */
object ZOrder {

  /** Layout constants — the single source of truth shared with the
    * oracle SQL (SparkEntry derives its DuckDB query from these, so the
    * two sides cannot silently desynchronize).
    */
  val CellBits = 16
  val LonMin = -180.0; val LonMax = 180.0
  val LatMin = -85.0; val LatMax = 85.0
  val DefaultLog2Buckets = 6
  /** 16-bit cell axis → z5-scale 7-bit tile axis. */
  val TileShift: Int = CellBits - 7

  /** Quantize a coordinate to a `bits`-bit integer cell on [lo, hi).
    * The floor input is a fixed-shape double chain — cross-engine safe
    * because both engines evaluate the identical expression on
    * identical doubles; the clamp handles hi-edge/out-of-range values.
    */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column =
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c - lit(lo)) / lit(hi - lo) * lit((1L << bits).toDouble)).cast("long")))

  /** Bit-interleaved Morton code of two 16-bit cells: x in the even
    * bits, y in the odd. Unrolled literal shifts (codegen-friendly);
    * the parts are bit-disjoint so summation is exact OR.
    */
  def morton16(x: Column, y: Column): Column = {
    val parts = (0 until 16).flatMap { j =>
      Seq(shiftleft(shiftright(x, j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftright(y, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }
    parts.reduce(_ + _)
  }

  /** Layout report over the Morton-ordered space: the top `log2Buckets`
    * bits of the code split the curve into equal Z-RANGES (a map-side
    * integer op — no global sort; a writer would `repartitionByRange`
    * on the same key), and each range reports its point count, cell
    * bounding box, and distinct-z5-tile touch count — small bboxes/few
    * tiles per bucket is exactly the locality a Z-ordered layout
    * buys.
    *
    * Scale shape: one narrow map (quantize + interleave) and ONE
    * aggregation keyed by the bounded bucket id; the tile-touch count
    * is a distinct-agg on the same key. Output: zbucket, n_points,
    * min_x, max_x, min_y, max_y, n_tiles — ordered by zbucket.
    */
  def layoutStats(points: DataFrame, lonCol: String = "lon", latCol: String = "lat",
                  log2Buckets: Int = DefaultLog2Buckets): DataFrame = {
    require(log2Buckets >= 1 && log2Buckets <= CellBits, s"bad bucket bits $log2Buckets")
    val x = quantize(col(lonCol), LonMin, LonMax, CellBits)
    val y = quantize(col(latCol), LatMin, LatMax, CellBits)
    points
      .select(x.as("x"), y.as("y"))
      .withColumn("z", morton16(col("x"), col("y")))
      .withColumn("zbucket", shiftright(col("z"), 2 * CellBits - log2Buckets))
      // z5-scale tile id: the top 7 bits of each 16-bit cell axis
      .withColumn("tile",
        shiftleft(shiftright(col("x"), TileShift), CellBits - TileShift)
          + shiftright(col("y"), TileShift))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n_points"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        countDistinct(col("tile")).as("n_tiles"))
      .orderBy(col("zbucket"))
  }
}
