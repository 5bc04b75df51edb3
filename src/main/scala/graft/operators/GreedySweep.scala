package graft.operators

import graft.functions.Mercator
import graft.model.{Bounds, ClusterOptions}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A1 (optional faithful mode): the reference's greedy sweep clustering
  * (reference: cluster/cluster.go:1265-1360 `clusterPoints`) — sort by
  * projected x, sweep left-to-right, gather unprocessed points within
  * `radius` (x-window early exit), cluster when ≥ MinPoints else emit a
  * single; cluster id = the sweep's first member.
  *
  * The reference's global sweep is sequential (and its parallel variant
  * shares a `processed` map across goroutines — race-dependent output,
  * cluster.go:1379-1464). The deterministic distributed re-spec here:
  * points are bucketed into coarse tiles (32·radius wide), each tile is
  * swept independently inside ONE `mapPartitions` pass in a fixed
  * (px, id) order — same-input ⇒ same-output, unlike the reference.
  * Near tile borders results may differ from a global sweep (bounded by
  * one radius); the default engine mode remains [[GridCluster]]
  * (SURVEY §7.1 standardization) and the dispatcher below reproduces the
  * reference's method choice.
  *
  * This is the one justified `mapPartitions` in the clustering path:
  * the sweep is inherently imperative-sequential (each decision depends
  * on which earlier points were absorbed), so the relational ladder
  * (a)–(c) cannot express it.
  *
  * Scale: one shuffle (repartition by tile) + per-tile O(k²) sweeps with
  * the x-window break (the reference's own bound); tile width 32·radius
  * caps k at the points of ~32 cells, and the reference dispatches away
  * from greedy above 50k viewport points anyway.
  */
object GreedySweep {

  /** @param maxSweepPoints per-tile memory guard: a tile whose point
    *                        count exceeds this is NOT buffered for the
    *                        O(k²) sweep — it spills to streaming grid
    *                        semantics (snap-to-cell, constant memory per
    *                        cell), mirroring the reference dispatcher's
    *                        own cutoff away from the greedy method for
    *                        big inputs (cluster/cluster.go:2442-2458 via
    *                        :930-940). A pathological dense tile can
    *                        therefore never OOM an executor: resident
    *                        state is bounded by maxSweepPoints rows plus
    *                        |cells|·(minPoints−1) buffered singles.
    * @param fallbackTiles   optional accumulator counting tiles that
    *                        engaged the grid fallback (test/ops hook)
    * @return columns: id, lon, lat, count, is_cluster, <metricCols...>
    */
  def cluster(points: DataFrame, zoom: Int, bounds: Bounds,
              opts: ClusterOptions = ClusterOptions(),
              metricCols: Seq[String] = Nil,
              idCol: String = "id", lonCol: String = "lon", latCol: String = "lat",
              maxSweepPoints: Int = 50000,
              fallbackTiles: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val se = opts.scaleExtent(zoom)
    val radius = opts.radius
    val tileW = radius * 32.0
    // Fallback cell size: the density factor normally depends on the
    // viewport count, unknown mid-stream — the fallback only engages for
    // tiles already past the cutoff, so it deterministically uses the
    // threshold itself as the count (the "big input" branch the
    // reference dispatcher routes to grid).
    val fallbackCellSize = opts.cellSize(zoom, maxSweepPoints.toLong + 1)
    val proj = GridCluster.projectToViewport(points, zoom, bounds, opts, lonCol, latCol)
      .select(Seq(col(idCol).cast("long").as("_id"), col("px"), col("py")) ++
        metricCols.map(m => col(m).cast("double")): _*)
      .withColumn("_tile", floor(col("px") / lit(tileW)))

    val outSchema = StructType(
      Seq(StructField(idCol, LongType), StructField(lonCol, DoubleType),
        StructField(latCol, DoubleType), StructField("count", LongType),
        StructField("is_cluster", BooleanType)) ++
        metricCols.map(m => StructField(m, DoubleType)))

    val nMetrics = metricCols.size
    val minPoints = opts.minPoints

    val swept = proj
      .repartition(col("_tile"))
      .sortWithinPartitions(col("_tile"), col("px"), col("_id"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]

        def sweep(buf: scala.collection.mutable.ArrayBuffer[Row]): Unit = {
          val n = buf.length
          val processed = new Array[Boolean](n)
          val r2 = radius * radius
          var i = 0
          while (i < n) {
            if (!processed(i)) {
              val pi = buf(i)
              val px = pi.getDouble(1)
              val py = pi.getDouble(2)
              val nearby = scala.collection.mutable.ArrayBuffer(i)
              var j = i + 1
              var cont = true
              while (j < n && cont) {
                val pj = buf(j)
                if (pj.getDouble(1) - px > radius) cont = false // x-window break
                else if (!processed(j)) {
                  val dx = pj.getDouble(1) - px
                  val dy = pj.getDouble(2) - py
                  if (dx * dx + dy * dy <= r2) nearby += j
                }
                j += 1
              }
              if (nearby.length >= minPoints) {
                var sx = 0.0; var sy = 0.0
                val sums = new Array[Double](nMetrics)
                nearby.foreach { k =>
                  val p = buf(k)
                  sx += p.getDouble(1); sy += p.getDouble(2)
                  var m = 0
                  while (m < nMetrics) { sums(m) += p.getDouble(3 + m); m += 1 }
                  processed(k) = true
                }
                val c = nearby.length
                out += Row.fromSeq(
                  Seq(pi.getLong(0), Mercator.invXs(sx / c, se), Mercator.invYs(sy / c, se),
                    c.toLong, true) ++ sums.toSeq)
              } else {
                processed(i) = true
                out += Row.fromSeq(
                  Seq(pi.getLong(0), Mercator.invXs(px, se), Mercator.invYs(py, se), 1L, false) ++
                    (0 until nMetrics).map(m => pi.getDouble(3 + m)))
              }
            }
            i += 1
          }
        }

        // Streaming grid fallback state for one oversized tile: per-cell
        // aggregates, with member rows buffered only while the cell is
        // still below minPoints (they may need to be emitted as
        // singles) — memory per cell is O(minPoints), not O(points).
        final class CellState {
          var cnt = 0L
          var sx = 0.0
          var sy = 0.0
          var minId = Long.MaxValue
          val sums = new Array[Double](nMetrics)
          var members: scala.collection.mutable.ArrayBuffer[Row] =
            scala.collection.mutable.ArrayBuffer.empty
        }
        var grid: scala.collection.mutable.HashMap[(Long, Long), CellState] = null

        def addToGrid(r: Row): Unit = {
          val key = (math.floor(r.getDouble(1) / fallbackCellSize).toLong,
            math.floor(r.getDouble(2) / fallbackCellSize).toLong)
          val st = grid.getOrElseUpdate(key, new CellState)
          st.cnt += 1
          st.sx += r.getDouble(1)
          st.sy += r.getDouble(2)
          if (r.getLong(0) < st.minId) st.minId = r.getLong(0)
          var m = 0
          while (m < nMetrics) { st.sums(m) += r.getDouble(3 + m); m += 1 }
          if (st.cnt < minPoints) st.members += r
          else st.members = null // cluster-bound: member rows not needed
        }

        // deterministic emission order: cells sorted by (cell_x, cell_y)
        def emitGrid(): Unit = {
          grid.toSeq.sortBy(_._1).foreach { case (_, st) =>
            if (st.cnt >= minPoints)
              out += Row.fromSeq(
                Seq(st.minId, Mercator.invXs(st.sx / st.cnt, se),
                  Mercator.invYs(st.sy / st.cnt, se), st.cnt, true) ++ st.sums.toSeq)
            else st.members.foreach { p =>
              out += Row.fromSeq(
                Seq(p.getLong(0), Mercator.invXs(p.getDouble(1), se),
                  Mercator.invYs(p.getDouble(2), se), 1L, false) ++
                  (0 until nMetrics).map(m => p.getDouble(3 + m)))
            }
          }
          grid = null
        }

        // rows arrive tile-sorted: process each tile's contiguous run —
        // buffered sweep below the cutoff, streaming grid above it
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        var tile = Long.MinValue
        def flushTile(): Unit = {
          if (grid != null) emitGrid()
          else if (buf.nonEmpty) sweep(buf)
          buf.clear()
        }
        it.foreach { r =>
          val t = r.getLong(3 + nMetrics) // _tile is the last column
          if (t != tile) { flushTile(); tile = t }
          if (grid != null) addToGrid(r)
          else {
            buf += r
            if (buf.length > maxSweepPoints) {
              fallbackTiles.foreach(_.add(1))
              grid = scala.collection.mutable.HashMap.empty
              buf.foreach(addToGrid)
              buf.clear()
            }
          }
        }
        flushTile()
        out.iterator
      }(RowEncoder.encoderFor(outSchema))

    swept.toDF()
  }

  /** A4: the reference's method dispatcher (cluster.go:930-940) — grid
    * for big/low-zoom viewports, greedy sweep otherwise.
    */
  def dispatch(points: DataFrame, zoom: Int, bounds: Bounds,
               opts: ClusterOptions = ClusterOptions(),
               metricCols: Seq[String] = Nil,
               viewportCount: Long): DataFrame = {
    val useGrid = viewportCount > 50000 ||
      (viewportCount > 10000 && zoom < opts.maxZoom / 2) ||
      zoom < opts.maxZoom / 4
    if (useGrid) GridCluster.cluster(points, zoom, bounds, opts, metricCols)
    else cluster(points, zoom, bounds, opts, metricCols)
  }
}
