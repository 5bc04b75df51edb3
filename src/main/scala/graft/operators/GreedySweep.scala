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
  * (x, id) order — same-input ⇒ same-output, unlike the reference.
  * Near tile borders results may differ from a global sweep (bounded by
  * one radius); the default engine mode remains [[GridCluster]]
  * (SURVEY §7.1 standardization) and the dispatcher below reproduces the
  * reference's method choice.
  *
  * QUANTIZED EXACT ARITHMETIC (round-10): the sweep runs on projected
  * coordinates quantized to the 1/64-pixel integer lattice
  * (`qx = round(px·64)` — the ·2⁶ scaling is a bare exponent bump, so
  * no new float error enters) and metrics quantized to cents. Every
  * membership decision is then an exact int64 comparison and every
  * centroid accumulator an exact int64 sum — order-free and
  * bit-identical across engines — which is what lets the driver's
  * DuckDB oracle replay the sweep hash-exactly (a recursive CTE over
  * the same per-tile (qx, id)-sorted lists; see
  * [[graft.SparkEntry]]'s `greedySweepSql`). Granularity 1/64 px is
  * ~0.04% of the default 40 px radius — far inside the reference's own
  * float noise — and the coarse lattice step keeps the
  * libm-last-ulp-flips-the-rounding probability per point at ~2⁻²⁶.
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

  /** Coordinate lattice: quantized units per pixel (a power of two, so
    * `px · Scale` is exact).
    */
  val Scale: Double = 64.0

  /** Tile width on the quantized lattice: 32·radius px. */
  def tileWidthQ(opts: ClusterOptions): Long =
    math.max(1L, math.round(opts.radius * 32.0 * Scale))

  /** Squared radius on the quantized lattice (int64 — membership tests
    * are exact integer comparisons).
    */
  def radius2Q(opts: ClusterOptions): Long = {
    val rq = opts.radius * Scale
    math.round(rq * rq)
  }

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
    val tileWq = tileWidthQ(opts)
    val r2q = radius2Q(opts)
    // Fallback cell size (px): the density factor normally depends on
    // the viewport count, unknown mid-stream — the fallback only
    // engages for tiles already past the cutoff, so it
    // deterministically uses the threshold itself as the count (the
    // "big input" branch the reference dispatcher routes to grid).
    val fallbackCellSize = opts.cellSize(zoom, maxSweepPoints.toLong + 1)
    val proj = GridCluster.projectToViewport(points, zoom, bounds, opts, lonCol, latCol)
      .select(Seq(col(idCol).cast("long").as("_id"),
        round(col("px") * lit(Scale)).cast("long").as("qx"),
        round(col("py") * lit(Scale)).cast("long").as("qy")) ++
        metricCols.map(m => round(col(m) * lit(100.0)).cast("long").as(m)): _*)
      .withColumn("_tile", expr(s"qx div $tileWq"))

    val outSchema = StructType(
      Seq(StructField(idCol, LongType), StructField(lonCol, DoubleType),
        StructField(latCol, DoubleType), StructField("count", LongType),
        StructField("is_cluster", BooleanType)) ++
        metricCols.map(m => StructField(m, DoubleType)))

    val nMetrics = metricCols.size
    val minPoints = opts.minPoints

    // lattice units → degrees, the exact expression shapes the oracle
    // mirrors: x = (Σqx/c)/Scale px, then the Mercator inverses.
    // Local copies only — a field reference would drag the (non-
    // serializable) GreedySweep$ object into the task closure.
    val scaleL = Scale
    val outLon = (sumQx: Long, c: Long) =>
      Mercator.invXs((sumQx.toDouble / c) / scaleL, se)
    val outLat = (sumQy: Long, c: Long) =>
      Mercator.invYs((sumQy.toDouble / c) / scaleL, se)

    val swept = proj
      .repartition(col("_tile"))
      .sortWithinPartitions(col("_tile"), col("qx"), col("_id"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]

        def sweep(buf: scala.collection.mutable.ArrayBuffer[Row]): Unit = {
          val n = buf.length
          val processed = new Array[Boolean](n)
          var i = 0
          while (i < n) {
            if (!processed(i)) {
              val pi = buf(i)
              val px = pi.getLong(1)
              val py = pi.getLong(2)
              val nearby = scala.collection.mutable.ArrayBuffer(i)
              var j = i + 1
              var cont = true
              while (j < n && cont) {
                val pj = buf(j)
                val dx = pj.getLong(1) - px
                if (dx * dx > r2q) cont = false // x-window break (qx sorted)
                else if (!processed(j)) {
                  val dy = pj.getLong(2) - py
                  if (dx * dx + dy * dy <= r2q) nearby += j
                }
                j += 1
              }
              if (nearby.length >= minPoints) {
                var sx = 0L; var sy = 0L
                val sums = new Array[Long](nMetrics)
                nearby.foreach { k =>
                  val p = buf(k)
                  sx += p.getLong(1); sy += p.getLong(2)
                  var m = 0
                  while (m < nMetrics) { sums(m) += p.getLong(3 + m); m += 1 }
                  processed(k) = true
                }
                val c = nearby.length
                out += Row.fromSeq(
                  Seq(pi.getLong(0), outLon(sx, c), outLat(sy, c), c.toLong, true) ++
                    sums.toSeq.map(_ / 100.0))
              } else {
                processed(i) = true
                out += Row.fromSeq(
                  Seq(pi.getLong(0), outLon(px, 1), outLat(py, 1), 1L, false) ++
                    (0 until nMetrics).map(m => pi.getLong(3 + m) / 100.0))
              }
            }
            i += 1
          }
        }

        // Streaming grid fallback state for one oversized tile: per-cell
        // aggregates, with member rows buffered only while the cell is
        // still below minPoints (they may need to be emitted as
        // singles) — memory per cell is O(minPoints), not O(points).
        // The fallback is a memory guard, not an oracle path (the
        // driver's sweep oracle never triggers it), so its cell snap
        // runs in plain double math off the quantized coords.
        final class CellState {
          var cnt = 0L
          var sx = 0L
          var sy = 0L
          var minId = Long.MaxValue
          val sums = new Array[Long](nMetrics)
          var members: scala.collection.mutable.ArrayBuffer[Row] =
            scala.collection.mutable.ArrayBuffer.empty
        }
        var grid: scala.collection.mutable.HashMap[(Long, Long), CellState] = null

        def addToGrid(r: Row): Unit = {
          val key = (math.floor(r.getLong(1) / Scale / fallbackCellSize).toLong,
            math.floor(r.getLong(2) / Scale / fallbackCellSize).toLong)
          val st = grid.getOrElseUpdate(key, new CellState)
          st.cnt += 1
          st.sx += r.getLong(1)
          st.sy += r.getLong(2)
          if (r.getLong(0) < st.minId) st.minId = r.getLong(0)
          var m = 0
          while (m < nMetrics) { st.sums(m) += r.getLong(3 + m); m += 1 }
          if (st.cnt < minPoints) st.members += r
          else st.members = null // cluster-bound: member rows not needed
        }

        // deterministic emission order: cells sorted by (cell_x, cell_y)
        def emitGrid(): Unit = {
          grid.toSeq.sortBy(_._1).foreach { case (_, st) =>
            if (st.cnt >= minPoints)
              out += Row.fromSeq(
                Seq(st.minId, outLon(st.sx, st.cnt), outLat(st.sy, st.cnt),
                  st.cnt, true) ++ st.sums.toSeq.map(_ / 100.0))
            else st.members.foreach { p =>
              out += Row.fromSeq(
                Seq(p.getLong(0), outLon(p.getLong(1), 1), outLat(p.getLong(2), 1),
                  1L, false) ++
                  (0 until nMetrics).map(m => p.getLong(3 + m) / 100.0))
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
