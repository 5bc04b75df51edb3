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

  /** @return columns: id, lon, lat, count, is_cluster, <metricCols...> */
  def cluster(points: DataFrame, zoom: Int, bounds: Bounds,
              opts: ClusterOptions = ClusterOptions(),
              metricCols: Seq[String] = Nil,
              idCol: String = "id", lonCol: String = "lon", latCol: String = "lat"): DataFrame = {
    val se = opts.scaleExtent(zoom)
    val radius = opts.radius
    val tileW = radius * 32.0
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

        // rows arrive tile-sorted: sweep each tile's contiguous run
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        var tile = Long.MinValue
        it.foreach { r =>
          val t = r.getLong(3 + nMetrics) // _tile is the last column
          if (t != tile && buf.nonEmpty) { sweep(buf); buf.clear() }
          tile = t
          buf += r
        }
        if (buf.nonEmpty) sweep(buf)
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
