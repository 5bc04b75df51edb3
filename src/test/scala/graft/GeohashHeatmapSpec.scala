package graft

import graft.functions.Geohash
import graft.operators.Heatmap
import org.apache.spark.sql.functions._

/** Geohash encoding against canonical public test vectors, and the
  * KDE heatmap's exact mass conservation.
  */
class GeohashHeatmapSpec extends SparkSpec {
  import spark.implicits._

  test("geohash matches canonical vectors at several precisions") {
    val pts = Seq(
      (-5.603, 42.605),    // classic example → ezs42
      (10.40744, 57.64911), // Wikipedia example → u4pruydqqvj
      (-0.1278, 51.5074),  // London
      (0.0, 0.0), (179.999, 89.999), (-180.0, -90.0)
    ).toDF("lon", "lat")
    val out5 = pts.select(Geohash.encode(col("lon"), col("lat"), 5).as("g")).as[String].collect()
    assert(out5(0) == "ezs42", s"got ${out5(0)}")
    assert(out5(1) == "u4pru", s"got ${out5(1)}")
    assert(out5(3) == "s0000", s"got ${out5(3)}") // (0,0) → s000…
    val out11 = pts.select(Geohash.encode(col("lon"), col("lat"), 11).as("g")).as[String].collect()
    assert(out11(1) == "u4pruydqqvj", s"got ${out11(1)}")
    // prefix property: higher precision extends, never rewrites
    assert(out11(0).startsWith(out5(0)) && out11(1).startsWith(out5(1)))
    // corner clamps stay in range (no overflow char)
    out5.foreach(g => assert(g.length == 5 && g.forall(Geohash.Alphabet.contains(_))))
  }

  test("kde conserves total kernel mass and peaks at a planted hotspot") {
    val r = 2
    val kernelMass = (for {
      dx <- -r to r; dy <- -r to r
      w = r * r + 1 - (dx * dx + dy * dy) if w > 0
    } yield w.toLong).sum
    // 900 points in one cell (the hotspot) + 100 spread far away
    val cells = ((1 to 900).map(_ => (50L, 50L)) ++
      (1 to 100).map(i => ((i * 13).toLong, 500L + i))).toDF("cx", "cy")
    val out = Heatmap.kde(cells, r).collect()
    assert(out.map(_.getAs[Long]("density")).sum == 1000L * kernelMass)
    val top = out.maxBy(_.getAs[Long]("density"))
    assert(top.getAs[Long]("cell_x") == 50L && top.getAs[Long]("cell_y") == 50L)
    assert(top.getAs[Long]("density") >= 900L * (r * r + 1))
  }
}
