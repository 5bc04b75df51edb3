package graft

import graft.operators.SpatialJoin
import org.apache.spark.sql.functions._

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naivePairs(points: org.apache.spark.sql.DataFrame,
                         places: org.apache.spark.sql.DataFrame,
                         r: Double): Set[(Long, Long)] = {
    val dlon = col("p_lon") - col("q_lon")
    val dlat = col("p_lat") - col("q_lat")
    points.select(col("id"), col("lon").as("p_lon"), col("lat").as("p_lat"))
      .crossJoin(places.select(col("place_id"), col("lon").as("q_lon"), col("lat").as("q_lat")))
      .filter(dlon * dlon + dlat * dlat <= lit(r * r))
      .select("id", "place_id")
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
  }

  // pseudo-random but deterministic scatter, includes negative coords
  // and points exactly on cell boundaries
  private def points = (0L until 400L).map { i =>
    (i, ((i * 7919) % 720) / 2.0 - 180.0, ((i * 104729) % 340) / 2.0 - 85.0)
  }.toDF("id", "lon", "lat")

  private def places = (0L until 25L).map { i =>
    (i, ((i * 6007) % 720) / 2.0 - 180.0, ((i * 2861) % 340) / 2.0 - 85.0)
  }.toDF("place_id", "lon", "lat")

  test("bucketed radius join equals the naive all-pairs join") {
    for (r <- Seq(1.0, 3.0, 7.5)) {
      val got = SpatialJoin.radiusJoin(points, places, r)
        .select("id", "place_id")
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
      assert(got == naivePairs(points, places, r), s"radius $r")
    }
  }

  test("boundary distance exactly equal to the radius is kept") {
    val p = Seq((1L, 0.0, 0.0)).toDF("id", "lon", "lat")
    val q = Seq((7L, 3.0, 0.0), (8L, 3.0000001, 0.0)).toDF("place_id", "lon", "lat")
    val got = SpatialJoin.radiusJoin(p, q, 3.0)
      .select("place_id").as[Long].collect().toSet
    assert(got == Set(7L))
  }

  test("nearestWithin picks the closest place, ties to the smaller id") {
    val p = Seq((1L, 0.0, 0.0), (2L, 50.0, 50.0)).toDF("id", "lon", "lat")
    val q = Seq((5L, 1.0, 0.0), (3L, 0.0, 1.0), (9L, 2.0, 0.0)).toDF("place_id", "lon", "lat")
    val got = SpatialJoin.nearestWithin(p, q, 3.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L)) // dist ties at 1.0: place 3 < place 5; point 2 out of range
  }

  test("place replication is bounded by the 3x3 cell neighborhood") {
    val q = Seq((1L, 0.5, 0.5)).toDF("place_id", "lon", "lat")
    // a place covers at most 9 cells regardless of position
    val n = SpatialJoin.radiusJoin(
      Seq((1L, 0.5, 0.5)).toDF("id", "lon", "lat"), q, 2.0).count()
    assert(n == 1L)
  }

  test("insideConvex: strict integer containment — interior in, boundary and outside out") {
    import org.apache.spark.sql.functions.col
    // unit-square-ish CCW quad scaled by 10: (0,0),(10,0),(10,10),(0,10)
    val quad = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val pts = Seq((1L, 5L, 5L), // interior
      (2L, 0L, 5L), // ON the left edge — strictly outside
      (3L, 10L, 10L), // vertex — outside
      (4L, 11L, 5L), (5L, -1L, -1L)) // outside
      .toDF("id", "centi_lon", "centi_lat")
    val in = pts.filter(SpatialJoin.insideConvex(quad, col("centi_lon"), col("centi_lat")))
      .collect().map(_.getLong(0)).toSet
    assert(in == Set(1L))
  }

  test("geofenceCounts: one-scan report, empty zones surface as explicit zeros") {
    val pts = Seq((7L, 5L, 5L), (8L, 6L, 5L)).toDF("id", "centi_lon", "centi_lat")
    val zones = Seq(
      "hit" -> Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L)),
      "empty" -> Seq((100L, 100L), (110L, 100L), (110L, 110L), (100L, 110L)))
    val out = SpatialJoin.geofenceCounts(pts, zones).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out("hit") == ((2L, 7L, 11L, 10L)))
    assert(out("empty") == ((0L, -1L, 0L, 0L)))
  }
}
