package graft

import graft.model.Bounds
import graft.sources.PointGen
import org.apache.spark.sql.functions._

/** Seeded generators (S2/S3): determinism, bounds, reference value
  * ranges (helpers.go:346-448).
  */
class PointGenSpec extends SparkSpec {

  test("uniform points: seeded, in bounds, reference metric ranges") {
    val b = Bounds(-10.0, -5.0, 10.0, 5.0)
    val a1 = PointGen.uniformPoints(spark, 500, b, seed = 7L).collect()
    val a2 = PointGen.uniformPoints(spark, 500, b, seed = 7L).collect()
    assert(a1.map(_.toString).sorted.sameElements(a2.map(_.toString).sorted)) // deterministic
    for (r <- a1) {
      assert(b.contains(r.getAs[Double]("lon"), r.getAs[Double]("lat")))
      val v = r.getAs[Double]("metric_value")
      assert(v >= 0.0 && v < 100.0)
      val sales = r.getAs[Double]("metric_sales")
      assert(sales >= 0.0 && sales < 1000.0)
    }
    assert(PointGen.uniformPoints(spark, 500, b, seed = 8L).collect()
      .map(_.getAs[Double]("lon")).toSet !=
      a1.map(_.getAs[Double]("lon")).toSet) // seed actually matters
  }

  // the reference's city table (helpers.go:388-395), keyed by name
  private val refCities = Map(
    "New York" -> (-74.0060, 40.7128), "Los Angeles" -> (-118.2437, 34.0522),
    "Chicago" -> (-87.6298, 41.8781), "Miami" -> (-80.1918, 25.7617),
    "Seattle" -> (-122.3321, 47.6062), "Austin" -> (-97.7431, 30.2672))

  test("city points: 3 cities, 50-mile polar geometry, metrics in range") {
    val rows = PointGen.cityPoints(spark, 600, seed = 42L).collect()
    val cities = rows.map(_.getAs[String]("meta_city")).toSet
    assert(cities.size == 3 && cities.subsetOf(refCities.keySet))
    // round-robin assignment (reference i%3) → exact thirds
    assert(rows.groupBy(_.getAs[String]("meta_city")).values.forall(_.length == 200))
    for (r <- rows) {
      val (clon, clat) = refCities(r.getAs[String]("meta_city"))
      val latOff = r.getAs[Double]("lat") - clat
      val lonOff = r.getAs[Double]("lon") - clon
      // reference geometry (helpers.go:404-425): ground distance ≤ 50
      // miles at 69 mi/°lat, lon offset scaled by 1/cos(cityLat)
      val milesLat = latOff * 69.0
      val milesLon = lonOff * 69.0 * math.cos(clat * math.Pi / 180.0)
      assert(math.sqrt(milesLat * milesLat + milesLon * milesLon) <= 50.0 + 1e-9)
      val t = r.getAs[Double]("meta_temperature")
      assert(t >= 60.0 && t < 90.0)
      val e = r.getAs[Double]("meta_elevation")
      assert(e >= 100.0 && e < 600.0)
      assert(r.getAs[String]("meta_category").nonEmpty)
    }
    // deterministic under a fixed seed; different seed → different pick/offsets
    val again = PointGen.cityPoints(spark, 600, seed = 42L).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    assert(PointGen.cityPoints(spark, 600, seed = 43L).collect()
      .map(_.getAs[Double]("lon")).toSet != rows.map(_.getAs[Double]("lon")).toSet)
  }
}
