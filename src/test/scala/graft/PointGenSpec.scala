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

  test("city points: 3 cities, offsets within ~50 miles, metrics in range") {
    val rows = PointGen.cityPoints(spark, 600, seed = 42L).collect()
    val cities = rows.map(_.getAs[String]("meta_city")).toSet
    assert(cities.size == 3)
    // every point within the 0.72-degree polar offset of its city
    val cityLoc = rows.groupBy(_.getAs[String]("meta_city")).map { case (c, rs) =>
      c -> (rs.map(_.getAs[Double]("lon")).sum / rs.length,
        rs.map(_.getAs[Double]("lat")).sum / rs.length)
    }
    for (r <- rows) {
      val (clon, clat) = cityLoc(r.getAs[String]("meta_city"))
      assert(math.abs(r.getAs[Double]("lon") - clon) < 1.5)
      assert(math.abs(r.getAs[Double]("lat") - clat) < 1.5)
      val t = r.getAs[Double]("meta_temperature")
      assert(t >= 60.0 && t < 90.0)
    }
  }
}
