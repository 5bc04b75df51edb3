package graft

import graft.functions.Mercator
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => ScTest}
import org.apache.spark.sql.functions._

/** Port of the reference's projection round-trip test
  * (reference: cluster/cluster_test.go:440-473 — 4 coords × zooms,
  * ε=1e-4) plus a ScalaCheck sweep of the whole domain.
  */
class ProjectionSpec extends SparkSpec {
  private val eps = 1e-4

  private val fixtures = Seq( // (lon, lat, zoom) — cluster_test.go:444-449
    (0.0, 0.0, 0), (180.0, 85.0, 10), (-180.0, -85.0, 5), (45.0, 45.0, 8))

  test("scalar round trip at reference fixture coords") {
    for ((lon, lat, z) <- fixtures) {
      val se = math.pow(2, z) * 512
      val lon2 = Mercator.invXs(Mercator.projXs(lon, se), se)
      val lat2 = Mercator.invYs(Mercator.projYs(lat, se), se)
      assert(math.abs(lon2 - lon) < eps, s"lon $lon z$z -> $lon2")
      assert(math.abs(lat2 - lat) < eps, s"lat $lat z$z -> $lat2")
    }
  }

  test("column-expression round trip matches scalar mirrors") {
    import spark.implicits._
    val df = fixtures.toDF("lon", "lat", "zoom")
    for (z <- Seq(0, 5, 8, 10, 16)) {
      val se = math.pow(2, z) * 512
      val rows = df
        .withColumn("px", Mercator.projX(col("lon"), se))
        .withColumn("py", Mercator.projY(col("lat"), se))
        .withColumn("lon2", Mercator.invX(col("px"), se))
        .withColumn("lat2", Mercator.invY(col("py"), se))
        .select("lon", "lat", "lon2", "lat2").collect()
      for (r <- rows) {
        assert(math.abs(r.getDouble(0) - r.getDouble(2)) < eps)
        assert(math.abs(r.getDouble(1) - r.getDouble(3)) < eps)
      }
    }
  }

  test("property: round trip within eps over the whole domain") {
    val gen = for {
      lon <- Gen.chooseNum(-180.0, 180.0)
      lat <- Gen.chooseNum(-85.0, 85.0)
      z <- Gen.chooseNum(0, 16)
    } yield (lon, lat, z)
    val prop = forAll(gen) { case (lon, lat, z) =>
      val se = math.pow(2, z) * 512
      math.abs(Mercator.invXs(Mercator.projXs(lon, se), se) - lon) < eps &&
        math.abs(Mercator.invYs(Mercator.projYs(lat, se), se) - lat) < eps
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("projected y decreases as latitude increases (Mercator flip)") {
    val se = 512.0
    assert(Mercator.projYs(50.0, se) < Mercator.projYs(-50.0, se))
  }
}
