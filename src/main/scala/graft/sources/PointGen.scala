package graft.sources

import graft.model.Bounds
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic point generators — the reference's test-data
  * sources S2/S3 (reference: cluster/helpers.go:346-448), as
  * `spark.range` pipelines. The reference seeds from wall-clock
  * (helpers.go:347,384); ours take an explicit seed so fixtures are
  * reproducible (SURVEY §2.1). Uniforms come from a per-row integer
  * mix, not `rand()`, so values are independent of partitioning.
  */
object PointGen {

  /** Deterministic uniform in [0,1) from (id, seed, stream). */
  private def u(id: Column, seed: Long, stream: Int): Column =
    pmod((id + lit(seed)) * lit(2654435761L) + lit(stream.toLong * 40503L), lit(1000003L)) / lit(1000003.0)

  /** S2: n uniform points in bounds with the reference's metric/metadata
    * menu (value 0..100, size 0..50, sales 0..1000, customers 0..100,
    * timestamp/category/region/elevation).
    */
  def uniformPoints(spark: SparkSession, n: Long, bounds: Bounds, seed: Long): DataFrame = {
    val categories = Seq("Urban", "Rural", "Coastal", "Mountain", "Desert", "Forest", "Island")
    val regions = Seq("Americas", "Europe", "Asia", "Africa", "Oceania")
    val id = col("id")
    spark.range(n).select(
      (id + 1).as("id"), // reference ids are 1-based uint32
      (lit(bounds.minLon) + u(id, seed, 0) * lit(bounds.maxLon - bounds.minLon)).as("lon"),
      (lit(bounds.minLat) + u(id, seed, 1) * lit(bounds.maxLat - bounds.minLat)).as("lat"),
      (u(id, seed, 2) * 100.0).as("metric_value"),
      (u(id, seed, 3) * 50.0).as("metric_size"),
      (u(id, seed, 4) * 1000.0).as("metric_sales"),
      floor(u(id, seed, 5) * 100.0).cast("double").as("metric_customers"),
      timestamp_seconds(lit(1704067200L) + (u(id, seed, 6) * 86400.0 * 365.0).cast("long")).as("meta_timestamp"),
      element_at(lit(categories.toArray), pmod(id, lit(categories.size)).cast("int") + 1).as("meta_category"),
      element_at(lit(regions.toArray), pmod(id, lit(regions.size)).cast("int") + 1).as("meta_region"),
      (u(id, seed, 7) * 5000.0).as("meta_elevation"))
  }

  /** S3: n points clustered around 3 of 6 US cities with the
    * reference's exact polar-offset geometry (helpers.go:382-448):
    * distance ≤ 50 miles at 69 miles/°lat; the latitude offset is
    * dist/69·cos θ and the longitude offset divides by cos(cityLat) to
    * keep ground distance isotropic. City pick = seeded shuffle take 3;
    * assignment round-robins id%3 like the reference's i%3. The
    * reference's wall-clock-random extra metric name (helpers.go:411)
    * is dropped (non-reproducible); metadata matches its menu
    * (timestamp/category/city/temperature/elevation).
    */
  /** The reference's city list (name, lon, lat) — shared by the S3
    * generator and the haversine nearest-city query.
    */
  val Cities: Seq[(String, Double, Double)] = Seq(
    ("New York", -74.0060, 40.7128), ("Los Angeles", -118.2437, 34.0522),
    ("Chicago", -87.6298, 41.8781), ("Miami", -80.1918, 25.7617),
    ("Seattle", -122.3321, 47.6062), ("Austin", -97.7431, 30.2672))

  def cityPoints(spark: SparkSession, n: Long, seed: Long): DataFrame = {
    val cities = Cities
    val categories = Seq("Urban", "Suburban", "Industrial", "Commercial", "Residential")
    val picked = new scala.util.Random(seed).shuffle(cities).take(3)
    val id = col("id")
    val cityIdx = pmod(id, lit(3)).cast("int")
    val lonArr = lit(picked.map(_._2).toArray)
    val latArr = lit(picked.map(_._3).toArray)
    val nameArr = lit(picked.map(_._1).toArray)
    val milesPerDegLat = 69.0
    val distMiles = u(id, seed, 0) * lit(50.0)
    val theta = u(id, seed, 1) * lit(2.0 * math.Pi)
    val cityLat = element_at(latArr, cityIdx + 1)
    val latOffset = distMiles / lit(milesPerDegLat) * cos(theta)
    val lonOffset =
      distMiles / (lit(milesPerDegLat) * cos(cityLat * lit(math.Pi / 180.0))) * sin(theta)
    spark.range(n).select(
      (id + 1).as("id"),
      (element_at(lonArr, cityIdx + 1) + lonOffset).as("lon"),
      (cityLat + latOffset).as("lat"),
      (u(id, seed, 2) * 10000.0).as("metric_population_density"),
      (u(id, seed, 3) * 100000.0).as("metric_avg_income"),
      (u(id, seed, 4) * 100.0).as("metric_crime_rate"),
      (u(id, seed, 5) * 100.0).as("metric_traffic_level"),
      timestamp_seconds(lit(1704067200L) + (u(id, seed, 8) * 86400.0 * 365.0).cast("long")).as("meta_timestamp"),
      element_at(lit(categories.toArray), pmod(id, lit(categories.size)).cast("int") + 1).as("meta_category"),
      element_at(nameArr, cityIdx + 1).as("meta_city"),
      (lit(60.0) + u(id, seed, 6) * 30.0).as("meta_temperature"),
      (lit(100.0) + u(id, seed, 7) * 500.0).as("meta_elevation"))
  }
}
