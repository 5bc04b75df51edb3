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

  /** S3: n points clustered around 3 of 6 US cities, polar offsets up
    * to ~50 miles (reference: helpers.go:382-448).
    */
  def cityPoints(spark: SparkSession, n: Long, seed: Long): DataFrame = {
    val cities = Seq( // (name, lon, lat) — the reference's city list
      ("New York", -74.006, 40.7128), ("Los Angeles", -118.2437, 34.0522),
      ("Chicago", -87.6298, 41.8781), ("Houston", -95.3698, 29.7604),
      ("Phoenix", -112.074, 33.4484), ("Philadelphia", -75.1652, 39.9526))
    val picked = new scala.util.Random(seed).shuffle(cities).take(3)
    val id = col("id")
    val cityIdx = pmod(id, lit(3)).cast("int")
    val lonArr = lit(picked.map(_._2).toArray)
    val latArr = lit(picked.map(_._3).toArray)
    val nameArr = lit(picked.map(_._1).toArray)
    // polar offset: ~50 miles ≈ 0.72 degrees of latitude
    val r = u(id, seed, 0) * lit(0.72)
    val theta = u(id, seed, 1) * lit(2.0 * math.Pi)
    spark.range(n).select(
      (id + 1).as("id"),
      (element_at(lonArr, cityIdx + 1) + r * cos(theta)).as("lon"),
      (element_at(latArr, cityIdx + 1) + r * sin(theta)).as("lat"),
      (u(id, seed, 2) * 10000.0).as("metric_population_density"),
      (u(id, seed, 3) * 100000.0).as("metric_avg_income"),
      (u(id, seed, 4) * 100.0).as("metric_crime_rate"),
      (u(id, seed, 5) * 100.0).as("metric_traffic_level"),
      element_at(nameArr, cityIdx + 1).as("meta_city"),
      (lit(60.0) + u(id, seed, 6) * 30.0).as("meta_temperature"),
      (lit(100.0) + u(id, seed, 7) * 500.0).as("meta_elevation"))
  }
}
