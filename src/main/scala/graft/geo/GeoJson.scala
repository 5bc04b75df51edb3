package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GeoJSON shaping of cluster query results — the reference's
  * `ToGeoJSON` / REST response contract (reference:
  * cluster/cluster.go:1998-2050, cmd/api/main.go:228-252):
  * each row becomes a Feature with Point geometry [lon, lat]; cluster
  * rows carry properties `cluster`=true, `cluster_id`, `point_count`;
  * single points carry `id`; metric values are inlined into properties.
  *
  * Built with `struct` + `to_json` (codegen, no UDF). Field order inside
  * the JSON follows struct order, so output is deterministic for tests.
  */
object GeoJson {

  /** Adds a `feature` JSON-string column shaped per the reference
    * contract. Expects the [[graft.operators.GridCluster.cluster]]
    * output schema (id, lon, lat, count, is_cluster, metrics...,
    * meta freq strings...). Metadata frequency strings are inlined into
    * properties (reference inlines the metadata maps —
    * cluster/cluster.go:2026-2034); null freq fields are omitted from
    * the JSON (reference omits absent keys).
    */
  def features(clusters: DataFrame, metricCols: Seq[String] = Nil,
               metaCols: Seq[String] = Nil): DataFrame = {
    val geometry = struct(
      lit("Point").as("type"),
      array(col("lon"), col("lat")).as("coordinates"))

    def props(extra: Seq[(String, Column)]): Column =
      struct(extra.map { case (n, c) => c.as(n) } ++
        metricCols.map(m => col(m).as(m)) ++
        metaCols.map(c => col(s"${c}_freq").as(s"${c}_freq")): _*)

    val clusterFeature = to_json(struct(
      lit("Feature").as("type"),
      geometry.as("geometry"),
      props(Seq(
        "cluster" -> lit(true),
        "cluster_id" -> col("id"),
        "point_count" -> col("count"))).as("properties")))

    val singleFeature = to_json(struct(
      lit("Feature").as("type"),
      geometry.as("geometry"),
      props(Seq("id" -> col("id"))).as("properties")))

    clusters.withColumn("feature",
      when(col("is_cluster"), clusterFeature).otherwise(singleFeature))
  }

  /** Collects a whole FeatureCollection JSON document (driver-side —
    * viewport results are bounded by construction, reference returns
    * the same materialized list over gRPC).
    */
  def featureCollection(clusters: DataFrame, metricCols: Seq[String] = Nil,
                        metaCols: Seq[String] = Nil): String = {
    val fs = features(clusters, metricCols, metaCols).select(col("feature"))
      .collect().map(_.getString(0))
    fs.mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")
  }
}
