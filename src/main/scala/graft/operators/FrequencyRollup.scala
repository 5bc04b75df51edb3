package graft.operators

import graft.model.{Bounds, ClusterOptions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-cluster metadata frequency distributions — the reference's
  * `MetadataStore.CalculateFrequencies` rollup (reference:
  * cluster/cluster.go:209-289): for each metadata key, the share of each
  * distinct value among the cluster's members.
  *
  * Pure relational rewrite (no UDAF — SURVEY §2.10): groupBy(cell,
  * value) counts → per-cell window total → fraction → canonical sorted
  * "value:ppm" string per cluster. The reference emits fractions 0..1
  * as a JSON map (cluster.go:272-284); we emit integer parts-per-million
  * in a deterministically ordered string so results are exact and
  * hash-comparable (fractions are reconstructable as ppm/1e6).
  *
  * Scale: two shuffles on (cell, value) then (cell) — both map-side
  * combined; the window runs over the already-aggregated (cell, value)
  * rows, not raw points.
  */
object FrequencyRollup {

  /** Frequency strings for every cluster (cells with ≥ minPoints
    * members). Output: id (min member id), count, one `{c}_freq` string
    * column per requested metadata column.
    */
  def clusterFrequencies(points: DataFrame, zoom: Int, bounds: Bounds,
                         opts: ClusterOptions = ClusterOptions(),
                         metaCols: Seq[String] = Nil,
                         idCol: String = "id"): DataFrame = {
    val (celled, _, _) = GridCluster.cellAssign(points, zoom, bounds, opts)

    val cellAgg = celled.groupBy(col("cell_x"), col("cell_y"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("min_id"))
      .filter(col("cnt") >= opts.minPoints)

    // left join: a cluster whose members all lack a key still appears,
    // with a null frequency column (the reference just omits the key).
    cellFrequencies(celled, metaCols)
      .foldLeft(cellAgg)((acc, f) => acc.join(f, Seq("cell_x", "cell_y"), "left"))
      .select(col("min_id").as(idCol) +: col("cnt").as("count") +:
        metaCols.map(c => col(s"${c}_freq")): _*)
  }

  /** One `(keyCols..., {c}_freq)` frame per metadata column — the
    * per-cell canonical "value:ppm" strings. Shared by
    * [[clusterFrequencies]], [[GridCluster.cluster]] and
    * [[TilePyramid.build]] (which join them onto their cluster output,
    * mirroring the reference's metadata-bearing `ClusterNode` —
    * cluster/cluster.go:1939-1944). `keyCols` is the cell key: the
    * viewport operators group per (cell_x, cell_y); the pyramid adds the
    * zoom dimension.
    */
  def cellFrequencies(celled: DataFrame, metaCols: Seq[String],
                      keyCols: Seq[String] = Seq("cell_x", "cell_y")): Seq[DataFrame] =
    metaCols.map(c => countsToFreq(cellCounts(celled, c, keyCols), c, keyCols))

  /** Per-(key, value) occurrence counts — the MERGEABLE form of a
    * frequency rollup (counts are associative where ppm strings are
    * not); [[graft.operators.TilePyramid]] maintains these
    * incrementally. Per-key totals count only points that HAVE the key
    * (reference skips absent metadata keys — cluster.go:222-227):
    * nulls drop out both of the counts and the denominators.
    * Output: keyCols..., c, vc.
    */
  def cellCounts(celled: DataFrame, c: String, keyCols: Seq[String]): DataFrame =
    celled
      .filter(col(c).isNotNull)
      .groupBy(keyCols.map(col) :+ col(c): _*)
      .agg(count(lit(1)).as("vc"))

  /** Canonical sorted "value:ppm" strings from a [[cellCounts]] table.
    * Output: keyCols..., {c}_freq.
    */
  def countsToFreq(counts: DataFrame, c: String, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
    counts
      .withColumn("total", sum(col("vc")).over(w))
      .withColumn("ppm", round(col("vc") * lit(1000000.0) / col("total")).cast("long"))
      .groupBy(keys: _*)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(c).as("v"), col("ppm").as("p")))),
          e => concat(e.getField("v"), lit(":"), e.getField("p").cast("string"))),
        ",").as(s"${c}_freq"))
  }
}
