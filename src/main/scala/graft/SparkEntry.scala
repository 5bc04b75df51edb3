package graft

import graft.model.{Bounds, ClusterOptions}
import graft.operators.GridCluster
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql`) per
  * implemented operator from SURVEY.md §2.
  *
  * Oracle-parity ground rules used throughout (see SURVEY §7.4 risks):
  *  - sums of the 2-decimal double columns go through DECIMAL casts
  *    ([[GridCluster.exactSum]]) so results are exact and identical
  *    regardless of fp addition order;
  *  - derived doubles keep the *same expression shape* (operand order /
  *    association) in the Spark code and the oracle SQL, so pure
  *    arithmetic is bit-identical; only libm calls (sin/log/atan/exp)
  *    can differ in the last ulp, absorbed by rounding outputs;
  *  - every query orders by a unique key; every computed column is
  *    aliased identically on both sides.
  */
object SparkEntry {

  // ---------------------------------------------------------------- helpers

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events` needs special handling: its `ts` is parquet
    * TIMESTAMP(NANOS), which Spark 4 rejects by default. Read it as LONG
    * nanos via an explicit schema, then truncate to microseconds with
    * *integer* division — matching DuckDB's ns→µs truncation of the same
    * file (double division would lose µs precision at 2^60 magnitudes).
    */
  private def events(s: SparkSession, dir: String): DataFrame =
    s.read
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Scala double literal → SQL literal with round-trip precision. */
  private def d(x: Double): String = {
    val r = java.lang.Double.toString(x)
    if (r.contains("E")) f"CAST($x%.17e AS DOUBLE)" else r
  }

  /** Deterministic synthetic lon/lat points derived from `events` by
    * exact integer arithmetic (identical in Spark and DuckDB). This is
    * the engine's point table for the clustering queries — the harness
    * testdata has no native geo table (TESTDATA.md), and the reference's
    * own generators are wall-clock-seeded (reference:
    * cluster/helpers.go:347) so they cannot be oracle-compared.
    */
  private def eventPoints(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("event_id").as("id"),
      (((col("event_id") * lit(7919L)) % lit(36000L)) / lit(100.0) - lit(180.0)).as("lon"),
      (((col("event_id") * lit(104729L)) % lit(17000L)) / lit(100.0) - lit(85.0)).as("lat"),
      col("value"),
      col("event_type"),
      col("ts"),
      col("props"))

  private val pointsSql: String =
    """SELECT event_id AS id,
      |       ((event_id * 7919) % 36000) / 100.0 - 180.0 AS lon,
      |       ((event_id * 104729) % 17000) / 100.0 - 85.0 AS lat,
      |       value, event_type, ts, props
      |FROM events""".stripMargin

  /** Mercator projection + viewport filter, as oracle SQL mirroring
    * [[graft.functions.Mercator]] / [[GridCluster.projectToViewport]]
    * expression-for-expression. Emits CTEs `pts`, `proj`.
    */
  private def projSql(zoom: Int, b: Bounds, opts: ClusterOptions): String = {
    import graft.functions.Mercator._
    val se = opts.scaleExtent(zoom)
    val (minPx, maxPx) = (projXs(b.minLon, se), projXs(b.maxLon, se))
    val (minPy, maxPy) = (projYs(b.maxLat, se), projYs(b.minLat, se))
    s"""pts AS ($pointsSql),
       |proj AS (
       |  SELECT * FROM (
       |    SELECT id, value, event_type, ts, props,
       |           (lon + 180.0) / 360.0 * ${d(se)} AS px,
       |           (0.5 - 0.25 * ln((1.0 + s) / (1.0 - s)) / pi()) * ${d(se)} AS py
       |    FROM (SELECT *,
       |            sin((CASE WHEN lat > 85.0511 THEN 85.0511
       |                      WHEN lat < -85.0511 THEN -85.0511
       |                      ELSE lat END) * pi() / 180.0) AS s
       |          FROM pts)
       |  ) WHERE px >= ${d(minPx)} AND px <= ${d(maxPx)}
       |      AND py >= ${d(minPy)} AND py <= ${d(maxPy)}
       |)""".stripMargin
  }

  /** Oracle SQL for the full grid-clustering pipeline
    * (mirrors [[GridCluster.cluster]]).
    */
  private def clusterSql(zoom: Int, b: Bounds, opts: ClusterOptions): String = {
    val se = opts.scaleExtent(zoom)
    // base cell-size factor before the count-dependent density adjust
    // (ClusterOptions.cellSize with the density branch left to SQL)
    val zr = zoom.toDouble / opts.maxZoom.toDouble
    val baseF =
      if (zoom < opts.maxZoom / 4) 1.1 - 0.75 * zr
      else if (zoom < opts.maxZoom / 2) 0.9 - 0.3 * zr
      else if (zoom > opts.maxZoom * 3 / 4) 0.7 - 0.2 * zr
      else 0.75
    s"""WITH ${projSql(zoom, b, opts)},
       |params AS (
       |  SELECT ${d(opts.radius)} * (CASE WHEN count(*) > 50000 THEN ${d(baseF)} * 1.1
       |                                   WHEN count(*) < 5000 THEN ${d(baseF)} * 0.9
       |                                   ELSE ${d(baseF)} END) AS cs
       |  FROM proj
       |),
       |cells AS (
       |  SELECT proj.*, floor(px / cs) AS cell_x, floor(py / cs) AS cell_y
       |  FROM proj, params
       |),
       |agg AS (
       |  SELECT cell_x, cell_y, count(*) AS cnt,
       |         sum(px) AS sx, sum(py) AS sy, min(id) AS min_id,
       |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |  FROM cells GROUP BY cell_x, cell_y
       |),
       |clusters AS (
       |  SELECT min_id AS id,
       |         round((sx / cnt) / ${d(se)} * 360.0 - 180.0, 5) AS lon,
       |         round((atan(exp((1.0 - (sy / cnt) / ${d(se)} * 2.0) * pi())) * 2.0 - pi() / 2)
       |               * 180.0 / pi(), 5) AS lat,
       |         cnt AS "count", TRUE AS is_cluster, sum_value AS value
       |  FROM agg WHERE cnt >= ${opts.minPoints}
       |),
       |singles AS (
       |  SELECT c.id,
       |         round(c.px / ${d(se)} * 360.0 - 180.0, 5) AS lon,
       |         round((atan(exp((1.0 - c.py / ${d(se)} * 2.0) * pi())) * 2.0 - pi() / 2)
       |               * 180.0 / pi(), 5) AS lat,
       |         CAST(1 AS BIGINT) AS "count", FALSE AS is_cluster, c.value AS value
       |  FROM cells c
       |  JOIN agg a ON c.cell_x = a.cell_x AND c.cell_y = a.cell_y
       |  WHERE a.cnt < ${opts.minPoints}
       |)
       |SELECT * FROM clusters UNION ALL SELECT * FROM singles ORDER BY id""".stripMargin
  }

  // The flagship clustering query's fixed parameters.
  private val flagZoom = 2
  private val flagBounds = Bounds(-120.0, -55.0, 60.0, 70.0)
  private val flagOpts = ClusterOptions()

  private def qClusterGrid(s: SparkSession, dir: String): DataFrame = {
    val out = GridCluster.cluster(eventPoints(s, dir), flagZoom, flagBounds, flagOpts,
      metricCols = Seq("value"))
    out.select(
      col("id"),
      round(col("lon"), 5).as("lon"),
      round(col("lat"), 5).as("lat"),
      col("count"),
      col("is_cluster"),
      col("value")
    ).orderBy("id")
  }

  private def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(12, 2)
    val li = table(s, dir, "lineitem")
    val one = lit(1).cast(dec)
    val ep = col("l_extendedprice").cast(dec)
    val disc = col("l_discount").cast(dec)
    val tax = col("l_tax").cast(dec)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        GridCluster.exactSum(col("l_quantity")).as("sum_qty"),
        GridCluster.exactSum(col("l_extendedprice")).as("sum_base_price"),
        sum(ep * (one - disc)).cast(DoubleType).as("sum_disc_price"),
        sum(ep * (one - disc) * (one + tax)).cast(DoubleType).as("sum_charge"),
        (GridCluster.exactSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (GridCluster.exactSum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (GridCluster.exactSum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- contract

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qClusterGrid(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q_cluster_grid" -> (qClusterGrid _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q_cluster_grid" -> clusterSql(flagZoom, flagBounds, flagOpts)
  )
}
