package graft

import graft.model.Bounds
import graft.operators.TilePyramid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Low-zoom skew safety (r7 advice #5): at z0–z2 a handful of grid
  * cells concentrate the FINAL aggregation in few reducers — safe only
  * because map-side partial aggregation collapses each input partition
  * to ≤ #cells rows before the one shuffle. This spec pins that
  * contract with the actual plan AND the actual shuffle volume: the
  * exchange carries ~#cells × #partitions rows, independent of the
  * point count (measured at N and 10N).
  */
class PyramidSkewSpec extends SparkSpec {

  // AQE off so the physical plan exposes the raw exchange node and its
  // write metrics (the production session keeps AQE on; the CONTRACT —
  // partial agg below the shuffle — is identical either way)
  private lazy val noAqe = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private def shuffleRecordsWritten(df: DataFrame): (Long, SparkPlan) = {
    df.collect() // execute THIS df's plan so its exchange metrics populate
    val plan = df.queryExecution.executedPlan
    // the AGGREGATION's exchange (a partial aggregate sits below it) —
    // not the synthetic-input repartition, which legitimately carries
    // one row per point
    val aggExchanges = plan.collect { case e: ShuffleExchangeLike
        if e.collect { case a: BaseAggregateExec => a }.nonEmpty => e }
    assert(aggExchanges.nonEmpty, s"no aggregation exchange found:\n$plan")
    (aggExchanges.map(_.metrics("shuffleRecordsWritten").value).sum, plan)
  }

  test("z0-2 pyramid agg is partial-aggregated: shuffle carries cells x partitions, not points") {
    val parts = 8
    def stateCells(n: Long): DataFrame = {
      val pts = graft.sources.PointGen.uniformPoints(noAqe, n, Bounds.World, seed = 7L)
        .repartition(parts)
      TilePyramid.cellState(pts, zMin = 0, zMax = 2, densityN = n).cells
    }

    val base = 20000L
    val cellsN = stateCells(base)
    val (writtenN, plan) = shuffleRecordsWritten(cellsN)

    // plan shape: a partial aggregate BELOW the exchange, final above —
    // the map-side combine that makes low-zoom key skew harmless
    val aggs = plan.collect { case a: BaseAggregateExec => a }
    assert(aggs.size >= 2, s"expected partial+final aggregates, got ${aggs.size}:\n$plan")
    val belowExchange = plan.collect { case e: ShuffleExchangeLike =>
      e.collect { case a: BaseAggregateExec => a }
    }.flatten
    assert(belowExchange.nonEmpty, s"no map-side partial aggregate below the exchange:\n$plan")

    // volume: the exchange carries at most #cells × #partitions rows
    // (every partition emits each cell at most once) — and FAR fewer
    // than the exploded point rows (3 zooms × N)
    val nCells = cellsN.count()
    assert(writtenN <= nCells * parts,
      s"shuffle wrote $writtenN rows > cells($nCells) x partitions($parts)")
    assert(writtenN < base, // not even one row per POINT, let alone per exploded row
      s"shuffle wrote $writtenN rows — partial agg is not collapsing ($base points)")

    // scale-independence: 10× the points, same grid → shuffle volume
    // must stay put (uniform world data saturates the z0-2 grids)
    val (written10N, _) = shuffleRecordsWritten(stateCells(base * 10))
    assert(written10N <= nCells * parts,
      s"10x points pushed shuffle volume to $written10N (> $nCells x $parts)")
    info(s"measured: cells=$nCells parts=$parts shuffle@N=$writtenN shuffle@10N=$written10N " +
      s"(exploded rows: ${3 * base} / ${3 * base * 10})")
  }
}
