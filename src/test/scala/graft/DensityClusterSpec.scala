package graft

import graft.operators.DensityCluster

class DensityClusterSpec extends SparkSpec {
  import spark.implicits._

  private def pts(cells: (Long, Long, Int)*) =
    cells.zipWithIndex.flatMap { case ((cx, cy, n), i) =>
      (0 until n).map(j => (i * 1000L + j, cx, cy))
    }.toDF("id", "cx", "cy")

  test("diagonal core cells merge; border mass attaches; sparse cells are noise") {
    // N = 25, totalCells = 100, factor = 8 → core iff n·100 > 200 ⇔ n ≥ 3
    val p = pts((0L, 0L, 10), (1L, 1L, 10), // two core cells touching diagonally
      (2L, 1L, 1), // adjacent to (1,1) → border of the merged cluster
      (5L, 5L, 1), // isolated sparse cell → noise
      (9L, 9L, 3)) // isolated CORE cell → its own singleton cluster
    val out = DensityCluster.gridDbscan(p, totalCells = 100L, densityFactor = 8L)
      .collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_cells"), r.getAs[Long]("n_core_points"),
          r.getAs[Long]("n_border_points"),
          (r.getAs[Long]("min_cx"), r.getAs[Long]("max_cx"),
            r.getAs[Long]("min_cy"), r.getAs[Long]("max_cy")))).toMap
    assert(out.size == 2) // noise never surfaces as a cluster
    // merged cluster id = min cell key (0,0) → 0
    assert(out(0L) == ((2L, 20L, 1L, (0L, 1L, 0L, 1L))))
    // singleton core cell keeps its own key and has no border
    assert(out(9000009L) == ((1L, 3L, 0L, (9L, 9L, 9L, 9L))))
  }

  test("a border cell touching TWO clusters attaches to the min cluster id only") {
    // N = 13, totalCells = 100, factor = 8 → core iff n ≥ 2
    // core at (0,0) and (4,0); border cell (2,0)... not adjacent to either.
    // use (1,0) between cores (0,0) and (2,0) — adjacent to both
    val p = pts((0L, 0L, 6), (2L, 0L, 6), (1L, 0L, 1))
    val out = DensityCluster.gridDbscan(p, 100L, 8L).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("n_border_points")).toMap
    // cores at distance 2 do NOT merge; the border point counts once, to cluster 0
    assert(out == Map(0L -> 1L, 2000000L -> 0L))
  }

  test("a chain of adjacent core cells collapses to one component") {
    val p = pts((0L until 8L).map(i => (i, 0L, 4)): _*)
    val out = DensityCluster.gridDbscan(p, 1000L, 8L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("cluster_id") == 0L)
    assert(out.head.getAs[Long]("n_cells") == 8L)
    assert(out.head.getAs[Long]("n_core_points") == 32L)
  }

  test("cell counts are partial-aggregated: shuffle carries cells x partitions, not points") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val parts = 8
    val nCells = 20L // 5 × 4 fixed layout, points spread round-robin
    def run(n: Long): Long = {
      val p = s.range(n)
        .selectExpr("id", "id % 5 AS cx", "(id DIV 5) % 4 AS cy")
        .repartition(parts)
      val counts = DensityCluster.cellCounts(p)
      counts.collect()
      val plan = counts.queryExecution.executedPlan
      val below = plan.collect { case e: ShuffleExchangeLike =>
        e.collect { case a: BaseAggregateExec => a }
      }.flatten
      assert(below.nonEmpty, s"no map-side partial aggregate below the exchange:\n$plan")
      plan.collect { case e: ShuffleExchangeLike
          if e.collect { case a: BaseAggregateExec => a }.nonEmpty => e }
        .map(_.metrics("shuffleRecordsWritten").value).sum
    }
    val writtenN = run(20000L)
    assert(writtenN <= nCells * parts,
      s"shuffle wrote $writtenN rows > cells($nCells) x partitions($parts)")
    val written10N = run(200000L)
    assert(written10N <= nCells * parts,
      s"10x points pushed the count shuffle to $written10N")
    info(s"measured: cells=$nCells parts=$parts shuffle@20k=$writtenN shuffle@200k=$written10N")
  }
}
