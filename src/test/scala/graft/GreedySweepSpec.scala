package graft

import graft.model.{Bounds, ClusterOptions}
import graft.operators.{GreedySweep, GridCluster}
import graft.sources.PointGen

/** A1 greedy-sweep mode: reference semantics on hand-computable data,
  * conservation + determinism at generator scale.
  */
class GreedySweepSpec extends SparkSpec {
  import spark.implicits._

  private val opts = ClusterOptions(minPoints = 2, radius = 40.0)

  test("sweep gathers within radius, first-member id, singles pass through") {
    // zoom 2, se = 2048: 1 degree lon ≈ 5.69 px → place two points ~20px
    // apart (cluster) and one far away (single)
    val pts = Seq(
      (10L, 0.0, 0.0), (11L, 3.0, 0.0), // ~17px apart at zoom 2 → cluster
      (50L, 60.0, 40.0)                 // alone → single
    ).toDF("id", "lon", "lat")
    val out = GreedySweep.cluster(pts, 2, Bounds(-170.0, -80.0, 170.0, 80.0), opts)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("count"),
        r.getAs[Boolean]("is_cluster"))).toSet
    assert(out == Set((10L, 2L, true), (50L, 1L, false)))
  }

  test("cluster centroid is the mean of projected members, unprojected") {
    val pts = Seq((1L, 10.0, 20.0), (2L, 10.2, 20.2)).toDF("id", "lon", "lat")
    val r = GreedySweep.cluster(pts, 4, Bounds(-170.0, -80.0, 170.0, 80.0), opts)
      .collect().head
    assert(r.getAs[Long]("id") == 1L && r.getAs[Long]("count") == 2L)
    // x linear in lon, to within the 1/64-px quantization lattice
    // (±1/128 px at zoom 4 ≈ 3.4e-4°; the lattice is what makes the
    // sweep oracle-exact cross-engine)
    assert(math.abs(r.getAs[Double]("lon") - 10.1) < 1e-3)
    assert(r.getAs[Double]("lat") > 20.0 && r.getAs[Double]("lat") < 20.2)
  }

  test("conservation + determinism + metric rollup at generator scale") {
    val pts = PointGen.uniformPoints(spark, 3000, Bounds.World, seed = 5L)
    val run1 = GreedySweep.cluster(pts, 8, Bounds.World, opts, Seq("metric_sales")).collect()
    val run2 = GreedySweep.cluster(pts, 8, Bounds.World, opts, Seq("metric_sales")).collect()
    assert(run1.map(_.getAs[Long]("count")).sum == 3000)
    assert(run1.map(_.toString).sorted.sameElements(run2.map(_.toString).sorted))
    // metric conservation on the cents lattice: cluster sums + single
    // values = global sum of per-point cents (metrics ride the same
    // DECIMAL(18,2)-equivalent convention as GridCluster.exactSum)
    val total = run1.map(_.getAs[Double]("metric_sales")).sum
    val expected = pts
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("metric_sales") * 100).cast("long")))
      .collect().head.getLong(0) / 100.0
    assert(math.abs(total - expected) < 1e-6)
  }

  test("oversized tile spills to the streaming grid fallback, deterministically") {
    // one dense hotspot: 500 points in a ~0.05° square land in a single
    // 32·radius tile; a threshold of 100 forces the memory guard
    val pts = (1L to 500L)
      .map(i => (i, 10.0 + (i % 50) * 0.001, 20.0 + (i / 50) * 0.001))
      .toDF("id", "lon", "lat")
    val world = Bounds(-170.0, -80.0, 170.0, 80.0)
    val acc = spark.sparkContext.longAccumulator("fallbacks")
    val run1 = GreedySweep.cluster(pts, 8, world, opts,
      maxSweepPoints = 100, fallbackTiles = Some(acc)).collect()
    assert(acc.value >= 1, "grid fallback did not engage on the hotspot tile")
    // conservation through the fallback path
    assert(run1.map(_.getAs[Long]("count")).sum == 500)
    // deterministic: same input ⇒ same output
    val run2 = GreedySweep.cluster(pts, 8, world, opts,
      maxSweepPoints = 100).collect()
    assert(run1.map(_.toString).sorted.sameElements(run2.map(_.toString).sorted))
    // below the cutoff the sweep path is untouched
    val accOff = spark.sparkContext.longAccumulator("noFallbacks")
    GreedySweep.cluster(pts, 8, world, opts,
      maxSweepPoints = 100000, fallbackTiles = Some(accOff)).collect()
    assert(accOff.value == 0)
  }

  test("dispatcher picks grid for low zoom / big viewports, greedy otherwise") {
    val pts = PointGen.uniformPoints(spark, 2000, Bounds.World, seed = 6L)
    // zoom 2 < maxZoom/4 → grid path (deterministic min-id ids)
    val grid = GreedySweep.dispatch(pts, 2, Bounds.World, opts, Nil, viewportCount = 2000)
    val direct = GridCluster.cluster(pts, 2, Bounds.World, opts)
    assert(grid.select("id").exceptAll(direct.select("id")).isEmpty)
    // zoom 10, small count → greedy path (first-member ids)
    val greedy = GreedySweep.dispatch(pts, 10, Bounds.World, opts, Nil, viewportCount = 2000)
    val sweep = GreedySweep.cluster(pts, 10, Bounds.World, opts)
    assert(greedy.select("id").exceptAll(sweep.select("id")).isEmpty)
  }
}
