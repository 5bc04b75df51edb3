package graft

import graft.model.{Bounds, ClusterOptions}
import graft.operators.GridCluster
import graft.sources.{Catalog, PointGen}
import java.nio.file.Files

/** Catalog round-trip + LRU semantics (reference: storage.go save/load,
  * helpers.go catalog listing, runner.go LRU of 5).
  */
class CatalogSpec extends SparkSpec {

  private lazy val warehouse = Files.createTempDirectory("graft-warehouse").toString

  test("save/load round trip preserves rows; tile partition column present") {
    val cat = new Catalog(spark, warehouse)
    val pts = PointGen.uniformPoints(spark, 1000, Bounds.World, seed = 42L)
    val info = cat.save(pts, "cluster-1000p-t0-alpha")
    assert(info.numPoints == 1000)
    val loaded = cat.load("cluster-1000p-t0-alpha")
    assert(loaded.count() == 1000)
    assert(loaded.columns.contains("tile_z5"))
    // loaded data clusters end-to-end
    val out = GridCluster.cluster(loaded, 3, Bounds.World,
      ClusterOptions(), metricCols = Seq("metric_sales"))
    assert(out.count() > 0)
  }

  test("viewport query prunes tile partitions at planning time") {
    val cat = new Catalog(spark, warehouse)
    val loaded = cat.load("cluster-1000p-t0-alpha")
    val viewport = Bounds(-10.0, -10.0, 10.0, 10.0)
    val proj = GridCluster.projectToViewport(loaded, 5, viewport, ClusterOptions())
    val plan = proj.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tile_z5"),
      s"expected tile partition filters in plan:\n$plan")
    // correctness unchanged by pruning: same rows as a tile-less scan
    val bare = loaded.drop("tile_z5")
    val expected = GridCluster.projectToViewport(bare, 5, viewport, ClusterOptions())
      .select("id")
    assert(proj.select("id").exceptAll(expected).isEmpty &&
      expected.exceptAll(proj.select("id")).isEmpty)
  }

  test("list + describe by substring; fileSize reported") {
    val cat = new Catalog(spark, warehouse)
    cat.save(PointGen.uniformPoints(spark, 50, Bounds.World, 1L), "cluster-50p-t1-beta")
    val ids = cat.list().map(_.id)
    assert(ids.contains("cluster-1000p-t0-alpha") && ids.contains("cluster-50p-t1-beta"))
    assert(cat.describe("beta").exists(_.numPoints == 50))
    assert(cat.describe("nope").isEmpty)
    // catalog entries carry on-disk size (reference helpers.go:88-93)
    assert(cat.list().forall(_.fileSizeBytes > 0))
  }

  test("LRU evicts least-recently-used beyond maxCached") {
    val cat = new Catalog(spark, warehouse, maxCached = 2)
    for (i <- 1 to 3)
      cat.save(PointGen.uniformPoints(spark, 10, Bounds.World, i.toLong), s"cluster-10p-t2-lru$i")
    cat.load("cluster-10p-t2-lru1")
    cat.load("cluster-10p-t2-lru2")
    cat.load("cluster-10p-t2-lru3") // evicts lru1
    assert(cat.cachedIds == Seq("cluster-10p-t2-lru2", "cluster-10p-t2-lru3"))
    cat.load("cluster-10p-t2-lru2") // refresh recency
    cat.load("cluster-10p-t2-lru1") // evicts lru3
    assert(cat.cachedIds == Seq("cluster-10p-t2-lru2", "cluster-10p-t2-lru1"))
  }

  test("idle entries evict on next access (reference's 30-min ticker)") {
    // idleEvictMs = -1: every previously-cached entry counts as idle on
    // the next access (age 0 > -1) — deterministic on any machine, no
    // sleeps (0 would race same-millisecond accesses)
    val cat = new Catalog(spark, warehouse, maxCached = 5, idleEvictMs = -1L)
    cat.load("cluster-10p-t2-lru1")
    cat.load("cluster-10p-t2-lru2") // evicts idle lru1
    assert(cat.cachedIds == Seq("cluster-10p-t2-lru2"))
    cat.load("cluster-10p-t2-lru2") // self-access never self-evicts
    assert(cat.cachedIds == Seq("cluster-10p-t2-lru2"))
    // and with a generous window nothing evicts
    val lazyCat = new Catalog(spark, warehouse, maxCached = 5, idleEvictMs = Long.MaxValue)
    lazyCat.load("cluster-10p-t2-lru1")
    lazyCat.load("cluster-10p-t2-lru2")
    assert(lazyCat.cachedIds.toSet ==
      Set("cluster-10p-t2-lru1", "cluster-10p-t2-lru2"))
  }

  test("drained frames unpersist within grace via the load-side sweep, no further evictions") {
    import org.apache.spark.storage.StorageLevel
    // r13 hole: draining was only reaped inside retire(), so once
    // eviction traffic stopped the last grace-window of frames stayed
    // persisted forever — the sweep now also runs on every load
    val cat = new Catalog(spark, warehouse, maxCached = 1, drainGraceMs = 50L)
    val a = cat.load("cluster-10p-t2-lru1")
    cat.load("cluster-10p-t2-lru2") // evicts lru1 into draining
    assert(a.storageLevel != StorageLevel.NONE,
      "drained frame must stay persisted inside its grace window")
    Thread.sleep(80)
    cat.load("cluster-10p-t2-lru2") // cache hit, NOT an eviction
    assert(a.storageLevel == StorageLevel.NONE,
      "lapsed draining frame must unpersist on the next load, not the next eviction")
  }

  test("mutation purges same-id draining frames immediately (no stale cached-plan reuse)") {
    import org.apache.spark.storage.StorageLevel
    // a frame evicted just before a mutation lingers in Spark's
    // CacheManager; cached-plan matching is path-based, so a
    // post-mutation load would silently reuse pre-mutation blocks
    // unless mutations purge draining entries too
    val cat = new Catalog(spark, warehouse, maxCached = 1, drainGraceMs = Long.MaxValue)
    val before = cat.load("cluster-10p-t2-lru1").count()
    val a = cat.load("cluster-10p-t2-lru1")
    cat.load("cluster-10p-t2-lru2") // evicts lru1 into draining (infinite grace)
    assert(a.storageLevel != StorageLevel.NONE)
    cat.append(PointGen.uniformPoints(spark, 5, Bounds.World, 99L), "cluster-10p-t2-lru1")
    assert(a.storageLevel == StorageLevel.NONE,
      "pre-mutation frame must leave the CacheManager at the mutation, grace or not")
    assert(cat.load("cluster-10p-t2-lru1").count() == before + 5,
      "post-mutation load must see the appended rows")
  }
}
