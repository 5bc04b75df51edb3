package graft

import graft.model.{Bounds, ClusterOptions}
import graft.operators.TilePyramid
import graft.sources.PointGen
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Delete quarter of the pyramid/dataset lifecycle: subtractive state
  * maintenance must reproduce a rebuild-without-the-points bit-for-bit
  * (exact decimal/count subtraction; min-ids re-derived only where
  * lost), tombstoned points must leave every serving path immediately,
  * and compaction must reclaim rows without changing any answer.
  */
class PyramidDeleteSpec extends SparkSpec {
  import spark.implicits._

  private val opts = ClusterOptions(minPoints = 2, radius = 40.0)
  private val metrics = Seq("metric_sales")
  private val meta = Seq("meta_category")

  private def pts = PointGen.uniformPoints(spark, 3000, Bounds.World, seed = 19L)

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("deleteFromState ≡ rebuild without the points (metrics + metadata freqs)") {
    val all = pts
    val n = all.count()
    val st = TilePyramid.cellState(all, 0, 4, opts, metrics, meta, n)
    // ids 1..60 are cell minima all over the grid — the repair path is
    // exercised hard, not incidentally
    val del = all.filter(col("id") <= 60 || col("id") % 13 === 0)
    val live = all.filter(!(col("id") <= 60 || col("id") % 13 === 0))
    val st2 = TilePyramid.deleteFromState(st, del, live, 0, 4, opts, metrics)
    val maintained = TilePyramid.finalizePyramid(st2, live, 0, 4, opts, metrics)
    // same epoch: the rebuild pins the ORIGINAL density count, exactly
    // as the maintenance contract requires (band unchanged)
    val rebuilt = TilePyramid.finalizePyramid(
      TilePyramid.cellState(live, 0, 4, opts, metrics, meta, n), live, 0, 4, opts, metrics)
    assertSame(maintained, rebuilt)

    // repair boundedness: min ids changed EXACTLY where the stored min
    // was deleted — never a gratuitous recompute of untouched cells
    val delIds = del.select(col("id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val changed = st.cells.select(col("zoom"), col("cell_x"), col("cell_y"),
        col("min_id"))
      .join(st2.cells.select(col("zoom"), col("cell_x"), col("cell_y"),
        col("min_id").as("m2")), Seq("zoom", "cell_x", "cell_y"))
      .filter(col("min_id") =!= col("m2"))
      .select(col("min_id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    assert(changed.nonEmpty, "expected some lost minima with ids 1..60 deleted")
    assert(changed.forall(delIds.contains),
      "a cell's min changed although its min was not deleted")
  }

  test("deleting every point of a cell removes the cell entirely") {
    val all = pts
    val n = all.count()
    val st = TilePyramid.cellState(all, 0, 2, opts, metrics, Nil, n)
    val st2 = TilePyramid.deleteFromState(st, all, all.limit(0), 0, 2, opts, metrics)
    assert(st2.cells.count() == 0L)
  }

  test("engine deleteAndMaintain: tombstones + subtractive pyramid ≡ rebuild; " +
       "compactPoints reclaims rows without changing answers") {
    val engine = new ClusterEngine(spark,
      Files.createTempDirectory("graft-del").toString, opts)
    val id = "cluster-3000p-t0-del"
    engine.catalog.save(pts, id)
    engine.buildAndSavePyramid(id, 0, 3)
    val delIds = (1L to 40L) ++ (100L to 2900L by 97L)
    val info = engine.deleteAndMaintain(id, delIds.toDF("id"))
    val live = pts.join(delIds.toDF("id"), Seq("id"), "left_anti")
    val liveCount = live.count()
    assert(info.numPoints == liveCount)

    // the live query path excludes tombstoned points immediately
    assert(engine.load(id).count() == liveCount)
    assert(engine.load(id).join(delIds.toDF("id"), Seq("id"), "left_semi").count() == 0L)

    // maintained pyramid ≡ full rebuild over the survivors
    val rebuilt = TilePyramid.build(live, 0, 3, opts,
      Seq("metric_value", "metric_size", "metric_sales", "metric_customers"),
      Seq("meta_category", "meta_region"))
    assertSame(engine.catalog.loadPyramid(id).select(rebuilt.columns.map(col): _*), rebuilt)

    // replayed delete is a no-op (idempotent)
    val again = engine.deleteAndMaintain(id, delIds.toDF("id"))
    assert(again.numPoints == liveCount)
    assertSame(engine.catalog.loadPyramid(id).select(rebuilt.columns.map(col): _*), rebuilt)

    // compaction drops the rows physically, clears tombstones, and
    // changes no answer
    engine.catalog.compactPoints(id)
    assert(!new java.io.File(s"${info.path}/_tombstones").exists)
    assert(engine.load(id).count() == liveCount)
    assertSame(engine.catalog.loadPyramid(id).select(rebuilt.columns.map(col): _*), rebuilt)
    assert(engine.list().find(_.id == id).get.numPoints == liveCount)
  }

  test("property: ANY random delete subset maintains to the rebuild exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Test => ScTest}
    val all = PointGen.uniformPoints(spark, 1500, Bounds.World, seed = 31L)
    val n = all.count()
    val st = TilePyramid.cellState(all, 0, 2, opts, metrics, meta, n)
    // salted-hash membership: every draw deletes a DIFFERENT ~1/d of
    // the corpus; the subtractive state must reproduce the epoch-pinned
    // rebuild over the survivors bit-for-bit each time — including the
    // min-id repairs the random subset happens to force
    val gen = for {
      d <- Gen.chooseNum(2, 8)
      salt <- Gen.chooseNum(1L, 1000000L)
    } yield (d, salt)
    val prop = forAll(gen) { case (d, salt) =>
      val isDel = org.apache.spark.sql.functions
        .pmod(org.apache.spark.sql.functions.xxhash64(col("id"), lit(salt)), lit(d)) === 0
      val del = all.filter(isDel)
      val live = all.filter(!isDel)
      val maintained = TilePyramid.finalizePyramid(
        TilePyramid.deleteFromState(st, del, live, 0, 2, opts, metrics),
        live, 0, 2, opts, metrics)
      val rebuilt = TilePyramid.finalizePyramid(
        TilePyramid.cellState(live, 0, 2, opts, metrics, meta, n),
        live, 0, 2, opts, metrics)
      maintained.collect().map(_.toString).sorted.toSeq ==
        rebuilt.collect().map(_.toString).sorted.toSeq
    }
    val res = org.scalacheck.Test.check(
      ScTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("append after delete never recycles ids, live or tombstoned") {
    val engine = new ClusterEngine(spark,
      Files.createTempDirectory("graft-del-ids").toString, opts)
    val id = "cluster-100p-t0-ids"
    engine.createDataset(id, 100) // ids 1..100
    // delete the MAX id and an interior one: numPoints (98) is now
    // below max(id) (100) — offsetting new ids by the count would
    // either collide with live id 99..100 or resurrect tombstoned 100
    engine.deleteAndMaintain(id, Seq(5L, 100L).toDF("id"))
    engine.appendPoints(id, 10)
    val ids = engine.load(id).select("id").as[Long].collect().sorted
    assert(ids.length == ids.distinct.length, "duplicate ids after append")
    assert(ids.max == 110L, s"expected fresh ids 101..110, got max ${ids.max}")
    assert(!ids.contains(5L) && !ids.contains(100L), "tombstoned id resurrected")
    assert(engine.list().find(_.id == id).get.numPoints == 108L)
  }

  test("band-crossing delete rebuilds the epoch at the new grid") {
    val engine = new ClusterEngine(spark,
      Files.createTempDirectory("graft-del-band").toString, opts)
    val id = "cluster-5100p-t0-band"
    val all = PointGen.uniformPoints(spark, 5100, Bounds.World, seed = 23L)
    engine.catalog.save(all, id)
    engine.buildAndSavePyramid(id, 0, 2)
    // 5100 → 4899 crosses the 5k density band: the grid itself changes
    val delIds = (1L to 5100L by 26L).toDF("id")
    val info = engine.deleteAndMaintain(id, delIds)
    assert(info.numPoints < 5000L)
    val live = all.join(delIds, Seq("id"), "left_anti")
    val rebuilt = TilePyramid.build(live, 0, 2, opts,
      Seq("metric_value", "metric_size", "metric_sales", "metric_customers"),
      Seq("meta_category", "meta_region"))
    assertSame(engine.catalog.loadPyramid(id).select(rebuilt.columns.map(col): _*), rebuilt)
  }
}
