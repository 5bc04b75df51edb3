package graft

import graft.model.{Bounds, ClusterOptions}
import graft.operators.TilePyramid
import graft.sources.PointGen
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental pyramid maintenance: mergeable exact partial states over
  * ingest batches must reproduce a full rebuild bit-for-bit (the
  * decimal/long accumulators are associative and exact), including the
  * metadata frequency strings derived from the mergeable counts table.
  */
class PyramidIncrementSpec extends SparkSpec {

  private val opts = ClusterOptions(minPoints = 2, radius = 40.0)
  private val metrics = Seq("metric_sales")
  private val meta = Seq("meta_category")

  private def pts = PointGen.uniformPoints(spark, 3000, Bounds.World, seed = 11L)

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("merged batch states reproduce the full rebuild exactly (incl. metadata)") {
    val all = pts
    val n = all.count()
    val st1 = TilePyramid.cellState(all.filter(col("id") % 2 === 0), 0, 4, opts,
      metrics, meta, n)
    val st2 = TilePyramid.cellState(all.filter(col("id") % 2 === 1), 0, 4, opts,
      metrics, meta, n)
    val incremental = TilePyramid.finalizePyramid(
      TilePyramid.mergeStates(st1, st2), all, 0, 4, opts, metrics)
    val full = TilePyramid.build(all, 0, 4, opts, metrics, meta)
    assertSame(incremental, full)
  }

  test("merge is order-insensitive and composes across three batches") {
    val all = pts
    val n = all.count()
    def st(r: Int) = TilePyramid.cellState(all.filter(col("id") % 3 === r), 0, 3, opts,
      metrics, Nil, n)
    val abc = TilePyramid.mergeStates(TilePyramid.mergeStates(st(0), st(1)), st(2))
    val cba = TilePyramid.mergeStates(st(2), TilePyramid.mergeStates(st(1), st(0)))
    assertSame(TilePyramid.finalizePyramid(abc, all, 0, 3, opts, metrics),
      TilePyramid.finalizePyramid(cba, all, 0, 3, opts, metrics))
  }

  test("property: ANY random partition into 2-4 batches merges to the rebuild exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Test => ScTest}
    val all = pts
    val n = all.count()
    val full = TilePyramid.build(all, 0, 3, opts, metrics, meta)
      .collect().map(_.toString).sorted.toSeq
    val gen = for {
      k <- Gen.chooseNum(2, 4)
      salt <- Gen.chooseNum(1L, 1000000L)
    } yield (k, salt)
    // random batch assignment via a salted hash of id — every draw is a
    // different partition of the SAME corpus; the merged state must
    // reproduce the full rebuild bit-for-bit each time
    val prop = forAll(gen) { case (k, salt) =>
      val merged = (0 until k).map { r =>
        TilePyramid.cellState(
          all.filter(pmod(xxhash64(col("id"), lit(salt)), lit(k)) === r),
          0, 3, opts, metrics, meta, n)
      }.reduce(TilePyramid.mergeStates)
      TilePyramid.finalizePyramid(merged, all, 0, 3, opts, metrics)
        .collect().map(_.toString).sorted.toSeq == full
    }
    val res = org.scalacheck.Test.check(
      ScTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("merging states of different epochs (density counts) is rejected") {
    val all = pts
    val a = TilePyramid.cellState(all, 0, 2, opts, Nil, Nil, densityN = 1000L)
    val b = TilePyramid.cellState(all, 0, 2, opts, Nil, Nil, densityN = 60000L)
    intercept[IllegalArgumentException](TilePyramid.mergeStates(a, b))
  }

  test("engine append path: incremental maintenance == rebuild, band crossing rebuilds") {
    val wh = Files.createTempDirectory("graft-incr-engine").toString
    val engine = new ClusterEngine(spark, wh)
    engine.createDataset("incr-a", 1200, seed = 21L)
    engine.buildAndSavePyramid("incr-a", 0, 3)
    val before = engine.catalog.loadPyramidState("incr-a").get._1.densityN

    // same band (1200 + 800 < 5000): merged state, epoch unchanged
    engine.appendPoints("incr-a", 800, seed = 22L)
    val st = engine.catalog.loadPyramidState("incr-a").get._1
    assert(st.densityN == before, "same-band append must keep the epoch")
    val full = engine.load("incr-a")
    val rebuilt = TilePyramid.build(full, 0, 3, graft.model.ClusterOptions.service,
      full.columns.filter(_.startsWith("metric_")).toSeq,
      full.columns.filter(c => c == "meta_category" || c == "meta_region").toSeq)
    // partitioned parquet reads the zoom column last — align by name
    val served = engine.catalog.loadPyramid("incr-a")
      .select(rebuilt.columns.map(col): _*)
    assertSame(served, rebuilt)

    // crossing the 5k band edge forces a new epoch
    engine.appendPoints("incr-a", 4000, seed = 23L)
    val st2 = engine.catalog.loadPyramidState("incr-a").get._1
    assert(st2.densityN == 6000L, s"band crossing must rebuild the epoch (got ${st2.densityN})")
    val full2 = engine.load("incr-a")
    val rebuilt2 = TilePyramid.build(full2, 0, 3, graft.model.ClusterOptions.service,
      full2.columns.filter(_.startsWith("metric_")).toSeq,
      full2.columns.filter(c => c == "meta_category" || c == "meta_region").toSeq)
    val served2 = engine.catalog.loadPyramid("incr-a")
      .select(rebuilt2.columns.map(col): _*)
    assertSame(served2, rebuilt2)
  }

  test("streaming ingest maintains the state via foreachBatch") {
    val all = pts
    val n = all.count()
    val dir = Files.createTempDirectory("graft-pyr-incr")
    // two ingest batch files, streamed one per trigger
    all.filter(col("id") % 2 === 0).write.parquet(s"$dir/b0.parquet")
    all.filter(col("id") % 2 === 1).write.parquet(s"$dir/b1.parquet")

    var state: Option[graft.operators.PyramidState] = None
    val q = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*.parquet")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val st = TilePyramid.cellState(batch, 0, 3, opts, metrics, meta, n)
        state = Some(state.fold(st)(prev => TilePyramid.mergeStates(prev, st)))
        // a production loop would persist/write the state table here to
        // bound lineage; materializing per batch is the same effect
        state.foreach(s => { s.cells.persist().count(); () })
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val incremental = TilePyramid.finalizePyramid(state.get, all, 0, 3, opts, metrics)
    assertSame(incremental, TilePyramid.build(all, 0, 3, opts, metrics, meta))
  }
}
