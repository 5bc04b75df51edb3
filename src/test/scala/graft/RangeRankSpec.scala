package graft

import graft.queries.{Relational, Events => Ev}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** RangeRank (range-bucketed two-pass rank / prefix sum) contracts:
  * bit-identical results to the single-partition-window specs, and an
  * executed plan whose every Window node is partitioned (no
  * single-partition global window anywhere) — the r9 verdict's
  * weak-class fix for q_gini / q_abc_analysis / q_balanced_shards /
  * q_concurrency.
  */
class RangeRankSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  /** Every WindowExec in the executed plan must have a non-empty
    * partitionSpec.
    */
  private def assertNoGlobalWindow(df: DataFrame, name: String): Unit = {
    df.collect() // materialize so AQE finalizes the plan
    def strip(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] =
      p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .flatMap(strip) ++ p.collect { case w: WindowExec => w }
    val wins = strip(df.queryExecution.executedPlan)
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"$name has a single-partition global Window:\n${w.treeString}")
    }
  }

  test("withRunningSumThen equals two independent passes and keeps bucketed windows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // heavy key ties so the peer-inclusive RANGE frame is exercised
    val df = (1L to 4000L).map(i => (i % 97, i % 5 + 1)).toDF("k", "v")
    // reference: two separate bucketed passes, second term derived from
    // the first's running value (the q_survival dependency shape)
    val a1 = graft.operators.RangeRank.withRunningSum(
      df, col("v"), col("k"), Nil, out = "r1")
    val a2 = graft.operators.RangeRank.withRunningSum(
      a1, col("r1") % 7 + col("v"), col("k"), Nil, out = "r2")
    val fused = graft.operators.RangeRank.withRunningSumThen(
      df, col("v"), "r1",
      s1 => s1, col("r1") % 7 + col("v"), "r2", col("k"), Nil)
    val want = a2.select("k", "v", "r1", "r2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val got = fused.select("k", "v", "r1", "r2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(got == want, "fused dependent running sums drifted from the two-pass reference")
    assertNoGlobalWindow(fused.select("k", "v", "r1", "r2"), "withRunningSumThen")
  }

  test("qGiniDist is bit-identical to qGini and has no global window") {
    val a = Relational.qGini(spark, dir).collect()
    val b = Relational.qGiniDist(spark, dir).collect()
    assert(a.toSeq == b.toSeq, s"gini twin drifted:\n${a.toSeq}\nvs\n${b.toSeq}")
    assertNoGlobalWindow(Relational.qGiniDist(spark, dir), "qGiniDist")
  }

  test("qAbcDist is bit-identical to qAbcAnalysis and has no global window") {
    val a = Relational.qAbcAnalysis(spark, dir).collect()
    val b = Relational.qAbcDist(spark, dir).collect()
    assert(a.toSeq == b.toSeq, s"abc twin drifted:\n${a.toSeq}\nvs\n${b.toSeq}")
    assertNoGlobalWindow(Relational.qAbcDist(spark, dir), "qAbcDist")
  }

  test("qNtileDist is bit-identical to qNtile and has no global window") {
    val a = Relational.qNtile(spark, dir).collect()
    val b = Relational.qNtileDist(spark, dir).collect()
    assert(a.toSeq == b.toSeq, s"ntile twin drifted:\n${a.toSeq}\nvs\n${b.toSeq}")
    assertNoGlobalWindow(Relational.qNtileDist(spark, dir), "qNtileDist")
  }

  test("balancedShards keeps the snake deal exact with no global window") {
    import spark.implicits._
    // adversarial sizes: heavy ties + a skewed head
    val docs = (1L to 5000L).map(i => (i, (i % 7) * 100 + (if (i < 10) 100000 else 0)))
      .toDF("doc_id", "n_tokens")
    val out = graft.operators.TrainingPrep
      .balancedShards(docs, 8, col("n_tokens"))
    val rows = out.collect()
    // rank is an exact permutation of 0..n-1 under (size desc, id)
    val byRank = rows.sortBy(r => r.getLong(2))
    assert(byRank.map(_.getLong(2)).toSeq == (0L until 5000L).toSeq)
    byRank.sliding(2).foreach {
      case Array(x, y) =>
        val (sx, ix, sy, iy) = (x.getLong(1), x.getLong(0), y.getLong(1), y.getLong(0))
        assert(sx > sy || (sx == sy && ix < iy),
          s"rank order violated: ($sx,$ix) before ($sy,$iy)")
      case _ =>
    }
    // snake arithmetic from the exact rank
    rows.foreach { r =>
      val (rank, shard) = (r.getLong(2), r.getLong(3))
      val expected = if ((rank / 8) % 2 == 0) rank % 8 else 8 - 1 - rank % 8
      assert(shard == expected, s"rank $rank dealt to $shard, expected $expected")
    }
    assertNoGlobalWindow(
      graft.operators.TrainingPrep.balancedShards(docs, 8, col("n_tokens")),
      "balancedShards")
  }

  test("qMadOutliers ranks through (group, bucket) windows, never group-only") {
    val events = SparkEntry.events(spark, dir)
    val df = Ev.qMadOutliers(events)
    df.collect()
    def strip(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] =
      p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .flatMap(strip) ++ p.collect { case w: WindowExec => w }
    strip(df.queryExecution.executedPlan).foreach { w =>
      assert(w.partitionSpec.size >= 2,
        s"rank window partitioned by the low-cardinality group alone:\n${w.treeString}")
    }
  }

  test("qConcurrency sweep has no global window and matches a serial recompute") {
    val events = SparkEntry.events(spark, dir)
    val out = Ev.qConcurrency(events).collect()
    assert(out.length == 1)
    val (peak, tPeak, n) = (out(0).getLong(0), out(0).getLong(1), out(0).getLong(2))
    // serial reference: fold the boundary multiset in (t, delta) order
    val sess = Ev.qSessionize(events)
      .select(unix_micros(col("t_start")).as("s"), unix_micros(col("t_end")).as("e"))
      .collect()
    val bounds = (sess.map(r => (r.getLong(0), 1L)) ++ sess.map(r => (r.getLong(1), -1L)))
      .sortBy(identity)
    // peer-inclusive running sum: group by (t, delta)
    var run = 0L
    var best = Long.MinValue
    var bestT = 0L
    bounds.groupBy(identity).toSeq.sortBy(_._1).foreach { case ((t, d), g) =>
      run += d * g.length
      if (run > best) { best = run; bestT = t }
    }
    assert(peak == best, s"peak $peak vs serial $best")
    assert(tPeak == bestT, s"t_peak $tPeak vs serial $bestT")
    assert(n == sess.length.toLong)
    assertNoGlobalWindow(Ev.qConcurrency(events), "qConcurrency")
  }

  test("groupedRankSelect matches a serial order-statistic recompute on random draws") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (draw <- 1 to 5) {
      val nGroups = 1 + rnd.nextInt(4)
      val rows = (0 until 500 + rnd.nextInt(1500)).map { _ =>
        // heavy-tail-ish values WITH duplicates (small value domain)
        (rnd.nextInt(nGroups).toString, rnd.nextInt(40).toLong)
      }
      val ranks = Seq("(n - 1) div 2 + 1", "n div 2 + 1", "1", "n")
      val got = graft.operators.RangeRank.groupedRankSelect(
          rows.toDF("grp", "c"), Seq("grp"), col("c"), ranks)
        .collect()
        .map(r => (r.getAs[String]("grp"), r.getAs[Long]("target_rank"),
          r.getAs[Long]("c")))
        .sorted.toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (g, vs) =>
        val sortedVs = vs.map(_._2).sorted
        val n = sortedVs.length.toLong
        Seq((n - 1) / 2 + 1, n / 2 + 1, 1L, n) // duplicates preserved
          .map(tr => (g, tr, sortedVs((tr - 1).toInt)))
      }.sorted
      assert(got == want, s"draw $draw: ${got.take(5)} vs ${want.take(5)}")
    }
  }

  test("groupedRankSelect shuffles only the target buckets' rows, linearly in N") {
    // AQE off so raw exchanges and their metrics are visible
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._

    def shuffled(n: Int): Long = {
      graft.operators.CachePool.clear()
      // uniform keys → ~n/32 rows per bucket; 2 median targets hit ≤ 2 buckets
      val df = (0 until n).map(i => ((i % 5).toString, (i * 2654435761L) % 1000000L))
        .toDF("grp", "c").repartition(8)
      val out = graft.operators.RangeRank.groupedRankSelect(
        df, Seq("grp"), col("c"), Seq("(n - 1) div 2 + 1", "n div 2 + 1"))
      out.collect()
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val top = out.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeLike => e.metrics("shuffleRecordsWritten").value }
      top.max // the window-input exchange dominates every other (tiny) one
    }
    val n1 = 20000
    val v1 = shuffled(n1)
    val v10 = shuffled(n1 * 10)
    // far below the full corpus (a full grouped rank would shuffle ~N)
    assert(v1 < n1 / 4, s"window input $v1 not a bucket-sized fraction of $n1")
    assert(v10 < n1 * 10 / 4, s"window input $v10 not a bucket-sized fraction of ${n1 * 10}")
    // and linear: 10× data → ≤ ~12× shuffled rows (bucket-count noise allowed)
    assert(v10 <= v1 * 12, s"not linear: $v1 -> $v10")
  }
}
