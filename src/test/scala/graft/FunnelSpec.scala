package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel counts cumulative survivors per stage in one pass") {
    val df = Seq(
      (1L, "en", 0.9, true),  // survives all
      (2L, "en", 0.9, false), // dropped at flag gate
      (3L, "en", 0.2, true),  // dropped at quality
      (4L, "de", 0.9, true),  // dropped at lang
      (5L, "en", 0.6, true)   // survives all
    ).toDF("id", "lang", "q", "keep")
    val out = Funnel.funnel(df, Seq(
      "lang" -> (col("lang") === "en"),
      "quality" -> (col("q") >= 0.5),
      "flag" -> col("keep")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "lang", 5L, 4L, 1L),
      (2L, "quality", 4L, 3L, 1L),
      (3L, "flag", 3L, 2L, 1L)))
  }

  test("funnel of an empty input is all zeros") {
    val df = Seq.empty[(Long, String)].toDF("id", "lang")
    val out = Funnel.funnel(df, Seq("lang" -> (col("lang") === "en")))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 0L, 0L)))
  }

  test("funnelBy keys the same cumulative counts by cohort") {
    val df = Seq(
      ("a", true, true), ("a", true, false), ("a", false, true),
      ("b", true, true)
    ).toDF("src", "f1", "f2")
    val out = Funnel.funnelBy(df, "src", Seq("g1" -> col("f1"), "g2" -> col("f2")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    // (group, stage_idx, rows_out, dropped)
    assert(out.toSeq == Seq(
      ("a", 1L, 2L, 1L), ("a", 2L, 1L, 1L),
      ("b", 1L, 1L, 0L), ("b", 2L, 1L, 0L)))
  }

  test("a single physical job serves every stage count") {
    val df = (1L to 100L).map(i => (i, i % 2 == 0, i % 3 == 0)).toDF("id", "a", "b")
    var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      Funnel.funnel(df, Seq("a" -> col("a"), "b" -> col("b"))).collect()
      // listener delivery is async; poll briefly for quiescence
      val deadline = System.nanoTime() + 5_000_000_000L
      var last = -1
      while (System.nanoTime() < deadline && jobs != last) {
        last = jobs; Thread.sleep(100)
      }
    } finally spark.sparkContext.removeSparkListener(l)
    assert(jobs <= 2, s"funnel ran $jobs jobs; expected one aggregation (+AQE finalization)")
  }
}
