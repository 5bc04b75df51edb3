package graft

import graft.queries.Relational

/** The ntile scale-path contract: `spendQuartilesApprox` (one-pass
  * approx_percentile boundaries + broadcast bucket join, no global
  * window) must agree with the exact `qNtile` spec within sketch
  * tolerance — the correctness oracle a production rewrite keeps.
  */
class QuartileScaleSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("approx quartiles agree with exact ntile within sketch tolerance, no global window") {
    val exact = Relational.qNtile(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Relational.spendQuartilesApprox(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

    val total = exact.values.sum
    assert(approx.map(_._2).sum == total, "bucket assignment must partition all customers")
    // per-quartile population within 1% of the exact ntile split
    approx.foreach { case (q, n, _, _) =>
      assert(math.abs(n - exact(q)) <= total / 100,
        s"quartile $q: approx $n vs exact ${exact(q)} (> 1% of $total off)")
    }
    // quartile ranges are ordered and non-overlapping (descending spend)
    approx.sortBy(_._1).sliding(2).foreach {
      case Array((_, _, lo1, _), (_, _, _, hi2)) =>
        assert(hi2 <= lo1, "quartile ranges overlap")
      case _ =>
    }
    // and the plan really has no single-partition global window: no
    // Window node at all, and the only wide shuffles are the spend agg
    val plan = Relational.spendQuartilesApprox(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scale path must not use a window:\n$plan")
  }
}
