package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sky(rows: (Long, String, Double, Int)*) =
    Skyline.skyline2dMin(
        rows.toDF("id", "grp", "x", "y"), "grp", "x", "y")
      .collect().map(_.getAs[Long]("id")).toSet

  test("skyline keeps exactly the non-dominated rows, per group") {
    val ids = sky(
      (1L, "A", 10.0, 5), // frontier
      (2L, "A", 10.0, 7), // dominated: same x, higher y
      (3L, "A", 12.0, 5), // dominated by 1: strict x, tie y
      (4L, "A", 12.0, 3), // frontier: new y low
      (5L, "A", 15.0, 3), // dominated by 4: tie y, higher x
      (6L, "A", 15.0, 1), // frontier
      (7L, "A", 10.0, 5), // exact duplicate of 1 — neither dominates, both stay
      (8L, "B", 99.0, 99)) // lone point in its group
    assert(ids == Set(1L, 4L, 6L, 7L, 8L))
  }

  test("skyline equals the definitional O(n²) dominance filter on random data") {
    val rnd = new scala.util.Random(42)
    val pts = (1 to 300).map { i =>
      (i.toLong, "g" + rnd.nextInt(3), (rnd.nextInt(20) * 5).toDouble, rnd.nextInt(25))
    }
    def dominated(p: (Long, String, Double, Int)) = pts.exists { q =>
      q._2 == p._2 && q._3 <= p._3 && q._4 <= p._4 &&
        (q._3 < p._3 || q._4 < p._4)
    }
    val expected = pts.filterNot(dominated).map(_._1).toSet
    assert(sky(pts: _*) == expected)
  }

  test("skyline window input is the SHRUNK frame: shuffle carries distinct keys, not rows") {
    // AQE off so the raw exchanges expose write metrics
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

    val parts = 8
    val nGroups = 4
    val nPrices = 50
    def run(n: Int): (Long, Long) = {
      val df = s.range(n).selectExpr("id",
          s"concat('g', id % $nGroups) AS grp",
          s"CAST((id * 31 % $nPrices) * 5 AS DOUBLE) AS x",
          s"CAST(id * 17 % 40 AS INT) AS y")
        .repartition(parts)
      val sky = graft.operators.Skyline.skyline2dMin(df, "grp", "x", "y")
      sky.collect()
      val plan = sky.queryExecution.executedPlan
      // exchanges whose DIRECT input is an aggregate — the groupBy
      // shuffle fed by the map-side partial, and the window shuffle fed
      // by the final agg. (Matching "any aggregate in the subtree"
      // would also catch the post-semi-join repartition: the optimizer
      // pushes the LeftSemi below it, putting the broadcast subtree —
      // aggregates included — under that exchange too.)
      def inputIsAgg(e: ShuffleExchangeLike): Boolean = {
        def strip(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
          p match {
            case u: org.apache.spark.sql.execution.UnaryExecNode
                if !u.isInstanceOf[BaseAggregateExec] &&
                  (u.nodeName.contains("Project") || u.nodeName.contains("Sort") ||
                    u.nodeName.contains("WholeStageCodegen") || u.nodeName.contains("InputAdapter")) =>
              strip(u.child)
            case other => other
          }
        strip(e.children.head).isInstanceOf[BaseAggregateExec]
      }
      val aggEx = plan.collect { case e: ShuffleExchangeLike if inputIsAgg(e) => e }
      assert(aggEx.nonEmpty, s"no aggregate-fed exchange:\n$plan")
      (aggEx.map(_.metrics("shuffleRecordsWritten").value).sum, sky.count())
    }
    // bound: groupBy shuffle ≤ keys × partitions (each partition emits
    // each key once) + window shuffle ≤ keys (final agg output)
    val bound = nGroups.toLong * nPrices * (parts + 1)
    val (written, _) = run(20000)
    assert(written <= bound,
      s"shuffle wrote $written > keys(${nGroups * nPrices}) x (partitions($parts)+1)")
    assert(written < 20000, s"shuffle wrote $written — agg is not collapsing")
    val (written10, _) = run(200000)
    assert(written10 <= bound,
      s"10x rows pushed the window-side shuffle to $written10")
    info(s"measured: keys=${nGroups * nPrices} parts=$parts " +
      s"shuffle@20k=$written shuffle@200k=$written10")
  }

  test("skyline is idempotent: the frontier of a frontier is itself") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 200).map { i =>
      (i.toLong, "g" + rnd.nextInt(2), (rnd.nextInt(15) * 3).toDouble, rnd.nextInt(20))
    }.toDF("id", "grp", "x", "y")
    val once = Skyline.skyline2dMin(pts, "grp", "x", "y")
    val twice = Skyline.skyline2dMin(once, "grp", "x", "y")
    assert(twice.collect().map(_.getAs[Long]("id")).toSet ==
      once.collect().map(_.getAs[Long]("id")).toSet)
  }
}
