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
