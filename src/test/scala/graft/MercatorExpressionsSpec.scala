package graft

import graft.functions.Mercator
import graft.plans.MercatorExpressions
import org.apache.spark.sql.functions._

/** The codegen Expressions must be BIT-IDENTICAL to the builtin
  * composition (same Math calls, same order) — checked with exact
  * equality, not tolerance.
  */
class MercatorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val se = math.pow(2, 5) * 512

  private def coords = Seq(
    (0.0, 0.0), (180.0, 85.0), (-180.0, -85.0), (45.0, 45.0),
    (-100.2, 40.2), (12.345, -67.89), (0.0, 89.9), (0.0, -89.9))
    .toDF("lon", "lat")

  test("expressions bit-equal to builtin composition, via SQL registration") {
    MercatorExpressions.register(spark)
    coords.createOrReplaceTempView("coords")
    val rows = spark.sql(
      s"""SELECT lon, lat,
         |  graft_mercator_x(lon, $se) AS ex, graft_mercator_y(lat, $se) AS ey,
         |  graft_mercator_inv_x(graft_mercator_x(lon, $se), $se) AS ix,
         |  graft_mercator_inv_y(graft_mercator_y(lat, $se), $se) AS iy
         |FROM coords""".stripMargin)
      .withColumn("bx", Mercator.projX(col("lon"), se))
      .withColumn("by", Mercator.projY(col("lat"), se))
      .withColumn("bix", Mercator.invX(Mercator.projX(col("lon"), se), se))
      .withColumn("biy", Mercator.invY(Mercator.projY(col("lat"), se), se))
      .collect()
    for (r <- rows) {
      assert(r.getAs[Double]("ex") == r.getAs[Double]("bx"), s"x @ $r")
      assert(r.getAs[Double]("ey") == r.getAs[Double]("by"), s"y @ $r")
      assert(r.getAs[Double]("ix") == r.getAs[Double]("bix"), s"invx @ $r")
      assert(r.getAs[Double]("iy") == r.getAs[Double]("biy"), s"invy @ $r")
    }
  }

  test("null propagation and interpreted path") {
    MercatorExpressions.register(spark)
    val r = spark.sql(s"SELECT graft_mercator_x(CAST(NULL AS DOUBLE), $se) AS x").collect()
    assert(r.head.isNullAt(0))
  }

  test("extension class registers the same functions") {
    // separate session with extensions injected
    val s2 = spark.newSession()
    new graft.plans.GraftExtensions() // construct (wiring itself needs builder-time config)
    MercatorExpressions.register(s2)
    assert(s2.sql(s"SELECT graft_mercator_x(0.0, $se) AS x").head().getDouble(0) == se / 2)
  }

  test("embedding/text expressions usable from pure SQL") {
    graft.plans.SimilarityExpressions.register(spark)
    graft.plans.TextExpressions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dot,
        |  graft_hsig(array(1.0D, 0.0D), 4, 2) AS sig,
        |  graft_shingles('a b c d', 3) AS sh,
        |  graft_minhash(array('x'), 2) AS mh""".stripMargin).head()
    assert(r.getAs[Double]("dot") == 32.0)
    assert(r.getAs[String]("sig").matches("[01]{4}"))
    assert(r.getAs[scala.collection.Seq[String]]("sh").toSeq == Seq("a b c", "b c d"))
    // element 0 = md5("0|x"), checkable against Spark's builtin md5
    val expect = spark.sql("SELECT md5('0|x') AS h").head().getString(0)
    assert(r.getAs[scala.collection.Seq[String]]("mh").head == expect)
  }
}
