package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton16 interleaves bits exactly") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (5L, 3L))
      .toDF("x", "y")
      .select(ZOrder.morton16(col("x"), col("y")).as("z"))
    val zs = df.as[Long].collect()
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(j => (((x >> j) & 1L) << (2 * j)) | (((y >> j) & 1L) << (2 * j + 1))).sum
    assert(zs.toSeq == Seq(ref(0, 0), ref(1, 0), ref(0, 1), ref(65535, 65535), ref(5, 3)))
    assert(zs(3) == 0xFFFFFFFFL) // full interleave of all-ones
    assert(zs(1) == 1L && zs(2) == 2L)
  }

  test("quantize clamps to the cell range") {
    val df = Seq(-200.0, -180.0, 0.0, 179.99, 180.0, 250.0).toDF("c")
      .select(ZOrder.quantize(col("c"), -180.0, 180.0, 16).as("q"))
    val qs = df.as[Long].collect()
    assert(qs.head == 0L && qs(1) == 0L)
    assert(qs(2) == 32768L)
    assert(qs(4) == 65535L && qs(5) == 65535L) // hi edge clamps
    assert(qs(3) < 65535L)
  }

  test("z-range buckets preserve spatial locality") {
    // a tight cluster of points lands in ONE z-bucket with a tiny bbox;
    // far-apart points land in different buckets
    val near = (1 to 50).map(i => (10.0 + i * 0.001, 20.0 + i * 0.001))
    val far = Seq((-170.0, -80.0), (170.0, 80.0))
    val pts = (near ++ far).toDF("lon", "lat")
    val out = ZOrder.layoutStats(pts).collect()
    assert(out.length == 3) // cluster bucket + 2 singleton buckets
    val clusterRow = out.find(_.getAs[Long]("n_points") == 50L).get
    assert(clusterRow.getAs[Long]("max_x") - clusterRow.getAs[Long]("min_x") <= 16L)
    assert(clusterRow.getAs[Long]("n_tiles") == 1L)
  }
}
