package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64
  private def basis(i: Int, scale: Float = 1.0f): Array[Float] =
    Array.tabulate(dims)(j => if (j == i) scale else 0.0f)

  private def embs = Seq(
    (0L, basis(0)),           // query
    (1L, basis(0, 5.0f)),     // same direction → cos 1
    (2L, basis(1)),           // orthogonal → cos 0
    (3L, Array.tabulate(dims)(j => if (j <= 1) 1.0f else 0.0f)) // 45° → cos √2/2
  ).toDF("vec_id", "embedding")

  test("brute-force top-k orders by cosine") {
    val out = Similarity.bruteForceTopK(embs, queryVecId = 0L, k = 3, dims = dims).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L, 2L))
    assert(out(0).getAs[Double]("cos_sim") == 1.0)
    assert(math.abs(out(1).getAs[Double]("cos_sim") - 0.707107) < 1e-6)
    assert(out(2).getAs[Double]("cos_sim") == 0.0)
  }

  test("LSH: co-directional vectors share a bucket signature") {
    val out = Similarity.lshBuckets(embs, bits = 8, dims = dims).collect()
    val sig = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("sig")).toMap
    assert(sig(0L) == sig(1L)) // scaling never flips a hyperplane sign
    assert(sig(0L).length == 8)
  }

  test("in-bucket nearest neighbor finds the co-directional vector") {
    val out = Similarity.lshNearestInBucket(embs, bits = 8, dims = dims).collect()
    val nn = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("nn_id")).toMap
    assert(nn.get(0L).contains(1L))
    assert(nn.get(1L).contains(0L))
  }
}
