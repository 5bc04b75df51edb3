package graft

import graft.sources.VectorIndex
import org.apache.spark.sql.functions._

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dims)(j => (((seed * 31 + j * 7) % 19) - 9) / 10.0f)

  private def corpus = (0L until 40L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")

  test("served ANN ranking equals the batch IVF search row for row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vix").toString
    VectorIndex.save(corpus, dir, k = 4, dims = dims)
    val served = VectorIndex.annServe(spark, dir, queryVecId = 0L,
      probes = 2, topK = 5, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.operators.Similarity.ivfSearch(corpus, queryVecId = 0L,
      k = 4, probes = 2, topK = 5, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(served.toSeq == batch.toSeq)
    assert(served.length == 5)
  }

  test("append against the frozen quantizer ≡ full rebuild, before and after compact") {
    val base = corpus // vec_id 0..39
    val batch = (40L until 60L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val full = base.unionByName(batch)

    val incDir = java.nio.file.Files.createTempDirectory("graft-vix-inc").toString
    VectorIndex.save(base, incDir, k = 4, dims = dims)
    VectorIndex.append(batch, incDir, dims = dims)

    val fullDir = java.nio.file.Files.createTempDirectory("graft-vix-full").toString
    VectorIndex.save(full, fullDir, k = 4, dims = dims)

    def serve(dir: String) = VectorIndex.annServe(spark, dir, queryVecId = 41L,
      probes = 2, topK = 8, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    val incServed = serve(incDir)
    assert(incServed == serve(fullDir), "append-then-serve diverged from rebuild")
    assert(incServed.exists(_._1 >= 40L), "appended batch absent from results")

    VectorIndex.compact(spark, incDir)
    assert(serve(incDir) == incServed, "compaction changed answers")
    val plan = VectorIndex.annServe(spark, incDir, queryVecId = 41L,
      probes = 2, topK = 8, dims = dims)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("cell"),
      s"compacted index lost the pruned-scan shape:\n$plan")
  }

  test("PQ serving equals the batch IVF+PQ pipeline row for row, codes scan pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-pq").toString
    VectorIndex.savePq(corpus, dir, kCoarse = 4, coarseIters = 2,
      m = 2, k = 4, iters = 2, dims = dims)
    val served = VectorIndex.pqServe(spark, dir, queryVecId = 0L,
      probes = 2, m = 2, shortlist = 10, topK = 5, dims = dims)
    val got = served.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val coarse = graft.operators.Similarity.centroidsAsVectors(
      graft.operators.Similarity.kmeansTrain(corpus, k = 4, iters = 2, dims = dims))
    val batch = graft.operators.Similarity.ivfpqSearch(corpus, coarse,
      queryVecId = 0L, probes = 2, m = 2, k = 4, iters = 2,
      shortlist = 10, topK = 5, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == batch, "served PQ ranking diverged from the batch pipeline")
    assert(got.length == 5)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("cell"),
      s"probed-cell predicate did not reach the codes scan:\n$plan")
  }

  test("the serving scan pushes the probed-cell predicate to parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vix2").toString
    VectorIndex.save(corpus, dir, k = 4, dims = dims)
    val plan = VectorIndex.annServe(spark, dir, queryVecId = 0L,
      probes = 2, topK = 5, dims = dims)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("cell"),
      s"cell IN predicate did not reach the scan:\n$plan")
  }
}
