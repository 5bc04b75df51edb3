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

  test("appendPq encodes with the frozen quantizers and serves the new vectors") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-pqa").toString
    VectorIndex.savePq(corpus, dir, kCoarse = 4, coarseIters = 2,
      m = 2, k = 4, iters = 2, dims = dims)
    // batch = near-copies of vector 0 (tiny perturbation in the last dim)
    val batch = (100L until 104L).map { i =>
      val v = vec(0); v(dims - 1) = v(dims - 1) + 0.01f * (i - 99); (i, v)
    }.toDF("vec_id", "embedding")
    VectorIndex.appendPq(batch, dir, m = 2, k = 4, dims = dims)

    // persisted batch codes ≡ frozen-codebook batch encoding
    val codebook = spark.read.parquet(s"$dir/codebook")
      .select(col("sub"), col("cent_id"), posexplode(col("cv")).as(Seq("pos0", "c")))
      .select(col("sub").cast("long").as("sub"), col("cent_id"),
        (col("pos0") + 1).cast("long").as("pos"), (col("c") / 1000000.0).as("cval"))
    val expected = graft.operators.Similarity
      .pqEncodeWith(batch, codebook, m = 2, k = 4, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val persisted = spark.read.parquet(s"$dir/codes")
      .filter(col("vec_id") >= 100L)
      .select(col("vec_id"), col("sub").cast("long"), col("code"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(persisted == expected, "appended codes diverged from frozen-codebook encoding")

    // the query's neighborhood: its two EXACT corpus duplicates (the
    // seed formula cycles mod 19, so vec(19) = vec(38) = vec(0), d2 = 0)
    // followed by the two closest appended perturbed copies
    val served = VectorIndex.pqServe(spark, dir, queryVecId = 0L,
      probes = 2, m = 2, shortlist = 20, topK = 4, dims = dims)
      .collect().map(_.getLong(0)).toSeq
    assert(served == Seq(19L, 38L, 100L, 101L), s"unexpected neighborhood: $served")

    VectorIndex.compactPq(spark, dir)
    val afterCompact = VectorIndex.pqServe(spark, dir, queryVecId = 0L,
      probes = 2, m = 2, shortlist = 20, topK = 4, dims = dims)
      .collect().map(_.getLong(0)).toSeq
    assert(afterCompact == served, "compaction changed PQ answers")
  }

  test("probe cells are derived from the live index, not stale literals") {
    // VERDICT r6 item #3: a regenerated index at the same path must be
    // served from ITS centroids — annServe re-collects the probe list
    // per call, so rebuilding with different data changes both the
    // probed cells and the results. A cached/stale probe list would
    // either de-prune (scan all cells) or return the old corpus.
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-fresh").toString
    VectorIndex.save(corpus, dir, k = 4, dims = dims)
    val before = VectorIndex.annServe(spark, dir, queryVecId = 0L,
      probes = 2, topK = 5, dims = dims)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq

    // regenerate at the SAME path: shifted ids, different vectors
    val corpus2 = (0L until 40L).map(i => (i, vec(i.toInt + 7))).toDF("vec_id", "embedding")
    VectorIndex.save(corpus2, dir, k = 4, dims = dims)
    val after = VectorIndex.annServe(spark, dir, queryVecId = 0L,
      probes = 2, topK = 5, dims = dims)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(after != before, "serving returned pre-regeneration results — stale probe state")

    // and the served ranking equals the batch IVF search over the NEW
    // corpus — the probe list really came from the regenerated centroids
    val batch2 = graft.operators.Similarity.ivfSearch(corpus2, queryVecId = 0L,
      k = 4, probes = 2, topK = 5, dims = dims)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(after == batch2, "post-regeneration serving diverged from batch over the new corpus")
  }

  test("filtered serving: metadata round-trips the index, predicate joins the pruned scan") {
    import org.apache.spark.sql.functions.col
    val meta = corpus.withColumn("label", (col("vec_id") % 5).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-filt").toString
    VectorIndex.save(meta, dir, k = 4, dims = dims, metaCols = Seq("label"))

    val served = VectorIndex.annServeFiltered(spark, dir, col("label") === 2,
      queryVecId = 0L, probes = 2, topK = 5, dims = dims)
    val got = served.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // every hit satisfies the predicate
    assert(got.nonEmpty && got.forall(_._1 % 5 == 2), s"predicate leaked: $got")
    // row-identical to the batch filtered operator at the same parameters
    val batch = graft.operators.Similarity.ivfSearchFiltered(meta, col("label") === 2,
      queryVecId = 0L, k = 4, probes = 2, topK = 5, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == batch, "served filtered ranking diverged from batch")
    // both the cell pruning AND the label predicate reach the parquet scan
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("cell") && plan.contains("label"),
      s"cell/label predicates did not reach the scan:\n$plan")
  }

  test("filtered PQ serving equals the batch filtered IVF+PQ pipeline") {
    import org.apache.spark.sql.functions.col
    val meta = corpus.withColumn("label", (col("vec_id") % 5).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-pqfilt").toString
    VectorIndex.savePq(meta, dir, kCoarse = 4, coarseIters = 2,
      m = 2, k = 4, iters = 2, dims = dims, metaCols = Seq("label"))
    val served = VectorIndex.pqServeFiltered(spark, dir, col("label") === 2,
      queryVecId = 0L, probes = 2, m = 2, shortlist = 10, topK = 5, dims = dims)
    val got = served.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got.forall(_._1 % 5 == 2), s"predicate leaked: $got")
    val coarse = graft.operators.Similarity.centroidsAsVectors(
      graft.operators.Similarity.kmeansTrain(meta, k = 4, iters = 2, dims = dims))
    val batch = graft.operators.Similarity.ivfpqSearchFiltered(meta, coarse,
      col("label") === 2, queryVecId = 0L, probes = 2, m = 2, k = 4, iters = 2,
      shortlist = 10, topK = 5, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == batch, "served filtered PQ ranking diverged from batch")
    // the label predicate reaches the CODES scan (pre-ADC pruning)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"),
      s"label predicate did not reach the codes scan:\n$plan")
  }

  test("appends refuse metadata drift; matching metaCols append serves filtered") {
    import org.apache.spark.sql.functions.col
    val meta = corpus.withColumn("label", (col("vec_id") % 5).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-metaguard").toString
    VectorIndex.save(meta, dir, k = 4, dims = dims, metaCols = Seq("label"))

    // append WITHOUT the label column → loud failure, not silent nulls
    val batchNoMeta = (100L until 104L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      VectorIndex.append(batchNoMeta, dir, dims = dims)
    }
    assert(e.getMessage.contains("metadata columns"), e.getMessage)

    // append WITH it → filtered serving sees the new vectors
    val batch = batchNoMeta.withColumn("label", (col("vec_id") % 5).cast("int"))
    VectorIndex.append(batch, dir, dims = dims, metaCols = Seq("label"))
    val served = VectorIndex.annServeFiltered(spark, dir, col("label") === 2,
      queryVecId = 0L, probes = 4, topK = 40, dims = dims)
      .collect().map(_.getLong(0)).toSeq
    assert(served.contains(102L), s"appended labeled vector missing: $served")
    assert(served.forall(_ % 5 == 2))

    // same contract on the PQ index
    val pqDir = java.nio.file.Files.createTempDirectory("graft-vix-pqguard").toString
    VectorIndex.savePq(meta, pqDir, kCoarse = 4, coarseIters = 2,
      m = 2, k = 4, iters = 2, dims = dims, metaCols = Seq("label"))
    val e2 = intercept[IllegalArgumentException] {
      VectorIndex.appendPq(batchNoMeta, pqDir, m = 2, k = 4, dims = dims)
    }
    assert(e2.getMessage.contains("metadata columns"), e2.getMessage)
    VectorIndex.appendPq(batch, pqDir, m = 2, k = 4, dims = dims, metaCols = Seq("label"))
    val servedPq = VectorIndex.pqServeFiltered(spark, pqDir, col("label") === 2,
      queryVecId = 0L, probes = 4, m = 2, shortlist = 40, topK = 40, dims = dims)
      .collect().map(_.getLong(0)).toSeq
    assert(servedPq.contains(102L), s"appended labeled vector missing from PQ: $servedPq")
    assert(servedPq.forall(_ % 5 == 2))
  }

  test("served BQ search equals the batch two-stage bqSearch row for row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bqix").toString
    VectorIndex.saveBq(corpus, dir, dims = dims)
    val served = VectorIndex.bqServe(spark, dir, queryVecId = 0L,
      shortlist = 12, topK = 5, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.operators.Similarity.bqSearch(corpus, queryVecId = 0L,
      shortlist = 12, topK = 5, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(served.toSeq == batch.toSeq)
    assert(served.length == 5)
  }

  test("tombstone delete: a deleted id never serves, compact drops it physically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vixdel").toString
    VectorIndex.save(corpus, dir, k = 4, dims = dims)
    VectorIndex.addBqCodes(spark, dir, dims = dims)
    def annIds() = VectorIndex.annServe(spark, dir, 0L, probes = 4, topK = 39, dims = dims)
      .collect().map(_.getLong(0)).toSet
    def bqIds() = VectorIndex.bqServe(spark, dir, 0L, shortlist = 39, topK = 39, dims = dims)
      .collect().map(_.getLong(0)).toSet
    assert(annIds().contains(7L) && bqIds().contains(7L))

    VectorIndex.delete(spark, dir, Seq(7L))
    assert(!annIds().contains(7L), "tombstoned id surfaced in annServe")
    assert(!bqIds().contains(7L), "tombstoned id surfaced in bqServe")

    val before = spark.read.parquet(s"$dir/vectors").count()
    VectorIndex.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/vectors").count() == before - 1,
      "compact must physically drop the tombstoned row")
    assert(!new java.io.File(s"$dir/tombstones").exists,
      "compact must clear the tombstone table")
    assert(!annIds().contains(7L) && !bqIds().contains(7L))

    // once the tombstone is compacted away, the id is genuinely re-addable
    VectorIndex.append(Seq((7L, vec(7))).toDF("vec_id", "embedding"), dir, dims = dims)
    assert(annIds().contains(7L))
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
