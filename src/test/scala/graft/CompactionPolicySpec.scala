package graft

import graft.sources.{Catalog, DedupIndex, TextIndex, VectorIndex}
import graft.model.Bounds
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Policy-driven compaction across all four index families: trickle
  * deletes must NOT trigger a rewrite (tombstones stay, answers
  * correct), and crossing the dead-fraction threshold must (rows
  * physically reclaimed, tombstones cleared, answers unchanged) — the
  * maintenance-loop contract that makes deletes O(batch) in steady
  * state instead of O(index) per delete.
  */
class CompactionPolicySpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private def embed(id: Long): Array[Float] =
    Array.tabulate(dims)(j => (((id * 31 + j * 7) % 19) - 9) / 10.0f)

  private def corpus(n: Int) = (1 to n).map(i =>
    (i.toLong, s"document number $i talks about topic ${i % 7} in tokens " +
      s"alpha$i beta${i % 11} gamma${i % 5} delta epsilon zeta")).toDF("doc_id", "text")

  test("dedup index: below-threshold deletes keep tombstones; crossing compacts") {
    val dir = Files.createTempDirectory("graft-pol-dix").toString
    DedupIndex.save(corpus(20), dir)
    DedupIndex.delete(spark, dir, Seq(1L, 2L)) // 10% dead
    assert(!DedupIndex.compactIfStale(spark, dir, maxDead = 0.2))
    assert(new java.io.File(s"$dir/tombstones").exists)
    DedupIndex.delete(spark, dir, Seq(3L, 4L, 5L)) // 25% dead
    assert(DedupIndex.compactIfStale(spark, dir, maxDead = 0.2))
    assert(!new java.io.File(s"$dir/tombstones").exists)
    assert(DedupIndex.deadFraction(spark, dir) == 0.0)
    // compacted index still refuses the survivors' duplicates
    val cls = DedupIndex.incrementalDedup(spark, dir,
      Seq((99L, corpus(20).filter(col("doc_id") === 10L)
        .select("text").as[String].head())).toDF("doc_id", "text")).collect().head
    assert(cls.getString(1) == "exact" && cls.getLong(2) == 10L)
  }

  test("vector index: policy respects the threshold on both layouts") {
    val embs = (1L to 20L).map(i => (i, embed(i))).toDF("vec_id", "embedding")
    val flat = Files.createTempDirectory("graft-pol-vix").toString
    VectorIndex.save(embs, flat, k = 2, dims = dims)
    VectorIndex.delete(spark, flat, Seq(1L))
    assert(VectorIndex.deadFraction(spark, flat) == 0.05)
    assert(!VectorIndex.compactIfStale(spark, flat, maxDead = 0.2))
    VectorIndex.delete(spark, flat, Seq(2L, 3L, 4L, 5L))
    assert(VectorIndex.compactIfStale(spark, flat, maxDead = 0.2))
    assert(!new java.io.File(s"$flat/tombstones").exists)
    val served = VectorIndex.annServe(spark, flat, queryVecId = 10L,
      probes = 2, topK = 20, dims = dims).collect().map(_.getLong(0))
    assert(served.nonEmpty && served.forall(_ > 5L))
  }

  test("text index: compaction keeps scores rebuild-exact after the policy fires") {
    val dir = Files.createTempDirectory("graft-pol-tix").toString
    TextIndex.save(corpus(20), dir)
    TextIndex.delete(spark, dir, Seq(1L, 2L, 3L, 4L, 5L))
    assert(TextIndex.deadFraction(spark, dir) == 0.25)
    assert(TextIndex.compactIfStale(spark, dir, maxDead = 0.2))
    val rebuilt = Files.createTempDirectory("graft-pol-tix2").toString
    TextIndex.save(corpus(20).filter(col("doc_id") > 5L), rebuilt)
    val a = TextIndex.bm25Serve(spark, dir, Seq("alpha10", "delta"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = TextIndex.bm25Serve(spark, rebuilt, Seq("alpha10", "delta"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("dataset: deadFraction reads the meta, not the data; policy compacts") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-pol-cat").toString)
    cat.save(graft.sources.PointGen.uniformPoints(spark, 100, Bounds.World, 7L), "d")
    cat.deletePoints("d", (1L to 10L).toDF("id"))
    assert(math.abs(cat.deadFraction("d") - 0.1) < 1e-9)
    assert(!cat.compactIfStale("d", maxDead = 0.2))
    cat.deletePoints("d", (11L to 25L).toDF("id"))
    assert(cat.compactIfStale("d", maxDead = 0.2))
    assert(!new java.io.File(s"${cat.list().head.path}/_tombstones").exists)
    assert(cat.load("d").count() == 75L)
    assert(cat.deadFraction("d") == 0.0)
  }
}
