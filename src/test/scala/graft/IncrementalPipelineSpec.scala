package graft

import graft.operators.Snapshot
import graft.sources.{DedupIndex, VectorIndex}
import org.apache.spark.sql.functions._

/** End-to-end INCREMENTAL pipeline: the snapshot diff scopes the work
  * list, only the delta is (re-)embedded and folded into the persisted
  * indexes with frozen quantizers/signatures, and both serving paths
  * immediately reflect the delta — the composition a 100 TB corpus
  * runs per release instead of any full rebuild.
  */
class IncrementalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  // deterministic "embedding model" stub: doc_id → vector (the real
  // encoder is external; what the engine owns is everything around it)
  private def embed(id: Long): Array[Float] =
    Array.tabulate(dims)(j => (((id * 31 + j * 7) % 19) - 9) / 10.0f)

  test("snapshot diff scopes the delta; index appends serve it; gate blocks it") {
    val v1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "spark shuffles partition data across the executor fleet"),
      (3L, "completely unrelated third document about map reduce jobs"),
      (4L, "a fourth document that will be modified in release two")
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "spark shuffles partition data across the executor fleet"),
      (3L, "completely unrelated third document about map reduce jobs"),
      (4L, "a fourth document that got rewritten for release two today"),
      (5L, "a brand new fifth document arriving in the second release")
    ).toDF("doc_id", "text")

    // 1. diff scopes the work list — nothing unchanged is touched
    val work = Snapshot.diff(v1, v2)
      .filter(col("status").isin("added", "modified"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(work == Set(4L, 5L), s"work list wrong: $work")

    // 2. v1 indexes exist (built once)
    val dixPath = java.nio.file.Files.createTempDirectory("graft-inc-dix").toString
    DedupIndex.save(v1, dixPath)
    val vixPath = java.nio.file.Files.createTempDirectory("graft-inc-vix").toString
    val v1Embs = v1.select("doc_id").collect().map(_.getLong(0)).toSeq
      .map(i => (i, embed(i))).toDF("vec_id", "embedding")
    VectorIndex.save(v1Embs, vixPath, k = 2, dims = dims)

    // 3. only the delta is embedded and appended (frozen quantizer)
    val deltaEmbs = work.toSeq.sorted.map(i => (i + 100L, embed(1L)))
      .toDF("vec_id", "embedding") // near-dups of doc 1's vector
    VectorIndex.append(deltaEmbs, vixPath, dims = dims)
    val deltaDocs = v2.filter(col("doc_id").isin(work.toSeq: _*))
    DedupIndex.append(deltaDocs, dixPath)

    // 4. ANN serving surfaces the appended delta immediately
    val served = VectorIndex.annServe(spark, vixPath, queryVecId = 1L,
      probes = 2, topK = 2, dims = dims).collect().map(_.getLong(0)).toSet
    assert(served == Set(104L, 105L),
      s"appended delta vectors not nearest to their twin: $served")

    // 5. the ingest gate now blocks exactly the newly indexed docs
    val replay = v2.withColumnRenamed("doc_id", "doc_id") // next batch replays v2
    val admitted = DedupIndex.bloomGate(spark, dixPath, replay)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.isEmpty,
      s"replayed release should be fully gated after the append: $admitted")

    // 6. compaction changes neither serving path
    VectorIndex.compact(spark, vixPath)
    DedupIndex.compact(spark, dixPath)
    val served2 = VectorIndex.annServe(spark, vixPath, queryVecId = 1L,
      probes = 2, topK = 2, dims = dims).collect().map(_.getLong(0)).toSet
    assert(served2 == served)
    val admitted2 = DedupIndex.bloomGate(spark, dixPath, replay)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted2.isEmpty)
  }

  test("right-to-be-forgotten sweep: one doc purged from every index in one motion") {
    import graft.sources.TextIndex
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "spark shuffles partition data across the executor fleet"),
      (3L, "completely unrelated third document about map reduce jobs"),
      (4L, "a fourth document mentioning spark exactly once here")
    ).toDF("doc_id", "text")
    val embs = corpus.select(col("doc_id").as("vec_id")).as[Long]
      .collect().toSeq.map(i => (i, embed(i))).toDF("vec_id", "embedding")
    val tix = java.nio.file.Files.createTempDirectory("graft-gdpr-tix").toString
    val vix = java.nio.file.Files.createTempDirectory("graft-gdpr-vix").toString
    val dix = java.nio.file.Files.createTempDirectory("graft-gdpr-dix").toString
    TextIndex.save(corpus, tix)
    VectorIndex.save(embs, vix, k = 2, dims = dims)
    DedupIndex.save(corpus, dix)

    // the purge: one id, three O(1)-ish tombstone appends
    TextIndex.delete(spark, tix, Seq(2L))
    VectorIndex.delete(spark, vix, Seq(2L))
    DedupIndex.delete(spark, dix, Seq(2L))

    def assertGone(): Unit = {
      // text: doc 2 out of every ranking, even for its own best term
      val ranked = TextIndex.bm25Serve(spark, tix, Seq("spark", "executor"), topK = 10)
        .collect().map(_.getLong(0))
      assert(!ranked.contains(2L) && ranked.contains(4L))
      // vectors: doc 2 out of ANN top-k however hard we probe
      val ann = VectorIndex.annServe(spark, vix, queryVecId = 1L,
        probes = 2, topK = 4, dims = dims).collect().map(_.getLong(0))
      assert(!ann.contains(2L) && ann.nonEmpty)
      // dedup: replaying the forgotten text is UNIQUE again and the
      // ingest gate re-admits it
      val replay = Seq((99L, "spark shuffles partition data across the executor fleet"))
        .toDF("doc_id", "text")
      val cls = DedupIndex.incrementalDedup(spark, dix, replay).collect().head
      assert(cls.getString(1) == "unique")
      val admitted = DedupIndex.bloomGate(spark, dix, replay)
        .select("doc_id").collect().map(_.getLong(0))
      assert(admitted.sameElements(Array(99L)))
    }
    assertGone()

    // compaction reclaims the rows everywhere; the contract holds
    TextIndex.compact(spark, tix)
    VectorIndex.compact(spark, vix)
    DedupIndex.compact(spark, dix)
    for (p <- Seq(tix, vix, dix))
      assert(!new java.io.File(s"$p/tombstones").exists &&
             !new java.io.File(s"$p/_tombstones").exists)
    assertGone()
  }
}
