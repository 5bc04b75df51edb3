package graft

import graft.sources.DedupIndex
import org.apache.spark.sql.functions._

class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  // corpus with a near-dup pair inside it and distinctive singletons
  private def corpus = Seq(
    (10L, "the quick brown fox jumps over the lazy dog tonight"),
    (11L, "completely different text about spark shuffles and joins"),
    (12L, "a third document with its own vocabulary entirely"),
    (13L, "short doc")
  ).toDF("doc_id", "text")

  private def batch = Seq(
    // exact duplicate of 10
    (100L, "the quick brown fox jumps over the lazy dog tonight"),
    // near duplicate of 10 (one word changed at the end)
    (101L, "the quick brown fox jumps over the lazy dog today"),
    // unique
    (102L, "nothing in the index resembles this sentence at all"),
    // too short to shingle into any candidate, and no digest match
    (103L, "tiny")
  ).toDF("doc_id", "text")

  private def classified(threshold: Double = 0.5) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dix").toString
    DedupIndex.save(corpus, dir)
    DedupIndex.incrementalDedup(spark, dir, batch, threshold = threshold)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("exact / near / unique classification against the persisted index") {
    val got = classified()
    assert(got(100L) == (("exact", 10L, 1000000L)))
    val (st, m, ppm) = got(101L)
    assert(st == "near" && m == 10L && ppm > 500000L && ppm < 1000000L)
    assert(got(102L) == (("unique", -1L, 0L)))
    assert(got(103L) == (("unique", -1L, 0L)))
  }

  test("bloomGate ≡ plain anti-join gate, and empty-index admits everything") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dix").toString
    DedupIndex.save(corpus, dir)
    val admitted = DedupIndex.bloomGate(spark, dir, batch)
      .select("doc_id").as[Long].collect().toSet
    val plain = {
      val sigkeys = spark.read.parquet(s"$dir/sigkeys")
      batch.withColumn("sigkey", graft.operators.Dedup.signatureKey(col("text")))
        .join(sigkeys, Seq("sigkey"), "left_anti")
        .select("doc_id").as[Long].collect().toSet
    }
    assert(admitted == plain)
    // exact dup of doc 10 is gated out; the near-dup has a different
    // signature KEY (identity gate, not similarity gate) so it passes
    assert(!admitted.contains(100L) && admitted.contains(102L))

    val emptyDir = java.nio.file.Files.createTempDirectory("graft-dix-e").toString
    DedupIndex.save(corpus.limit(0), emptyDir)
    val all = DedupIndex.bloomGate(spark, emptyDir, batch)
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(100L, 101L, 102L, 103L))
  }

  test("threshold gates the near match") {
    val got = classified(threshold = 0.95)
    assert(got(101L)._1 == "unique")
    assert(got(100L)._1 == "exact") // digest path ignores the threshold
  }

  test("band-key probe prunes: candidate scan only touches agreeing keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dix2").toString
    DedupIndex.save(corpus, dir)
    // bands table is bk-sorted; digests table digest-sorted — the probe
    // joins hit sorted, range-partitioned layouts
    val bands = spark.read.parquet(s"$dir/bands").select("bk").as[String].collect()
    assert(bands.sameElements(bands.sorted), "bands parquet not bk-sorted")
    val digs = spark.read.parquet(s"$dir/digests").select("digest").as[String].collect()
    assert(digs.sameElements(digs.sorted), "digests parquet not digest-sorted")
  }

  test("incremental result is deterministic across runs") {
    assert(classified() == classified())
  }

  test("append folds a batch into the index; compact preserves behavior") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dix3").toString
    DedupIndex.save(corpus, dir)
    // ingest lifecycle: classify, then append the unique survivor
    val survivor = Seq((102L, "nothing in the index resembles this sentence at all"))
      .toDF("doc_id", "text")
    DedupIndex.append(survivor, dir)
    def statusOf(id: Long, text: String): (String, Long) = {
      val r = DedupIndex.incrementalDedup(spark, dir,
        Seq((id, text)).toDF("doc_id", "text")).collect().head
      (r.getString(1), r.getLong(2))
    }
    // the NEXT batch dedups against the appended doc
    assert(statusOf(200L, "nothing in the index resembles this sentence at all") == (("exact", 102L)))
    // superset edit: 7 of 8 shingles shared → jaccard 0.875
    assert(statusOf(201L, "nothing in the index resembles this sentence at all truly")._1 == "near")
    // original corpus still indexed
    assert(statusOf(202L, "the quick brown fox jumps over the lazy dog tonight") == (("exact", 10L)))
    // compaction rewrites into sorted layout without changing answers
    DedupIndex.compact(spark, dir)
    assert(statusOf(203L, "nothing in the index resembles this sentence at all") == (("exact", 102L)))
    assert(statusOf(204L, "the quick brown fox jumps over the lazy dog tonight") == (("exact", 10L)))
    val sig = spark.read.parquet(s"$dir/sigkeys").select("sigkey").as[String].collect()
    assert(sig.sameElements(sig.sorted) && sig.distinct.length == sig.length,
      "compacted sigkeys not sorted/deduped")
    // gate sees appended docs too
    val gated = graft.streaming.DocStream.gateAgainstIndex(spark,
      Seq((300L, "nothing in the index resembles this sentence at all"),
          (301L, "a wholly new sentence unseen by any index so far"))
        .toDF("doc_id", "text"), dir)
      .select("doc_id").as[Long].collect().toSet
    assert(gated == Set(301L))
  }

  private def classifyAll(dir: String) =
    DedupIndex.incrementalDedup(spark, dir, batch)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  private def gateSet(dir: String) =
    DedupIndex.bloomGate(spark, dir, batch)
      .select("doc_id").as[Long].collect().toSet

  test("delete: serve-after-delete ≡ rebuild-without-doc on every gate path, " +
       "through replay and compact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dix-d").toString
    DedupIndex.save(corpus, dir)
    DedupIndex.delete(spark, dir, Seq(10L))
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-dix-r").toString
    DedupIndex.save(corpus.filter(col("doc_id") =!= 10L), rebuilt)

    // incremental classify: the tombstoned index answers exactly like a
    // rebuild without the doc — 100/101 lose their exact/near match
    val expect = classifyAll(rebuilt)
    assert(classifyAll(dir) == expect)
    assert(expect(100L) == (("unique", -1L, 0L)))
    assert(expect(101L) == (("unique", -1L, 0L)))

    // bloom gate + streaming gate: the deleted doc's signature leaves
    assert(gateSet(dir) == gateSet(rebuilt))
    assert(gateSet(dir).contains(100L))
    val streamed = graft.streaming.DocStream.gateAgainstIndex(spark, batch, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed.contains(100L))

    // replayed delete is idempotent
    DedupIndex.delete(spark, dir, Seq(10L))
    assert(classifyAll(dir) == expect)

    // compact physically drops the doc from all four tables and clears
    // the tombstones, answers unchanged
    DedupIndex.compact(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones").exists)
    assert(classifyAll(dir) == expect && gateSet(dir) == gateSet(rebuilt))
    for (t <- Seq("digests", "bands", "shingles", "sigkeys")) {
      val n = spark.read.parquet(s"$dir/$t").filter(col("doc_id") === 10L).count()
      assert(n == 0L, s"$t still holds deleted doc rows after compact")
    }
  }

  test("delete: a signature shared with a live doc keeps gating") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dix-s").toString
    val twinned = corpus.unionByName(
      Seq((14L, "the quick brown fox jumps over the lazy dog tonight"))
        .toDF("doc_id", "text"))
    DedupIndex.save(twinned, dir)
    DedupIndex.delete(spark, dir, Seq(10L))
    // the exact-dup batch doc still matches — via the LIVE twin
    assert(classifyAll(dir)(100L) == (("exact", 14L, 1000000L)))
    // and its signature still gates (the per-doc sigkey layout's point)
    assert(!gateSet(dir).contains(100L))
    // gateFunnel's LEFT join is against DISTINCT live keys: counts are
    // per-batch-row even with twin docs sharing a key
    val funnel = graft.streaming.DocStream.gateFunnel(spark,
      batch.withColumn("lang", lit("en")), dir).collect().head
    assert(funnel.getLong(0) == 4L, "arrived count inflated by sigkey join")
  }
}
