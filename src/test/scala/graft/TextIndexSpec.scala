package graft

import graft.sources.TextIndex
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark join vector scan"),
    (2L, "spark spark spark filter"),
    (3L, "vector vector join"),
    (4L, "totally unrelated words here")
  ).toDF("doc_id", "text")

  test("served BM25 equals the batch-scored ranking row for row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tix").toString
    TextIndex.save(corpus, dir)
    val served = TextIndex.bm25Serve(spark, dir, Seq("spark", "vector", "join"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = graft.operators.CorpusStats
      .bm25TopDocs(corpus, Seq("spark", "vector", "join"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(served.toSeq == batch.toSeq)
    assert(served.nonEmpty && !served.map(_._1).contains(4L))
  }

  test("the serving scan pushes the term predicate to parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tix2").toString
    TextIndex.save(corpus, dir)
    val plan = TextIndex.bm25Serve(spark, dir, Seq("spark"), topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("term"),
      s"term IN predicate did not reach the scan:\n$plan")
  }

  test("append-then-serve ≡ full rebuild, before and after compact") {
    val batch = Seq(
      (5L, "spark vector spark retrieval"),
      (6L, "join join filter")
    ).toDF("doc_id", "text")
    val incDir = java.nio.file.Files.createTempDirectory("graft-tix-inc").toString
    TextIndex.save(corpus, incDir)
    TextIndex.append(batch, incDir)
    val fullDir = java.nio.file.Files.createTempDirectory("graft-tix-full").toString
    TextIndex.save(corpus.unionByName(batch), fullDir)

    def serve(dir: String) =
      TextIndex.bm25Serve(spark, dir, Seq("spark", "vector", "join"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val inc = serve(incDir)
    assert(inc == serve(fullDir),
      "append-then-serve diverged from rebuild (stale df or stats)")
    assert(inc.map(_._1).contains(5L), "appended doc absent from ranking")

    TextIndex.compact(spark, incDir)
    assert(serve(incDir) == inc, "compaction changed the ranking")
    // compact restored the one-row stats and the GLOBAL df column
    assert(spark.read.parquet(s"$incDir/_stats").count() == 1L)
    val dfSpark = spark.read.parquet(s"$incDir/postings")
      .filter(col("term") === "spark").select("df").distinct().collect()
    assert(dfSpark.map(_.getLong(0)).toSeq == Seq(3L), "df not refreshed globally")
  }

  test("postings carry exact denormalized stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tix3").toString
    TextIndex.save(corpus, dir)
    val p = spark.read.parquet(s"$dir/postings")
      .filter(col("term") === "spark").collect()
      .map(r => (r.getAs[Long]("doc"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[Long]("dl"))).toSet
    assert(p == Set((1L, 1L, 2L, 4L), (2L, 3L, 2L, 4L)))
    val s = spark.read.parquet(s"$dir/_stats").collect().head
    assert((s.getAs[Long]("n"), s.getAs[Long]("dl_sum")) == ((4L, 15L)))
  }

  test("tombstone delete is score-correct: serve ≡ rebuild without the doc") {
    val q = Seq("spark", "vector", "join")
    def ranked(dir: String) = TextIndex.bm25Serve(spark, dir, q, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val dir = java.nio.file.Files.createTempDirectory("graft-tixdel").toString
    TextIndex.save(corpus, dir)
    assert(ranked(dir).map(_._1).contains(2L))

    // deleting doc 2 must reproduce a FRESH index over the remaining
    // corpus exactly — ids AND micro-scores (N, Σdl, df all shift)
    TextIndex.delete(spark, dir, Seq(2L))
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-tixdel2").toString
    TextIndex.save(corpus.filter(col("doc_id") =!= 2L), rebuilt)
    assert(ranked(dir) == ranked(rebuilt),
      "post-delete serving must equal the rebuild, scores included")

    // a replayed delete cannot double-subtract the corpus constants
    TextIndex.delete(spark, dir, Seq(2L))
    assert(ranked(dir) == ranked(rebuilt))

    // compact physically drops the postings and clears the tombstones
    val before = spark.read.parquet(s"$dir/postings").count()
    TextIndex.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/postings").count() < before)
    assert(!new java.io.File(s"$dir/tombstones").exists)
    assert(ranked(dir) == ranked(rebuilt))
  }
}
