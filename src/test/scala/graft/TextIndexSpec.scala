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
}
