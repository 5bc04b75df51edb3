package graft

import graft.operators.CorpusStats

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("source overlap counts exactly the distinct shared shingles") {
    val docs = Seq(
      (1L, "srcA", "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "srcB", "b c d e"),   // shingles: "b c d", "c d e"
      (3L, "srcB", "x y z"),     // shingle "x y z" — no overlap
      (4L, "srcC", "a b c")      // shingle "a b c" — overlaps srcA only
    ).toDF("doc_id", "source", "text")
    val out = CorpusStats.sourceOverlapMatrix(docs).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("n_shared")).toMap
    assert(out == Map(("srcA", "srcB") -> 1L, ("srcA", "srcC") -> 1L))
    // (srcB, srcC) share nothing → absent, not zero
  }

  test("source overlap dedups shingle multiplicity within a source") {
    val docs = Seq(
      (1L, "srcA", "a b c"), (2L, "srcA", "a b c"), // same shingle twice in srcA
      (3L, "srcB", "a b c")
    ).toDF("doc_id", "source", "text")
    val out = CorpusStats.sourceOverlapMatrix(docs).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_shared") == 1L)
  }

  test("length percentiles are the exact discrete order statistics") {
    // srcA: token counts 1..10 → p25 = rank ceil(2.5)=3 → 3,
    // p50 = rank 5 → 5, p90 = rank 9 → 9, p99 = rank ceil(9.9)=10 → 10
    val docs = (1 to 10).map(i => (i.toLong, "srcA", Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val r = CorpusStats.lengthPercentiles(docs).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("p25") == 3L)
    assert(row.getAs[Long]("p50") == 5L)
    assert(row.getAs[Long]("p90") == 9L)
    assert(row.getAs[Long]("p99") == 10L)
  }

  test("tfidf ranks source-specific terms above corpus-wide ones") {
    // "common" appears in every doc (idf = ln(1) = 0 → score 0);
    // each source repeats its own marker term
    val docs = Seq(
      (1L, "srcA", "common alpha alpha alpha beta"),
      (2L, "srcB", "common gamma gamma gamma delta")
    ).toDF("doc_id", "source", "text")
    val out = CorpusStats.tfidfTopTerms(docs, k = 2).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet == Set("srcA", "srcB"))
    bySource.values.foreach(rows => assert(rows.length == 2))
    val top = out.filter(_.getAs[Double]("tfidf") ==
      out.map(_.getAs[Double]("tfidf")).max).map(_.getAs[String]("term")).toSet
    assert(top == Set("alpha", "gamma")) // tf 3 · ln 2 each
    // the everywhere-term scores exactly zero
    assert(out.filter(_.getAs[String]("term") == "common")
      .forall(_.getAs[Double]("tfidf") == 0.0))
  }

  test("tfidf emits at most k rows per source with term tie-break") {
    val docs = Seq(
      (1L, "srcA", "a b c d e f g h"),
      (2L, "srcB", "p q r s t u v w")
    ).toDF("doc_id", "source", "text")
    val out = CorpusStats.tfidfTopTerms(docs, k = 3).collect()
    out.groupBy(_.getAs[String]("source")).values.foreach { rows =>
      assert(rows.length == 3)
      // all scores tie (tf=1, same idf) → lexicographically first terms win
    }
    assert(out.filter(_.getAs[String]("source") == "srcA")
      .map(_.getAs[String]("term")).toSet == Set("a", "b", "c"))
  }
}
