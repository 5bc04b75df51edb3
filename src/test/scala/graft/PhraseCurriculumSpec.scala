package graft

import graft.operators.CorpusStats

class PhraseCurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("phrase search finds every occurrence with 1-based positions") {
    val docs = Seq(
      (1L, "a b c a b c a b"),   // "a b c" at 1 and 4
      (2L, "x a b c y"),         // at 2
      (3L, "a c b"),             // no match
      (4L, "a b")                // too short
    ).toDF("doc_id", "text")
    val out = CorpusStats.phraseSearch(docs, Seq("a", "b", "c")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos")))
    assert(out.toSeq == Seq((1L, 2L, 1L), (2L, 1L, 2L)))
  }

  test("phrase search handles repeated terms in the phrase") {
    val docs = Seq((1L, "go go go stop"), (2L, "go stop go")).toDF("doc_id", "text")
    val out = CorpusStats.phraseSearch(docs, Seq("go", "go")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_matches")))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("curriculum phases order by unigram difficulty within source") {
    // 8 docs in one source: 4 made of very common tokens (low NLL),
    // 4 with rare tokens (high NLL) → common docs land in phases 1-2
    val common = (1 to 4).map(i => (i.toLong, "s", Seq.fill(10)("the").mkString(" ")))
    val rare = (5 to 8).map(i => (i.toLong, "s", (1 to 10).map(j => s"rare${i}_$j").mkString(" ")))
    val docs = (common ++ rare).toDF("doc_id", "source", "text")
    val out = CorpusStats.curriculumPhases(docs, phases = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phase")).toMap
    assert((1L to 4L).map(out).toSet == Set(1L, 2L))
    assert((5L to 8L).map(out).toSet == Set(3L, 4L))
  }

  test("curriculum ntile balances phase sizes per source") {
    val docs = (1 to 10).map(i => (i.toLong, if (i <= 6) "a" else "b",
      (1 to i).map(j => s"w$j").mkString(" "))).toDF("doc_id", "source", "text")
    val sizes = CorpusStats.curriculumPhases(docs, phases = 2).collect()
      .groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("phase")))
      .view.mapValues(_.length).toMap
    assert(sizes(("a", 1L)) == 3 && sizes(("a", 2L)) == 3)
    assert(sizes(("b", 1L)) == 2 && sizes(("b", 2L)) == 2)
  }
}
