package graft

import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("nbTrainScore separates disjoint-vocabulary classes perfectly") {
    val docs = Seq(
      (1L, "web", "spam casino pills spam casino"),
      (2L, "web", "casino pills pills spam"),
      (3L, "book", "chapter prose narrative chapter"),
      (4L, "book", "narrative prose prose chapter")
    ).toDF("doc_id", "source", "text")
    val out = Classifier.nbTrainScore(docs).collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("correct") == 1L))
  }

  test("mixed-token doc goes to the class owning the majority of its tokens") {
    val docs = Seq(
      (1L, "web", "spam casino pills"),
      (2L, "web", "spam casino casino"),
      (3L, "book", "chapter prose narrative"),
      (4L, "book", "prose prose chapter"),
      // labeled web but 3 of 4 tokens are book vocabulary (the doc's own
      // tokens train its labeled class, so the minority needs a margin)
      (5L, "web", "prose chapter narrative spam")
    ).toDF("doc_id", "source", "text")
    val got = Classifier.nbTrainScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted")).toMap
    assert(got(5L) == "book")
    assert(got(1L) == "web" && got(3L) == "book")
  }

  test("argmax tie breaks to the lexically smaller class") {
    // perfectly symmetric corpus: doc 5's single shared token scores
    // identically under both classes -> 'a' wins the tie
    val docs = Seq(
      (1L, "b", "x x"),
      (2L, "a", "x x"),
      (3L, "a", "y"),
      (4L, "b", "y")
    ).toDF("doc_id", "source", "text")
    val got = Classifier.nbTrainScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted")).toMap
    assert(got(1L) == "a" && got(2L) == "a")
  }

  test("perceptron distillation learns the gate and stays integer-exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val total = docs.count()
    val hist = Classifier.perceptronDistill(docs, iters = 5).collect()
    assert(hist.length == 5)
    val errByIt = hist.map(r => r.getAs[Long]("it") -> r.getAs[Long]("n_err")).toMap
    // w = 0 gives margin 0 everywhere: iteration 1 misclassifies all
    assert(errByIt(1L) == total)
    // the linear model must beat the all-wrong start on the rule labels
    assert(errByIt(5L) < total)
    // determinism: a second run is bit-identical (exact BIGINT path)
    val again = Classifier.perceptronDistill(docs, iters = 5).collect()
    assert(hist.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
