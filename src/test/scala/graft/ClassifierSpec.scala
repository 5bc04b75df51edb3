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

  test("empty corpus returns an empty frame with the output schema, not a throw") {
    val docs = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    val out = Classifier.nbTrainScore(docs)
    assert(out.columns.toSeq ==
      Seq("doc_id", "actual", "predicted", "nll_units", "correct"))
    assert(out.count() == 0L)
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

  test("vectorized scoring matches a brute-force dense reference on a random corpus") {
    // Guards the r14 class-vectorized decomposition: the reference
    // replicates the lattice definition directly - per (doc, cls),
    // sum n * round(-ln((tf+1)/(t_c+v)) * 1e5) over the doc's distinct
    // terms plus the prior, argmin with (total asc, cls asc) ties -
    // with the same IEEE double ops and HALF_UP rounding Spark's
    // round() uses, so any algebraic slip in the base/delta split or
    // the argmin projection shows up as a value diff, not a flake.
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("ant", "bee", "cat", "dog", "eel", "fox", "gnu",
      "hen", "ibis", "jay", "kit", "lark")
    val classes = Vector("alpha", "beta", "gamma")
    val docsSeq = (1L to 30L).map { i =>
      val n = 1 + rnd.nextInt(8)
      val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, classes(rnd.nextInt(classes.size)), text)
    }
    def sqlRound(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val toks = docsSeq.map { case (id, cls, text) => (id, cls, text.split(" ", -1).toSeq) }
    val tfc = toks.flatMap { case (_, cls, ts) => ts.map(cls -> _) }
      .groupBy(identity).map { case ((cls, t), xs) => (cls, t) -> xs.size.toLong }
    val tC = tfc.groupBy(_._1._1).map { case (cls, m) => cls -> m.values.sum }
    val v = tfc.keys.map(_._2).toSet.size.toLong
    val nDocs = docsSeq.size.toLong
    val nC = docsSeq.groupBy(_._2).map { case (cls, xs) => cls -> xs.size.toLong }
    val expected = toks.map { case (id, actual, ts) =>
      val dt = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val totals = nC.keys.toSeq.sorted.map { cls =>
        val prior = sqlRound(-math.log(nC(cls).toDouble / nDocs.toDouble) * 100000.0)
        val like = dt.map { case (t, n) =>
          val tf = tfc.getOrElse((cls, t), 0L)
          n * sqlRound(-math.log((tf + 1L).toDouble / (tC(cls) + v).toDouble) * 100000.0)
        }.sum
        cls -> (prior + like)
      }
      val (predCls, best) = totals.minBy { case (cls, tot) => (tot, cls) }
      (id, actual, predCls, best, if (actual == predCls) 1L else 0L)
    }.sortBy(_._1)
    val got = Classifier.nbTrainScore(docsSeq.toDF("doc_id", "source", "text"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("actual"),
        r.getAs[String]("predicted"), r.getAs[Long]("nll_units"),
        r.getAs[Long]("correct"))).toSeq
      // the plan ends in orderBy(doc_id), but sort defensively anyway:
      // the assert must test VALUES, not ride on collect() row order
      .sortBy(_._1)
    assert(got == expected, s"vectorized NB drifted from the dense reference:\n" +
      got.zip(expected).filter(p => p._1 != p._2).take(5).mkString("\n"))
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
