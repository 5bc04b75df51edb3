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

  test("vocabTop counts corpus tf and distinct-doc df, k-bounded") {
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a c"),
      (3L, "c")
    ).toDF("doc_id", "text")
    val out = CorpusStats.vocabTop(docs, k = 2).collect()
    // tf: a=3, c=2, b=1 → top-2 is a then c
    assert(out.map(_.getAs[String]("term")).toSeq == Seq("a", "c"))
    val byTerm = out.map(r => r.getAs[String]("term") ->
      (r.getAs[Long]("tf"), r.getAs[Long]("df"))).toMap
    assert(byTerm("a") == (3L, 2L)) // 3 occurrences across 2 docs
    assert(byTerm("c") == (2L, 2L))
  }

  test("unigram NLL matches the hand-computed lattice values") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // tf: a=2 b=2 c=1, T=5; nll(a)=nll(b)=round(-ln(0.4)e5)=91629,
    // nll(c)=round(-ln(0.2)e5)=160944
    val out = CorpusStats.unigramNll(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("nll_total"),
          r.getAs[Double]("avg_nll"))).toMap
    assert(out(1L) == (3L, 3 * 91629L, 91629.0))
    assert(out(2L) == (2L, 91629L + 160944L, (91629L + 160944L) / 2.0))
  }

  test("bigram NLL interpolates bigram and unigram probabilities on the lattice") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    // uni: a=3 b=2 c=1 solo=1 (T=7 — ALL tokens, incl. short docs');
    // bi: (a,b)=2 (a,c)=1; context c1(a)=3
    def nll(pBi: Double, pUni: Double): Long =
      math.round(-math.log(0.7 * pBi + 0.3 * pUni) * 100000.0)
    val out = CorpusStats.bigramNll(docs, lambda = 0.7).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_total"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // <2-token doc has no bigrams
    assert(out(1L) == (1L, nll(2.0 / 3, 2.0 / 7)))
    assert(out(2L) == out(1L))
    assert(out(3L) == (1L, nll(1.0 / 3, 1.0 / 7)))
    // the rarer continuation scores strictly worse
    assert(out(3L)._2 > out(1L)._2)
  }

  test("bm25 ranks by query-term frequency and omits no-hit docs") {
    val docs = Seq(
      (1L, "spark spark is fast here"), // 2 hits
      (2L, "spark is also neat here"),  // 1 hit, same length
      (3L, "nothing relevant at all x") // 0 hits → absent
    ).toDF("doc_id", "text")
    val out = CorpusStats.bm25TopDocs(docs, Seq("spark"), topK = 10).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[Long]("score_micro") > out(1).getAs[Long]("score_micro"))
    assert(out.forall(r => r.getAs[Double]("score") ==
      r.getAs[Long]("score_micro") / 1.0e6))
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

  test("vocabProfile counts hapaxes within-source and corpus-wide") {
    // srcA: tokens a a b → terms {a:2, b:1}, hapax {b}; "b" also occurs
    // in srcB so it is NOT a global hapax; "c" is srcB-only and global
    val docs = Seq(
      (1L, "srcA", "a a b"),
      (2L, "srcB", "b c")
    ).toDF("doc_id", "source", "text")
    val out = CorpusStats.vocabProfile(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_terms"),
          r.getAs[Long]("n_hapax"), r.getAs[Long]("n_global_hapax"),
          r.getAs[Long]("ttr_ppm"))).toMap
    // srcA's terms both occur twice corpus-wide → zero global hapaxes
    assert(out("srcA") == ((3L, 2L, 1L, 0L, 666667L)))
    assert(out("srcB") == ((2L, 2L, 2L, 1L, 1000000L)))
  }

  test("sourceKl is zero when a source matches the corpus distribution") {
    // both sources have the identical unigram distribution → KL = 0
    val docs = Seq(
      (1L, "srcA", "x y"),
      (2L, "srcB", "x y")
    ).toDF("doc_id", "source", "text")
    val out = CorpusStats.sourceKl(docs).collect()
    assert(out.forall(_.getAs[Long]("kl_unit_total") == 0L))
    assert(out.forall(_.getAs[Double]("kl_nats") == 0.0))
  }

  test("quantileSketch: estimate equals exact when the sample covers the group") {
    val docs = (1L to 10L).map(i => (i, "g", i * 100L)).toDF("doc_id", "source", "n_chars")
    val r = CorpusStats.quantileSketch(docs, k = 32).collect().head
    // nearest-rank over 1..10 ×100: p50 = 5th = 500, p90 = 9th = 900
    assert((r.getAs[Long]("n_docs"), r.getAs[Long]("sample_n")) == ((10L, 10L)))
    assert(r.getAs[Long]("p50_est") == 500L && r.getAs[Long]("p50_exact") == 500L)
    assert(r.getAs[Long]("p90_est") == 900L && r.getAs[Long]("p90_exact") == 900L)
  }

  test("quantileSketch: sample is the deterministic bottom-k by hash rank") {
    val docs = (1L to 100L).map(i => (i, "g", i)).toDF("doc_id", "source", "n_chars")
    val r1 = CorpusStats.quantileSketch(docs, k = 8).collect().head
    val r2 = CorpusStats.quantileSketch(docs, k = 8).collect().head
    assert(r1 == r2, "sketch must be deterministic")
    assert(r1.getAs[Long]("sample_n") == 8L && r1.getAs[Long]("n_docs") == 100L)
    // the estimate is a plausible uniform-sample read, not a constant
    assert(r1.getAs[Long]("p50_est") >= 1L && r1.getAs[Long]("p50_est") <= 100L)
    assert(r1.getAs[Long]("p90_est") >= r1.getAs[Long]("p50_est"))
  }

  test("zipfFit recovers slope ≈ −1 on an exactly Zipfian vocabulary") {
    // term i repeated 1024/i times → tf/rank curve is exactly 1/rank
    val text = (1 to 64).flatMap(i => Seq.fill(1024 / i)(s"t$i")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val row = CorpusStats.zipfFit(docs).collect().head
    assert(row.getAs[Long]("n_terms") == 64L)
    val slope = row.getAs[Long]("slope_ppm") / 1e6
    assert(slope < -0.9 && slope > -1.1, s"slope $slope")
  }

  test("packContext admits the greedy prefix that fits the budget, in rank order") {
    val ranked = Seq((10L, 900L), (20L, 800L), (30L, 700L), (40L, 600L))
      .toDF("doc_id", "score_micro")
    val toks = Seq((10L, 50L), (20L, 40L), (30L, 30L), (40L, 5L))
      .toDF("doc_id", "n_tokens")
    val out = CorpusStats.packContext(ranked, toks, budget = 95L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rnk"), r.getAs[Long]("cum_tokens")))
    // 50, 90 fit; 120 exceeds — the cut is a PREFIX cut (doc 40 would
    // fit alone but sits after the overflow, the greedy contract)
    assert(out.toSeq == Seq((10L, 1L, 50L), (20L, 2L, 90L)))
  }

  test("packContext partitions per query in the batch multi-query shape") {
    val ranked = Seq(("q1", 10L, 900L), ("q1", 20L, 800L), ("q2", 10L, 700L), ("q2", 30L, 600L))
      .toDF("query_id", "doc_id", "score_micro")
    val toks = Seq((10L, 60L), (20L, 50L), (30L, 70L)).toDF("doc_id", "n_tokens")
    val out = CorpusStats.packContext(ranked, toks, budget = 100L,
        queryCols = Seq("query_id")).collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("doc_id"), r.getAs[Long]("rnk")))
    // each query packs independently from rank 1
    assert(out.toSeq == Seq(("q1", 10L, 1L), ("q2", 10L, 1L)))
  }

  test("collocations: Dice floor-ppm over adjacent pairs, minCount prunes the tail") {
    // "a b" appears 3×, with c(a)=4 (one stray "a x"), c(b)=3
    val docs = Seq("a b", "a b", "a b a x").toDF("text")
    val out = CorpusStats.collocations(docs, minCount = 2, k = 10).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Long]("c_ab"), r.getAs[Long]("dice_ppm")))
    // dice = 2·3/(4+3) = 6/7 → floor ppm 857142; pairs "b a"/"a x" occur once → pruned
    assert(out.toSeq == Seq(("a", "b", 3L, 857142L)))
    // single-token docs produce no bigrams and must not error
    assert(CorpusStats.collocations(Seq("solo").toDF("text"), 1, 10).count() == 0)
  }

  test("keyness: source-exclusive terms top their source's list; shared filler scores low") {
    val docs = (
      (0 until 10).map(i => (i.toLong, "A", "the apple apple apple")) ++
        (10 until 20).map(i => (i.toLong, "B", "the banana banana banana"))
    ).toDF("doc_id", "source", "text")
    val rows = CorpusStats.keyness(docs, minCount = 5, k = 3).collect()
    val topA = rows.filter(_.getAs[String]("source") == "A").minBy(_.getAs[Long]("rank"))
    val topB = rows.filter(_.getAs[String]("source") == "B").minBy(_.getAs[Long]("rank"))
    assert(topA.getAs[String]("term") == "apple" && topA.getAs[Long]("direction") == 1)
    assert(topB.getAs[String]("term") == "banana" && topB.getAs[Long]("direction") == 1)
    // 'the' is distributed exactly as the source marginals → G² = 0, direction 0
    val theA = rows.find(r => r.getAs[String]("source") == "A" &&
      r.getAs[String]("term") == "the").get
    assert(theA.getAs[Double]("g2") == 0.0 && theA.getAs[Long]("direction") == 0)
    assert(theA.getAs[Double]("g2") < topA.getAs[Double]("g2"))
  }
}
