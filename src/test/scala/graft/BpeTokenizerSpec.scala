package graft

import graft.operators.BpeTokenizer

class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("training learns the most frequent pair first, weighted by word count") {
    // "aab" ×3, "ab" ×2 → pair counts: (a,a)=3, (a,b)=5 → first merge "ab"
    val docs = Seq((1L, "aab aab ab"), (2L, "aab ab")).toDF("doc_id", "text")
    val m = BpeTokenizer.trainMerges(docs, 1)
    assert(m.length == 1)
    assert((m.head.lft, m.head.rgt, m.head.pair_count) == (("a", "b", 5L)))
  }

  test("ties break by (count desc, left asc, right asc)") {
    // "ab" and "cd" both appear twice — (a,b) wins on left asc
    val docs = Seq((1L, "ab cd ab cd")).toDF("doc_id", "text")
    val m = BpeTokenizer.trainMerges(docs, 1)
    assert((m.head.lft, m.head.rgt) == (("a", "b")))
  }

  test("merged symbols participate in later merges") {
    // "abc" ×4: merge 1 = (a,b) [lex tie over (b,c)], merge 2 = (ab,c)
    val docs = Seq((1L, "abc abc abc abc")).toDF("doc_id", "text")
    val m = BpeTokenizer.trainMerges(docs, 2)
    assert(m.map(x => (x.lft, x.rgt)) == Seq(("a", "b"), ("ab", "c")))
    assert(m(1).merged == "abc")
  }

  test("repeat runs count via the non-overlapping replace scan") {
    // " a a a a " contains TWO non-overlapping " a a " under the
    // delimiter-consuming scan? No — one at pos 0, the next lacks its
    // leading space → ONE. Both counting and merging must agree on it.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val m = BpeTokenizer.trainMerges(docs, 1)
    assert((m.head.lft, m.head.rgt, m.head.pair_count) == (("a", "a", 1L)))
  }

  test("encode applies merges in rank order and counts symbols") {
    val docs = Seq((1L, "abc ab x"), (2L, "abc")).toDF("doc_id", "text")
    val merges = BpeTokenizer.trainMerges(docs, 2) // (a,b) then (ab,c)
    val out = BpeTokenizer.encode(docs, merges).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bpe"), r.getAs[String]("bpe_head"))).toMap
    // doc 1: "abc"→[abc], "ab"→[ab], "x"→[x] → 3 symbols
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2.startsWith(" abc | ab | x "))
    // doc 2: one symbol
    assert(out(2L)._1 == 1L)
  }

  test("encode never merges across word boundaries") {
    // words "a" and "b" adjacent: pair (a,b) learned from "ab" must not
    // fuse the standalone words
    val docs = Seq((1L, "ab ab a b")).toDF("doc_id", "text")
    val merges = BpeTokenizer.trainMerges(docs, 1)
    assert((merges.head.lft, merges.head.rgt) == (("a", "b")))
    val out = BpeTokenizer.encode(docs, merges).collect().head
    // "ab","ab","a","b" → 2 merged + 2 singles = 4 symbols
    assert(out.getAs[Long]("n_bpe") == 4L)
    assert(out.getAs[String]("bpe_head").contains("| a | b"))
  }

  test("encode handles a realistic-size merge table (constant plan depth)") {
    // 12k synthetic merges — the nested-replace formulation would blow
    // analysis/codegen stack depth here; the native BpeApply expression
    // must analyze and run. Only the first two merges can fire on the
    // data; the rest are no-op patterns exercising the loop.
    val docs = Seq((1L, "abc ab x"), (2L, "abc")).toDF("doc_id", "text")
    val real = BpeTokenizer.trainMerges(docs, 2) // (a,b), (ab,c)
    val noise = (1 to 12000).map(i =>
      BpeTokenizer.Merge(real.length + i.toLong, s"zz$i", s"qq$i", s"zz${i}qq$i", 0L))
    val out = BpeTokenizer.encode(docs, real ++ noise).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe")).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
    // and the result is identical to encoding with just the real merges
    val expect = BpeTokenizer.encode(docs, real).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("bpe_hash"))).toSet
    val got = BpeTokenizer.encode(docs, real ++ noise).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("bpe_hash"))).toSet
    assert(got == expect)
  }

  test("fertility aggregates symbols/words/chars per source exactly") {
    // "ab ab" with merge (a,b): 2 words, 2 bpe symbols, 5 chars
    // "cd" with no applicable merge: 1 word, 2 symbols, 2 chars
    val docs = Seq((1L, "s1", "ab ab"), (2L, "s2", "cd")).toDF("doc_id", "source", "text")
    val merges = Seq(BpeTokenizer.Merge(1L, "a", "b", "ab", 2L))
    val out = BpeTokenizer.fertility(docs, merges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // s1: fertility 2/2 = 1e6; chars/bpe 5/2 = 2.5e6
    assert(out("s1") == ((1L, 2L, 2L, 5L, 1000000L, 2500000L)))
    // s2: fertility 2/1 = 2e6; chars/bpe 2/2 = 1e6
    assert(out("s2") == ((1L, 1L, 2L, 2L, 2000000L, 1000000L)))
  }

  test("train DataFrame output matches the driver merge list") {
    val docs = Seq((1L, "spark spark stream stream scan")).toDF("doc_id", "text")
    val fromDf = BpeTokenizer.train(spark, docs, 4).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("lft"),
        r.getAs[String]("rgt"), r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
    val direct = BpeTokenizer.trainMerges(docs, 4)
      .map(m => (m.rank, m.lft, m.rgt, m.merged, m.pair_count))
    assert(fromDf.toSeq == direct)
  }
}
