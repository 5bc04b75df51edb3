package graft

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // path graph a—b—c as undirected pairs
  private def pathPairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")

  test("two hand-computed damped iterations on the path graph") {
    // iter1: r(b) = 150000 + 85%·(1e6 + 1e6)      = 1850000
    //        r(a) = r(c) = 150000 + 85%·(1e6 div 2) =  575000
    // iter2: r(b) = 150000 + 85%·(575000+575000)  = 1127500
    //        r(a) = r(c) = 150000 + 85%·(1850000 div 2) = 936250
    val got = PageRank.rankMicro(pathPairs, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("the hub of a star graph outranks its leaves") {
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)).toDF("id_a", "id_b")
    val got = PageRank.rankMicro(star, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) > got(1L) && got.filterKeys(_ != 10L).values.toSet.size == 1)
  }

  test("disconnected components rank independently and deterministically") {
    val two = Seq((1L, 2L), (5L, 6L), (6L, 7L)).toDF("id_a", "id_b")
    val a = PageRank.rankMicro(two, iters = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = PageRank.rankMicro(two, iters = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // symmetric pair gets identical ranks; middle of the path dominates
    val m = a.toMap
    assert(m(1L) == m(2L) && m(6L) > m(5L))
  }
}
