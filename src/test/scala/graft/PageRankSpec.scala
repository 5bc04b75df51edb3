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

  test("triangleStats counts a triangle-with-pendant exactly") {
    // triangle {1,2,3} plus pendant 4—1: degrees 3,2,2,1; one triangle
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val got = PageRank.triangleStats(g).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 1L, 333333L))) // 2·1e6/(3·2)
    assert(got(2L) == ((2L, 1L, 1000000L)))
    assert(got(3L) == ((2L, 1L, 1000000L)))
    assert(got(4L) == ((1L, 0L, 0L)))
  }

  test("triangleStats counts K4 once per face and is duplicate-edge safe") {
    // K4 has 4 triangles, every node in 3 of them; cc = 1 everywhere.
    // Feed each edge twice (reversed) — the canonical distinct must absorb it.
    val edges = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)
    val got = PageRank.triangleStats(edges.toDF("id_a", "id_b")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((3L, 3L, 1000000L)))
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

  test("boundedHops: path graph distances stop at the hop cap") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val from1 = PageRank.boundedHops(path, maxHops = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(from1((1L, 2L)) == 1L && from1((1L, 3L)) == 2L && from1((1L, 4L)) == 3L)
    assert(!from1.contains((1L, 5L))) // 4 hops — beyond the cap
    assert(from1((3L, 1L)) == 2L && from1((5L, 4L)) == 1L) // symmetric sources
  }

  test("boundedHops: cycles take the SHORTEST side, self pairs excluded") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("id_a", "id_b")
    val d = PageRank.boundedHops(square, maxHops = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(d((1L, 3L)) == 2L) // both ways round give 2, not 2 AND a spurious longer entry
    assert(d((1L, 2L)) == 1L && d((1L, 4L)) == 1L)
    assert(!d.keySet.exists { case (s, t) => s == t }) // no self distances via the cycle
  }

  test("commonNeighbors: path endpoints share the middle; triangles flag is_edge") {
    // path 1-2-3 plus triangle 3-4, 4-5, 5-3
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 3L)).toDF("id_a", "id_b")
    val out = PageRank.commonNeighbors(g).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getAs[Long]("nbr_jaccard_ppm"), r.getAs[Long]("is_edge")))).toMap
    // (1,3): common neighbor {2}; deg1=1, deg3=3 → jaccard 1/3
    assert(out((1L, 3L)) == ((1L, 333333L, 0L)))
    // (4,5) is a closed triad: common {3}, deg 2+2−1=3
    assert(out((4L, 5L)) == ((1L, 333333L, 1L)))
    // (2,4) and (2,5) share hub 3 — link-prediction candidates
    assert(out((2L, 4L))._3 == 0L && out((2L, 5L))._3 == 0L)
    // (1,2) share no neighbor → absent entirely
    assert(!out.contains((1L, 2L)))
  }

  test("assortativity: star graph is perfectly disassortative, regular graph NULL, path hand case") {
    // star K1,4: every edge joins degree 4 to degree 1 → r = −1
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)).toDF("id_a", "id_b")
    val s = PageRank.assortativity(star).collect().head
    assert(s.getAs[Long]("n_nodes") == 5 && s.getAs[Long]("n_edges") == 4)
    assert(s.getAs[Long]("assort_ppm") == -1000000L)
    // 4-cycle: all degrees 2 → zero variance → NULL-guarded
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("id_a", "id_b")
    assert(PageRank.assortativity(cyc).collect().head.isNullAt(5))
    // path a—b—c: edges (1,2),(2,1) degree pairs → m=2, S1=4, S2=6, S3=10
    // r = (4·2·4 − 36) / (2·2·10 − 36) = −4/4 = −1
    val p = PageRank.assortativity(pathPairs).collect().head
    assert(p.getAs[Long]("assort_ppm") == -1000000L)
  }

  test("commonNeighbors: maxCenterDegree drops wedges through hubs") {
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("id_a", "id_b")
    assert(PageRank.commonNeighbors(star).count() == 3) // all leaf pairs via the hub
    assert(PageRank.commonNeighbors(star, maxCenterDegree = 2).count() == 0)
  }
}
