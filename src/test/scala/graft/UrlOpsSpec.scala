package graft

import graft.operators.UrlOps
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonical(col("url")).as("c"))
      .as[String].collect().toSeq

  test("spelling variants of one page collapse to one canonical form") {
    val forms = canonOf(
      "HTTP://WWW.Site.EXAMPLE.COM:80/a/b/index.html?utm_source=x",
      "https://site.example.com/a/b/",
      "http://site.example.com:443/a/b?utm_campaign=c&ref=rss#frag",
      "https://www.site.example.com/a/b")
    assert(forms.distinct == Seq("site.example.com/a/b"))
  }

  test("meaningful structure is preserved") {
    // non-default port, non-tracking params (in order), path case
    assert(canonOf("https://h.com:8080/x") == Seq("h.com:8080/x"))
    assert(canonOf("https://h.com/x?b=2&a=1") == Seq("h.com/x?b=2&a=1"))
    assert(canonOf("https://h.com/Docs/A") == Seq("h.com/Docs/A"))
    // tracking params stripped mid-list, survivors keep order
    assert(canonOf("https://h.com/x?b=2&utm_medium=m&a=1") == Seq("h.com/x?b=2&a=1"))
    // root slash is not stripped
    assert(canonOf("https://h.com/") == Seq("h.com/"))
  }

  test("dedupAndCap groups forms and caps per domain deterministically") {
    val df = Seq(
      // domain d1: 4 pages, cap 3 -> page with smallest best_chars dropped
      (1L, 100L, "https://d1.com/p1"), (2L, 90L, "https://WWW.d1.com/p1/"),
      (3L, 80L, "https://d1.com/p2"), (4L, 70L, "https://d1.com/p3"),
      (5L, 60L, "https://d1.com/p4"),
      (6L, 50L, "https://d2.com/only")).toDF("doc_id", "n_chars", "url")
    val out = UrlOps.dedupAndCap(df, "url", maxPerDomain = 3).collect()
    val byUrl = out.map(r => r.getString(0) -> r).toMap
    assert(out.length == 4)
    assert(byUrl("d1.com/p1").getLong(3) == 2L) // two spellings merged
    assert(byUrl("d1.com/p1").getLong(2) == 1L) // canonical_id = min doc
    assert(!byUrl.contains("d1.com/p4")) // capped out (rank 4 by best_chars)
    assert(byUrl("d2.com/only").getLong(5) == 1L) // rank restarts per domain
  }
}
