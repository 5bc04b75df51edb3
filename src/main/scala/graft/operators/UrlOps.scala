package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + per-domain capping — the crawl-hygiene pass
  * every web-corpus pipeline runs before content dedup (public
  * knowledge: the RFC 3986 §6 normalization steps plus the
  * tracking-param strip CCNet/RefinedWeb-style pipelines apply).
  * Distinct raw spellings of one logical page (scheme variants, host
  * case, default port, `www.`, fragments, `utm_*`/`ref` params,
  * `/index.html`, trailing slash) collapse to one canonical key,
  * URL-level dedup groups on that key, and a per-domain cap bounds any
  * single host's share of the corpus.
  *
  * Everything is builtin string expressions (`split_part`, `lower`,
  * `filter`, `array_join`) — per-row, shuffle-free; the only shuffles
  * are the canonical-key group and the domain-window rank, both on
  * bounded keys. At 100 TB the canonical group is the same one
  * shuffle exact content dedup pays, on a far smaller key.
  *
  * Cross-engine exactness: pure string surgery — no regex replace
  * (Spark replaces all matches, DuckDB only the first: a portability
  * trap), no float arithmetic anywhere.
  */
object UrlOps {

  /** Drop the last `n` characters of `c`. */
  private def dropRight(c: Column, n: Int): Column = c.substr(lit(1), length(c) - n)

  /** RFC-style canonical form of `url` (scheme-insensitive): fragment
    * dropped, host lowercased with a default port (:80/:443) and a
    * leading `www.` stripped, tracking params (`utm_*`, `ref`,
    * `fbclid`, `gclid`) removed with the surviving query kept in
    * original order, `/index.html` then a trailing slash stripped from
    * the path.
    */
  def canonical(url: Column): Column = {
    val noFrag = split_part(url, lit("#"), lit(1))
    val rest = split_part(noFrag, lit("://"), lit(2))
    val hostPort = split_part(rest, lit("/"), lit(1))
    val pathQ = rest.substr(length(hostPort) + lit(1), length(rest))
    val hostLc = lower(hostPort)
    val h443 = when(hostLc.endsWith(":443"), dropRight(hostLc, 4)).otherwise(hostLc)
    val h80 = when(h443.endsWith(":80"), dropRight(h443, 3)).otherwise(h443)
    val host = when(h80.startsWith("www."), h80.substr(lit(5), length(h80))).otherwise(h80)
    val path0 = split_part(pathQ, lit("?"), lit(1))
    val q = split_part(pathQ, lit("?"), lit(2))
    val qKept = array_join(filter(split(q, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("ref=") ||
        p.startsWith("fbclid=") || p.startsWith("gclid="))), "&")
    val path1 = when(path0.endsWith("/index.html"), dropRight(path0, 11)).otherwise(path0)
    val path = when(path1.endsWith("/") && length(path1) > 1, dropRight(path1, 1))
      .otherwise(path1)
    concat(host, path,
      when(qKept === "", lit("")).otherwise(concat(lit("?"), qKept)))
  }

  /** Registrable domain key of a canonical URL (host up to the first
    * `/`).
    */
  def domainOf(canon: Column): Column = split_part(canon, lit("/"), lit(1))

  /** URL-level dedup + per-domain cap over (`urlCol`, doc rows):
    * group by canonical URL (canonical_id = min doc id, n_forms =
    * spellings seen, best_chars = the group's largest `sizeCol`), then
    * keep at most `maxPerDomain` pages per domain ranked by
    * (best_chars DESC, canonical_id ASC) — the deterministic
    * keep-the-biggest-pages policy. Output: canon_url, domain,
    * canonical_id, n_forms, best_chars, domain_rank — ordered by
    * canon_url.
    */
  def dedupAndCap(df: DataFrame, urlCol: String, maxPerDomain: Int,
                  idCol: String = "doc_id", sizeCol: String = "n_chars"): DataFrame = {
    val canon = df.select(canonical(col(urlCol)).as("canon_url"),
      col(idCol).as("id"), col(sizeCol).as("sz"))
    val grouped = canon.groupBy(col("canon_url"))
      .agg(min(col("id")).as("canonical_id"),
        count(lit(1)).as("n_forms"),
        max(col("sz")).as("best_chars"))
      .withColumn("domain", domainOf(col("canon_url")))
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("best_chars").desc, col("canonical_id"))
    grouped.withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= maxPerDomain)
      .select(col("canon_url"), col("domain"), col("canonical_id"),
        col("n_forms"), col("best_chars"), col("domain_rank"))
      .orderBy(col("canon_url"))
  }
}
