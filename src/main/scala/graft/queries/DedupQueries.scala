package graft.queries

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, countDistinct, lit, sum, when}

/** Query entries + DuckDB oracles for the dedup suite. The oracle SQL
  * mirrors the Spark operators' md5-based hashing exactly (DuckDB's
  * `md5` of the same UTF-8 bytes yields the same lowercase hex), so
  * signatures, buckets and candidate sets are identical by construction.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/documents.parquet")

  def qExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(docs(s, dir))

  val qExactSql: String =
    """SELECT md5(text) AS hash, min(doc_id) AS canonical_id, count(*) AS n_dups
      |FROM documents GROUP BY md5(text) ORDER BY canonical_id""".stripMargin

  def qNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(s, dir), threshold = 0.5)

  /** Shared shingle CTEs: word 3-grams, distinct per doc. */
  private val shinglesCte: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(generate_series(1, len(t) - 2),
      |                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM toks WHERE len(t) >= 3
      |),
      |ds AS (SELECT doc_id AS id, unnest(s) AS shingle FROM sh)""".stripMargin

  val qNgramSql: String =
    s"""WITH $shinglesCte,
       |sc AS (SELECT id, count(*) AS n FROM ds GROUP BY id),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
       |  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.id < b.id
       |  GROUP BY a.id, b.id
       |)
       |SELECT id_a, id_b, inter, union_n,
       |       CAST(round(inter * 1000000.0 / union_n) AS BIGINT) AS jaccard_ppm
       |FROM (
       |  SELECT id_a, id_b, inter, sa.n + sb.n - inter AS union_n
       |  FROM pairs
       |  JOIN sc sa ON id_a = sa.id
       |  JOIN sc sb ON id_b = sb.id
       |)
       |WHERE inter * 1.0 / union_n >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  def qMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(docs(s, dir), k = 8, bands = 4, threshold = 0.5)

  /** CTE chain ending in `verified` = the banded-minhash near-dup pairs
    * (shared by the pair oracle, the grouping oracle, and the
    * clean-corpus capstone).
    */
  private[queries] val minhashVerifiedCte: String =
    s"""$shinglesCte,
       |sig AS (
       |  SELECT doc_id AS id, s,
       |         list_transform(generate_series(0, 7),
       |           i -> list_min(list_transform(s, x -> md5(CAST(i AS VARCHAR) || '|' || x)))) AS g
       |  FROM sh
       |),
       |bands AS (
       |  SELECT id, b, md5(g[2*b + 1] || g[2*b + 2]) AS bk
       |  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
       |),
       |cand AS (
       |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk AND x.id < y.id
       |),
       |verified AS (
       |  SELECT id_a, id_b,
       |         CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS inter,
       |         CAST(len(sa.s) + len(sb.s) AS BIGINT) - CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS union_n
       |  FROM cand
       |  JOIN sh sa ON id_a = sa.doc_id
       |  JOIN sh sb ON id_b = sb.doc_id
       |)""".stripMargin

  val qMinhashSql: String =
    s"""WITH $minhashVerifiedCte
       |SELECT id_a, id_b,
       |       CAST(round(inter * 1000000.0 / union_n) AS BIGINT) AS jaccard_ppm
       |FROM verified
       |WHERE inter * 1.0 / union_n >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  /** Near-dup grouping: connected components over the banded-minhash
    * pairs (Spark: iterative min-label propagation; oracle: transitive
    * closure via a recursive CTE — a genuinely different machinery
    * computing the same fixpoint, like the DuckDB-native ASOF check).
    */
  /** Memoized banded-minhash pair graph (k=8, bands=4, t=0.5) over the
    * raw corpus, and the connected-component labels derived from it —
    * deterministic, so their seven consumers (pair listing, grouping,
    * savings, PageRank, triangles, BFS hops, the duplication matrix,
    * hard-negative filtering) share ONE persisted copy per session.
    * Consumers over MODIFIED corpora (cleaning capstones) still build
    * their own.
    */
  private val pairMemo = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private[queries] def minhashPairsShared(s: SparkSession, dir: String): DataFrame =
    pairMemo.getOrElseUpdate(dir, {
      val p = Dedup.minhashPairs(docs(s, dir), k = 8, bands = 4, threshold = 0.5).persist()
      p.count()
      p
    })

  private val groupMemo = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def nearDupGroupsShared(s: SparkSession, dir: String): DataFrame =
    groupMemo.getOrElseUpdate(dir, {
      val g = Dedup.nearDupGroups(minhashPairsShared(s, dir)).persist()
      g.count()
      g
    })

  def qGroups(s: SparkSession, dir: String): DataFrame =
    nearDupGroupsShared(s, dir).orderBy("doc_id")

  /** CTE chain (recursive) ending in `grp` = (doc_id, group_id) labels
    * over the minhash pair graph.
    */
  private[queries] val groupsCte: String =
    s"""$minhashVerifiedCte,
       |npairs AS (
       |  SELECT id_a, id_b FROM verified WHERE inter * 1.0 / union_n >= 0.5
       |),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM npairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM npairs
       |),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |),
       |grp AS (
       |  SELECT u AS doc_id, least(u, min(v)) AS group_id
       |  FROM reach GROUP BY u
       |)""".stripMargin

  val qGroupsSql: String =
    s"""WITH RECURSIVE $groupsCte
       |SELECT doc_id, group_id FROM grp ORDER BY doc_id""".stripMargin

  /** Dedup-savings report — the capacity-planning number a 100 TB
    * dedup pass is run FOR: per near-dup-group size, how many groups,
    * how many member chars total, and how many chars disappear if each
    * group keeps only its canonical (min-id) representative. One join
    * of the group labels against doc lengths + two bounded aggs — the
    * output is at most maxGroupSize rows regardless of corpus size.
    */
  def qDedupSavings(s: SparkSession, dir: String): DataFrame =
    nearDupGroupsShared(s, dir)
      .join(docs(s, dir).select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("size"),
        sum(col("n_chars")).as("chars"),
        sum(when(col("doc_id") === col("group_id"), col("n_chars"))
          .otherwise(lit(0L))).as("rep_chars"))
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("chars")).as("chars_total"),
        sum(col("chars") - col("rep_chars")).as("chars_saved"))
      .orderBy(col("size"))

  val qDedupSavingsSql: String =
    s"""WITH RECURSIVE $groupsCte,
       |per AS (
       |  SELECT g.group_id,
       |         CAST(count(*) AS BIGINT) AS size,
       |         CAST(sum(d.n_chars) AS BIGINT) AS chars,
       |         CAST(sum(CASE WHEN g.doc_id = g.group_id THEN d.n_chars
       |                       ELSE 0 END) AS BIGINT) AS rep_chars
       |  FROM grp g JOIN documents d USING (doc_id)
       |  GROUP BY g.group_id
       |)
       |SELECT size, CAST(count(*) AS BIGINT) AS n_groups,
       |       CAST(sum(chars) AS BIGINT) AS chars_total,
       |       CAST(sum(chars - rep_chars) AS BIGINT) AS chars_saved
       |FROM per GROUP BY size ORDER BY size""".stripMargin

  /** Duplication-aware training weights: every doc in a near-dup group
    * of size g samples with weight 1/g (exact floor-ppm), so a template
    * family contributes ~one document's worth of gradient regardless of
    * how many times it was crawled — the standard soft-dedup
    * alternative to dropping non-canonical members outright. Output is
    * the bounded per-group-size rollup (size, docs, weight, effective
    * micro-docs), not the per-doc table — at most maxGroupSize rows at
    * any corpus size; the per-doc weight is `1000000 div group_size`
    * joined from the same labels when a pipeline materializes it.
    * Scale shape: the group labels + one broadcast-size join against
    * the corpus ids + two bounded aggs.
    */
  def qDupWeights(s: SparkSession, dir: String): DataFrame = {
    val sizes = nearDupGroupsShared(s, dir)
      .groupBy(col("group_id")).agg(count(lit(1)).as("gsz"))
    docs(s, dir).select(col("doc_id"))
      .join(nearDupGroupsShared(s, dir), Seq("doc_id"), "left")
      .join(sizes, Seq("group_id"), "left")
      .select(org.apache.spark.sql.functions.coalesce(col("gsz"), lit(1L)).as("gsz"))
      .groupBy(col("gsz"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("gsz").as("group_size"), col("n_docs"),
        org.apache.spark.sql.functions.expr("1000000 div gsz").as("weight_ppm"),
        org.apache.spark.sql.functions.expr("n_docs * (1000000 div gsz)")
          .as("effective_micro_docs"))
      .orderBy(col("group_size"))
  }

  val qDupWeightsSql: String =
    s"""WITH RECURSIVE $groupsCte,
       |sizes AS (SELECT group_id, CAST(count(*) AS BIGINT) AS gsz
       |          FROM grp GROUP BY group_id),
       |lab AS (
       |  SELECT d.doc_id, coalesce(s.gsz, 1) AS gsz
       |  FROM documents d
       |  LEFT JOIN grp g ON g.doc_id = d.doc_id
       |  LEFT JOIN sizes s ON s.group_id = g.group_id
       |)
       |SELECT gsz AS group_size, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(1000000 // gsz AS BIGINT) AS weight_ppm,
       |       CAST(count(*) * (1000000 // gsz) AS BIGINT) AS effective_micro_docs
       |FROM lab GROUP BY gsz ORDER BY group_size""".stripMargin

  private val SpanLen = 8

  /** Duplicated 8-token spans per doc (see
    * [[graft.operators.Dedup.duplicatedSpans]]): the fixed-length form
    * of suffix-array substring dedup's memorization signal.
    */
  def qDupSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(docs(s, dir), spanLen = SpanLen)

  val qDupSpansSql: String =
    s"""WITH sp AS (
       |  SELECT doc_id AS doc, unnest(list_transform(
       |    generate_series(1, len(t) - ${SpanLen - 1}),
       |    i -> md5(array_to_string(t[i:i+${SpanLen - 1}], ' ')))) AS h
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
       |  WHERE len(t) >= $SpanLen
       |),
       |m AS (SELECT h, CAST(count(*) AS BIGINT) AS mult FROM sp GROUP BY h)
       |SELECT doc AS doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |       CAST(count(CASE WHEN mult >= 2 THEN 1 END) AS BIGINT) AS n_dup_spans,
       |       CAST(round((CAST(count(CASE WHEN mult >= 2 THEN 1 END) AS DOUBLE)
       |                   / count(*)) * 1000000.0) AS BIGINT) AS dup_ppm,
       |       CAST(max(mult) AS BIGINT) AS max_mult
       |FROM sp JOIN m USING (h)
       |GROUP BY doc
       |ORDER BY doc_id""".stripMargin

  /** Incremental dedup against the persisted signature index
    * ([[graft.sources.DedupIndex]]): the corpus (doc_id % 13 ≠ 0) is
    * indexed ONCE per scale dir; the ingest batch (doc_id % 13 = 0) is
    * classified exact / near / unique against it. The oracle recomputes
    * the whole thing from the raw bipartite split — proving the index
    * round trip (md5 digests, band keys, shingle sets through parquet)
    * lossless.
    */
  private val dedupIndexPaths = scala.collection.concurrent.TrieMap.empty[String, String]
  private def dedupIndexPath(s: SparkSession, dir: String): String =
    dedupIndexPaths.getOrElseUpdate(dir,
      graft.sources.DedupIndex.save(
        docs(s, dir).filter(org.apache.spark.sql.functions.col("doc_id") % 13 =!= 0),
        "target/graft-wh/" + dir.replaceAll("[^A-Za-z0-9]", "_") + "/_dedupindex"))

  def qIncremental(s: SparkSession, dir: String): DataFrame = {
    val batch = docs(s, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 13 === 0)
    graft.sources.DedupIndex.incrementalDedup(s, dedupIndexPath(s, dir), batch)
  }

  /** Warm dedup-gate serving plan: classify a FIXED ~10-doc probe batch
    * against the persisted signature index — the per-request shape of a
    * production ingest gate ([[graft.Bench]] times it as
    * `dedup_gate_warm_sec` beside the pyramid/BM25/ANN warm paths).
    */
  private val gatePlans = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  def dedupGateServe(s: SparkSession, dir: String): DataFrame =
    gatePlans.getOrElseUpdate(dir, {
      import org.apache.spark.sql.functions.col
      val probe = docs(s, dir).filter(col("doc_id") % 13 === 0 && col("doc_id") <= 130)
      graft.sources.DedupIndex.incrementalDedup(s, dedupIndexPath(s, dir), probe)
    })

  val qIncrementalSql: String =
    """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0),
      |batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 = 0),
      |csh AS (
      |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
      |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus) WHERE len(t) >= 3
      |),
      |bsh AS (
      |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
      |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM batch) WHERE len(t) >= 3
      |),
      |exact AS (
      |  SELECT b.doc_id, min(c.doc_id) AS m
      |  FROM batch b JOIN corpus c ON md5(b.text) = md5(c.text)
      |  GROUP BY b.doc_id
      |),
      |csig AS (
      |  SELECT doc_id, list_transform(generate_series(0, 7),
      |           i -> list_min(list_transform(s, x -> md5(CAST(i AS VARCHAR) || '|' || x)))) AS g
      |  FROM csh
      |),
      |bsig AS (
      |  SELECT doc_id, list_transform(generate_series(0, 7),
      |           i -> list_min(list_transform(s, x -> md5(CAST(i AS VARCHAR) || '|' || x)))) AS g
      |  FROM bsh
      |),
      |cband AS (
      |  SELECT doc_id, b, md5(g[2*b + 1] || g[2*b + 2]) AS bk
      |  FROM csig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
      |),
      |bband AS (
      |  SELECT doc_id, b, md5(g[2*b + 1] || g[2*b + 2]) AS bk
      |  FROM bsig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
      |),
      |cand AS (
      |  SELECT DISTINCT nb.doc_id AS nid, cb.doc_id AS oid
      |  FROM bband nb JOIN cband cb ON nb.b = cb.b AND nb.bk = cb.bk
      |),
      |ver AS (
      |  SELECT nid, oid,
      |         CAST(len(list_intersect(bs.s, cs.s)) AS BIGINT) AS inter,
      |         CAST(len(bs.s) + len(cs.s) AS BIGINT)
      |           - CAST(len(list_intersect(bs.s, cs.s)) AS BIGINT) AS union_n
      |  FROM cand JOIN bsh bs ON nid = bs.doc_id JOIN csh cs ON oid = cs.doc_id
      |),
      |near AS (
      |  SELECT nid, oid, CAST(round(inter * 1000000.0 / union_n) AS BIGINT) AS ppm,
      |         row_number() OVER (PARTITION BY nid
      |           ORDER BY CAST(round(inter * 1000000.0 / union_n) AS BIGINT) DESC, oid) AS rn
      |  FROM ver WHERE inter * 1.0 / union_n >= 0.5
      |)
      |SELECT b.doc_id,
      |       CASE WHEN e.m IS NOT NULL THEN 'exact'
      |            WHEN n.oid IS NOT NULL THEN 'near'
      |            ELSE 'unique' END AS status,
      |       COALESCE(e.m, n.oid, -1) AS match_id,
      |       CAST(CASE WHEN e.m IS NOT NULL THEN 1000000
      |                 ELSE COALESCE(n.ppm, 0) END AS BIGINT) AS jaccard_ppm
      |FROM batch b
      |LEFT JOIN exact e ON b.doc_id = e.doc_id
      |LEFT JOIN (SELECT nid, oid, ppm FROM near WHERE rn = 1) n ON b.doc_id = n.nid
      |ORDER BY b.doc_id""".stripMargin

  /** Bloom-accelerated ingest gate (see
    * [[graft.sources.DedupIndex.bloomGate]]): admit batch docs whose
    * signature key is absent from the index; bloom negatives skip the
    * join entirely. Result ≡ the plain anti-join gate — the oracle
    * recomputes both sides' signature keys raw.
    */
  def qBloomGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val batch = docs(s, dir).filter(col("doc_id") % 13 === 0)
    graft.sources.DedupIndex.bloomGate(s, dedupIndexPath(s, dir), batch)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  val qBloomGateSql: String =
    """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0),
      |batch AS (SELECT doc_id, text, source, n_chars FROM documents WHERE doc_id % 13 = 0),
      |ck AS (
      |  SELECT CASE WHEN len(t) >= 3 THEN array_to_string(
      |           list_transform(generate_series(0, 7),
      |             i -> list_min(list_transform(
      |                    list_distinct(list_transform(generate_series(1, len(t) - 2),
      |                      j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2])),
      |                    x -> md5(CAST(i AS VARCHAR) || '|' || x)))), ',')
      |         ELSE md5(text) END AS sigkey
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM corpus)
      |),
      |bk AS (
      |  SELECT doc_id, source, n_chars,
      |         CASE WHEN len(t) >= 3 THEN array_to_string(
      |           list_transform(generate_series(0, 7),
      |             i -> list_min(list_transform(
      |                    list_distinct(list_transform(generate_series(1, len(t) - 2),
      |                      j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2])),
      |                    x -> md5(CAST(i AS VARCHAR) || '|' || x)))), ',')
      |         ELSE md5(text) END AS sigkey
      |  FROM (SELECT doc_id, text, source, n_chars, string_split(text, ' ') AS t FROM batch)
      |)
      |SELECT b.doc_id, b.source, b.n_chars
      |FROM bk b LEFT JOIN (SELECT DISTINCT sigkey FROM ck) c USING (sigkey)
      |WHERE c.sigkey IS NULL
      |ORDER BY b.doc_id""".stripMargin

  /** Serving after a tombstone delete ([[graft.sources.DedupIndex
    * .delete]]): the corpus index loses its doc_id % 7 = 0 members via
    * a distributed tombstone append (pre-compaction — the serving
    * shape right after a purge), then the same ingest batch is
    * classified against the survivors only. The oracle is the
    * incremental oracle with the deleted docs excluded from the
    * corpus, so serve-after-delete ≡ rebuild-without-docs at the
    * oracle level too (DedupIndexSpec proves the same identity for the
    * bloom/streaming gates and through [[graft.sources.DedupIndex
    * .compact]]).
    */
  private val deletedIndexPaths = scala.collection.concurrent.TrieMap.empty[String, String]
  // synchronized: TrieMap.getOrElseUpdate may evaluate the by-name
  // body in two racing first callers, and this body does rmRf+copy on
  // a shared destination — one thread's clear would eat the other's
  // half-finished clone
  private def deletedIndexPath(s: SparkSession, dir: String): String =
    deletedIndexPaths.synchronized { deletedIndexPaths.getOrElseUpdate(dir, {
      import org.apache.spark.sql.functions.col
      // clone the shared index's files instead of re-shingling the
      // corpus — the delete must not mutate the index the other
      // incremental/bloom queries serve from, but a tombstone test
      // needs only its own copy of the SAME persisted state
      val src = java.nio.file.Paths.get(dedupIndexPath(s, dir))
      val dst = java.nio.file.Paths.get(
        "target/graft-wh/" + dir.replaceAll("[^A-Za-z0-9]", "_") + "/_dedupindex_del")
      if (java.nio.file.Files.isDirectory(dst)) {
        val w = java.nio.file.Files.walk(dst)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally w.close()
      }
      val w = java.nio.file.Files.walk(src)
      try w.forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
        ()
      } finally w.close()
      graft.sources.DedupIndex.delete(dst.toString,
        docs(s, dir).filter(col("doc_id") % 13 =!= 0 && col("doc_id") % 7 === 0)
          .select(col("doc_id")))
      dst.toString
    }) }

  /** The corpus-filter anchor shared by the incremental/bloom oracles;
    * the deleted twins rewrite it, guarded so silent drift is
    * impossible (the ADVICE.md derived-oracle contract).
    */
  private val CorpusAnchor =
    "corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0)"
  private def withDeletedCorpus(sql: String): String = {
    require(sql.contains(CorpusAnchor),
      "incremental-oracle corpus CTE drifted; update the deleted-twin rewrite")
    sql.replace(CorpusAnchor,
      "corpus AS (SELECT doc_id, text FROM documents " +
        "WHERE doc_id % 13 <> 0 AND doc_id % 7 <> 0)")
  }

  def qDedupDeleted(s: SparkSession, dir: String): DataFrame = {
    val batch = docs(s, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 13 === 0)
    graft.sources.DedupIndex.incrementalDedup(s, deletedIndexPath(s, dir), batch)
  }

  val qDedupDeletedSql: String = withDeletedCorpus(qIncrementalSql)

  /** Bloom gate on the tombstoned index: the bloom is rebuilt from the
    * LIVE distinct sigkeys, so batch docs whose only signature twin was
    * deleted are now admitted.
    */
  def qBloomGateDeleted(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val batch = docs(s, dir).filter(col("doc_id") % 13 === 0)
    graft.sources.DedupIndex.bloomGate(s, deletedIndexPath(s, dir), batch)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  val qBloomGateDeletedSql: String = withDeletedCorpus(qBloomGateSql)

  /** Corpus release diff: snapshot A (doc_id % 11 ≠ 0) vs snapshot B
    * (doc_id % 9 ≠ 0, with docs at doc_id % 7 = 0 revised) — every doc
    * classified added/removed/modified/unchanged by content digest
    * ([[graft.operators.Snapshot.diff]]).
    */
  def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = docs(s, dir)
    val a = d.filter(col("doc_id") % 11 =!= 0)
    val b = d.filter(col("doc_id") % 9 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
    graft.operators.Snapshot.diff(a, b).orderBy("doc_id")
  }

  val qSnapshotDiffSql: String =
    """WITH a AS (
      |  SELECT doc_id, md5(text) AS d FROM documents WHERE doc_id % 11 <> 0
      |),
      |b AS (
      |  SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
      |                          ELSE text END) AS d
      |  FROM documents WHERE doc_id % 9 <> 0
      |)
      |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |       CASE WHEN a.doc_id IS NULL THEN 'added'
      |            WHEN b.doc_id IS NULL THEN 'removed'
      |            WHEN a.d <> b.d THEN 'modified'
      |            ELSE 'unchanged' END AS status,
      |       COALESCE(a.d, '') AS old_digest,
      |       COALESCE(b.d, '') AS new_digest
      |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      |ORDER BY doc_id""".stripMargin

  private val PrIters = 4
  private val PrDampingPct = 85

  /** Graph authority over the near-dup graph: deterministic
    * integer-lattice PageRank ([[graft.operators.PageRank]]), the
    * "which doc is the boilerplate hub" companion to `q_dedup_groups`.
    * Oracle = the SAME damped iterations unrolled as SQL CTEs (the
    * k-means-trainer oracle pattern); every constant below derives from
    * the one Scala parameter set, so operator and oracle cannot
    * desynchronize.
    */
  def qPagerank(s: SparkSession, dir: String): DataFrame =
    graft.operators.PageRank
      .rankMicro(minhashPairsShared(s, dir),
        iters = PrIters, dampingPct = PrDampingPct)
      .orderBy("doc_id")

  val qPagerankSql: String = {
    val base = 1000000L * (100L - PrDampingPct) / 100L
    val iterCtes = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT e.v AS id,
         |         CAST($base + ($PrDampingPct * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
         |  FROM edges e JOIN r${i - 1} r ON e.u = r.id JOIN deg d ON e.u = d.u
         |  GROUP BY e.v
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $minhashVerifiedCte,
       |npairs AS (
       |  SELECT id_a, id_b FROM verified WHERE inter * 1.0 / union_n >= 0.5
       |),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM npairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM npairs
       |),
       |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u),
       |r0 AS (SELECT u AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
       |$iterCtes
       |SELECT id AS doc_id, r AS rank_micro FROM r$PrIters ORDER BY doc_id""".stripMargin
  }

  /** Personalized PageRank from the doc_id % 50 = 0 seed set (see
    * [[graft.operators.PageRank.personalizedRankMicro]]): proximity of
    * every graph member to the seeds through the near-dup topology —
    * the "expand from known-bad docs" curation query that global
    * PageRank's uniform teleport cannot answer. Same exact integer
    * lattice and iteration count as `q_pagerank`; the oracle unrolls
    * the same rounds with the seed CASE in both the initial mass and
    * the per-round base term.
    */
  def qPersonalizedPagerank(s: SparkSession, dir: String): DataFrame =
    graft.operators.PageRank.personalizedRankMicro(
      minhashPairsShared(s, dir),
      docs(s, dir).filter(col("doc_id") % 50 === 0).select(col("doc_id")),
      iters = PrIters, dampingPct = PrDampingPct)
      .orderBy("doc_id")

  val qPersonalizedPagerankSql: String = {
    val base = 1000000L * (100L - PrDampingPct) / 100L
    val iterCtes = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT e.v AS id,
         |         CAST(CASE WHEN s.id IS NOT NULL THEN $base ELSE 0 END
         |              + ($PrDampingPct * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
         |  FROM edges e JOIN r${i - 1} r ON e.u = r.id JOIN deg d ON e.u = d.u
         |  LEFT JOIN src s ON e.v = s.id
         |  GROUP BY e.v, s.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $minhashVerifiedCte,
       |npairs AS (
       |  SELECT id_a, id_b FROM verified WHERE inter * 1.0 / union_n >= 0.5
       |),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM npairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM npairs
       |),
       |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u),
       |src AS (SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id % 50 = 0),
       |r0 AS (
       |  SELECT d.u AS id,
       |         CAST(CASE WHEN s.id IS NOT NULL THEN 1000000 ELSE 0 END AS BIGINT) AS r
       |  FROM deg d LEFT JOIN src s ON d.u = s.id
       |),
       |$iterCtes
       |SELECT id AS doc_id, r AS ppr_micro FROM r$PrIters ORDER BY doc_id""".stripMargin
  }

  /** Per-node triangle count + local clustering coefficient over the
    * near-dup graph (see [[graft.operators.PageRank.triangleStats]]):
    * dense template family vs copied-once star. Oracle = the same
    * degree-ordered orientation as SQL CTEs.
    */
  def qTriangles(s: SparkSession, dir: String): DataFrame =
    graft.operators.PageRank
      .triangleStats(minhashPairsShared(s, dir))

  val qTrianglesSql: String =
    s"""WITH $minhashVerifiedCte,
       |npairs AS (
       |  SELECT id_a, id_b FROM verified WHERE inter * 1.0 / union_n >= 0.5
       |),
       |e AS (
       |  SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b FROM npairs
       |),
       |deg AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS d
       |  FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
       |  GROUP BY id
       |),
       |oe AS (
       |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN a ELSE b END AS u,
       |         CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN b ELSE a END AS v,
       |         CASE WHEN da.d < db.d OR (da.d = db.d AND a < b) THEN db.d ELSE da.d END AS dv
       |  FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b
       |),
       |tri AS (
       |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
       |  FROM oe e1
       |  JOIN oe e2 ON e1.u = e2.u
       |    AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
       |  JOIN oe e3 ON e3.u = e1.v AND e3.v = e2.v
       |),
       |tc AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS n_tri
       |  FROM (SELECT unnest([x, y, z]) AS id FROM tri)
       |  GROUP BY id
       |)
       |SELECT deg.id AS doc_id, deg.d AS degree,
       |       COALESCE(tc.n_tri, 0) AS n_tri,
       |       CASE WHEN deg.d >= 2
       |            THEN CAST(round(2.0 * COALESCE(tc.n_tri, 0) * 1000000.0
       |                            / (deg.d * (deg.d - 1))) AS BIGINT)
       |            ELSE 0 END AS cc_ppm
       |FROM deg LEFT JOIN tc ON tc.id = deg.id
       |ORDER BY doc_id""".stripMargin

  /** Common-neighbor similarity over the near-dup graph (see
    * [[graft.operators.PageRank.commonNeighbors]]): shared-neighbor
    * counts, neighbor-set Jaccard in exact ppm, and the is_edge flag
    * separating closed triads from link-prediction candidates — the
    * "these two docs don't match directly but share near-dups"
    * transitive-contamination view. Same shared pair graph as
    * PageRank/triangles/BFS; oracle re-derives the wedge counts
    * declaratively.
    */
  def qCommonNeighbors(s: SparkSession, dir: String): DataFrame =
    graft.operators.PageRank.commonNeighbors(minhashPairsShared(s, dir))

  val qCommonNeighborsSql: String =
    s"""WITH $minhashVerifiedCte,
       |npairs AS (
       |  SELECT id_a, id_b FROM verified WHERE inter * 1.0 / union_n >= 0.5
       |),
       |e AS (
       |  SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b FROM npairs
       |),
       |edges AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
       |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
       |cn AS (
       |  SELECT e1.v AS na, e2.v AS nb, CAST(count(*) AS BIGINT) AS common
       |  FROM edges e1 JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
       |  GROUP BY 1, 2
       |)
       |SELECT cn.na AS id_a, cn.nb AS id_b, cn.common,
       |       da.d AS deg_a, db.d AS deg_b,
       |       cn.common * 1000000 // (da.d + db.d - cn.common) AS nbr_jaccard_ppm,
       |       CASE WHEN e.a IS NOT NULL THEN CAST(1 AS BIGINT)
       |            ELSE CAST(0 AS BIGINT) END AS is_edge
       |FROM cn JOIN deg da ON cn.na = da.u JOIN deg db ON cn.nb = db.u
       |LEFT JOIN e ON e.a = cn.na AND e.b = cn.nb
       |ORDER BY id_a, id_b""".stripMargin

  /** Degree assortativity of the near-dup graph (see
    * [[graft.operators.PageRank.assortativity]]): one number saying
    * whether duplication is template-family clumping (high-degree ↔
    * high-degree, r → 1) or hub-and-spoke copying (r < 0) — the
    * graph-level companion of the per-node triangle/clustering view.
    * Same shared pair graph; oracle recomputes the exact moment sums.
    */
  def qAssortativity(s: SparkSession, dir: String): DataFrame =
    graft.operators.PageRank.assortativity(minhashPairsShared(s, dir))

  val qAssortativitySql: String =
    s"""WITH $minhashVerifiedCte,
       |npairs AS (
       |  SELECT id_a, id_b FROM verified WHERE inter * 1.0 / union_n >= 0.5
       |),
       |e AS (
       |  SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b FROM npairs
       |),
       |deg AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS d
       |  FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
       |  GROUP BY id
       |),
       |j AS (
       |  SELECT da.d AS dda, db.d AS ddb
       |  FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b
       |),
       |agg AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       |         CAST(count(*) AS BIGINT) AS n_edges,
       |         CAST(sum(dda * ddb) AS BIGINT) AS s1,
       |         CAST(sum(dda + ddb) AS BIGINT) AS s2,
       |         CAST(sum(dda * dda + ddb * ddb) AS BIGINT) AS s3
       |  FROM j
       |)
       |SELECT n_nodes, n_edges, s1, s2, s3,
       |       CASE WHEN 2.0 * CAST(n_edges AS DOUBLE) * CAST(s3 AS DOUBLE)
       |                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) = 0.0 THEN NULL
       |            ELSE CAST(round((4.0 * CAST(n_edges AS DOUBLE) * CAST(s1 AS DOUBLE)
       |                             - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
       |                            / (2.0 * CAST(n_edges AS DOUBLE) * CAST(s3 AS DOUBLE)
       |                               - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
       |                            * 1000000.0) AS BIGINT) END AS assort_ppm
       |FROM agg""".stripMargin

  /** Asymmetric containment near-superset pairs (see
    * [[graft.operators.Dedup.containmentPairs]]): both containment
    * directions in exact integer ppm over the SAME banded candidates as
    * `q_dedup_minhash` — the quote-inclusion detector symmetric Jaccard
    * under-scores. Oracle replays the banding + list_intersect sizes.
    */
  def qContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(docs(s, dir), k = 8, bands = 4, minCont = 0.8)

  val qContainmentSql: String =
    s"""WITH $minhashVerifiedCte,
       |sz AS (
       |  SELECT id_a, id_b,
       |         CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS inter,
       |         CAST(len(sa.s) AS BIGINT) AS sz_a, CAST(len(sb.s) AS BIGINT) AS sz_b
       |  FROM cand JOIN sh sa ON id_a = sa.doc_id JOIN sh sb ON id_b = sb.doc_id
       |)
       |SELECT id_a, id_b, inter, sz_a, sz_b,
       |       inter * 1000000 // sz_a AS cont_a_ppm,
       |       inter * 1000000 // sz_b AS cont_b_ppm
       |FROM sz
       |WHERE greatest(inter * 1000000 // sz_a, inter * 1000000 // sz_b) >= 800000
       |ORDER BY id_a, id_b""".stripMargin

  /** Near-dup pair count vs Jaccard threshold (0.3/0.5/0.7/0.9) over
    * the SAME banded candidates — the dedup-aggressiveness tuning
    * artifact: how many pairs (and how many chars of removable text)
    * each threshold setting would declare duplicates. One candidate
    * generation + verification, four cheap filters — the expensive
    * subtree is shared, not re-run (CachePool-persisted shingles).
    */
  def qJaccardCurve(s: SparkSession, dir: String): DataFrame = {
    val verified = Dedup.minhashPairs(docs(s, dir), k = 8, bands = 4, threshold = 0.3)
    Seq(300000L, 500000L, 700000L, 900000L).map { t =>
      verified.filter(col("jaccard_ppm") >= t)
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("id_b")).as("n_removable"))
        .select(lit(t).as("threshold_ppm"), col("n_pairs"), col("n_removable"))
    }.reduce(_ unionByName _).orderBy("threshold_ppm")
  }

  val qJaccardCurveSql: String =
    Seq(300000L, 500000L, 700000L, 900000L).map { t =>
      s"""SELECT CAST($t AS BIGINT) AS threshold_ppm,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(count(DISTINCT id_b) AS BIGINT) AS n_removable
         |FROM (WITH $minhashVerifiedCte
         |      SELECT id_a, id_b,
         |             CAST(round(inter * 1000000.0 / union_n) AS BIGINT) AS jaccard_ppm
         |      FROM verified
         |      WHERE inter * 1.0 / union_n >= 0.3)
         |WHERE jaccard_ppm >= $t""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY threshold_ppm")

  private val HopsMax = 3

  /** Multi-source bounded-hop BFS over the near-dup graph (see
    * [[graft.operators.PageRank.boundedHops]]): shortest hop distance
    * for every ordered doc pair reachable within 3 hops — the
    * contamination-depth view the flat components of `q_dedup_groups`
    * erase. The oracle derives the SAME distances declaratively: a
    * recursive CTE (UNION-distinct bounds state) + min(d), against the
    * iterative frontier-expansion plan whose anti-join makes
    * first-reach = min-hops by construction.
    */
  def qGraphHops(s: SparkSession, dir: String): DataFrame =
    graft.operators.PageRank
      .boundedHops(minhashPairsShared(s, dir),
        maxHops = HopsMax)
      .orderBy("src_id", "doc_id")

  val qGraphHopsSql: String =
    s"""WITH RECURSIVE $minhashVerifiedCte,
       |npairs AS (
       |  SELECT id_a, id_b FROM verified WHERE inter * 1.0 / union_n >= 0.5
       |),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM npairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM npairs
       |),
       |walk(src, id, d) AS (
       |  SELECT u, v, 1 FROM edges
       |  UNION
       |  SELECT w.src, e.v, w.d + 1
       |  FROM walk w JOIN edges e ON e.u = w.id
       |  WHERE w.d < $HopsMax AND e.v <> w.src
       |)
       |SELECT src AS src_id, id AS doc_id, CAST(min(d) AS BIGINT) AS hops
       |FROM walk GROUP BY src, id
       |ORDER BY src_id, doc_id""".stripMargin

  /** Hop-bounded weighted shortest paths over the near-dup graph
    * ([[graft.operators.PageRank.weightedHops]]): edge weight =
    * 1000000 − jaccard_ppm (similarity → distance), so the minimum
    * cost between two docs within 3 hops measures how much mutation a
    * contamination chain accumulated — two docs 2 hops apart through a
    * 0.9-Jaccard bridge are closer than direct 0.55-Jaccard neighbors,
    * a distinction [[qGraphHops]]' unweighted hop counts erase. The
    * oracle enumerates walks declaratively (recursive CTE) and takes
    * the same min over the cost·10+hops tie lattice that the iterative
    * Bellman–Ford plan maintains per-round minima on.
    */
  def qShortestPath(s: SparkSession, dir: String): DataFrame =
    graft.operators.PageRank
      .weightedHops(minhashPairsShared(s, dir)
          .withColumn("w", lit(1000000L) - col("jaccard_ppm")),
        maxHops = HopsMax)
      .orderBy("src_id", "doc_id")

  // Level-unrolled Bellman–Ford DP (HopsMax = 3) instead of a recursive
  // walk-enumeration CTE: min cost is additive, so per-level min-cost
  // tables bound the oracle's memory to O(node-pairs) per level where
  // the walk enumeration held every distinct (src, id, cost, d) state —
  // the r10 oracle-gate OOM hog. Semantics identical: every level
  // excludes returning to src, and min(cost*10+d) over levels is the
  // same tie lattice the iterative plan maintains per-round minima on.
  val qShortestPathSql: String =
    s"""WITH $minhashVerifiedCte,
       |npairs AS (
       |  SELECT id_a, id_b,
       |         1000000 - CAST(round(inter * 1000000.0 / union_n) AS BIGINT) AS w
       |  FROM verified WHERE inter * 1.0 / union_n >= 0.5
       |),
       |edges AS MATERIALIZED (
       |  SELECT id_a AS u, id_b AS v, w FROM npairs
       |  UNION ALL
       |  SELECT id_b, id_a, w FROM npairs
       |),
       |l1 AS MATERIALIZED (
       |  SELECT u AS src, v AS id, CAST(min(w) AS BIGINT) AS c
       |  FROM edges GROUP BY u, v
       |),
       |l2 AS MATERIALIZED (
       |  SELECT l1.src, e.v AS id, min(l1.c + e.w) AS c
       |  FROM l1 JOIN edges e ON e.u = l1.id
       |  WHERE e.v <> l1.src GROUP BY l1.src, e.v
       |),
       |l3 AS MATERIALIZED (
       |  SELECT l2.src, e.v AS id, min(l2.c + e.w) AS c
       |  FROM l2 JOIN edges e ON e.u = l2.id
       |  WHERE e.v <> l2.src GROUP BY l2.src, e.v
       |),
       |lat AS (
       |  SELECT src, id, c * 10 + 1 AS lat FROM l1
       |  UNION ALL SELECT src, id, c * 10 + 2 FROM l2
       |  UNION ALL SELECT src, id, c * 10 + 3 FROM l3
       |)
       |SELECT src AS src_id, id AS doc_id,
       |       CAST(min(lat) // 10 AS BIGINT) AS cost_ppm,
       |       CAST(min(lat) % 10 AS BIGINT) AS hops
       |FROM lat GROUP BY src, id
       |ORDER BY src_id, doc_id""".stripMargin

  /** Quality-aware duplicate-group representative: for every near-dup
    * group, the member a pipeline should KEEP — highest
    * [[graft.operators.TextAnalysis.qualityScore]], ties to the lowest
    * doc_id — rather than the min-id canonical the plain grouping
    * emits. One window pass over the labeled members (quality doubles
    * are bit-identical cross-engine — pure arithmetic on exact counts —
    * so the argmax ordering is too).
    */
  def qDedupBest(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextAnalysis
    import org.apache.spark.sql.functions._
    val d = docs(s, dir)
    val groups = nearDupGroupsShared(s, dir)
    val scored = d.select(col("doc_id"),
      TextAnalysis.qualityScore(TextAnalysis.tokens(col("text")), col("text")).as("quality"))
    val byGroup = org.apache.spark.sql.expressions.Window.partitionBy(col("group_id"))
    val w = byGroup.orderBy(col("quality").desc, col("doc_id"))
    groups.join(scored, "doc_id")
      .withColumn("n_members", count(lit(1)).over(byGroup))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("group_id"), col("doc_id").as("best_id"), col("quality"),
        col("n_members"))
      .orderBy("group_id")
  }

  val qDedupBestSql: String = {
    val en = graft.functions.TextAnalysis.stopwords("en")
      .map(w => s"'$w'").mkString(", ")
    s"""WITH RECURSIVE $groupsCte,
       |scored AS (
       |  SELECT doc_id,
       |    0.4 * least(1.0, len(t) * 1.0 / 50.0)
       |      + 0.3 * (len(list_distinct(t)) * 1.0 / len(t))
       |      + 0.3 * (1.0 - len(list_filter(t, x -> x IN ($en))) * 1.0 / len(t)) AS quality
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
       |),
       |m AS (
       |  SELECT g.group_id, g.doc_id, s.quality,
       |         CAST(count(*) OVER (PARTITION BY g.group_id) AS BIGINT) AS n_members,
       |         row_number() OVER (PARTITION BY g.group_id
       |                            ORDER BY s.quality DESC, g.doc_id) AS rn
       |  FROM grp g JOIN scored s USING (doc_id)
       |)
       |SELECT group_id, doc_id AS best_id, quality, n_members
       |FROM m WHERE rn = 1 ORDER BY group_id""".stripMargin
  }

  /** Cross-source duplication matrix: verified near-dup pairs bucketed
    * by (source_a ≤ source_b) with mean Jaccard — which sources copy
    * from which (mirror-site detection, the pair-level companion to
    * the per-source overlap estimates). One broadcast of the tiny
    * (doc_id → source) dimension onto the pair set; the matrix is at
    * most sources² rows.
    */
  def qDupMatrix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val pairs = minhashPairsShared(s, dir)
    val src = docs(s, dir).select(col("doc_id"), col("source"))
    pairs
      .join(broadcast(src.select(col("doc_id").as("id_a"), col("source").as("sa"))), "id_a")
      .join(broadcast(src.select(col("doc_id").as("id_b"), col("source").as("sb"))), "id_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"),
        col("jaccard_ppm"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("jaccard_ppm"))).cast("long").as("mean_jaccard_ppm"))
      .orderBy("source_a", "source_b")
  }

  val qDupMatrixSql: String =
    s"""WITH $minhashVerifiedCte,
       |np AS (
       |  SELECT id_a, id_b,
       |         CAST(round(inter * 1000000.0 / union_n) AS BIGINT) AS jaccard_ppm
       |  FROM verified WHERE inter * 1.0 / union_n >= 0.5
       |),
       |tagged AS (
       |  SELECT least(da.source, db.source) AS source_a,
       |         greatest(da.source, db.source) AS source_b,
       |         np.jaccard_ppm
       |  FROM np
       |  JOIN documents da ON np.id_a = da.doc_id
       |  JOIN documents db ON np.id_b = db.doc_id
       |)
       |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(round(avg(jaccard_ppm)) AS BIGINT) AS mean_jaccard_ppm
       |FROM tagged GROUP BY source_a, source_b
       |ORDER BY source_a, source_b""".stripMargin

  def qSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashBuckets(docs(s, dir))

  val qSimhashSql: String = {
    val bits = (1 to 16).map { j =>
      s"""CASE WHEN list_sum(list_transform(t, tok ->
         |  CASE WHEN substring(md5(tok), $j, 1) >= '8' THEN 1 ELSE -1 END)) > 0
         |THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" || ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sigs AS (SELECT doc_id, $bits AS simhash FROM toks)
       |SELECT doc_id, simhash,
       |       CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS n_same_sig
       |FROM sigs ORDER BY doc_id""".stripMargin
  }

  /** Leakage-safe split: the [[graft.operators.TrainingPrep.assignSplit]]
    * hash rule keyed by near-dup GROUP id (see
    * [[graft.operators.TrainingPrep.leakSafeSplit]]) — a doc and its
    * near-copies can never straddle train/test.
    */
  def qLeakSplit(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val groups = Dedup.nearDupGroups(Dedup.minhashPairs(d, k = 8, bands = 4, threshold = 0.5))
    graft.operators.TrainingPrep.leakSafeSplit(d, groups, trainFrac = 0.8, valFrac = 0.1)
  }

  val qLeakSplitSql: String = {
    val space = 16777216.0
    val tTrain = math.round(0.8 * space)
    val tVal = math.round(0.9 * space)
    val h6 = graft.operators.TrainingPrep.hex6IntSql("gid")
    s"""WITH RECURSIVE $groupsCte,
       |labeled AS (
       |  SELECT d.doc_id, COALESCE(g.group_id, d.doc_id) AS gid
       |  FROM documents d LEFT JOIN grp g USING (doc_id)
       |)
       |SELECT doc_id, gid AS group_id,
       |       CASE WHEN $h6 < $tTrain THEN 'train'
       |            WHEN $h6 < $tVal THEN 'val'
       |            ELSE 'test' END AS split
       |FROM labeled
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------ repeated-block boilerplate
  /** C4-style line-level dedup over 4-token blocks: drop any block
    * text occurring ≥ 3 times corpus-wide, reassemble the survivors.
    */
  def qLineDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.repeatedBlockFilter(docs(s, dir), blockLen = 4, minRepeat = 3)

  val qLineDedupSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |blk AS (
      |  SELECT doc_id, b,
      |         array_to_string(t[(b*4+1):(b*4+4)], ' ') AS btxt
      |  FROM toks, LATERAL (
      |    SELECT unnest(generate_series(0, CAST(ceil(len(t)/4.0) AS BIGINT) - 1)) AS b) _
      |),
      |mult AS (SELECT btxt, count(*) AS m FROM blk GROUP BY btxt)
      |SELECT blk.doc_id,
      |       count(*) AS n_blocks,
      |       count(*) FILTER (WHERE m < 3) AS n_kept,
      |       CAST(round(count(*) FILTER (WHERE m < 3) * 1000000.0 / count(*)) AS BIGINT)
      |         AS kept_ppm,
      |       md5(COALESCE(string_agg(btxt, ' ' ORDER BY b) FILTER (WHERE m < 3), ''))
      |         AS kept_hash
      |FROM blk JOIN mult USING (btxt)
      |GROUP BY blk.doc_id
      |ORDER BY blk.doc_id""".stripMargin
}
