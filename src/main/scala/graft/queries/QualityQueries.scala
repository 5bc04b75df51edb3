package graft.queries

import graft.functions.TextAnalysis
import graft.operators.{BpeTokenizer, Dedup, QualityRules}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query entries + DuckDB oracles for the quality-gate, fingerprinting,
  * sketch, tokenizer-training, and semi-structured-extraction
  * operators. Determinism notes live on the operators
  * ([[graft.operators.QualityRules]], [[graft.operators.BpeTokenizer]],
  * [[graft.operators.Dedup.simhashNearPairs]]).
  */
object QualityQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/documents.parquet")

  /** Delegates to the type-probing shared loader — the queries here only
    * touch event_id/event_type/props (ts is column-pruned away), but a
    * private forced-schema copy was one fixture regeneration away from
    * the r6 loader bug; one loader, one contract.
    */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.events(s, dir)

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  // --------------------------------------------------- gopher quality gate

  def qGopher(s: SparkSession, dir: String): DataFrame =
    QualityRules.gopherFlags(docs(s, dir))

  val qGopherSql: String = {
    val en = inList(TextAnalysis.stopwords("en"))
    s"""WITH s AS (
       |  SELECT doc_id, len(t) AS n, length(text) - (len(t) - 1) AS sumw,
       |         len(list_distinct(t)) AS uniq,
       |         len(list_filter(t, x -> length(x) <= 1)) AS nshort,
       |         len(list_intersect(list_distinct(t), [$en])) AS nstop
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
       |)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |  n >= 30 AND n <= 1000 AS rule_word_count,
       |  sumw >= n * 4 AND sumw <= n * 10 AS rule_word_len,
       |  (n - uniq) * 10 <= n * 6 AS rule_dup_frac,
       |  nstop >= 2 AS rule_stopwords,
       |  nshort * 20 <= n * 3 AS rule_short_toks,
       |  (n >= 30 AND n <= 1000) AND (sumw >= n * 4 AND sumw <= n * 10)
       |    AND ((n - uniq) * 10 <= n * 6) AND (nstop >= 2)
       |    AND (nshort * 20 <= n * 3) AS passes
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------ winnowing fingerprints

  def qWinnow(s: SparkSession, dir: String): DataFrame =
    QualityRules.winnowFingerprints(docs(s, dir), w = 4)

  val qWinnowSql: String =
    """WITH h AS (
      |  SELECT doc_id, len(t) AS n,
      |         list_transform(generate_series(1, len(t) - 2),
      |                        i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS hs
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |  WHERE len(t) >= 6
      |)
      |SELECT doc_id, unnest(list_distinct(
      |  list_transform(generate_series(1, n - 5), j -> list_min(hs[j:j+3])))) AS fp
      |FROM h ORDER BY doc_id, fp""".stripMargin

  // ------------------------------------------- HLL cardinality sketch

  import org.apache.spark.sql.functions.{col, explode, split, countDistinct}

  private def srcTokens(d: DataFrame): DataFrame =
    d.select(col("source"), explode(split(col("text"), " ")).as("tok"))

  /** Per-source distinct-token estimate via the HyperLogLog sketch
    * (see [[graft.operators.Hll]]) beside the exact count — the
    * second cardinality sketch next to `q_kmv_distinct`, with exact
    * integer registers and a 2^−53-lattice harmonic sum so the oracle
    * hash-compares registers AND estimates.
    */
  def qHll(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.operators.CachePool.track(srcTokens(docs(s, dir)))
    val exact = toks.groupBy(col("source")).agg(countDistinct(col("tok")).as("n_exact"))
    graft.operators.Hll.estimate(toks, Seq("source"), col("tok"))
      .join(exact, "source")
      .select(col("source"), col("n_exact"), col("n_regs"), col("v_zero"),
        col("sum_inv_scaled"), col("est_distinct"))
      .orderBy("source")
  }

  private val hllCtes: String =
    """toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
      |hs AS (
      |  SELECT source, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h FROM toks),
      |rr AS (
      |  SELECT source, h >> 52 AS reg,
      |         CASE WHEN (h & 4503599627370495) = 0 THEN 53
      |              ELSE 52 - list_max(list_transform(generate_series(0, 51),
      |                j -> CASE WHEN (((h & 4503599627370495) >> j) & 1) = 1
      |                     THEN j ELSE -1 END))
      |         END AS rank
      |  FROM hs),
      |rm AS (SELECT source, reg, max(rank) AS mj FROM rr GROUP BY 1, 2),
      |agg AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_regs,
      |         CAST(sum(CAST(1 AS BIGINT) << (53 - mj)) AS BIGINT) AS present_sum
      |  FROM rm GROUP BY 1),
      |fin AS (
      |  SELECT source, n_regs, 256 - n_regs AS v_zero,
      |         present_sum + (256 - n_regs) * 9007199254740992 AS sum_inv_scaled,
      |         (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 * 9007199254740992.0
      |           / CAST(present_sum + (256 - n_regs) * 9007199254740992 AS DOUBLE)
      |           AS raw_est
      |  FROM agg),
      |ex AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
      |       FROM toks GROUP BY 1)""".stripMargin

  val qHllSql: String =
    s"""WITH $hllCtes
       |SELECT fin.source, ex.n_exact, fin.n_regs, fin.v_zero, fin.sum_inv_scaled,
       |       round(CASE WHEN fin.v_zero > 0 AND fin.raw_est <= 640.0
       |                  THEN 256.0 * ln(256.0 / CAST(fin.v_zero AS DOUBLE))
       |                  ELSE fin.raw_est END, 3) AS est_distinct
       |FROM fin JOIN ex ON fin.source = ex.source
       |ORDER BY fin.source""".stripMargin

  /** Mergeability proof for the HLL sketch: register tables built over
    * the doc_id-parity halves of the corpus merge by register max and
    * finalize to EXACTLY the whole-corpus sketch (register max is
    * associative and every accumulator exact) — so it shares
    * [[qHllSql]] verbatim, and incremental cardinality maintenance at
    * 100 TB is a batch-sized register aggregation plus this merge.
    */
  def qHllMerge(s: SparkSession, dir: String): DataFrame = {
    val d = graft.operators.CachePool.track(docs(s, dir))
    val ra = graft.operators.Hll.registers(
      srcTokens(d.filter(col("doc_id") % 2 === 0)), Seq("source"), col("tok"))
    val rb = graft.operators.Hll.registers(
      srcTokens(d.filter(col("doc_id") % 2 =!= 0)), Seq("source"), col("tok"))
    val exact = srcTokens(d).groupBy(col("source"))
      .agg(countDistinct(col("tok")).as("n_exact"))
    graft.operators.Hll
      .finalizeEstimate(graft.operators.Hll.merge(ra, rb, Seq("source")), Seq("source"))
      .join(exact, "source")
      .select(col("source"), col("n_exact"), col("n_regs"), col("v_zero"),
        col("sum_inv_scaled"), col("est_distinct"))
      .orderBy("source")
  }

  // ------------------------------------------------ KMV cardinality sketch

  def qKmv(s: SparkSession, dir: String): DataFrame =
    QualityRules.kmvDistinct(docs(s, dir), k = 64)

  val qKmvSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT source, shingle FROM (
      |    SELECT source, unnest(list_transform(generate_series(1, len(t) - 2),
      |                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      |    FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
      |    WHERE len(t) >= 3
      |  )
      |),
      |hs AS (
      |  SELECT DISTINCT source,
      |         CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h
      |  FROM sh
      |),
      |r AS (
      |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      |  FROM hs
      |),
      |agg AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_exact,
      |         max(CASE WHEN rn = 64 THEN h END) AS kth_hash
      |  FROM r GROUP BY source
      |)
      |SELECT source, n_exact, kth_hash,
      |       round((CASE WHEN kth_hash IS NULL THEN CAST(n_exact AS DOUBLE)
      |              ELSE 63.0 * 1152921504606846976.0 / CAST(kth_hash AS DOUBLE) END)
      |             * 1000.0) / 1000.0 AS est_distinct
      |FROM agg ORDER BY source""".stripMargin

  // --------------------------------------------------- pattern redaction

  /** Scrub numeric literals out of the event payload JSON — the
    * PII-redaction shape (count + mask + auditable hash) over the one
    * testdata column that actually carries digit spans.
    */
  def qRedact(s: SparkSession, dir: String): DataFrame =
    QualityRules.redact(events(s, dir), pattern = "[0-9]+", repl = "#",
      textCol = "props", idCol = "event_id")

  val qRedactSql: String =
    """SELECT event_id,
      |       CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_hits,
      |       md5(regexp_replace(props, '[0-9]+', '#', 'g')) AS clean_hash,
      |       substring(regexp_replace(props, '[0-9]+', '#', 'g'), 1, 40) AS clean_head
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------ KMV sketch set algebra

  def qKmvSetOps(s: SparkSession, dir: String): DataFrame =
    QualityRules.kmvSetOps(docs(s, dir), k = 64)

  val qKmvSetOpsSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT source, shingle FROM (
      |    SELECT source, unnest(list_transform(generate_series(1, len(t) - 2),
      |                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      |    FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
      |    WHERE len(t) >= 3
      |  )
      |),
      |hs AS (
      |  SELECT DISTINCT source,
      |         CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h
      |  FROM sh
      |),
      |sk AS (
      |  SELECT source, h FROM (
      |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      |    FROM hs
      |  ) WHERE rn <= 64
      |),
      |srcs AS (SELECT DISTINCT source FROM sk),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b
      |  FROM srcs a JOIN srcs b ON a.source < b.source
      |),
      |merged AS (
      |  SELECT p.src_a, p.src_b, s.h,
      |         max(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
      |         max(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS in_b
      |  FROM pairs p JOIN sk s ON s.source = p.src_a OR s.source = p.src_b
      |  GROUP BY p.src_a, p.src_b, s.h
      |),
      |topk AS (
      |  SELECT * FROM (
      |    SELECT src_a, src_b, h, in_a, in_b,
      |           row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
      |    FROM merged
      |  ) WHERE rn <= 64
      |),
      |agg AS (
      |  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS k_eff,
      |         max(CASE WHEN rn = 64 THEN h END) AS tau,
      |         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
      |  FROM topk GROUP BY src_a, src_b
      |),
      |est AS (
      |  SELECT src_a, src_b, k_eff, n_both,
      |         round((CASE WHEN tau IS NULL THEN CAST(k_eff AS DOUBLE)
      |                ELSE 63.0 * 1152921504606846976.0 / CAST(tau AS DOUBLE) END)
      |               * 1000.0) / 1000.0 AS est_union
      |  FROM agg
      |)
      |SELECT src_a, src_b, k_eff, n_both, est_union,
      |       round(CAST(n_both AS DOUBLE) / k_eff * est_union * 1000.0) / 1000.0 AS est_inter
      |FROM est
      |ORDER BY src_a, src_b""".stripMargin

  // --------------------------------------------- count-min sketch readback

  def qCmsTop(s: SparkSession, dir: String): DataFrame =
    QualityRules.cmsHeavyHitters(docs(s, dir), width = 1024, depth = 4, k = 20)

  val qCmsTopSql: String = {
    val h6 = graft.operators.TrainingPrep.hex6IntSql("CAST(j AS VARCHAR) || '|' || term")
    s"""WITH vocab AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
       |  GROUP BY term
       |),
       |d AS (SELECT unnest(generate_series(0, 3)) AS j),
       |keyed AS (
       |  SELECT term, tf, j, ($h6) % 1024 AS b FROM vocab, d
       |),
       |cells AS (
       |  SELECT j, b, CAST(SUM(tf) AS BIGINT) AS cell FROM keyed GROUP BY j, b
       |),
       |top AS (SELECT term, tf FROM vocab ORDER BY tf DESC, term LIMIT 20)
       |SELECT t.term, t.tf, CAST(MIN(c.cell) AS BIGINT) AS tf_est,
       |       CAST(MIN(c.cell) - t.tf AS BIGINT) AS overcount
       |FROM top t JOIN keyed k ON k.term = t.term JOIN cells c ON c.j = k.j AND c.b = k.b
       |GROUP BY t.term, t.tf
       |ORDER BY t.tf DESC, t.term""".stripMargin
  }

  // --------------------------------------------- simhash hamming near-dups

  /** Universe cap for the FIXED-16-bit baseline: 4-bit bands have 16
    * values, so its candidate join is quadratic in corpus size BY
    * CONTRACT (this query exists as the pinned-scale oracle baseline;
    * the scale path is [[qSimhashWide]]'s width knob). Past the
    * fixture scales it runs on the first `SimhashNearCap` docs —
    * no-op ≤ sf0.1 (5000 docs), bounds the band join at sf1+ (the
    * uncapped 50k-doc oracle materialized 6·10⁸ candidate rows and
    * OOM'd DuckDB in the r13 sf1 drive).
    */
  private val SimhashNearCap = 10000L

  def qSimhashNear(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearStats(
      docs(s, dir).filter(col("doc_id") < SimhashNearCap), maxHam = 2)

  val qSimhashNearSql: String = {
    val bits = (1 to 16).map { j =>
      s"""CASE WHEN list_sum(list_transform(t, tok ->
         |  CASE WHEN substring(md5(tok), $j, 1) >= '8' THEN 1 ELSE -1 END)) > 0
         |THEN ${1L << (16 - j)} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |              WHERE doc_id < $SimhashNearCap),
       |ints AS (SELECT doc_id, CAST($bits AS BIGINT) AS sig FROM toks),
       |bk AS (
       |  SELECT doc_id, sig, band, (sig >> (4 * (3 - band))) & 15 AS bv
       |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band FROM ints)
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id, a.sig AS sig, b.doc_id AS id_b
       |  FROM bk a JOIN bk b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id <> b.doc_id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= 2
       |)
       |SELECT id AS doc_id, sig, CAST(count(*) AS BIGINT) AS n_near,
       |       CAST(min(id_b) AS BIGINT) AS min_near_id
       |FROM cand
       |GROUP BY id, sig
       |ORDER BY doc_id""".stripMargin
  }

  /** The scale-parameterized variant: a 48-bit signature in 4 bands of
    * 12 bits drops random band agreement from 2^−4 to 2^−12 — the
    * candidate join touches ~1/256th the pairs of the 16-bit default
    * at the same corpus size (the knob to turn as n grows).
    */
  def qSimhashWide(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearStats(docs(s, dir), maxHam = 2, sigBits = 48, bands = 4)

  val qSimhashWideSql: String = {
    // hex char j of the signature stream: md5(tok) carries bits 1..32,
    // md5('1|' || tok) bits 33..48 — same construction as
    // Dedup.simhashBitsStr.
    //
    // r16: the Hamming test runs INSIDE the candidate CTE, before the
    // DISTINCT. Semantics-identical (sig is functionally dependent on
    // doc_id, so DISTINCT (id, id_b) + the filter commutes), but the
    // sf2 fixture's duplicate clusters skew band buckets quadratically
    // — the biggest 12-bit bucket holds 22k docs, ~2.5e9 candidate
    // rows across 4 bands — and DISTINCT-ing THAT before filtering
    // exhausted the checker's 50 GB spill; filtered first, only the
    // ~8.4M true near pairs reach the hash table (checks in ~1 min).
    def hexChar(j: Int): String =
      if (j <= 32) s"substring(md5(tok), $j, 1)"
      else s"substring(md5('1|' || tok), ${j - 32}, 1)"
    val bits = (1 to 48).map { j =>
      s"""CASE WHEN list_sum(list_transform(t, tok ->
         |  CASE WHEN ${hexChar(j)} >= '8' THEN 1 ELSE -1 END)) > 0
         |THEN ${1L << (48 - j)} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ints AS (SELECT doc_id, CAST($bits AS BIGINT) AS sig FROM toks),
       |bk AS (
       |  SELECT doc_id, sig, band, (sig >> (12 * (3 - band))) & 4095 AS bv
       |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band FROM ints)
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id, a.sig AS sig, b.doc_id AS id_b
       |  FROM bk a JOIN bk b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id <> b.doc_id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= 2
       |)
       |SELECT id AS doc_id, sig, CAST(count(*) AS BIGINT) AS n_near,
       |       CAST(min(id_b) AS BIGINT) AS min_near_id
       |FROM cand
       |GROUP BY id, sig
       |ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------------- BPE trainer

  val BpeMerges = 8

  def qBpeTrain(s: SparkSession, dir: String): DataFrame =
    BpeTokenizer.train(s, docs(s, dir), BpeMerges)

  /** The word histogram, then `BpeMerges` unrolled iterations: distinct
    * adjacent symbol pairs per word, occurrence counts via the
    * non-overlapping replace scan, argmax with (count desc, pair asc)
    * ties, then the merge applied with the SAME replace. `w{r}` /
    * `t{r}` mirror the driver loop's state after round r.
    */
  private def bpeTrainCtes: String = {
    val w0 =
      """w0 AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c,
        |         ' ' || array_to_string(list_transform(generate_series(1, length(w)),
        |                                i -> w[i]), ' ') || ' ' AS s
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w
        |)""".stripMargin
    val iters = (1 to BpeMerges).map { r =>
      s"""p$r AS (
         |  SELECT DISTINCT s, c, s2[i] AS x, s2[i+1] AS y FROM (
         |    SELECT s, c, s2, unnest(generate_series(1, len(s2) - 1)) AS i
         |    FROM (SELECT s, c, string_split(trim(s), ' ') AS s2 FROM w${r - 1})
         |  )
         |),
         |t$r AS (
         |  SELECT x, y, CAST(SUM(((length(s) - length(replace(s, ' ' || x || ' ' || y || ' ', '')))
         |                         // length(' ' || x || ' ' || y || ' ')) * c) AS BIGINT) AS cnt
         |  FROM p$r GROUP BY x, y
         |  ORDER BY cnt DESC, x, y LIMIT 1
         |),
         |w$r AS (
         |  SELECT w, c, replace(s, ' ' || x || ' ' || y || ' ', ' ' || x || y || ' ') AS s
         |  FROM w${r - 1}, t$r
         |)""".stripMargin
    }
    (w0 +: iters).mkString(",\n")
  }

  val qBpeTrainSql: String = {
    val rows = (1 to BpeMerges).map { r =>
      s"SELECT CAST($r AS BIGINT) AS rank, x AS lft, y AS rgt, x || y AS merged, cnt AS pair_count FROM t$r"
    }.mkString("\nUNION ALL\n")
    s"WITH $bpeTrainCtes\n$rows\nORDER BY rank"
  }

  // ----------------------------------------------------------- BPE encoder

  def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    BpeTokenizer.encode(d, BpeTokenizer.trainMerges(d, BpeMerges))
  }

  val qBpeEncodeSql: String = {
    val encChain = (1 to BpeMerges).map { r =>
      s"""e$r AS (
         |  SELECT doc_id, n_tokens,
         |         replace(s, ' ' || x || ' ' || y || ' ', ' ' || x || y || ' ') AS s
         |  FROM e${r - 1}, t$r
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeTrainCtes,
       |e0 AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         ' ' || replace(regexp_replace(text, '(.)', '\\1 ', 'g'), '   ', ' | ') AS s
       |  FROM documents
       |),
       |$encChain
       |SELECT doc_id, n_tokens,
       |       CAST(len(string_split(trim(s), ' ')) AS BIGINT) - (n_tokens - 1) AS n_bpe,
       |       md5(s) AS bpe_hash, substring(s, 1, 60) AS bpe_head
       |FROM e$BpeMerges ORDER BY doc_id""".stripMargin
  }

  /** Per-source tokenizer fertility/compression (see
    * [[graft.operators.BpeTokenizer.fertility]]) under the corpus's own
    * trained merges — which source a vocabulary fragments worst.
    */
  def qBpeFertility(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    BpeTokenizer.fertility(d, BpeTokenizer.trainMerges(d, BpeMerges))
  }

  val qBpeFertilitySql: String = {
    val encChain = (1 to BpeMerges).map { r =>
      s"""f$r AS (
         |  SELECT src, n_tokens, n_chars,
         |         replace(s, ' ' || x || ' ' || y || ' ', ' ' || x || y || ' ') AS s
         |  FROM f${r - 1}, t$r
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeTrainCtes,
       |f0 AS (
       |  SELECT source AS src, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(length(text) AS BIGINT) AS n_chars,
       |         ' ' || replace(regexp_replace(text, '(.)', '\\1 ', 'g'), '   ', ' | ') AS s
       |  FROM documents
       |),
       |$encChain,
       |agg AS (
       |  SELECT src, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       |         CAST(SUM(CAST(len(string_split(trim(s), ' ')) AS BIGINT) - (n_tokens - 1))
       |              AS BIGINT) AS sum_bpe,
       |         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |  FROM f$BpeMerges GROUP BY src
       |)
       |SELECT src AS "group", n_docs, sum_tokens, sum_bpe, sum_chars,
       |       CAST(round(sum_bpe * 1000000.0 / sum_tokens) AS BIGINT) AS fertility_ppm,
       |       CAST(round(sum_chars * 1000000.0 / sum_bpe) AS BIGINT) AS chars_per_bpe_ppm
       |FROM agg ORDER BY "group"""".stripMargin
  }

  // ---------------------------------------------------------- phrase search

  private val Phrase = Seq("table", "key", "filter")

  def qPhraseSearch(s: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.phraseSearch(docs(s, dir), Phrase)

  val qPhraseSearchSql: String = {
    val slots = Phrase.zipWithIndex.map { case (w, i) =>
      s"s$i AS (SELECT doc, pos - $i AS start FROM tok WHERE term = '$w')"
    }.mkString(",\n")
    val joins = (1 until Phrase.length).map(i => s"JOIN s$i USING (doc, start)").mkString(" ")
    s"""WITH tok AS (
       |  SELECT doc_id AS doc, i AS pos, t[i] AS term FROM (
       |    SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
       |    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
       |  )
       |),
       |$slots
       |SELECT doc AS doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       |       CAST(min(start) AS BIGINT) AS first_pos
       |FROM s0 $joins
       |GROUP BY doc ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------ curriculum phases

  def qCurriculum(s: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.curriculumPhases(docs(s, dir), phases = 4)

  val qCurriculumSql: String =
    """WITH tok AS (
      |  SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term FROM documents
      |),
      |vocab AS (SELECT term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY term),
      |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS t FROM vocab),
      |nll AS (
      |  SELECT doc, CAST(count(*) AS BIGINT) AS n_tokens,
      |         CAST(SUM(CAST(round(-ln(CAST(tf AS DOUBLE) / t) * 100000.0) AS BIGINT))
      |              AS BIGINT) AS nll_total
      |  FROM tok JOIN vocab USING (term) CROSS JOIN tot
      |  GROUP BY doc
      |)
      |SELECT d.doc_id, d.source, n_tokens, nll_total,
      |       CAST(ntile(4) OVER (PARTITION BY d.source
      |                           ORDER BY CAST(nll_total AS DOUBLE) / n_tokens, d.doc_id)
      |            AS BIGINT) AS phase
      |FROM documents d JOIN nll ON d.doc_id = nll.doc
      |ORDER BY d.doc_id""".stripMargin

  // -------------------------------------------------- training-prep capstone

  /** The TRAINING-PREP composition a pipeline runs after cleaning —
    * quality gate → exact-dup canonical → tokenizer-aware token counts
    * (BPE trained on the corpus snapshot) → temperature-mixed source
    * resampling → token-budget sequence packing — in ONE plan, every
    * stage individually oracled elsewhere; this query hash-checks the
    * COMPOSITION. Scale shape: the gate/dedup/encode/mix stages are
    * maps or key-equi joins on doc_id / md5; the pack window partitions
    * by shard. The merge loop's histogram is the only driver traffic.
    */
  def qPrepCapstone(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val gated = d.join(
      QualityRules.gopherFlags(d).filter(col("passes")).select("doc_id"), "doc_id")
    val canon = gated.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val surv = gated.join(canon.select("doc_id"), "doc_id")
    val merges = BpeTokenizer.trainMerges(d, BpeMerges) // snapshot tokenizer
    val enc = BpeTokenizer.encode(surv, merges).select(col("doc_id"), col("n_bpe"))
    val kept = graft.operators.TrainingPrep
      .temperatureMix(surv, alpha = 0.5, targetFrac = 0.6)
      .select(col("doc_id"), col("source"))
    val packed = graft.operators.TrainingPrep.packSequences(
      kept.join(enc, "doc_id"), budget = 256, shards = 8, tokenCountCol = col("n_bpe"))
    kept.join(packed.withColumnRenamed("n_tokens", "n_bpe"), "doc_id")
      .select(col("doc_id"), col("source"), col("n_bpe"), col("shard"),
        col("bin"), col("bin_offset"))
      .orderBy("doc_id")
  }

  val qPrepCapstoneSql: String = {
    val en = inList(TextAnalysis.stopwords("en"))
    val tau = graft.queries.Sql.d(0.6)
    val h6 = graft.operators.TrainingPrep.hex6IntSql("doc_id")
    val encChain = (1 to BpeMerges).map { r =>
      s"""e$r AS (
         |  SELECT doc_id, replace(s, ' ' || x || ' ' || y || ' ', ' ' || x || y || ' ') AS s
         |  FROM e${r - 1}, t$r
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeTrainCtes,
       |gate AS (
       |  SELECT doc_id, text, source FROM (
       |    SELECT doc_id, text, source, len(t) AS n,
       |           length(text) - (len(t) - 1) AS sumw,
       |           len(list_distinct(t)) AS uniq,
       |           len(list_filter(t, x -> length(x) <= 1)) AS nshort,
       |           len(list_intersect(list_distinct(t), [$en])) AS nstop
       |    FROM (SELECT doc_id, text, source, string_split(text, ' ') AS t FROM documents)
       |  ) WHERE (n >= 30 AND n <= 1000) AND (sumw >= n * 4 AND sumw <= n * 10)
       |    AND ((n - uniq) * 10 <= n * 6) AND (nstop >= 2) AND (nshort * 20 <= n * 3)
       |),
       |canon AS (SELECT min(doc_id) AS doc_id FROM gate GROUP BY md5(text)),
       |surv AS (SELECT g.* FROM gate g JOIN canon USING (doc_id)),
       |e0 AS (
       |  SELECT doc_id,
       |         ' ' || replace(regexp_replace(text, '(.)', '\\1 ', 'g'), '   ', ' | ') AS s
       |  FROM surv
       |),
       |$encChain,
       |enc AS (
       |  SELECT e.doc_id,
       |         CAST(len(string_split(trim(s), ' ')) AS BIGINT)
       |           - (CAST(len(string_split(v.text, ' ')) AS BIGINT) - 1) AS n_bpe
       |  FROM e$BpeMerges e JOIN surv v USING (doc_id)
       |),
       |bysrc AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_src,
       |         CAST(round(pow(CAST(CAST(count(*) AS BIGINT) AS DOUBLE), 0.5)
       |              * 1000000.0) AS BIGINT) AS w
       |  FROM surv GROUP BY source
       |),
       |tot AS (SELECT CAST(SUM(n_src) AS BIGINT) AS n_total,
       |               CAST(SUM(w) AS BIGINT) AS sw FROM bysrc),
       |kept AS (
       |  SELECT doc_id, source FROM (
       |    SELECT v.doc_id, v.source,
       |           LEAST(1.0, $tau * CAST(n_total AS DOUBLE) * CAST(w AS DOUBLE)
       |                 / CAST(sw AS DOUBLE) / CAST(n_src AS DOUBLE)) AS rate
       |    FROM surv v JOIN bysrc b USING (source) CROSS JOIN tot
       |  )
       |  WHERE $h6 < CAST(round(rate * 16777216.0) AS BIGINT)
       |),
       |pack AS (
       |  SELECT doc_id, shard, n_bpe,
       |         COALESCE(SUM(n_bpe) OVER (PARTITION BY shard ORDER BY doc_id
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM (SELECT k.doc_id, k.doc_id % 8 AS shard, e.n_bpe
       |        FROM kept k JOIN enc e USING (doc_id))
       |)
       |SELECT k.doc_id, k.source, p.n_bpe, p.shard,
       |       CAST(p.cum_before // 256 AS BIGINT) AS bin,
       |       CAST(p.cum_before % 256 AS BIGINT) AS bin_offset
       |FROM kept k JOIN pack p USING (doc_id)
       |ORDER BY k.doc_id""".stripMargin
  }

  // ------------------------------------------- semi-structured extraction

  /** JSON property extraction + typed aggregation over `events.props` —
    * the semi-structured-column surface (Spark `get_json_object` vs
    * DuckDB `json_extract`, both pure per-row). All outputs integer.
    */
  def qJsonProps(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))
      .orderBy("event_type")

  val qJsonPropsSql: String =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(k) AS BIGINT) AS n_k,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(MIN(k) AS BIGINT) AS min_k,
      |  CAST(MAX(k) AS BIGINT) AS max_k,
      |  CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
      |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------- URL canonicalization + caps

  /** Deterministic messy-URL derivation (the corpus has no URL column):
    * three spelling variants per logical page `doc_id % 100` — scheme
    * case + WWW + default port + /index.html + tracking param /
    * trailing slash / kept-junk params + fragment. The canonicalizer
    * must collapse all three.
    */
  private def rawUrl(dfCol: org.apache.spark.sql.Column,
                     src: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val page = (dfCol % 100).cast("string")
    when(dfCol % 3 === 0,
      concat(lit("HTTP://WWW."), upper(src), lit(".EXAMPLE.COM:80/docs/page-"),
        page, lit("/index.html?utm_source=feed")))
      .when(dfCol % 3 === 1,
        concat(lit("https://"), src, lit(".example.com/docs/page-"), page, lit("/")))
      .otherwise(
        concat(lit("https://"), src, lit(".example.com/docs/page-"),
          page, lit("?utm_campaign=x&ref=rss#sec2")))
  }

  // NOTE: no line may START with `||` — this fragment is re-embedded in
  // a stripMargin string, which would eat one pipe of the operator.
  private val rawUrlSql: String =
    """CASE CAST(doc_id % 3 AS INT)
      |  WHEN 0 THEN 'HTTP://WWW.' || upper(source) || '.EXAMPLE.COM:80/docs/page-' ||
      |              CAST(doc_id % 100 AS VARCHAR) || '/index.html?utm_source=feed'
      |  WHEN 1 THEN 'https://' || source || '.example.com/docs/page-' ||
      |              CAST(doc_id % 100 AS VARCHAR) || '/'
      |  ELSE 'https://' || source || '.example.com/docs/page-' ||
      |       CAST(doc_id % 100 AS VARCHAR) || '?utm_campaign=x&ref=rss#sec2'
      |END""".stripMargin

  def qUrlDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.UrlOps.dedupAndCap(
      docs(s, dir).withColumn("url", rawUrl(col("doc_id"), col("source"))),
      urlCol = "url", maxPerDomain = 3)

  /** Mirrors [[graft.operators.UrlOps.canonical]] step by step;
    * `starts_with` (not LIKE — `_` is a LIKE wildcard) for the
    * tracking-param prefixes.
    */
  val qUrlDedupSql: String =
    s"""WITH raw AS (
       |  SELECT doc_id, n_chars, $rawUrlSql AS url FROM documents
       |),
       |parts AS (
       |  SELECT doc_id, n_chars,
       |         split_part(split_part(url, '#', 1), '://', 2) AS rest
       |  FROM raw
       |),
       |hp AS (
       |  SELECT doc_id, n_chars, rest, split_part(rest, '/', 1) AS hostport
       |  FROM parts
       |),
       |comp AS (
       |  SELECT doc_id, n_chars,
       |         lower(hostport) AS h0,
       |         substring(rest, length(hostport) + 1) AS pathq
       |  FROM hp
       |),
       |host4 AS (
       |  SELECT doc_id, n_chars, pathq,
       |         CASE WHEN h0 LIKE '%:443' THEN substring(h0, 1, length(h0) - 4)
       |              ELSE h0 END AS h1
       |  FROM comp
       |),
       |host8 AS (
       |  SELECT doc_id, n_chars, pathq,
       |         CASE WHEN h1 LIKE '%:80' THEN substring(h1, 1, length(h1) - 3)
       |              ELSE h1 END AS h2
       |  FROM host4
       |),
       |hostd AS (
       |  SELECT doc_id, n_chars, pathq,
       |         CASE WHEN starts_with(h2, 'www.') THEN substring(h2, 5) ELSE h2 END AS host
       |  FROM host8
       |),
       |pq AS (
       |  SELECT doc_id, n_chars, host,
       |         split_part(pathq, '?', 1) AS path0,
       |         COALESCE(array_to_string(
       |           list_filter(string_split(split_part(pathq, '?', 2), '&'),
       |             p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'ref=')
       |                       OR starts_with(p, 'fbclid=') OR starts_with(p, 'gclid='))),
       |           '&'), '') AS qkept -- array_to_string([]) is NULL in DuckDB, '' in Spark
       |  FROM hostd
       |),
       |pth AS (
       |  SELECT doc_id, n_chars, host, qkept,
       |         CASE WHEN path0 LIKE '%/index.html'
       |              THEN substring(path0, 1, length(path0) - 11)
       |              ELSE path0 END AS path1
       |  FROM pq
       |),
       |canon AS (
       |  SELECT doc_id, n_chars,
       |         host ||
       |         (CASE WHEN path1 LIKE '%/' AND length(path1) > 1
       |               THEN substring(path1, 1, length(path1) - 1)
       |               ELSE path1 END) ||
       |         (CASE WHEN qkept = '' THEN '' ELSE '?' || qkept END) AS canon_url
       |  FROM pth
       |),
       |grp AS (
       |  SELECT canon_url,
       |         split_part(canon_url, '/', 1) AS domain,
       |         min(doc_id) AS canonical_id,
       |         count(*) AS n_forms,
       |         max(n_chars) AS best_chars
       |  FROM canon GROUP BY canon_url
       |)
       |SELECT canon_url, domain, canonical_id, n_forms, best_chars, domain_rank
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY domain
       |                               ORDER BY best_chars DESC, canonical_id) AS domain_rank
       |  FROM grp
       |)
       |WHERE domain_rank <= 3
       |ORDER BY canon_url""".stripMargin

  // ------------------------------------------ perceptron gate distillation

  def qPerceptron(s: SparkSession, dir: String): DataFrame =
    graft.operators.Classifier.perceptronDistill(docs(s, dir), iters = 5)

  /** Unrolled full-batch perceptron: feature CTE mirrors
    * [[graft.operators.Classifier.gateFeatures]] (integer `//`
    * divisions — all positive, so floor ≡ Spark's `div`), then five
    * weight CTEs each one aggregation over `feat` with the previous
    * weights cross-joined in. Sums are CAST back to BIGINT (DuckDB
    * sums BIGINT into HUGEINT).
    */
  /** Shared CTE chain: feat (doc_id + integer features + label) and the
    * five unrolled weight iterations i1..i5.
    */
  private[queries] val perceptronCtes: String = {
    val en = inList(TextAnalysis.stopwords("en"))
    def margin(p: String) =
      s"y * ($p.w1*x1 + $p.w2*x2 + $p.w3*x3 + $p.w4*x4 + $p.w5*x5 + $p.b)"
    def iter(k: Int): String = {
      val m = margin("p")
      val dw = (1 to 5).map(i =>
        s"CAST(p.w$i + COALESCE(sum(y*x$i) FILTER (WHERE $m <= 0), 0) AS BIGINT) AS w$i")
        .mkString(",\n         ")
      s"""i$k AS (
         |  SELECT CAST(count(*) FILTER (WHERE $m <= 0) AS BIGINT) AS n_err,
         |         $dw,
         |         CAST(p.b + COALESCE(sum(y) FILTER (WHERE $m <= 0), 0) AS BIGINT) AS b
         |  FROM feat CROSS JOIN i${k - 1} p
         |  GROUP BY p.w1, p.w2, p.w3, p.w4, p.w5, p.b
         |)""".stripMargin
    }
    s"""stats AS (
       |  SELECT doc_id, len(t) AS n, length(text) - (len(t) - 1) AS sumw,
       |         len(list_distinct(t)) AS uniq,
       |         len(list_filter(t, x -> length(x) <= 1)) AS nshort,
       |         len(list_intersect(list_distinct(t), [$en])) AS nstop
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
       |),
       |feat AS (
       |  SELECT doc_id,
       |         CAST(n AS BIGINT) AS x1,
       |         CAST((uniq * 1000) // n AS BIGINT) AS x2,
       |         CAST(nstop AS BIGINT) AS x3,
       |         CAST((sumw * 10) // n AS BIGINT) AS x4,
       |         CAST((nshort * 1000) // n AS BIGINT) AS x5,
       |         CASE WHEN n >= 30 AND n <= 1000 AND sumw >= n * 4 AND sumw <= n * 10
       |                   AND (n - uniq) * 10 <= n * 6 AND nstop >= 2
       |                   AND nshort * 20 <= n * 3
       |              THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y
       |  FROM stats
       |),
       |i0 AS (SELECT CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2,
       |              CAST(0 AS BIGINT) AS w3, CAST(0 AS BIGINT) AS w4,
       |              CAST(0 AS BIGINT) AS w5, CAST(0 AS BIGINT) AS b),
       |${(1 to 5).map(iter).mkString(",\n")}""".stripMargin
  }

  val qPerceptronSql: String = {
    val rows = (1 to 5).map(k =>
      s"SELECT CAST($k AS BIGINT) AS it, n_err, w1, w2, w3, w4, w5, b FROM i$k")
      .mkString("\n", "\nUNION ALL\n", "\n")
    s"""WITH $perceptronCtes
       |$rows
       |ORDER BY it""".stripMargin
  }

  def qPerceptronScore(s: SparkSession, dir: String): DataFrame =
    graft.operators.Classifier.perceptronScore(docs(s, dir), iters = 5)

  /** Inference oracle: every doc scored against the i5 hyperplane. */
  val qPerceptronScoreSql: String =
    s"""WITH $perceptronCtes
       |SELECT doc_id, y,
       |       CASE WHEN p.w1*x1 + p.w2*x2 + p.w3*x3 + p.w4*x4 + p.w5*x5 + p.b > 0
       |            THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS pred,
       |       CASE WHEN (p.w1*x1 + p.w2*x2 + p.w3*x3 + p.w4*x4 + p.w5*x5 + p.b > 0)
       |                 = (y = 1)
       |            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS correct
       |FROM feat CROSS JOIN i5 p
       |ORDER BY doc_id""".stripMargin
}
